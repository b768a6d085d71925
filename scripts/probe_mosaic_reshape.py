"""Per-round Mosaic capability probe (VERDICT standing item): does the
TPU Pallas compiler accept an IN-KERNEL row-merge reshape
[960, 160] -> [320, 480]?

This is THE blocker keeping the fused T1 front-end kernel behind XLA's
implicit-im2col GEMM path (docs/RESULTS.md "Front-end kernel race"): the
reshape would let the kernel read g=3 residue-class frame views from one
waveform block at zero copy cost, exactly like XLA's fused operand read.
While Mosaic rejects it, the kernel must materialize the views in HBM
(~7 ms/256 clips of traffic XLA does not pay).

Run on the real chip each round:  python scripts/probe_mosaic_reshape.py
Prints one JSON line: {"row_merge_reshape_supported": bool, ...}.
If it ever prints true: build pallas_frontend v3 with in-kernel framing
and re-race XLA (see pallas_frontend.py module docstring).
"""

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def kernel(x_ref, o_ref):
    x = x_ref[...]                      # [960, 160]
    o_ref[...] = x.reshape(320, 480)    # row-merge: 3 rows -> 1


def control_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0       # known-good: elementwise copy


def main():
    x = np.arange(960 * 160, dtype=np.float32).reshape(960, 160)
    # CONTROL first (VERDICT r4 item 8): a kernel Mosaic definitely
    # accepts, compiled in the SAME session. If the control passes and
    # the reshape fails, the failure is a genuine capability reject even
    # when it surfaces as an HTTP 500 from the remote compile helper
    # (the helper crashes ON the kernel, exit 1 -> 500) — not tunnel flake.
    try:
        c = pl.pallas_call(
            control_kernel,
            out_shape=jax.ShapeDtypeStruct((960, 160), jnp.float32),
        )(jnp.asarray(x))
        control_ok = bool(np.allclose(np.asarray(c), x * 2.0))
        control_err = None
    except Exception as e:
        control_ok, control_err = False, f"{type(e).__name__}: {str(e)[:200]}"
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((320, 480), jnp.float32),
        )(jnp.asarray(x))
        ok = bool(np.array_equal(np.asarray(out), x.reshape(320, 480)))
        err = None if ok else "compiled but produced wrong values"
    except Exception as e:  # Mosaic lowering error == still unsupported
        ok, err = False, f"{type(e).__name__}: {str(e)[:300]}"
    print(json.dumps({
        "row_merge_reshape_supported": ok,
        "control_kernel_ok": control_ok,
        "verdict": ("genuine-reject" if control_ok and not ok
                    else "supported" if ok
                    else "inconclusive-compiler-unreachable"),
        "platform": jax.devices()[0].platform,
        "error": err,
        "control_error": control_err,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
