"""Device mesh + sharding rules (T2 mesh runtime, T3 data parallelism,
T4 tensor parallelism; SURVEY.md §2.2).

The reference is single-process/single-device (SURVEY.md §1: no scheduler,
no comm layer) — all of this is new, TPU-native machinery:

- Mesh axes: ``("data", "model")``. DP shards the batch axis; gradients
  all-reduce over ICI implicitly through pjit (T8: XLA collectives, no
  NCCL/MPI).
- TP (T4) is a slot for completeness at this model scale (<10M params):
  rule-based PartitionSpecs shard FC widths over "model"; XLA inserts the
  activation collectives. model_parallel=1 (off) is the default and the
  recommended setting — the workload is DP-shaped (BASELINE.json:10).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data_parallel: int = -1,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model") mesh. data_parallel=-1 -> all remaining
    devices. Axis order puts "model" innermost so TP collectives ride the
    fastest ICI links and DP allreduce the rest."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if model_parallel < 1 or n % model_parallel:
        raise ValueError(f"model_parallel={model_parallel} must divide device count {n}")
    dp = n // model_parallel if data_parallel == -1 else data_parallel
    if dp < 1 or dp * model_parallel > n:
        raise ValueError(
            f"data_parallel*model_parallel = {dp}*{model_parallel} exceeds {n} devices"
        )
    arr = np.asarray(devs[: dp * model_parallel]).reshape(dp, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Leading axis over "data", rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *(None,) * (ndim - 1)))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a pytree of host arrays with batch-axis sharding (T3)."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_local_batch(local: Any, mesh: Mesh, global_batch: int) -> jax.Array:
    """Assemble a batch-sharded GLOBAL array from this process's local slice
    (multi-controller T3: each host loads only its ``global_batch /
    process_count`` rows; jax.make_array_from_process_local_data stitches
    the global array). Single-process this degenerates to ``shard_batch``
    on the full batch."""
    local = np.asarray(local)
    sh = batch_sharding(mesh, local.ndim)
    if jax.process_count() == 1:
        return jax.device_put(local, sh)
    return jax.make_array_from_process_local_data(
        sh, local, (global_batch,) + local.shape[1:]
    )


def put_replicated(arr: Any, mesh: Mesh) -> jax.Array:
    """Place a host array replicated over the whole (possibly multi-host)
    mesh. Every process must pass the same value."""
    arr = np.asarray(arr)
    sh = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(arr, sh)
    return jax.make_array_from_process_local_data(sh, arr, arr.shape)


def fetch(arr: Any) -> np.ndarray:
    """Host value of a device array; works for the multi-controller case
    where a replicated global array is not fully addressable (every shard
    holds the full value — read the first local one)."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    return np.asarray(jax.device_get(arr.addressable_data(0)))


def _tp_spec_for(path: Tuple[str, ...], shape: Tuple[int, ...], hidden: int) -> P:
    """TP rule (T4): shard the hidden width of the embedded-mapping FCs and
    the attention projections over "model".

    - Dense kernels [in, hidden]   -> P(None, "model")   (column parallel)
    - Dense kernels [hidden, out]  -> P("model", None)   (row parallel; XLA
      adds the psum on the output)
    - biases [hidden]              -> P("model")
    Everything else (convs, norms, small heads) replicates.
    """
    name = "/".join(str(p) for p in path)
    if "kernel" in name and len(shape) == 2:
        if shape[1] == hidden:
            return P(None, MODEL_AXIS)
        if shape[0] == hidden:
            return P(MODEL_AXIS, None)
    if "bias" in name and len(shape) == 1 and shape[0] == hidden:
        return P(MODEL_AXIS)
    return P()


def param_shardings(mesh: Mesh, params: Any, hidden_units: int) -> Any:
    """NamedSharding tree for a param/variable pytree under the TP rule.
    With model_parallel == 1 every spec degenerates to replication."""
    if mesh.shape[MODEL_AXIS] == 1:
        return jax.tree.map(lambda _: replicated(mesh), params)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree.structure(params)
    shardings = []
    for path, leaf in flat:
        keys = tuple(
            getattr(k, "key", getattr(k, "idx", getattr(k, "name", str(k)))) for k in path
        )
        spec = _tp_spec_for(keys, np.shape(leaf), hidden_units)
        # divisibility guard: replicate anything the axis can't split evenly
        ok = all(
            spec[i] is None or np.shape(leaf)[i] % mesh.shape[MODEL_AXIS] == 0
            for i in range(len(spec))
        )
        shardings.append(NamedSharding(mesh, spec if ok else P()))
    return jax.tree.unflatten(treedef, shardings)
