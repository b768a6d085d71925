"""Worker for tests/test_multiprocess.py: one host of a 2-process
jax.distributed run (Gloo CPU collectives). Two modes (argv[1]):

- ``step`` (default): builds the global ("data","model") mesh over both
  processes' devices, replicates a deterministic TrainState by
  initializing INSIDE jit (the multi-controller-safe way to get identical
  global arrays), assembles its per-host slice of the global batch, runs
  ONE DP train step, and prints the (replicated) loss.
- ``fit``: runs the REAL ``train.loop.fit()`` end-to-end multi-host — the
  loop's own make_array_from_process_local_data batch assembly, jit-init,
  device-resident gather, eval, and loss fetch — and prints the loss
  history + final eval mAP (workspace from MLA_WORKSPACE env).

Launched with env: JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_
device_count=<local>, JAX_COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID,
and a PYTHONPATH WITHOUT the axon site dir (its sitecustomize initializes
the backend before jax.distributed can register the other hosts)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from mla_tpu.parallel.distributed import initialize, local_batch_slice  # noqa: E402


def fit_config(pipeline: str = "numpy", ooc_train: str = None,
               ooc_eval: str = None):
    """Shared by the multi-host worker and the single-process reference.
    pipeline="grain" exercises the stateless host-sharded stream + the
    per-step put_local_batch assembly (no device-resident gather).
    ``ooc_train``/``ooc_eval`` switch to an on-disk HDF5 waveform pack
    streamed out-of-core (every host reads its slice's rows from the same
    shared file — the T9 scale story under multi-controller)."""
    from mla_tpu.config import Config, DataConfig, ModelConfig, TrainConfig

    if ooc_train:
        return Config(
            name="mp_fit_ooc",
            model=ModelConfig(variant="multi_level_attention", trunk="cnn",
                              n_classes=6, n_blocks=2, hidden_units=24,
                              conv_channels=(4, 8), convs_per_stage=1,
                              compute_dtype="float32"),
            data=DataConfig(dataset="hdf5", hdf5_path=ooc_train,
                            eval_hdf5_path=ooc_eval, out_of_core=True,
                            pipeline=pipeline, clip_seconds=1.0),
            train=TrainConfig(batch_size=16, num_steps=4, data_parallel=-1,
                              seed=0, log_every=1, eval_every=4,
                              checkpoint_every=0),
        )
    return Config(
        name="mp_fit",
        model=ModelConfig(variant="multi_level_attention", trunk="none", n_classes=8,
                          n_blocks=2, hidden_units=32, compute_dtype="float32"),
        data=DataConfig(dataset="synthetic_audioset", pipeline=pipeline),
        train=TrainConfig(batch_size=16, num_steps=6, data_parallel=-1, seed=0,
                          log_every=1, eval_every=6, checkpoint_every=0),
    )


def main_fit(pipeline: str = "numpy", ooc: bool = False):
    started = initialize()
    assert started and jax.process_count() == 2, (started, jax.process_count())
    from mla_tpu.train.loop import fit

    cfg = fit_config(
        pipeline,
        ooc_train=os.environ.get("MLA_OOC_TRAIN") if ooc else None,
        ooc_eval=os.environ.get("MLA_OOC_EVAL") if ooc else None,
    )
    res = fit(cfg, workspace=os.environ["MLA_WORKSPACE"], log=False)
    print(json.dumps({
        "process": jax.process_index(),
        "losses": [h["loss"] for h in res.history],
        "mAP": res.eval_stats[-1]["mAP"],
    }))


def main_fit_resume():
    """Multi-host Orbax checkpoint + deterministic resume: train 3 steps
    (checkpoint at 3), then auto_resume to 6 — the resumed segment's losses
    must equal an uninterrupted run's steps 4-6 (compared by the test)."""
    import dataclasses

    started = initialize()
    assert started and jax.process_count() == 2, (started, jax.process_count())
    from mla_tpu.train.loop import fit

    ws = os.environ["MLA_WORKSPACE"]
    cfg = fit_config()
    cfg3 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, num_steps=3, checkpoint_every=3)
    )
    fit(cfg3, workspace=ws, log=False)
    cfg6 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, num_steps=6, checkpoint_every=3)
    )
    res = fit(cfg6, workspace=ws, log=False, auto_resume=True)
    print(json.dumps({
        "process": jax.process_index(),
        "losses": [h["loss"] for h in res.history],
    }))


def main_fit_preempt():
    """ONE host (process 0) gets a preempt request mid-run; the per-step
    flag agreement must make BOTH hosts checkpoint at the same step and
    exit interrupted — acting on the local flag alone would deadlock the
    collectives (host 0 saving while host 1 steps)."""
    import dataclasses

    started = initialize()
    assert started and jax.process_count() == 2, (started, jax.process_count())
    from mla_tpu.train import loop as tl

    cfg = fit_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, num_steps=40, log_every=2,
                                       checkpoint_every=0)
    )
    if jax.process_index() == 0:
        orig = tl.ScalarWriter.write

        def write_then_preempt(self, step, scalars):
            orig(self, step, scalars)
            if step == 4:
                tl.request_preemption()

        tl.ScalarWriter.write = write_then_preempt
    res = tl.fit(cfg, workspace=os.environ["MLA_WORKSPACE"], log=False)
    print(json.dumps({
        "process": jax.process_index(),
        "interrupted": res.interrupted,
        "last_step": res.history[-1]["step"],
    }))


def main():
    started = initialize()
    assert started and jax.process_count() == 2, (started, jax.process_count())

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mla_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from mla_tpu.models.zoo import build_model
    from mla_tpu.parallel import mesh as pmesh
    from mla_tpu.train.state import create_train_state, make_train_step

    cfg = Config(
        model=ModelConfig(variant="multi_level_attention", trunk="none", n_classes=8,
                          n_blocks=2, hidden_units=32, compute_dtype="float32"),
        data=DataConfig(dataset="synthetic_audioset"),
        train=TrainConfig(batch_size=16, data_parallel=-1, seed=0),
    )
    mesh = pmesh.make_mesh()  # all 8 global devices on "data"
    model = build_model(cfg.model)
    rng = np.random.default_rng(0)
    gx = rng.standard_normal((16, 10, 128)).astype(np.float32)
    gy = (rng.random((16, 8)) < 0.2).astype(np.float32)

    repl = pmesh.replicated(mesh)
    state = jax.jit(
        lambda: create_train_state(cfg, model, jnp.zeros((16, 10, 128), jnp.float32)),
        out_shardings=jax.tree.map(lambda _: repl, jax.eval_shape(
            lambda: create_train_state(cfg, model, jnp.zeros((16, 10, 128), jnp.float32))
        )),
    )()

    sl = local_batch_slice(16)
    bsh = pmesh.batch_sharding(mesh, 3)
    ysh = pmesh.batch_sharding(mesh, 2)
    x = jax.make_array_from_process_local_data(bsh, gx[sl], (16, 10, 128))
    y = jax.make_array_from_process_local_data(ysh, gy[sl], (16, 8))

    step = jax.jit(
        make_train_step(cfg, model, "features"),
        in_shardings=(jax.tree.map(lambda _: repl, state), bsh, ysh),
        out_shardings=(jax.tree.map(lambda _: repl, state), repl),
    )
    _, loss = step(state, x, y)
    loss_val = float(np.asarray(jax.device_get(loss.addressable_shards[0].data)))
    print(json.dumps({"process": jax.process_index(), "loss": loss_val}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "step"
    if mode == "fit":
        main_fit()
    elif mode == "fit_grain":
        main_fit("grain")
    elif mode == "fit_grain_ooc":
        main_fit("grain", ooc=True)
    elif mode == "fit_resume":
        main_fit_resume()
    elif mode == "fit_preempt":
        main_fit_preempt()
    else:
        main()
