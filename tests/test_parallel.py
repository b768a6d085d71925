"""Mesh/sharding runtime tests (T2-T4) on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mla_tpu.parallel import mesh as pmesh


def test_make_mesh_shapes():
    m = pmesh.make_mesh()
    assert m.shape == {"data": 8, "model": 1}
    m2 = pmesh.make_mesh(data_parallel=4, model_parallel=2)
    assert m2.shape == {"data": 4, "model": 2}
    m3 = pmesh.make_mesh(data_parallel=3, model_parallel=2)  # subset of devices ok
    assert m3.shape == {"data": 3, "model": 2}
    with pytest.raises(ValueError):
        pmesh.make_mesh(data_parallel=5, model_parallel=2)  # 10 > 8 devices
    with pytest.raises(ValueError):
        pmesh.make_mesh(model_parallel=5)  # 5 doesn't divide 8


def test_shard_batch_places_on_data_axis(rng):
    m = pmesh.make_mesh()
    x = rng.standard_normal((16, 10)).astype(np.float32)
    xs = pmesh.shard_batch(x, m)
    assert xs.sharding.spec == P("data", None)
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_param_shardings_tp_rule(rng):
    m = pmesh.make_mesh(data_parallel=4, model_parallel=2)
    hidden = 64
    params = {
        "block0": {"fc0": {"kernel": np.zeros((128, hidden)), "bias": np.zeros(hidden)}},
        "att": {"gate": {"kernel": np.zeros((hidden, 17)), "bias": np.zeros(17)}},
        "out": {"kernel": np.zeros((34, 17)), "bias": np.zeros(17)},
    }
    sh = pmesh.param_shardings(m, params, hidden)
    assert sh["block0"]["fc0"]["kernel"].spec == P(None, "model")  # column parallel
    assert sh["block0"]["fc0"]["bias"].spec == P("model")
    assert sh["att"]["gate"]["kernel"].spec == P("model", None)  # row parallel
    assert sh["att"]["gate"]["bias"].spec == P()
    assert sh["out"]["kernel"].spec == P()  # small head replicates


def test_param_shardings_divisibility_guard():
    m = pmesh.make_mesh(data_parallel=4, model_parallel=2)
    params = {"fc": {"kernel": np.zeros((10, 63))}}  # 63 % 2 != 0 -> replicate
    sh = pmesh.param_shardings(m, params, 63)
    assert sh["fc"]["kernel"].spec == P()


def test_tp_forward_equivalence(rng):
    """single_attention forward: replicated vs TP-sharded params give the
    same probs (XLA inserts the collectives; T4)."""
    from mla_tpu.config import ModelConfig
    from mla_tpu.models.zoo import AudioTagger

    cfg = ModelConfig(variant="single_attention", trunk="none", n_classes=6,
                      n_blocks=2, hidden_units=64, compute_dtype="float32")
    model = AudioTagger(cfg)
    x = jnp.asarray(rng.standard_normal((4, 10, 128)).astype(np.float32))
    params = model.init(jax.random.key(0), x)

    ref = np.asarray(jax.jit(model.apply)(params, x))

    m = pmesh.make_mesh(data_parallel=4, model_parallel=2)
    psh = pmesh.param_shardings(m, params, cfg.hidden_units)
    params_tp = jax.device_put(params, psh)
    x_tp = jax.device_put(x, pmesh.batch_sharding(m, 3))
    out = np.asarray(jax.jit(model.apply)(params_tp, x_tp))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
