"""Attention pooling op (C6) + streaming renormalization (T6) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mla_tpu.ops.attention_pool as ap


def _naive_pool(gate_logits, cla_logits, att_act, cla_act):
    """Direct NumPy transcription of the paper's equations."""
    if att_act == "exp":
        v = np.exp(gate_logits)
    elif att_act == "sigmoid":
        v = 1 / (1 + np.exp(-gate_logits))
    elif att_act == "relu":
        v = np.maximum(gate_logits, 0)
    else:
        raise ValueError(att_act)
    f = 1 / (1 + np.exp(-cla_logits)) if cla_act == "sigmoid" else cla_logits
    return (v * f).sum(-2) / np.maximum(v.sum(-2), 1e-7)


@pytest.mark.parametrize("att_act", ["exp", "sigmoid", "relu"])
def test_attention_pool_matches_naive(rng, att_act):
    g = rng.standard_normal((4, 10, 7)).astype(np.float32)
    c = rng.standard_normal((4, 10, 7)).astype(np.float32)
    ours = np.asarray(ap.attention_pool(jnp.asarray(g), jnp.asarray(c), att_act))
    np.testing.assert_allclose(ours, _naive_pool(g, c, att_act, "sigmoid"), rtol=2e-5, atol=1e-6)


def test_exp_gate_is_softmax_over_time(rng):
    g = rng.standard_normal((2, 10, 5)).astype(np.float32)
    c = rng.standard_normal((2, 10, 5)).astype(np.float32)
    f = jax.nn.sigmoid(jnp.asarray(c))
    w = jax.nn.softmax(jnp.asarray(g), axis=-2)
    expected = np.asarray((w * f).sum(-2))
    ours = np.asarray(ap.attention_pool(jnp.asarray(g), jnp.asarray(c), "exp"))
    np.testing.assert_allclose(ours, expected, rtol=2e-5, atol=1e-6)


def test_exp_gate_stable_at_large_logits(rng):
    g = rng.standard_normal((2, 10, 5)).astype(np.float32) + 500.0  # exp would overflow
    c = rng.standard_normal((2, 10, 5)).astype(np.float32)
    out = np.asarray(ap.attention_pool(jnp.asarray(g), jnp.asarray(c), "exp"))
    assert np.isfinite(out).all()


@pytest.mark.parametrize("att_act", ["exp", "sigmoid"])
@pytest.mark.parametrize("chunk", [1, 3, 5, 10])
def test_streaming_matches_whole_clip(rng, att_act, chunk):
    T, C = 10, 6
    g = (rng.standard_normal((2, T, C)) * 5).astype(np.float32)
    c = rng.standard_normal((2, T, C)).astype(np.float32)
    whole = np.asarray(ap.attention_pool(jnp.asarray(g), jnp.asarray(c), att_act))
    state = ap.init_stream_state((2, C))
    for s in range(0, T, chunk):
        state = ap.update_stream_state(
            state, jnp.asarray(g[:, s : s + chunk]), jnp.asarray(c[:, s : s + chunk]), att_act
        )
    np.testing.assert_allclose(np.asarray(ap.stream_finalize(state)), whole, rtol=1e-5, atol=1e-6)


def test_streaming_merge_associative(rng):
    g = (rng.standard_normal((3, 12, 4)) * 8).astype(np.float32)
    c = rng.standard_normal((3, 12, 4)).astype(np.float32)

    def state_of(sl):
        return ap.update_stream_state(
            ap.init_stream_state((3, 4)), jnp.asarray(g[:, sl]), jnp.asarray(c[:, sl]), "exp"
        )

    a, b, d = state_of(slice(0, 4)), state_of(slice(4, 8)), state_of(slice(8, 12))
    left = ap.merge_stream_states(ap.merge_stream_states(a, b), d)
    right = ap.merge_stream_states(a, ap.merge_stream_states(b, d))
    whole = np.asarray(ap.attention_pool(jnp.asarray(g), jnp.asarray(c), "exp"))
    np.testing.assert_allclose(np.asarray(ap.stream_finalize(left)), whole, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ap.stream_finalize(left)), np.asarray(ap.stream_finalize(right)), rtol=1e-6
    )


def test_time_sharded_psum_equals_whole_clip(rng):
    """T6's context-parallel story: shard T over 8 CPU devices, one psum."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    n_dev = len(jax.devices())
    assert n_dev == 8, f"conftest should force 8 CPU devices, got {n_dev}"
    T, C = 16, 4
    g = (rng.standard_normal((2, T, C)) * 5).astype(np.float32)
    c = rng.standard_normal((2, T, C)).astype(np.float32)
    mesh = Mesh(np.asarray(jax.devices()), ("t",))

    def local(gl, cl):
        st = ap.update_stream_state(ap.init_stream_state((2, C)), gl, cl, "exp")
        st = ap.psum_stream_state(st, "t", "exp")
        return ap.stream_finalize(st)

    sharded = shard_map(
        local, mesh=mesh, in_specs=(P(None, "t", None), P(None, "t", None)), out_specs=P(None, None)
    )
    out = np.asarray(sharded(jnp.asarray(g), jnp.asarray(c)))
    whole = np.asarray(ap.attention_pool(jnp.asarray(g), jnp.asarray(c), "exp"))
    np.testing.assert_allclose(out, whole, rtol=1e-5, atol=1e-6)
