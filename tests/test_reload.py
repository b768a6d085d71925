"""Zero-downtime weight hot-reload (server.reload_weights + /v1/reload):
the tick/finalize programs take variables as an explicit argument, so a
swap is one device_put — no retrace, open streams keep their accumulator
state, and chunks folded after the swap use the new weights."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mla_tpu.config import Config, ModelConfig
from mla_tpu.models.zoo import build_model
from mla_tpu.ops import attention_pool as ap
from mla_tpu.ops.frontend import apply_frontend, waveform_to_patches
from mla_tpu.serve.server import BatchedStreamingServer
from mla_tpu.serve.streaming import _samples_per_patches


def _setup(rng, variant="single_attention"):
    cfg = Config(
        name="reload_test",
        model=ModelConfig(variant=variant, trunk="cnn", n_classes=7,
                          n_blocks=1, hidden_units=32, conv_channels=(8, 16),
                          convs_per_stage=1, compute_dtype="float32"),
    )
    model = build_model(cfg.model)
    probe = waveform_to_patches(
        jnp.asarray(rng.standard_normal(16000 * 2).astype(np.float32))[None],
        cfg.frontend)
    v1 = model.init(jax.random.key(0), probe)
    v2 = model.init(jax.random.key(1), probe)
    return cfg, model, v1, v2


def test_reload_fresh_stream_matches_new_weight_server(rng):
    cfg, model, v1, v2 = _setup(rng)
    wav = (rng.standard_normal(
        _samples_per_patches(cfg.frontend, 3)) * 0.3).astype(np.float32)

    srv = BatchedStreamingServer(cfg, v1, max_streams=2, chunk_patches=3)
    a = srv.open()
    srv.feed(a, wav)
    srv.drain()
    before = srv.scores(a).copy()

    srv.reload_weights(v2)
    b = srv.open()
    srv.feed(b, wav)
    srv.drain()

    ref = BatchedStreamingServer(cfg, v2, max_streams=1, chunk_patches=3)
    r = ref.open()
    ref.feed(r, wav)
    ref.drain()
    np.testing.assert_allclose(srv.scores(b), ref.scores(r),
                               rtol=1e-5, atol=1e-6)
    assert not np.allclose(srv.scores(b), before)  # weights really changed


def test_reload_mid_stream_keeps_accumulator_state(rng):
    """Chunks before the swap fold with old weights, after with new; the
    O(1) state carries across — checked against a hand-built fold."""
    cfg, model, v1, v2 = _setup(rng)
    srv = BatchedStreamingServer(cfg, v1, max_streams=1, chunk_patches=3)
    n = _samples_per_patches(cfg.frontend, 6)
    wav = (rng.standard_normal(n) * 0.3).astype(np.float32)
    c1 = wav[: srv.chunk_samples]
    c2 = wav[srv.hop_samples: srv.hop_samples + srv.chunk_samples]

    sid = srv.open()
    srv.feed(sid, c1)
    assert srv.tick() == 1
    srv.reload_weights(v2)
    srv.feed(sid, wav[len(c1):])  # completes chunk 2 exactly
    assert srv.drain() == 1

    def levels(v, chunk):
        p = apply_frontend(jnp.asarray(chunk)[None], cfg.frontend)
        return model.apply(v, p, method="segment_logits")[0]

    st = ap.init_stream_state((1, cfg.model.n_classes))
    st = ap.update_stream_state(st, *levels(v1, c1), "exp", "sigmoid")
    st = ap.update_stream_state(st, *levels(v2, c2), "exp", "sigmoid")
    want = np.asarray(ap.stream_finalize(st))[0]
    np.testing.assert_allclose(srv.scores(sid), want, rtol=1e-4, atol=1e-5)


def test_reload_rejects_mismatched_tree(rng):
    cfg, model, v1, _ = _setup(rng)
    srv = BatchedStreamingServer(cfg, v1, max_streams=1, chunk_patches=3)
    other_cfg = ModelConfig(variant="single_attention", trunk="cnn",
                            n_classes=9, n_blocks=1, hidden_units=32,
                            conv_channels=(8, 16), convs_per_stage=1,
                            compute_dtype="float32")
    other = build_model(other_cfg)
    probe = waveform_to_patches(
        jnp.asarray(rng.standard_normal(16000 * 2).astype(np.float32))[None],
        cfg.frontend)
    bad = other.init(jax.random.key(0), probe)
    with pytest.raises(ValueError, match="does not match"):
        srv.reload_weights(bad)


def test_reload_sharded_server(rng):
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    cfg, model, v1, v2 = _setup(rng, variant="multi_level_attention")
    wav = (rng.standard_normal(
        _samples_per_patches(cfg.frontend, 3)) * 0.3).astype(np.float32)

    srv = BatchedStreamingServer(cfg, v1, max_streams=4, chunk_patches=3,
                                 mesh=mesh)
    sid = srv.open()
    srv.feed(sid, wav)
    srv.drain()
    srv.reload_weights(v2)
    b = srv.open()
    srv.feed(b, wav)
    srv.drain()

    ref = BatchedStreamingServer(cfg, v2, max_streams=1, chunk_patches=3)
    r = ref.open()
    ref.feed(r, wav)
    ref.drain()
    np.testing.assert_allclose(srv.scores(b), ref.scores(r),
                               rtol=1e-5, atol=1e-6)


def _serve_http(rng, reload_fn, create):
    cfg, model, v1, v2 = _setup(rng)
    srv = create(cfg, v1, port=0, max_streams=2, chunk_patches=3,
                 transfer_dtype="float32", reload_fn=reload_fn)
    return cfg, v1, v2, srv


def test_http_reload_route(rng):
    from mla_tpu.serve.client import TagClient
    from mla_tpu.serve.http import create_server

    cfg, model, v1, v2 = _setup(rng)
    swaps = {"n": 0}

    def reload_fn():
        swaps["n"] += 1
        return v2, {"generation": swaps["n"]}

    srv = create_server(cfg, v1, port=0, max_streams=2, chunk_patches=3,
                        transfer_dtype="float32", reload_fn=reload_fn)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = "http://%s:%d" % srv.server_address[:2]
    wav = (rng.standard_normal(
        _samples_per_patches(cfg.frontend, 3)) * 0.3).astype(np.float32)
    try:
        c = TagClient(base)
        before = dict(c.tag(wav, top_k=7, wire="float32"))
        out = c.reload()
        assert out == {"reloaded": True, "generation": 1}
        after = dict(c.tag(wav, top_k=7, wire="float32"))
    finally:
        srv.shutdown()
        srv.server_close()
    assert before != after
    # the post-reload endpoint serves exactly v2's one-shot scores
    from mla_tpu.serve.streaming import tag_clip

    want = tag_clip(cfg, v2, wav)
    from mla_tpu.data.labels import labels_for

    labels = labels_for(cfg.data.dataset, cfg.model.n_classes)
    for name, p in after.items():
        assert abs(p - float(want[labels.index(name)])) < 1e-4


def test_http_reload_unconfigured_409(rng):
    from mla_tpu.serve.client import TagClient, TagServiceError
    from mla_tpu.serve.http import create_server

    cfg, model, v1, _ = _setup(rng)
    srv = create_server(cfg, v1, port=0, max_streams=2, chunk_patches=3,
                        transfer_dtype="float32")
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = "http://%s:%d" % srv.server_address[:2]
    try:
        with pytest.raises(TagServiceError, match="no reload source") as e:
            TagClient(base).reload()
        assert e.value.status == 409
    finally:
        srv.shutdown()
        srv.server_close()


def test_native_front_reload_route(rng):
    from mla_tpu.serve import native_front
    from mla_tpu.serve.client import TagClient

    if not native_front.available():
        pytest.skip("native serving front unavailable")
    cfg, model, v1, v2 = _setup(rng)
    srv = native_front.create_native_server(
        cfg, v1, port=0, max_streams=2, chunk_patches=3,
        transfer_dtype="float32", reload_fn=lambda: v2)
    base = "http://%s:%d" % srv.server_address
    wav = (rng.standard_normal(
        _samples_per_patches(cfg.frontend, 3)) * 0.3).astype(np.float32)
    try:
        c = TagClient(base)
        before = dict(c.tag(wav, top_k=7, wire="float32"))
        assert c.reload()["reloaded"] is True
        after = dict(c.tag(wav, top_k=7, wire="float32"))
    finally:
        srv.server_close()
    assert before != after


def test_reload_watcher_swaps_on_new_checkpoint(tmp_path, rng):
    """start_reload_watcher: a new integer-named step dir triggers ONE
    reload_now; tmp/partial dirs and repeat polls of the same step don't."""
    import time

    from mla_tpu.serve.client import TagClient
    from mla_tpu.serve.http import create_server, start_reload_watcher

    cfg, model, v1, v2 = _setup(rng)
    calls = {"n": 0}

    def reload_fn():
        calls["n"] += 1
        return v2

    ckdir = tmp_path / "checkpoints" / cfg.name
    ckdir.mkdir(parents=True)
    (ckdir / "0").mkdir()  # the step the server started from

    srv = create_server(cfg, v1, port=0, max_streams=2, chunk_patches=3,
                        transfer_dtype="float32", reload_fn=reload_fn)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    stop = start_reload_watcher(srv, str(ckdir), interval_s=0.05)
    try:
        time.sleep(0.3)
        assert calls["n"] == 0  # no new step yet
        (ckdir / "100.orbax-checkpoint-tmp-1").mkdir()  # in-flight save
        time.sleep(0.2)
        assert calls["n"] == 0  # tmp dirs are not steps
        (ckdir / "100").mkdir()  # finalized
        deadline = time.time() + 5
        while calls["n"] == 0 and time.time() < deadline:
            time.sleep(0.05)
        assert calls["n"] == 1
        time.sleep(0.3)
        assert calls["n"] == 1  # same step: no re-reload
        # and the swap really landed
        base = "http://%s:%d" % srv.server_address[:2]
        wav = (rng.standard_normal(
            _samples_per_patches(cfg.frontend, 3)) * 0.3).astype(np.float32)
        from mla_tpu.serve.streaming import tag_clip

        got = dict(TagClient(base).tag(wav, top_k=7, wire="float32"))
        want = tag_clip(cfg, v2, wav)
        from mla_tpu.data.labels import labels_for

        labels = labels_for(cfg.data.dataset, cfg.model.n_classes)
        for name, p in got.items():
            assert abs(p - float(want[labels.index(name)])) < 1e-4
    finally:
        stop.set()
        srv.shutdown()
        srv.server_close()


def test_native_reload_now(rng):
    from mla_tpu.serve import native_front

    if not native_front.available():
        pytest.skip("native serving front unavailable")
    cfg, model, v1, v2 = _setup(rng)
    srv = native_front.create_native_server(
        cfg, v1, port=0, max_streams=1, chunk_patches=3,
        transfer_dtype="float32", reload_fn=lambda: (v2, {"step": 7}))
    try:
        assert srv.reload_now() == {"step": 7}
    finally:
        srv.server_close()


def test_reload_stages_transfer_outside_the_locks(rng):
    """VERDICT r4 item 3: the ~31 MB device_put must run BEFORE the
    tick-serializing locks are taken (round 4 measured ~0.8 s of stream
    freeze per reload with the transfer inside `dev`); only the pointer
    swap may hold them. Asserted by instrumenting prepare/commit: prepare
    must see `dev` free, commit must see it held."""
    from mla_tpu.serve.ticker import TickLoop

    cfg, model, v1, v2 = _setup(rng)
    loop = TickLoop(BatchedStreamingServer(cfg, v1, max_streams=1,
                                           chunk_patches=2))
    try:
        seen = {}
        srv = loop.srv
        orig_prepare, orig_commit = srv.prepare_reload, srv.commit_reload

        def prepare(variables):
            # dev must be free here — acquire(blocking=False) succeeds
            got = loop.dev.acquire(blocking=False)
            seen["prepare_dev_free"] = got
            if got:
                loop.dev.release()
            return orig_prepare(variables)

        def commit(staged):
            # dev must be HELD by this thread here — non-blocking
            # acquire fails (Lock is not reentrant)
            seen["commit_dev_held"] = not loop.dev.acquire(blocking=False)
            if not seen["commit_dev_held"]:
                loop.dev.release()
            return orig_commit(staged)

        srv.prepare_reload, srv.commit_reload = prepare, commit
        loop.reload_weights(v2)
        assert seen == {"prepare_dev_free": True, "commit_dev_held": True}

        # equivalence intact: a fresh stream on the swapped loop matches
        # a server built directly with v2
        srv.prepare_reload, srv.commit_reload = orig_prepare, orig_commit
        wav = (rng.standard_normal(
            _samples_per_patches(cfg.frontend, 2)) * 0.3).astype(np.float32)
        a = loop.open()
        loop.feed(a, wav)
        ref = BatchedStreamingServer(cfg, v2, max_streams=1, chunk_patches=2)
        r = ref.open()
        ref.feed(r, wav)
        ref.drain()
        np.testing.assert_allclose(loop.scores(a), ref.scores(r),
                                   rtol=1e-5, atol=1e-6)
    finally:
        loop.stop()


def test_mesh_server_reload_matches_unsharded(rng):
    """Hot-swap on a MESH server: prepare_reload must stage the new tree
    with the server's parameter shardings (srv._var_sh), and a fresh
    stream after the swap must match an unsharded server built with the
    new weights."""
    from mla_tpu.parallel import mesh as pmesh

    cfg, model, v1, v2 = _setup(rng)
    mesh = pmesh.make_mesh()
    srv = BatchedStreamingServer(cfg, v1, max_streams=8, chunk_patches=2,
                                 mesh=mesh)
    wav = (rng.standard_normal(
        _samples_per_patches(cfg.frontend, 2)) * 0.3).astype(np.float32)

    staged = srv.prepare_reload(jax.tree.map(np.asarray, v2))
    # staged tree carries the mesh shardings, not host arrays
    expect = jax.tree.leaves(srv._var_sh)
    got = [x.sharding for x in jax.tree.leaves(staged)]
    assert got == expect
    srv.commit_reload(staged)

    sid = srv.open()
    srv.feed(sid, wav)
    srv.drain()

    ref = BatchedStreamingServer(cfg, v2, max_streams=1, chunk_patches=2)
    r = ref.open()
    ref.feed(r, wav)
    ref.drain()
    np.testing.assert_allclose(srv.scores(sid), ref.scores(r),
                               rtol=1e-5, atol=1e-6)


def test_reload_under_concurrent_feeds(rng):
    """Hot-swap while another stream feeds: the swap holds dev+cond, the
    tick thread holds dev for its state swap — scores must stay finite
    and the post-drain state must be reachable (no deadlock, no torn
    variables/states pairing)."""
    import threading as _th

    from mla_tpu.serve.ticker import TickLoop

    cfg, model, v1, v2 = _setup(rng)
    loop = TickLoop(BatchedStreamingServer(cfg, v1, max_streams=2,
                                           chunk_patches=2))
    try:
        a, b = loop.open(), loop.open()
        chunk = _samples_per_patches(cfg.frontend, 2)
        stop = _th.Event()

        def feeder():
            while not stop.is_set():
                loop.feed(b, (rng.standard_normal(chunk) * 0.5
                              ).astype(np.float32), sync=False)

        t = _th.Thread(target=feeder, daemon=True)
        t.start()
        try:
            for k in range(20):
                loop.reload_weights(v2 if k % 2 == 0 else v1)
                loop.feed(a, (rng.standard_normal(chunk) * 0.3
                              ).astype(np.float32))
                s = loop.scores(a)
                assert np.isfinite(s).all() and (s >= 0).all() and (s <= 1).all()
        finally:
            stop.set()
            t.join(timeout=10)
    finally:
        loop.stop()
