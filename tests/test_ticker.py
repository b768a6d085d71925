"""Concurrent serving front (serve/ticker.py, round-2 VERDICT next item
2): N threads feeding distinct streams through the tick thread must (a)
score identically to the serial in-process tagger and (b) actually BATCH
— concurrent chunk-ready streams share one device tick instead of paying
one full-S upload each."""

import dataclasses
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mla_tpu.config import Config, ModelConfig
from mla_tpu.models.zoo import build_model
from mla_tpu.ops.frontend import waveform_to_patches
from mla_tpu.serve.server import BatchedStreamingServer
from mla_tpu.serve.streaming import StreamingTagger, _samples_per_patches
from mla_tpu.serve.ticker import TickLoop


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        name="ticker_test",
        model=ModelConfig(variant="single_attention", trunk="cnn", n_classes=10,
                          n_blocks=1, hidden_units=48, conv_channels=(8, 16),
                          convs_per_stage=1, compute_dtype="float32"),
        data=dataclasses.replace(Config().data, dataset="synthetic_us8k"),
    )
    model = build_model(cfg.model)
    wav = (np.random.default_rng(7).standard_normal(16000 * 14) * 0.1
           ).astype(np.float32)
    patches = waveform_to_patches(jnp.asarray(wav[:32000])[None], cfg.frontend)
    variables = model.init(jax.random.key(0), patches)
    return cfg, variables, wav


def _serial_scores(cfg, variables, audio, flush=False):
    t = StreamingTagger(cfg, variables, chunk_patches=3)
    t.feed(audio)
    if flush:
        t.flush()
    return t.scores()


def test_concurrent_feeds_match_serial(setup):
    """4 threads, 4 streams, different audio each, feeds split into odd
    blocks — every stream's scores equal its serial single-stream run."""
    cfg, variables, wav = setup
    n = _samples_per_patches(cfg.frontend, 6)  # 2 chunks of 3 patches
    audios = [(wav[:n] * g).astype(np.float32) for g in (1.0, 0.5, 0.25, 0.8)]
    loop = TickLoop(BatchedStreamingServer(
        cfg, variables, max_streams=4, chunk_patches=3), batch_grace=0.02)
    try:
        sids = [loop.open() for _ in audios]
        errs = []

        def client(sid, audio):
            try:
                for s in range(0, len(audio), 11111):
                    loop.feed(sid, audio[s: s + 11111])
            except Exception as e:  # pragma: no cover - failure reporting
                errs.append(e)

        ts = [threading.Thread(target=client, args=(sid, a))
              for sid, a in zip(sids, audios)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs, errs
        for sid, audio in zip(sids, audios):
            np.testing.assert_allclose(
                loop.scores(sid), _serial_scores(cfg, variables, audio),
                rtol=1e-5, atol=1e-6)
            loop.close(sid)
    finally:
        loop.stop()


def test_lockstep_streams_share_ticks(setup):
    """Chunk-sized feeds from 4 threads in lockstep: the grace window must
    merge them so a device tick serves >1 stream on average (the serial
    round-2 tier was pinned at exactly 1 per request)."""
    cfg, variables, wav = setup
    n1 = _samples_per_patches(cfg.frontend, 3)
    audio = wav[:n1]
    loop = TickLoop(BatchedStreamingServer(
        cfg, variables, max_streams=4, chunk_patches=3), batch_grace=0.5)
    try:
        sids = [loop.open() for _ in range(4)]
        rounds = 3
        barrier = threading.Barrier(4)
        errs = []

        def client(sid):
            try:
                for _ in range(rounds):
                    barrier.wait()
                    loop.feed(sid, audio)
            except Exception as e:  # pragma: no cover - failure reporting
                errs.append(e)

        ts = [threading.Thread(target=client, args=(sid,)) for sid in sids]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs, errs
        assert loop.ticked_streams == 4 * rounds
        # generous grace + lockstep clients: reaching 12 folded streams in
        # <= 6 ticks means real cross-stream batching happened
        assert loop.ticks <= 2 * rounds, (loop.ticks, loop.ticked_streams)
        for sid in sids:
            np.testing.assert_allclose(
                loop.scores(sid),
                _serial_scores(cfg, variables,
                               np.concatenate([audio] * rounds)),
                rtol=1e-5, atol=1e-6)
    finally:
        loop.stop()


def test_feed_advanced_and_flush_semantics(setup):
    """feed() returns the chunk count it completed (the HTTP `advanced`
    field), sub-chunk feeds return 0, and flush folds the tail exactly
    like the serial tagger."""
    cfg, variables, wav = setup
    loop = TickLoop(BatchedStreamingServer(
        cfg, variables, max_streams=2, chunk_patches=3))
    try:
        n1 = _samples_per_patches(cfg.frontend, 3)
        sid = loop.open()
        assert loop.feed(sid, wav[: n1 // 2]) == 0
        assert loop.feed(sid, wav[n1 // 2: n1]) == 1
        tail_n = 16000  # > one 15,360-sample patch, < a 3-patch chunk
        assert loop.feed(sid, wav[n1: n1 + tail_n]) == 0
        assert loop.pending(sid) > 0
        assert loop.flush(sid) is True  # a whole-patch tail folds
        np.testing.assert_allclose(
            loop.scores(sid),
            _serial_scores(cfg, variables, wav[: n1 + tail_n], flush=True),
            rtol=1e-5, atol=1e-6)
        # errors propagate from the ticker like from the raw server
        with pytest.raises(RuntimeError):
            loop.scores(loop.open())  # fresh stream, nothing processed
        with pytest.raises(KeyError):
            loop.feed(99, wav[:100])
    finally:
        loop.stop()


def test_open_reset_not_lost_to_inflight_tick(setup):
    """Slot reuse under load: closing + reopening a slot while other
    streams keep ticking must yield a CLEAN state for the new stream (the
    dev lock makes reset and tick state swaps atomic — a lost reset would
    leak the previous occupant's accumulators into the new scores)."""
    cfg, variables, wav = setup
    n = _samples_per_patches(cfg.frontend, 3)
    audio = wav[:n]
    loop = TickLoop(BatchedStreamingServer(
        cfg, variables, max_streams=2, chunk_patches=3), batch_grace=0.0)
    try:
        other = loop.open()
        stop = threading.Event()
        errs = []

        def background():
            try:
                while not stop.is_set():
                    loop.feed(other, audio)
            except Exception as e:  # pragma: no cover - failure reporting
                errs.append(e)

        t = threading.Thread(target=background)
        t.start()
        try:
            for gain in (1.0, 0.3):
                sid = loop.open()
                loop.feed(sid, (audio * gain).astype(np.float32))
                np.testing.assert_allclose(
                    loop.scores(sid),
                    _serial_scores(cfg, variables,
                                   (audio * gain).astype(np.float32)),
                    rtol=1e-5, atol=1e-6)
                loop.close(sid)
        finally:
            stop.set()
            t.join()
        assert not errs, errs
    finally:
        loop.stop()


def test_async_feeds_match_serial_and_backpressure(setup):
    """sync=False feeds return on buffering (pipelined uploads) but
    scores still reflect every fed chunk; backpressure bounds the
    backlog instead of letting a fast client buffer without limit."""
    cfg, variables, wav = setup
    n1 = _samples_per_patches(cfg.frontend, 3)
    audio = wav[: n1 * 4]
    loop = TickLoop(BatchedStreamingServer(
        cfg, variables, max_streams=2, chunk_patches=3), batch_grace=0.0)
    try:
        sid = loop.open()
        for s in range(0, len(audio), n1):
            loop.feed(sid, audio[s: s + n1], sync=False, max_backlog=2)
            with loop.cond:
                assert loop.srv.chunks_ready(sid) <= 3  # backlog+in-append
        np.testing.assert_allclose(
            loop.scores(sid),  # waits for the drain
            _serial_scores(cfg, variables, audio),
            rtol=1e-5, atol=1e-6)
        assert loop.backlog() == 0
    finally:
        loop.stop()
