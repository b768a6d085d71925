"""Concurrent front for BatchedStreamingServer (T11 as a deployable
service under real concurrency; round-2 VERDICT next item 2).

The round-2 HTTP tier held ONE lock across body routing, host wire
encoding, device drain()s and score fetches, so N network clients
serialized end-to-end — and, worse, each request's drain() ran a
full-S-row upload for a single active stream: 8 concurrent clients paid
8x the host->device bytes of one batched tick on a host whose serving
ceiling IS the upload path (docs/RESULTS.md).

``TickLoop`` fixes the shape: handler threads only touch host buffers
(feed/encode under a condition variable), and ONE dedicated tick thread
owns device dispatch — it gathers every ready stream into a single
masked batched tick, exactly like the direct-drive bench does. A short
batching grace window lets near-simultaneous streams share one upload.

Locking (acquire ``dev`` before ``cond`` when both are needed; the tick
thread never holds ``cond`` while taking ``dev``):
  - ``cond``  guards the server's host state: slot table, per-stream
    buffers + adpcm remainders, ``_fed`` — and wakes the tick thread.
  - ``dev``   guards the states read->compute->assign window, so a
    concurrent open()'s slot reset can never be lost to an in-flight
    tick's state swap.
The expensive steps run OUTSIDE both locks: the [S, chunk] host->device
upload (tick thread) and the ~27 ms score fetch (caller threads). JAX
dispatch is async on this platform, so the ``dev`` critical section is
microseconds.

API semantics match the serial tier: ``feed`` returns only after the
chunks it completed are folded into device state (so a scores() right
after a feed reflects that audio, and the HTTP ``advanced`` field stays
deterministic), but feeds on DIFFERENT streams overlap with each other
and with device compute.
"""

from __future__ import annotations

import threading
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from mla_tpu.serve.server import BatchedStreamingServer


class TickLoop:
    """One device-owning tick thread + thread-safe stream operations.

    >>> loop = TickLoop(BatchedStreamingServer(cfg, variables))
    >>> sid = loop.open()
    >>> loop.feed(sid, samples)     # from any thread; returns when folded
    >>> loop.scores(sid); loop.close(sid); loop.stop()
    """

    def __init__(self, server: BatchedStreamingServer,
                 batch_grace: float = 0.005):
        """``batch_grace``: after the first stream becomes ready, wait up
        to this long for more streams to fill a chunk before dispatching —
        one batched tick uploads the same [S, chunk] bytes as a
        single-stream tick, so merging ticks divides the transfer cost.
        0 disables (dispatch the moment anything is ready)."""
        self.srv = server
        self.batch_grace = float(batch_grace)
        self.cond = threading.Condition()
        self.dev = threading.Lock()
        self._dispatching = False
        self._stop = False
        self.ticks = 0          # completed batched device ticks
        self.ticked_streams = 0  # sum of active stream counts over ticks
        self._thread = threading.Thread(
            target=self._run, name="mla-tick", daemon=True)
        self._thread.start()

    # --- lifecycle -------------------------------------------------------
    def open(self) -> int:
        # slot reset touches device state -> dev; slot table -> cond
        with self.dev, self.cond:
            return self.srv.open()

    def close(self, sid: int):
        with self.cond:
            self.srv.close(sid)
            self.cond.notify_all()

    def stop(self):
        with self.cond:
            self._stop = True
            self.cond.notify_all()
        self._thread.join(timeout=10)

    # --- data path -------------------------------------------------------
    def feed(self, sid: int, samples: np.ndarray,
             wire: Optional[bool] = None, sync: bool = True,
             max_backlog: int = 8) -> int:
        """Append audio. ``sync=True`` (default): block until every chunk
        this feed completed has been folded into device state — a
        scores() right after the feed reflects the audio, and the return
        value (the HTTP ``advanced`` field) counts folded chunks.
        ``sync=False``: return as soon as the audio is buffered (returns
        the chunks made READY), so a client pipelines its next upload
        while the device ticks; backpressure kicks in only beyond
        ``max_backlog`` buffered chunks. scores()/flush() always wait for
        the stream to drain, so final results are identical either way.
        Encoding happens under ``cond`` — host-bound work on a 1-core
        host serializes anyway, and the adpcm encoder's per-stream
        remainder needs the buffer lock."""
        with self.cond:
            self.srv.feed(sid, samples, wire=wire)
            n = self.srv.chunks_ready(sid)
            if n:
                self.cond.notify_all()
        if sync:
            if n:
                self._wait_drained(sid)
        elif n > max_backlog:
            with self.cond:
                while (0 <= sid < self.srv.S
                       and self.srv._bufs[sid] is not None
                       and self.srv.chunks_ready(sid) > max_backlog):
                    self.cond.wait()
        return n

    def pending(self, sid: int) -> int:
        with self.cond:
            return self.srv.pending(sid)

    def open_streams(self) -> int:
        with self.cond:
            return sum(b is not None for b in self.srv._bufs)

    def backlog(self) -> int:
        """Chunks buffered but not yet folded, across all streams (+1
        while a tick is mid-flight) — 0 means device state reflects every
        fed chunk. Exposed via /v1/healthz for pipelined-feed clients."""
        with self.cond:
            return (sum(self.srv.chunks_ready(s) for s in range(self.srv.S))
                    + (1 if self._dispatching else 0))

    def _wait_drained(self, sid: int):
        """Wait until the stream has no full chunk buffered AND no tick is
        mid-flight (a gather empties the buffer before the state swap)."""
        with self.cond:
            while (0 <= sid < self.srv.S
                   and self.srv._bufs[sid] is not None
                   and (self.srv.chunks_ready(sid) or self._dispatching)):
                self.cond.wait()

    def flush(self, sid: int) -> bool:
        """Fold the sub-chunk tail (server.flush semantics). Whole chunks
        are left to the tick thread first; the tail dispatch itself is one
        async device call, cheap enough to hold both locks."""
        self._wait_drained(sid)
        with self.dev, self.cond:
            return self.srv.flush(sid)

    def scores(self, sid: int) -> np.ndarray:
        """Scores reflecting all audio fed before this call. The finalize
        fetch (~27 ms tunnel RTT) runs outside every lock: states are
        immutable JAX arrays, so a snapshot reference is consistent."""
        self._wait_drained(sid)
        with self.cond:
            self.srv._check(sid)
            if not self.srv._fed[sid]:
                raise RuntimeError(f"stream {sid} has no processed audio yet")
            variables, states = self.srv.variables, self.srv.states
        return np.asarray(self.srv._finalize(variables, states))[sid]

    def reload_weights(self, variables) -> None:
        """Zero-downtime weight swap (server.reload_weights semantics),
        serialized against the tick thread's state-assign window. The
        ~31 MB device_put is staged BEFORE taking the locks (VERDICT r4
        item 3: holding `dev` across the transfer froze every stream
        ~0.8 s per reload); only the pointer swap holds them."""
        staged = self.srv.prepare_reload(variables)
        with self.dev, self.cond:
            self.srv.commit_reload(staged)

    def timeline(self, sid: int):
        """Localization window (server.timeline semantics). The ring fetch
        (~1 MB) runs outside every lock on an immutable snapshot."""
        return self.timeline_with_scores(sid)[1:]

    def timeline_with_scores(self, sid: int):
        """(scores, start_patch, levels) from ONE consistent snapshot —
        the HTTP timeline route labels the window with the clip scores, so
        both must reflect the same set of folded chunks. The snapshot is
        taken under ``dev`` as well as ``cond``: the tick thread assigns
        states and tl as two attribute stores under ``dev``, so a
        cond-only reader could pair a pre-tick states with a post-tick
        ring (weights > 1). The single combined fetch (scores ride the
        packed timeline blob) runs outside the locks."""
        self._wait_drained(sid)
        with self.dev, self.cond:
            self.srv._check(sid)
            if not self.srv._fed[sid]:
                raise RuntimeError(f"stream {sid} has no processed audio yet")
            variables, states, tl = (self.srv.variables, self.srv.states,
                                     self.srv.tl)
        return self.srv.timeline_with_scores_from(variables, states, tl, sid)

    # --- tick thread -----------------------------------------------------
    def _n_ready(self) -> int:
        return sum(self.srv.chunks_ready(s) > 0 for s in range(self.srv.S))

    def _run(self):
        srv = self.srv
        # packed hot path (VERDICT r4 item 3, stdlib tier): gather every
        # ready stream straight into ONE uint8 buffer (flat; on a mesh
        # the [S, row_bytes] layout whose rows shard over the stream
        # axis, making the tick one SHARDED upload) and dispatch
        # the one-upload packed tick — replaces the 3-transfer
        # _put_batch handoff (~4 ms/tick of jnp.asarray on this 1-core
        # host; 3 small uploads measured far slower than 1, CLAUDE.md).
        # The staging buffer is FRESH per tick and never mutated after
        # jnp.asarray: safe under either PJRT host-buffer semantics
        # (sync copy, or borrow-until-transfer-completes — jax holds a
        # reference, so GC can't free it mid-transfer). A rotating ring
        # is NOT safe here: under backlog the tick thread dispatches
        # back-to-back (~1-2 ms apart — dispatch is async and
        # block_until_ready is a no-op on this platform), so a depth-8
        # ring slot can be rewritten while its upload is still in
        # flight. gather_ready_packed writes EVERY byte (blank rows for
        # inactive streams), so np.empty needs no zeroing.
        packed = srv._packed_step is not None
        while True:
            with self.cond:
                while not self._stop and self._n_ready() == 0:
                    self.cond.wait()
                if self._stop:
                    return
                if self.batch_grace > 0:
                    # some streams ready, maybe not all: give stragglers a
                    # moment so their chunks ride the same upload
                    deadline = time.monotonic() + self.batch_grace
                    while (not self._stop
                           and self._n_ready() < self.open_count_locked()
                           and time.monotonic() < deadline):
                        self.cond.wait(deadline - time.monotonic())
                    if self._stop:
                        return
                if packed:
                    buf = srv.packed_buffer()
                    active = srv.gather_ready_packed(buf)
                    if active is None:
                        continue
                else:
                    g = srv.gather_ready()
                    if g is None:
                        continue
                    wav, active = g
                self._dispatching = True
            # upload outside both locks (the slow, transfer-bound part)
            if packed:
                dev_buf = srv.put_packed(buf)
                del buf  # never touched again — jax owns the last reference
                with self.dev:
                    srv.states, srv.tl = srv._packed_step(
                        srv.variables, srv.states, srv.tl, dev_buf)
            else:
                n_valid = np.full(srv.S, srv.chunk_patches, np.int32)
                dev_args = srv._put_batch(wav, active, n_valid)
                with self.dev:
                    srv.states, srv.tl = srv._batched_step(
                        srv.variables, srv.states, srv.tl, *dev_args)
            with self.cond:
                srv._fed |= active
                self._dispatching = False
                self.ticks += 1
                self.ticked_streams += int(active.sum())
                self.cond.notify_all()

    def open_count_locked(self) -> int:
        """Open streams that could still contribute to this tick: any open
        slot with buffered audio or a ready chunk (caller holds cond)."""
        return sum(
            b is not None and len(b) > 0 for b in self.srv._bufs
        ) or 1
