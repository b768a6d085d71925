"""Multi-stream batched inference server (T11 at production shape: many
concurrent audio streams share ONE device program per tick).

Each stream has O(1) attention state (ops.attention_pool.StreamState per
level, batched along the stream axis). The server owns S slots; feeds are
buffered per slot in numpy (measured: buffering is noise next to the
host->device transfer — see transfer_dtype below; the C++ ring buffer in
data.native serves custom high-rate feeders); every ``tick()`` gathers
the slots that have a full chunk ready and runs one batched
front-end+trunk+logits program over exactly those — batching is by a
static-shape mask, so there is a single compiled program regardless of
which subset is ready (XLA static shapes; masked folds for the rest).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mla_tpu.config import Config
from mla_tpu.models.zoo import build_model
from mla_tpu.ops import attention_pool as ap
from mla_tpu.ops import frontend as fe
from mla_tpu.serve.streaming import (
    STREAMING_VARIANTS,
    _samples_per_patches,
    n_stream_levels,
    stream_finalize_scores,
)


class BatchedStreamingServer:
    """S concurrent long-form streams, one batched device program per tick.

    >>> srv = BatchedStreamingServer(cfg, variables, max_streams=8)
    >>> sid = srv.open()
    >>> srv.feed(sid, samples)        # any block size, any interleaving
    >>> srv.tick()                    # one batched device call
    >>> srv.scores(sid); srv.close(sid)
    """

    def __init__(self, cfg: Config, variables: Dict, max_streams: int = 8,
                 chunk_patches: int = 5, transfer_dtype: str = "float32",
                 mesh=None, mesh_axis: str = "data"):
        """``mesh`` shards the STREAM axis over ``mesh[mesh_axis]`` (T11 at
        pod scale): per-tick front-end+trunk+logits and the per-stream
        accumulator states partition across devices with zero cross-device
        communication (streams are independent); host work is unchanged.
        max_streams must divide by the axis size."""
        if cfg.model.variant not in STREAMING_VARIANTS:
            raise ValueError(f"streaming needs an attention variant, got {cfg.model.variant!r}")
        if transfer_dtype not in ("float32", "int16", "uint8", "adpcm4"):
            raise ValueError(
                "transfer_dtype must be float32|int16|uint8|adpcm4, "
                f"got {transfer_dtype!r}"
            )
        # "int16": buffer and ship PCM16, dequantize ON DEVICE — halves
        # host->device bytes (the wire format audio arrives in anyway;
        # quantization error 1/32768 is far below the front-end's parity
        # budget). Production default for transfer-bound hosts.
        # "uint8": 8-bit mu-law (G.711-style) — quarter of f32, expanded on
        # device; ~38 dB SNR, fine for tagging (tested vs float32 scores).
        # "adpcm4": 4-bit block IMA ADPCM (data/adpcm.py) — eighth of f32;
        # buffered as int16, encoded per tick (native C++ when built) and
        # decoded INSIDE the jitted chunk program, so the tick upload is
        # ~0.51 bytes/sample; ~24-31 dB SNR, top-1 stable (tested).
        self.transfer_dtype = transfer_dtype
        self._buf_dtype = {
            "float32": np.float32, "int16": np.int16, "uint8": np.uint8,
            "adpcm4": np.int16,
        }[transfer_dtype]
        # silence in wire units: mu-law code 0 is FULL-SCALE -1.0, not zero —
        # pad with the code for 0.0 (=128) or a flushed sub-patch tail would
        # be padded with a -1 DC slab instead of silence
        self._pad_value = 128 if self._buf_dtype == np.uint8 else 0
        self.cfg = cfg
        self.model = build_model(cfg.model)
        self.variables = variables
        self.S = max_streams
        self.chunk_patches = chunk_patches
        self.chunk_samples = _samples_per_patches(cfg.frontend, chunk_patches)
        self.hop_samples = (
            cfg.frontend.example_hop_frames * cfg.frontend.hop_length * chunk_patches
        )
        self._n_levels = n_stream_levels(cfg.model)
        self._bufs: List[Optional[np.ndarray]] = [None] * self.S
        self._fed = np.zeros(self.S, bool)
        c = cfg.model.n_classes
        self.states = [ap.init_stream_state((self.S, c)) for _ in range(self._n_levels)]
        self._wav_sh = self._vec_sh = None
        jit_kwargs = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if self.S % mesh.shape[mesh_axis]:
                raise ValueError(
                    f"max_streams {self.S} not divisible by mesh "
                    f"{mesh_axis}={mesh.shape[mesh_axis]}"
                )
            row = NamedSharding(mesh, P(mesh_axis, None))
            self._wav_sh = row
            self._vec_sh = NamedSharding(mesh, P(mesh_axis))
            st_sh = [ap.StreamState(num=row, den=row, m=row)
                     for _ in range(self._n_levels)]
            self.states = jax.device_put(self.states, st_sh)
            jit_kwargs = dict(
                in_shardings=(st_sh, row, self._vec_sh, self._vec_sh),
                out_shardings=st_sh,
            )

        def batched_step(states, wav, active, n_valid):
            """wav [S, chunk_samples] (f32, or PCM16 dequantized here on
            device); active [S] bool — fold only active rows; n_valid [S]
            int — per-stream count of REAL patches in the chunk (a flush
            pads the tail with zeros; padded patches get gate logits of
            -inf so they contribute nothing — exact for every gate
            activation, which all map -inf to 0). One static-shape program
            serves both regular ticks (n_valid = chunk_patches) and flushes.
            For transfer_dtype="adpcm4", ``wav`` is the (packed nibbles,
            pred0, index0) tuple and the codec is decoded here on device —
            the upload stays compressed all the way to HBM."""
            if self.transfer_dtype == "adpcm4":
                from mla_tpu.data.adpcm import adpcm4_decode

                wav = adpcm4_decode(*wav, n=self.chunk_samples, xp=jnp)
            elif wav.dtype == jnp.int16:
                wav = wav.astype(jnp.float32) / 32768.0
            elif wav.dtype == jnp.uint8:  # mu-law expansion on device
                from mla_tpu.data.audio_io import mulaw_decode

                wav = mulaw_decode(wav, xp=jnp)
            patches = fe.apply_frontend(wav, cfg.frontend)  # [S, P, 96, 64]
            levels = self.model.apply(self.variables, patches, method="segment_logits")
            p = patches.shape[1]
            tmask = jnp.arange(p)[None, :] < n_valid[:, None]  # [S, P]
            new_states = []
            for st, (g, c_) in zip(states, levels):
                g = jnp.where(tmask[..., None], g, -jnp.inf)
                upd = ap.update_stream_state(st, g, c_, cfg.model.att_activation,
                                             cfg.model.cla_activation)
                mask = active[:, None]
                new_states.append(ap.StreamState(
                    num=jnp.where(mask, upd.num, st.num),
                    den=jnp.where(mask, upd.den, st.den),
                    m=jnp.where(mask, upd.m, st.m),
                ))
            return new_states

        def finalize(states):
            return stream_finalize_scores(
                self.model, self.variables, cfg.model.variant, states
            )

        self._batched_step = jax.jit(batched_step, **jit_kwargs)
        self._finalize = jax.jit(finalize)

    def _put_batch(self, wav, active, n_valid):
        if self._wav_sh is None:
            wav = (tuple(jnp.asarray(w) for w in wav)
                   if isinstance(wav, tuple) else jnp.asarray(wav))
            return wav, jnp.asarray(active), jnp.asarray(n_valid)
        # adpcm4's (nibbles, pred0, index0) are all [S, *]: the stream-row
        # sharding applies to each leaf (device_put broadcasts a single
        # sharding over a pytree)
        return (jax.device_put(wav, self._wav_sh),
                jax.device_put(active, self._vec_sh),
                jax.device_put(n_valid, self._vec_sh))

    def _dispatch(self, wav, active, n_valid):
        """Host-side wire encode (adpcm4 only) + one batched device step."""
        if self.transfer_dtype == "adpcm4":
            from mla_tpu.data.adpcm import adpcm4_encode

            wav = adpcm4_encode(wav)
        self.states = self._batched_step(
            *(self.states,) + self._put_batch(wav, active, n_valid)
        )

    # --- stream lifecycle ---
    def open(self) -> int:
        for sid in range(self.S):
            if self._bufs[sid] is None:
                self._bufs[sid] = np.zeros(0, self._buf_dtype)
                self._reset_slot(sid)
                return sid
        raise RuntimeError(f"all {self.S} stream slots busy")

    def close(self, sid: int):
        self._check(sid)
        self._bufs[sid] = None
        self._fed[sid] = False

    def _reset_slot(self, sid: int):
        c = self.cfg.model.n_classes
        blank = ap.init_stream_state((1, c))
        self.states = [
            ap.StreamState(
                num=st.num.at[sid].set(blank.num[0]),
                den=st.den.at[sid].set(blank.den[0]),
                m=st.m.at[sid].set(blank.m[0]),
            )
            for st in self.states
        ]
        self._fed[sid] = False

    def _check(self, sid: int):
        if not 0 <= sid < self.S or self._bufs[sid] is None:
            raise KeyError(f"stream {sid} is not open")

    # --- data path ---
    def _coerce(self, samples: np.ndarray) -> np.ndarray:
        """Incoming float32 [-1,1], PCM16, or uint8 mu-law -> the configured
        buffer dtype (uint8 arrays are mu-law codes by convention)."""
        from mla_tpu.data.audio_io import mulaw_decode, mulaw_encode

        samples = np.asarray(samples)
        if samples.dtype == self._buf_dtype:
            return samples
        if samples.dtype == np.int16:
            samples = samples.astype(np.float32) / 32768.0
        elif samples.dtype == np.uint8:
            samples = mulaw_decode(samples)
        if self._buf_dtype == np.int16:
            return np.asarray(np.clip(samples, -1.0, 1.0) * 32767.0, np.int16)
        if self._buf_dtype == np.uint8:
            return mulaw_encode(samples)
        return np.asarray(samples, np.float32)

    def feed(self, sid: int, samples: np.ndarray):
        self._check(sid)
        self._bufs[sid] = np.concatenate([self._bufs[sid], self._coerce(samples)])

    def pending(self, sid: int) -> int:
        self._check(sid)
        return len(self._bufs[sid])

    def tick(self) -> int:
        """Process one chunk for every stream that has one ready; returns the
        number of streams advanced (0 = nothing ready, no device call)."""
        active = np.array(
            [b is not None and len(b) >= self.chunk_samples for b in self._bufs]
        )
        if not active.any():
            return 0
        wav = np.full((self.S, self.chunk_samples), self._pad_value, self._buf_dtype)
        for sid in range(self.S):
            if active[sid]:
                wav[sid] = self._bufs[sid][: self.chunk_samples]
                self._bufs[sid] = self._bufs[sid][self.hop_samples :]
        n_valid = np.full(self.S, self.chunk_patches, np.int32)
        self._dispatch(wav, active, n_valid)
        self._fed |= active
        return int(active.sum())

    def drain(self) -> int:
        """tick() until no stream has a full chunk; returns total advanced."""
        total = 0
        while True:
            n = self.tick()
            if n == 0:
                return total
            total += n

    def flush(self, sid: int) -> bool:
        """Fold a stream's sub-chunk tail into its state — the server
        counterpart of ``StreamingTagger.flush``, with the same semantics:
        remaining WHOLE patches are processed (the sub-patch remainder is
        dropped, matching the reference front-end), and only a stream too
        short for one patch gets zero-padded to one. Padded patches are
        masked out of the accumulators via the tick program's n_valid lane;
        returns True if a device call was made."""
        self._check(sid)
        # fold any still-complete chunks first — flush must never discard
        # audio a tick() would have processed
        while len(self._bufs[sid]) >= self.chunk_samples:
            self.tick()
        buf = self._bufs[sid]
        if len(buf) == 0:
            return False
        from mla_tpu.serve.streaming import _whole_patches

        fcfg = self.cfg.frontend
        n_valid_sid = _whole_patches(fcfg, len(buf))
        if n_valid_sid < 1:
            if self._fed[sid]:
                self._bufs[sid] = np.zeros(0, self._buf_dtype)
                return False
            n_valid_sid = 1  # lone sub-patch stream: zero-pad to one patch
        n_valid_sid = min(n_valid_sid, self.chunk_patches)
        wav = np.full((self.S, self.chunk_samples), self._pad_value, self._buf_dtype)
        wav[sid, : min(len(buf), self.chunk_samples)] = buf[: self.chunk_samples]
        active = np.zeros(self.S, bool)
        active[sid] = True
        n_valid = np.full(self.S, n_valid_sid, np.int32)
        self._dispatch(wav, active, n_valid)
        self._fed[sid] = True
        self._bufs[sid] = np.zeros(0, self._buf_dtype)
        return True

    def scores(self, sid: int) -> np.ndarray:
        self._check(sid)
        if not self._fed[sid]:
            raise RuntimeError(f"stream {sid} has no processed audio yet")
        return np.asarray(self._finalize(self.states))[sid]
