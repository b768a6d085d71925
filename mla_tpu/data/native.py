"""ctypes bindings for the native audio-ingest library (native/
audio_ingest.cpp): C++ wav decode, polyphase resample, streaming ring
buffer. Host-side runtime tier — the TPU compute path stays JAX/Pallas.

The .so is built on demand with g++ (no pybind11 in this image; plain C ABI
+ ctypes per the environment constraints). Every entry point has a pure-
Python/scipy fallback in data.audio_io, and ``available()`` gates usage.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LOCK = threading.Lock()
_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")


def _build_and_load() -> Optional[ctypes.CDLL]:
    so_path = os.path.join(_SRC_DIR, "libaudio_ingest.so")
    src = os.path.join(_SRC_DIR, "audio_ingest.cpp")
    if not os.path.exists(src):
        return None
    if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-fPIC", "-march=native", "-shared",
                 "-pthread", src, "-o", so_path],
                check=True, capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.wav_decode.restype = ctypes.c_long
    lib.wav_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.resample_poly.restype = ctypes.c_long
    lib.resample_poly.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
    ]
    lib.ring_new.restype = ctypes.c_void_p
    lib.ring_free.argtypes = [ctypes.c_void_p]
    lib.ring_push.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    lib.ring_size.restype = ctypes.c_long
    lib.ring_size.argtypes = [ctypes.c_void_p]
    lib.ring_pop_chunk.restype = ctypes.c_int
    lib.ring_pop_chunk.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long
    ]
    lib.mulaw_encode.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.POINTER(ctypes.c_uint8)
    ]
    lib.mulaw_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.POINTER(ctypes.c_float)
    ]
    lib.adpcm4_encode.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.adpcm2_encode.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.POINTER(ctypes.c_uint8),
    ]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB
    with _LOCK:
        if _LIB is None:
            _LIB = _build_and_load() or False  # False = tried and failed
    return _LIB or None


def available() -> bool:
    return _lib() is not None


def wav_decode(data: bytes) -> Tuple[np.ndarray, int]:
    """wav bytes -> (mono float32 waveform, sample_rate). Raises on parse error."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native audio_ingest unavailable")
    sr = ctypes.c_int(0)
    n = lib.wav_decode(data, len(data), None, 0, ctypes.byref(sr))
    if n < 0:
        raise ValueError("not a parseable RIFF/WAVE file")
    out = np.empty(n, np.float32)
    got = lib.wav_decode(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, ctypes.byref(sr),
    )
    if got != n:
        raise ValueError(f"wav decode failed ({got})")
    return out, sr.value


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resample (scipy.resample_poly semantics), native."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native audio_ingest unavailable")
    x = np.ascontiguousarray(x, np.float32)
    if sr_in == sr_out:
        return x.copy()
    from math import gcd

    g = gcd(sr_in, sr_out)
    n_out = (len(x) * (sr_out // g) + (sr_in // g) - 1) // (sr_in // g)
    out = np.empty(n_out, np.float32)
    got = lib.resample_poly(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), sr_in, sr_out,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out,
    )
    if got < 0:
        raise RuntimeError(f"native resample failed ({got})")
    return out[:got]


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """float32 [-1,1] -> uint8 mu-law codes (native; == audio_io.mulaw_encode)."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native audio_ingest unavailable")
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(len(x), np.uint8)
    lib.mulaw_encode(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def mulaw_decode(q: np.ndarray) -> np.ndarray:
    """uint8 mu-law codes -> float32 (native; == audio_io.mulaw_decode)."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native audio_ingest unavailable")
    q = np.ascontiguousarray(q, np.uint8)
    out = np.empty(len(q), np.float32)
    lib.mulaw_decode(q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(q),
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def adpcm4_encode(x: np.ndarray, block: int) -> np.ndarray:
    """int16 [rows, n] (n a multiple of block) -> block-interleaved wire
    uint8 [rows, (n/block)*(block/2+3)]. Bit-exact twin of data.adpcm's
    numpy encoder (that module is the spec); rows encode on parallel
    threads when the host has cores."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native audio_ingest unavailable")
    x = np.ascontiguousarray(x, np.int16)
    rows, n = x.shape
    if n % block:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    wire = np.zeros((rows, n // 2 + 3 * (n // block)), np.uint8)
    lib.adpcm4_encode(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), rows, n, block,
        wire.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return wire


def adpcm2_encode(x: np.ndarray, block: int) -> np.ndarray:
    """2-bit twin of adpcm4_encode (data.adpcm.adpcm2_encode numpy path is
    the spec; bit-exact)."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native audio_ingest unavailable")
    x = np.ascontiguousarray(x, np.int16)
    rows, n = x.shape
    if n % block:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    wire = np.zeros((rows, n // 4 + 3 * (n // block)), np.uint8)
    lib.adpcm2_encode(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), rows, n, block,
        wire.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return wire


class NativeRingBuffer:
    """Streaming sample buffer backed by the C++ ring (used by the
    streaming inference service's host feeder)."""

    def __init__(self):
        lib = _lib()
        if lib is None:
            raise RuntimeError("native audio_ingest unavailable")
        self._lib = lib
        self._h = lib.ring_new()

    def push(self, x: np.ndarray):
        x = np.ascontiguousarray(x, np.float32)
        self._lib.ring_push(self._h, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x))

    def __len__(self) -> int:
        return self._lib.ring_size(self._h)

    def pop_chunk(self, chunk: int, advance: int) -> Optional[np.ndarray]:
        out = np.empty(chunk, np.float32)
        ok = self._lib.ring_pop_chunk(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), chunk, advance
        )
        return out if ok else None

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ring_free(self._h)
            self._h = None
