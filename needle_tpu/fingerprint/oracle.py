"""ctypes binding to a system libchromaprint, used as a *test oracle*.

The production fingerprint path is our own NumPy/JAX implementation; this
module exists to (a) generate golden hashes in tests, proving algorithm
compatibility with the exact library the reference links against
(chromaprint 1.5.x), and (b) provide an optional "exact" backend for users
who require bit-identical `.needle.dat` files.

Mirrors the usage in needle/src/audio/analyzer.rs:176-311 (start -> feed ->
finish -> get_delay / get_item_duration / get_fingerprint_raw).
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import Optional

import numpy as np

# Default algorithm: CHROMAPRINT_ALGORITHM_TEST2 == 1 (chromaprint.h).
ALGORITHM_TEST2 = 1

_LIB_CANDIDATES = (
    "libchromaprint.so.1",
    "libchromaprint.so",
    "libchromaprint.1.dylib",
    "libchromaprint.dylib",
)

_lib = None
_lib_checked = False
_lib_lock = __import__("threading").Lock()


def load_library() -> Optional[ctypes.CDLL]:
    """Load libchromaprint if available, configuring prototypes. Returns None
    if the library is not installed (callers should skip golden tests)."""
    global _lib, _lib_checked
    with _lib_lock:
        return _load_library_locked()


def _load_library_locked() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    path = ctypes.util.find_library("chromaprint")
    names = ([path] if path else []) + list(_LIB_CANDIDATES)
    lib = None
    for name in names:
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if lib is None:
        return None

    c = ctypes
    lib.chromaprint_new.restype = c.c_void_p
    lib.chromaprint_new.argtypes = [c.c_int]
    lib.chromaprint_free.restype = None
    lib.chromaprint_free.argtypes = [c.c_void_p]
    lib.chromaprint_start.restype = c.c_int
    lib.chromaprint_start.argtypes = [c.c_void_p, c.c_int, c.c_int]
    lib.chromaprint_feed.restype = c.c_int
    lib.chromaprint_feed.argtypes = [c.c_void_p, c.POINTER(c.c_int16), c.c_int]
    lib.chromaprint_finish.restype = c.c_int
    lib.chromaprint_finish.argtypes = [c.c_void_p]
    lib.chromaprint_get_raw_fingerprint.restype = c.c_int
    lib.chromaprint_get_raw_fingerprint.argtypes = [
        c.c_void_p,
        c.POINTER(c.POINTER(c.c_uint32)),
        c.POINTER(c.c_int),
    ]
    lib.chromaprint_get_delay.restype = c.c_int
    lib.chromaprint_get_delay.argtypes = [c.c_void_p]
    lib.chromaprint_get_delay_ms.restype = c.c_int
    lib.chromaprint_get_delay_ms.argtypes = [c.c_void_p]
    lib.chromaprint_get_item_duration.restype = c.c_int
    lib.chromaprint_get_item_duration.argtypes = [c.c_void_p]
    lib.chromaprint_get_item_duration_ms.restype = c.c_int
    lib.chromaprint_get_item_duration_ms.argtypes = [c.c_void_p]
    lib.chromaprint_get_sample_rate.restype = c.c_int
    lib.chromaprint_get_sample_rate.argtypes = [c.c_void_p]
    lib.chromaprint_dealloc.restype = None
    lib.chromaprint_dealloc.argtypes = [c.c_void_p]
    if hasattr(lib, "chromaprint_hash_fingerprint"):
        lib.chromaprint_hash_fingerprint.restype = c.c_int
        lib.chromaprint_hash_fingerprint.argtypes = [
            c.POINTER(c.c_uint32),
            c.c_int,
            c.POINTER(c.c_uint32),
        ]
    _lib = lib
    return _lib


def available() -> bool:
    return load_library() is not None


class ChromaprintOracle:
    """Minimal equivalent of chromaprint_rust::Context for testing."""

    def __init__(self, algorithm: int = ALGORITHM_TEST2):
        lib = load_library()
        if lib is None:
            raise RuntimeError("libchromaprint not available")
        self._lib = lib
        self._ctx = lib.chromaprint_new(algorithm)
        if not self._ctx:
            raise RuntimeError("chromaprint_new failed")

    def close(self):
        if self._ctx:
            self._lib.chromaprint_free(self._ctx)
            self._ctx = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    @property
    def sample_rate(self) -> int:
        return self._lib.chromaprint_get_sample_rate(self._ctx)

    def start(self, sample_rate: int, channels: int) -> None:
        if self._lib.chromaprint_start(self._ctx, sample_rate, channels) != 1:
            raise RuntimeError("chromaprint_start failed")

    def feed(self, samples: np.ndarray) -> None:
        """Feed interleaved i16 samples (like analyzer.rs:275)."""
        samples = np.ascontiguousarray(samples, dtype=np.int16)
        ptr = samples.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
        if self._lib.chromaprint_feed(self._ctx, ptr, samples.size) != 1:
            raise RuntimeError("chromaprint_feed failed")

    def finish(self) -> None:
        if self._lib.chromaprint_finish(self._ctx) != 1:
            raise RuntimeError("chromaprint_finish failed")

    def get_raw_fingerprint(self) -> np.ndarray:
        fp_ptr = ctypes.POINTER(ctypes.c_uint32)()
        size = ctypes.c_int()
        if (
            self._lib.chromaprint_get_raw_fingerprint(
                self._ctx, ctypes.byref(fp_ptr), ctypes.byref(size)
            )
            != 1
        ):
            raise RuntimeError("chromaprint_get_raw_fingerprint failed")
        try:
            out = np.ctypeslib.as_array(fp_ptr, shape=(size.value,)).astype(np.uint32)
        finally:
            self._lib.chromaprint_dealloc(fp_ptr)
        return out

    def get_delay_samples(self) -> int:
        return self._lib.chromaprint_get_delay(self._ctx)

    def get_item_duration_samples(self) -> int:
        return self._lib.chromaprint_get_item_duration(self._ctx)

    def simhash(self, hashes: np.ndarray) -> int:
        hashes = np.ascontiguousarray(hashes, dtype=np.uint32)
        out = ctypes.c_uint32()
        ptr = hashes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
        if self._lib.chromaprint_hash_fingerprint(ptr, hashes.size, ctypes.byref(out)) != 1:
            raise RuntimeError("chromaprint_hash_fingerprint failed")
        return out.value


def fingerprint_oracle(mono_or_stereo_i16: np.ndarray, channels: int = 1) -> np.ndarray:
    """One-shot raw fingerprint of i16 PCM at 11025 Hz via libchromaprint."""
    ctx = ChromaprintOracle()
    ctx.start(11025, channels)
    ctx.feed(mono_or_stereo_i16)
    ctx.finish()
    fp = ctx.get_raw_fingerprint()
    ctx.close()
    return fp
