"""ctypes bindings for the native host-runtime library (native/dlse_native.cpp).

Provides fast WAV decode/encode and batched random-crop assembly. Falls back
transparently to the pure-Python implementations in audio_io.py when the
shared library has not been built (``tools/build_native.sh``) — importers
should use :func:`available` / the wrappers below rather than probing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_TRIED = False
_LOCK = threading.Lock()

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO_PATH = os.path.join(_REPO_ROOT, "native", "libdlse_native.so")
_BUILD_SCRIPT = os.path.join(_REPO_ROOT, "tools", "build_native.sh")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        # serialized: two prefetch threads racing here could otherwise run
        # the g++ build concurrently (corrupting the .so) or one could see
        # _TRIED=True mid-build and silently fall back to the slow path
        if _TRIED:
            return _LIB
        lib = _load_locked()
        _LIB = lib
        _TRIED = True
        return _LIB


def _load_locked():
    if not os.path.exists(_SO_PATH) and os.path.exists(_BUILD_SCRIPT):
        try:
            subprocess.run(["sh", _BUILD_SCRIPT], capture_output=True,
                           timeout=120, check=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.dlse_read_wav.restype = ctypes.c_int
    lib.dlse_read_wav.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.dlse_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.dlse_write_wav.restype = ctypes.c_int
    lib.dlse_write_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.dlse_crop_batch.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
    ]
    return lib


def available() -> bool:
    return _load() is not None


def read_wav(path: str):
    """Native WAV decode -> ((T, C) float32, sample_rate); None if the
    library is unavailable (caller falls back to pure Python)."""
    lib = _load()
    if lib is None:
        return None
    data_p = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_int64()
    channels = ctypes.c_int32()
    sr = ctypes.c_int32()
    rc = lib.dlse_read_wav(path.encode(), ctypes.byref(data_p),
                           ctypes.byref(frames), ctypes.byref(channels),
                           ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f"native wav decode failed ({rc}): {path}")
    n = frames.value * channels.value
    try:
        arr = np.ctypeslib.as_array(data_p, shape=(n,)).copy()
    finally:
        lib.dlse_free(data_p)
    return arr.reshape(frames.value, channels.value), sr.value


def write_wav(path: str, audio: np.ndarray, sample_rate: int) -> bool:
    lib = _load()
    if lib is None:
        return False
    a = np.ascontiguousarray(audio, np.float32)
    if a.ndim == 1:
        a = a[:, None]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    rc = lib.dlse_write_wav(
        path.encode(), a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        a.shape[0], a.shape[1], sample_rate,
    )
    return rc == 0


def crop_batch(clips: list[np.ndarray], starts: np.ndarray, crop_len: int):
    """Assemble (B, crop_len, C) from float32 clips at given offsets."""
    lib = _load()
    if lib is None:
        return None
    if any(c.ndim != 2 for c in clips):
        return None  # caller falls back (pure-Python path handles 1-D)
    b = len(clips)
    ch = clips[0].shape[1]
    clips = [np.ascontiguousarray(c, np.float32) for c in clips]
    ptrs = (ctypes.POINTER(ctypes.c_float) * b)(
        *[c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for c in clips]
    )
    starts_arr = np.ascontiguousarray(starts, np.int64)
    out = np.empty((b, crop_len, ch), np.float32)
    lib.dlse_crop_batch(
        ptrs, starts_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b, crop_len, ch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
