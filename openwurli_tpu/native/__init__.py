"""Native (C++) audio data loader — ctypes bindings with auto-build.

Compiles wav_loader.cpp with g++ on first use (cached next to the source);
callers fall back to the pure-NumPy paths when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "wav_loader.cpp")
_LIB = os.path.join(_DIR, "libwurli_native.so")

_lib = None
_tried = False


def _build():
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
        check=True, capture_output=True)


def get_lib():
    """The loaded native library, or None if build/load fails."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.wurli_decode_wav.restype = ctypes.c_longlong
        lib.wurli_decode_wav.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.c_longlong, ctypes.POINTER(ctypes.c_int)]
        lib.wurli_encode_wav.restype = ctypes.c_int
        lib.wurli_encode_wav.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.c_longlong, ctypes.c_int, ctypes.c_int]
        lib.wurli_frame_stats.restype = ctypes.c_longlong
        lib.wurli_frame_stats.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
            ctypes.c_longlong, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def decode_wav(path):
    """Native WAV decode → (mono float64 array, sample_rate) or None."""
    lib = get_lib()
    if lib is None:
        return None
    sr = ctypes.c_int(0)
    n = lib.wurli_decode_wav(path.encode(), None, 0, ctypes.byref(sr))
    if n < 0:
        return None
    out = np.empty(n, dtype=np.float64)
    written = lib.wurli_decode_wav(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, ctypes.byref(sr))
    if written != n:
        return None
    return out, sr.value


def encode_wav(path, x, sample_rate, bits=24):
    """Native mono WAV encode. Returns True on success."""
    lib = get_lib()
    if lib is None:
        return False
    x = np.ascontiguousarray(x, dtype=np.float64)
    if x.ndim != 1:
        return False
    rc = lib.wurli_encode_wav(
        path.encode(), x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        x.shape[0], int(sample_rate), int(bits))
    return rc == 0


def frame_stats(x, frame, hop):
    """Framed (rms, peak) envelopes, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float64)
    if x.shape[0] < frame:
        return np.zeros(0), np.zeros(0)
    n_frames = 1 + (x.shape[0] - frame) // hop
    rms = np.empty(n_frames, dtype=np.float64)
    peak = np.empty(n_frames, dtype=np.float64)
    got = lib.wurli_frame_stats(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), x.shape[0],
        frame, hop, rms.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        peak.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if got != n_frames:
        return None
    return rms, peak
