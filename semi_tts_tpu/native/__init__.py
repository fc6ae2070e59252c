"""ctypes loader for the native host-runtime kernels (lazy g++ build).

Falls back cleanly (``lib() -> None``) when no toolchain is present; pure-
python implementations in ``data/wavio.py`` / ``utils/metrics.py`` define the
semantics and remain authoritative in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "native.cc")
_SO = os.path.join(_DIR, "_native.so")
_lib = None
_tried = False


def build(force: bool = False) -> str | None:
    """Compile native.cc -> _native.so (cached on mtime)."""
    if not force and os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO
    except (OSError, subprocess.CalledProcessError):
        return None


def lib():
    """The loaded CDLL with argtypes set, or None when unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    so = build()
    if so is None:
        return None
    try:
        L = ctypes.CDLL(so)
    except OSError:
        return None
    L.stt_wav_read.restype = ctypes.c_long
    L.stt_wav_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                               ctypes.c_long, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    L.stt_wav_read_batch.restype = ctypes.c_int
    L.stt_wav_read_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.c_long, ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int]
    L.stt_edit_distance.restype = ctypes.c_long
    L.stt_edit_distance.argtypes = [ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
                                    ctypes.POINTER(ctypes.c_int32), ctypes.c_long]
    _lib = L
    return _lib


def wav_read_batch(paths, capacity: int, channel: int = 0, n_threads: int = 4):
    """Decode a list of wav paths into a fresh (B, capacity) float32 array.

    Returns (array, lengths (B,), srs (B,)) or None if native is unavailable.
    Rows that failed decode have length -1 (caller falls back per file).
    """
    import numpy as np

    L = lib()
    if L is None:
        return None
    B = len(paths)
    out = np.zeros((B, capacity), np.float32)
    lengths = np.zeros(B, np.int64)
    srs = np.zeros(B, np.int32)
    arr = (ctypes.c_char_p * B)(*[os.fsencode(str(p)) for p in paths])
    rc = L.stt_wav_read_batch(
        arr, B, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        capacity, lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), channel, n_threads)
    if rc != 0:
        return None
    return out, lengths, srs


def edit_distance(a, b):
    """Native Levenshtein or None when unavailable."""
    import numpy as np

    L = lib()
    if L is None:
        return None
    aa = np.ascontiguousarray(a, np.int32)
    bb = np.ascontiguousarray(b, np.int32)
    return int(L.stt_edit_distance(
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(aa),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(bb)))
