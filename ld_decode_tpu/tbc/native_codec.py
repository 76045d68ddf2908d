"""ctypes binding for the native codec decoder (native/codec_decode.cpp).

Built on demand with g++ (same pattern as io/native_unpack.py); callers
fall back to the numpy decode when the toolchain is unavailable.  The
numpy decode costs ~20-60 ms per image on the consumer path; the native
path is the same arithmetic in ~2-4 ms, and returns the shipped-word
count so the pipeline's consistency gate comes for free.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), 'native', 'codec_decode.cpp')
_SO = os.path.join(os.path.dirname(_SRC), 'libldcodec.so')


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(['g++', '-O3', '-march=native', '-shared',
                            '-fPIC', '-o', _SO, _SRC],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.codec_decode.restype = ctypes.c_int64
        lib.codec_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p]
        lib.unpack_tab6.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_void_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def decode_image(tab: np.ndarray, dense: np.ndarray, qstream: np.ndarray,
                 shape, k: int):
    """(image (R, C) u16, shipped_words) or None if the native lib is
    unavailable; shipped_words = -1 flags short buffers (caller falls
    back).  tab: (R, NB) or flat 6-bit table values."""
    lib = _load()
    if lib is None:
        return None
    R, C = shape
    tab = np.ascontiguousarray(np.asarray(tab).reshape(-1), dtype=np.uint16)
    dense = np.ascontiguousarray(dense, dtype=np.uint16)
    qstream = np.ascontiguousarray(qstream, dtype=np.uint16)
    out = np.empty((R, C), np.uint16)
    shipped = lib.codec_decode(
        tab.ctypes.data, dense.ctypes.data, len(dense),
        qstream.ctypes.data, len(qstream),
        R, C // 16, k, out.ctypes.data)
    return out, int(shipped)


def unpack_tab(words: np.ndarray, n: int):
    """(n,) 6-bit table values from the packed u16 wire format, or None
    if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    words = np.ascontiguousarray(words, dtype=np.uint16)
    out = np.empty(n, np.uint16)
    lib.unpack_tab6(words.ctypes.data, n, out.ctypes.data)
    return out
