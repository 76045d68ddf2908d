"""ctypes binding for the native codec decoder (native/codec_decode.cpp).

Built per-host into the hash-keyed cache (utils/native_build.py — a
foreign/stale -march=native binary must never be loaded); callers fall
back to the numpy decode when the toolchain is unavailable.  The numpy
decode costs ~20-60 ms per image on the consumer path; the native path
is the same arithmetic in ~2-4 ms, and returns the shipped-word count
so the pipeline's consistency gate comes for free.  A tiny known-stream
round trip runs once at load; any mismatch discards the library.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), 'native', 'codec_decode.cpp')


def _selftest(lib) -> bool:
    """Decode a hand-crafted minimal stream (R=1, NB=1, k=1; row
    [1, 0 x15] -> head-row h-delta d=[1,-1,0..], zigzag z=[2,1,0..],
    2 bit planes: plane0 word=0b10, plane1 word=0b01, each padded to
    the 32-word unit) and check the exact reconstruction."""
    tab = np.array([2], np.uint16)             # nwords=2, mode=0
    dense = np.zeros(64, np.uint16)
    dense[0] = 2                               # plane 0: bit0 of z1
    dense[32] = 1                              # plane 1: bit1 of z0
    q = np.zeros(8, np.uint16)
    out = np.empty((1, 16), np.uint16)
    shipped = lib.codec_decode(tab.ctypes.data, dense.ctypes.data, 64,
                               q.ctypes.data, 8, 1, 1, 1, 0,
                               out.ctypes.data)
    want = np.zeros((1, 16), np.uint16)
    want[0, 0] = 1
    return shipped == 64 and np.array_equal(out, want)


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        from ld_decode_tpu.utils.native_build import build_and_load
        lib = build_and_load(_SRC, 'ldcodec')
        lib.codec_decode.restype = ctypes.c_int64
        lib.codec_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p]
        lib.unpack_tab6.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_void_p]
        _LIB = lib if _selftest(lib) else None
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def decode_image(tab: np.ndarray, dense: np.ndarray, qstream: np.ndarray,
                 shape, k: int, hpass: bool = False):
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
        R, C // 16, k, int(hpass), out.ctypes.data)
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
