"""ctypes binding for the native bit-unpack library (native/unpack.cpp).

Built on demand with g++ (no pip deps); loaders.py falls back to the
vectorized-numpy unpack when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), 'native', 'unpack.cpp')
_SO = os.path.join(os.path.dirname(_SRC), 'libldunpack.so')


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(['g++', '-O3', '-march=native', '-shared', '-fPIC',
                            '-o', _SO, _SRC], check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.unpack_4_40.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                    ctypes.c_void_p]
        lib.pack_4_40.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                  ctypes.c_void_p]
        lib.unpack_3_32.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                    ctypes.c_void_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def unpack_4_40(raw: np.ndarray, readlen: int, offset: int) -> np.ndarray:
    lib = _load()
    groups = len(raw) // 5
    raw = np.ascontiguousarray(raw[:groups * 5])
    out = np.empty(groups * 4, dtype=np.uint16)
    lib.unpack_4_40(raw.ctypes.data, groups, out.ctypes.data)
    return out[offset:offset + readlen]


def pack_4_40(samples: np.ndarray) -> np.ndarray:
    lib = _load()
    groups = len(samples) // 4
    s = np.ascontiguousarray(samples[:groups * 4], dtype=np.uint16)
    out = np.empty(groups * 5, dtype=np.uint8)
    lib.pack_4_40(s.ctypes.data, groups, out.ctypes.data)
    return out


def unpack_3_32(words: np.ndarray, readlen: int, offset: int) -> np.ndarray:
    lib = _load()
    words = np.ascontiguousarray(words, dtype='<u4')
    out = np.empty(len(words) * 3, dtype=np.int16)
    lib.unpack_3_32(words.ctypes.data, len(words), out.ctypes.data)
    return out[offset:offset + readlen]
