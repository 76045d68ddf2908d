"""Import machinery for running the reference decoder as a test oracle.

The reference at /root/reference is numpy-1.x era code; this module shims the
removed numpy aliases and injects array-backed loaders so the original
pipeline can be run unmodified under pytest and compared against our output.
The reference code is used strictly as a black-box oracle — never imported
into the framework itself.
"""

from __future__ import annotations

import io
import os
import sys

import numpy as np

REF_PATH = '/root/reference'

_loaded = None


def _install_numpy_shims():
    # reference uses np.int / np.float / np.fromstring (removed in numpy>=1.24/2.0)
    if not hasattr(np, 'int'):
        np.int = int
    if not hasattr(np, 'float'):
        np.float = float
    if not hasattr(np, 'fromstring'):
        def fromstring(buf, dtype, count=-1):
            return np.frombuffer(buf, dtype=dtype, count=count)
        np.fromstring = fromstring
    # numpy>=2 NEP50: uint8 * 10000 overflows in the reference's philips
    # nibble math (lddecode_core.py:856-868); widen packbits output — but
    # ONLY for the reference's list-of-bools call pattern: jax itself uses
    # np.packbits on bool ndarrays and must see the original behavior.
    if not getattr(np.packbits, '_oracle_shim', False):
        _orig_packbits = np.packbits

        def packbits(a, *args, **k):
            out = _orig_packbits(a, *args, **k)
            if isinstance(a, list):
                return out.astype(np.int64)
            return out
        packbits._oracle_shim = True
        np.packbits = packbits


def load_reference():
    """Import lddecode_core + lddutils from the reference tree (cached)."""
    global _loaded
    if _loaded is not None:
        return _loaded
    _install_numpy_shims()
    os.environ.setdefault('MPLBACKEND', 'Agg')
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    import lddutils      # noqa: F401
    import lddecode_core
    _loaded = lddecode_core
    return lddecode_core


class ArrayFile(io.IOBase):
    """Make a numpy sample array look like the file+loader pair the reference
    expects (loader API contract documented at lddutils.py:117-129)."""

    def __init__(self, arr: np.ndarray):
        super().__init__()
        self.arr = arr

    def readable(self):
        return True


def array_loader(infile, sample, readlen):
    arr = infile.arr
    sample = int(sample)
    readlen = int(readlen)
    if sample < 0 or sample + readlen > len(arr):
        return None
    return arr[sample:sample + readlen]


def install_array_loader():
    core = load_reference()
    import lddecode_core
    lddecode_core.loader = array_loader
    return core


def make_rf(system='NTSC', blocklen=16384, decode_analog_audio=True,
            inputfreq=40):
    core = load_reference()
    return core.RFDecode(inputfreq=inputfreq, system=system,
                         blocklen_=blocklen,
                         decode_analog_audio=decode_analog_audio)
