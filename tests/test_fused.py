"""Fused device-resident path vs the reference-parity streaming path."""

import numpy as np
import pytest

from ld_decode_tpu.ops import filters as F
from ld_decode_tpu.models import encode as E
from ld_decode_tpu.io import loaders as L
from ld_decode_tpu.tbc import framer as FR
from ld_decode_tpu.utils.params import DecoderConfig


@pytest.fixture(scope='module')
def pair():
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    samples = E.encode_frames(cfg, 3, E.EncodeSpec(pattern='ramp',
                                                   cav_start_frame=900))
    # both paths at float32 (the production dtype) so differences isolate
    # the fused restructuring, not precision
    bank = F.make_demod_bank(cfg, np.complex64)
    fr_a = FR.Framer(cfg, bank, loader=L.make_array_loader(samples))
    rv_a = fr_a.readframe(None, 33046, True)
    fr_b = FR.Framer(cfg, bank, capture=samples)
    rv_b = fr_b.readframe(None, 33046, True)
    return fr_a, rv_a, fr_b, rv_b


def test_fused_structure(pair):
    fr_a, rv_a, fr_b, rv_b = pair
    assert rv_a[0] is not None and rv_b[0] is not None
    assert rv_a[2] == rv_b[2]                       # same next sample
    assert fr_a.vbi['framenr'] == fr_b.vbi['framenr']
    for fa, fb in zip(rv_a[3], rv_b[3]):
        assert fa.istop == fb.istop
        assert fa.linecount == fb.linecount


def test_fused_linelocs(pair):
    _, rv_a, _, rv_b = pair
    for fa, fb in zip(rv_a[3], rv_b[3]):
        d = np.abs(np.asarray(fa.linelocs) - np.asarray(fb.linelocs))
        assert d.max() < 0.05, d.max()


def test_fused_picture(pair):
    _, rv_a, _, rv_b = pair
    a = rv_a[0].astype(np.int64)
    b = rv_b[0].astype(np.int64)
    d = np.abs(a - b)
    # identical modulo float32-vs-float64 rounding in the final scale
    assert np.percentile(d, 99.9) <= 2, (d.max(), (d > 2).sum())
    assert d.max() <= 64, d.max()


def test_fused_audio(pair):
    _, rv_a, _, rv_b = pair
    a, b = rv_a[1], rv_b[1]
    n = min(len(a), len(b))
    assert abs(len(a) - len(b)) <= 2
    d = np.abs(a[:n].astype(np.int64) - b[:n].astype(np.int64))
    assert np.percentile(d, 99.9) <= 2, d.max()
