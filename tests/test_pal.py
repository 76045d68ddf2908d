"""PAL decode parity vs the reference FieldPAL/Framer pipeline."""

import numpy as np
import pytest

from ld_decode_tpu.ops import filters as F
from ld_decode_tpu.models import encode as E
from ld_decode_tpu.io import loaders as L
from ld_decode_tpu.tbc import framer as FR
from ld_decode_tpu.utils.params import DecoderConfig

import oracle

START = 2560 * 14      # past the first vertical interval


@pytest.fixture(scope='module')
def pal_capture():
    cfg = DecoderConfig(system='PAL', freq_mhz=40.0)
    samples = E.encode_frames(cfg, 3, E.EncodeSpec(pattern='ramp',
                                                   cav_start_frame=900))
    return cfg, samples


@pytest.fixture(scope='module')
def oracle_pal(pal_capture):
    cfg, samples = pal_capture
    core = oracle.install_array_loader()
    rf = core.RFDecode(system='PAL')
    framer = core.Framer(rf)
    return framer.readframe(oracle.ArrayFile(samples), START, True), framer


@pytest.fixture(scope='module')
def our_pal(pal_capture):
    cfg, samples = pal_capture
    bank = F.make_demod_bank(cfg, np.complex128)
    framer = FR.Framer(cfg, bank, loader=L.make_array_loader(samples))
    return framer.readframe(None, START, True), framer


def test_pal_structure(oracle_pal, our_pal):
    (ref, _), ((combined, audio, nextsample, fields), fr) = oracle_pal, our_pal
    ref_rv, ref_framer = ref, oracle_pal[1]
    assert combined is not None and oracle_pal[0][0] is not None
    assert combined.shape == oracle_pal[0][0].shape
    for rf_f, our_f in zip(oracle_pal[0][3], fields):
        assert our_f.istop == rf_f.istop
        assert our_f.linecount == rf_f.linecount


def test_pal_linelocs(oracle_pal, our_pal):
    for rf_f, our_f in zip(oracle_pal[0][3], our_pal[0][3]):
        ref_ll = np.asarray(rf_f.linelocs, np.float64)
        our_ll = np.asarray(our_f.linelocs, np.float64)
        d = np.abs(ref_ll[12:-12] - our_ll[12:-12])
        assert np.percentile(d, 95) < 0.3, (d.max(), np.argmax(d))


def test_pal_picture_psnr(oracle_pal, our_pal):
    ref = oracle_pal[0][0].reshape(-1, 1135)
    ours = our_pal[0][0].reshape(-1, 1135)
    a = ref[50:600, 20:].astype(np.float64)
    b = ours[50:600, 20:].astype(np.float64)
    mse = np.mean((a - b) ** 2)
    p = 10 * np.log10(65535.0 ** 2 / mse) if mse > 0 else np.inf
    assert p > 40, p


def test_pal_fused_matches_streaming(pal_capture):
    cfg, samples = pal_capture
    bank = F.make_demod_bank(cfg, np.complex64)
    fa = FR.Framer(cfg, bank, loader=L.make_array_loader(samples))
    ra = fa.readframe(None, START, True)
    fb = FR.Framer(cfg, bank, capture=samples)
    rb = fb.readframe(None, START, True)
    assert ra[0] is not None and rb[0] is not None
    a = ra[0].reshape(-1, 1135).astype(np.int64)
    b = rb[0].reshape(-1, 1135).astype(np.int64)
    d = np.abs(a[24:] - b[24:])
    assert np.percentile(d, 99.9) <= 2, d.max()
