"""FDLS designer + filter analysis utilities."""

import numpy as np
import scipy.signal as sps

from ld_decode_tpu.utils.fdls import fdls, fdls_from_filter
from ld_decode_tpu.utils import filtertools as FT
from ld_decode_tpu.models import encode as E
from ld_decode_tpu.utils.params import DecoderConfig


def test_fdls_matches_butterworth():
    b0, a0 = sps.butter(2, 0.2)
    w = np.linspace(0.001, np.pi * 0.98, 256)
    _, h = sps.freqz(b0, a0, worN=w)
    b, a = fdls(w, np.abs(h), np.unwrap(np.angle(h)), 2, 2)
    _, h2 = sps.freqz(b, a, worN=w)
    err = np.abs(h - h2)
    assert err.max() < 1e-6, err.max()


def test_fdls_from_filter_refit():
    b0, a0 = sps.butter(3, 0.3)
    b, a = fdls_from_filter(b0, a0, 3, 3)
    w = np.linspace(0.01, 3.0, 100)
    _, h0 = sps.freqz(b0, a0, worN=w)
    _, h1 = sps.freqz(b, a, worN=w)
    assert np.abs(h0 - h1).max() < 1e-5


def test_response_report():
    b, a = sps.butter(5, 4.2e6 / 20e6)
    rep = FT.response_report(b, a, 40.0)
    assert len(rep['crossings_m3']) >= 1
    assert abs(rep['crossings_m3'][0] - 4.2) < 0.1


def test_capture_spectrum_finds_carrier():
    cfg = DecoderConfig()
    samples = E.encode_frames(cfg, 1, E.EncodeSpec(pattern='flat50'))
    db = FT.peak_to_background_db(samples, 40.0, band=(7.0, 10.0))
    assert db > 20, db
