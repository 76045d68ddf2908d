"""Full TBC field/frame parity vs the reference Field/Framer pipeline."""

import numpy as np
import pytest

from ld_decode_tpu.ops import filters as F
from ld_decode_tpu.models import encode as E
from ld_decode_tpu.io import loaders as L
from ld_decode_tpu.tbc import framer as FR
from ld_decode_tpu.utils.params import DecoderConfig

import oracle


@pytest.fixture(scope='module')
def synth_capture():
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    samples = E.encode_frames(cfg, 3, E.EncodeSpec(pattern='ramp',
                                                   cav_start_frame=900))
    return cfg, samples


@pytest.fixture(scope='module')
def oracle_frame(synth_capture):
    cfg, samples = synth_capture
    core = oracle.install_array_loader()
    rf = core.RFDecode(system='NTSC')
    infile = oracle.ArrayFile(samples)
    framer = core.Framer(rf)
    return framer.readframe(infile, 33046, True)


@pytest.fixture(scope='module')
def our_frame(synth_capture):
    cfg, samples = synth_capture
    bank = F.make_demod_bank(cfg, np.complex128)
    framer = FR.Framer(cfg, bank, L.make_array_loader(samples))
    rv = framer.readframe(None, 33046, True)
    return framer, rv


def psnr(a, b, peak=65535.0):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return np.inf
    return 10 * np.log10(peak * peak / mse)


def test_field_structure(oracle_frame, our_frame):
    ref_fields = oracle_frame[3]
    _, (_, _, _, fields) = our_frame
    for rf_f, our_f in zip(ref_fields, fields):
        assert our_f.istop == rf_f.istop
        assert our_f.linecount == rf_f.linecount


def test_linelocs_parity(oracle_frame, our_frame):
    ref_fields = oracle_frame[3]
    _, (_, _, _, fields) = our_frame
    for rf_f, our_f in zip(ref_fields, fields):
        ref_ll = np.asarray(rf_f.linelocs, np.float64)
        our_ll = np.asarray(our_f.linelocs, np.float64)
        assert len(ref_ll) == len(our_ll)
        # compare the picture lines (skip vsync/edge extrapolation areas)
        d = np.abs(ref_ll[12:-12] - our_ll[12:-12])
        assert np.percentile(d, 95) < 0.3, (d.max(), np.argmax(d))


def test_vbi_framenr(oracle_frame, our_frame):
    framer, rv = our_frame
    ref_fields = oracle_frame[3]
    ref_vbi = {}
    for f in ref_fields:
        for k, v in f.vbi.items():
            if v is not None:
                ref_vbi[k] = v
    assert framer.vbi['framenr'] == ref_vbi.get('framenr')
    assert framer.vbi['framenr'] is not None


def test_picture_psnr(oracle_frame, our_frame):
    ref = oracle_frame[0]
    _, (combined, _, _, _) = our_frame
    assert combined.shape == ref.shape
    W = 910
    # compare the active picture area only: skip VBI lines and the first two
    # metadata samples of each line
    ref2 = ref.reshape(-1, W)[40:500, 20:]
    our2 = combined.reshape(-1, W)[40:500, 20:]
    p = psnr(ref2, our2)
    assert p > 40.0, p


def test_audio_close(oracle_frame, our_frame):
    ref_audio = oracle_frame[1]
    _, (_, audio, _, _) = our_frame
    assert audio is not None and ref_audio is not None
    n = min(len(audio), len(ref_audio))
    assert n > 1000
    diff = np.abs(audio[:n].astype(np.int64) - ref_audio[:n].astype(np.int64))
    # int16 full scale = +-150kHz deviation; require < 1% of full scale rms
    rms = np.sqrt(np.mean(diff.astype(np.float64) ** 2))
    assert rms < 327.67, rms
