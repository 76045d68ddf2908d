"""Filter-bank parity vs the reference RFDecode filter construction."""

import numpy as np
import pytest

from ld_decode_tpu.ops import filters as F
from ld_decode_tpu.utils.params import DecoderConfig

import oracle


@pytest.mark.parametrize('system', ['NTSC', 'PAL'])
def test_video_filter_parity(system):
    cfg = DecoderConfig(system=system)
    ours = F.design_video_filters(cfg)
    rf = oracle.make_rf(system=system)
    SF = rf.Filters

    np.testing.assert_allclose(ours.rf_video, SF['RFVideo'], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(ours.mtf, SF['MTF'], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(ours.f_video, SF['FVideo'], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(ours.f_video05, SF['FVideo05'], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(ours.f_video_burst, SF['FVideoBurst'], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(ours.f_psync, SF['FPsync'], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(ours.f_emp, SF['Femp'], rtol=1e-9, atol=1e-12)
    assert ours.f05_offset == SF['F05_offset']
    if system == 'PAL':
        np.testing.assert_allclose(ours.f_video_pilot, SF['FVideoPilot'],
                                   rtol=1e-9, atol=1e-12)
    else:
        assert ours.f_video_pilot is None


@pytest.mark.parametrize('system', ['NTSC', 'PAL'])
def test_audio_filter_parity(system):
    cfg = DecoderConfig(system=system)
    ours = F.design_audio_filters(cfg)
    rf = oracle.make_rf(system=system)
    SF = rf.Filters

    np.testing.assert_allclose(ours.lfilt, SF['audio_lfilt'], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(ours.rfilt, SF['audio_rfilt'], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(ours.lpf2, SF['audio_lpf2'], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(ours.deemp2, SF['audio_deemp2'], rtol=1e-9, atol=1e-12)
    assert ours.fdiv1 == SF['audio_fdiv1']
    assert ours.fdiv2 == SF['audio_fdiv2']
    assert ours.freq_arf == SF['freq_arf']
    assert ours.lowfreq == SF['audio_lowfreq']
    assert ours.slice_lo == (SF['audio_fdslice_lo'].start, SF['audio_fdslice_lo'].stop)
    assert ours.slice_hi == (SF['audio_fdslice_hi'].start, SF['audio_fdslice_hi'].stop)


def test_params_basic():
    cfg = DecoderConfig(system='NTSC')
    assert cfg.sys.outlinelen == 910
    assert cfg.linelen == 2542
    assert abs(cfg.sys.fps - 29.97) < 0.01
    pal = DecoderConfig(system='PAL')
    assert pal.sys.outlinelen == 1135
    assert pal.sys.outlinelen_pilot == 960
    assert pal.linelen == 2560
    assert cfg.block_keep == 15328
