"""Demod-core parity vs the reference RFDecode.demodblock / .demod."""

import numpy as np
import jax.numpy as jnp
import pytest

from ld_decode_tpu.ops import demod as D
from ld_decode_tpu.ops import filters as F
from ld_decode_tpu.models import encode as E
from ld_decode_tpu.utils.params import DecoderConfig

import oracle


def _bank64(cfg):
    return F.make_demod_bank(cfg, dtype=np.complex128)


def _synth(cfg, nframes=1):
    return E.encode_frames(cfg, nframes, E.EncodeSpec(pattern='ramp'))


@pytest.mark.parametrize('mtf_level', [0.0, 1.0, 0.5])
def test_demodblock_video_parity(ntsc_cfg, mtf_level):
    cfg = ntsc_cfg
    rf = oracle.make_rf('NTSC')
    data = _synth(cfg)[:cfg.blocklen]

    rv_video, rv_audio = rf.demodblock(data, mtf_level=mtf_level)

    bank = _bank64(cfg)
    blocks = jnp.asarray(data, dtype=jnp.float64)[None, :]
    R_os = jnp.fft.rfft(blocks)
    ours = D.demod_video_rfft(R_os, bank, cfg,
                              jnp.float64(mtf_level), rdtype=jnp.float64)

    # demod: instantaneous frequency ~8.1e6 Hz; hz_ire ~12143, so atol of a
    # few Hz is ~1e-4 IRE.
    np.testing.assert_allclose(np.asarray(ours['demod'][0]),
                               rv_video['demod'], atol=1e-3)
    np.testing.assert_allclose(np.asarray(ours['demod_05'][0]),
                               rv_video['demod_05'], atol=1e-3)
    np.testing.assert_allclose(np.asarray(ours['demod_burst'][0]),
                               rv_video['demod_burst'], atol=1e-3)
    np.testing.assert_allclose(np.asarray(ours['demod_sync'][0]),
                               rv_video['demod_sync'], atol=1e-6)


def test_demodblock_pal_parity(pal_cfg):
    cfg = pal_cfg
    rf = oracle.make_rf('PAL')
    data = _synth(DecoderConfig(system='NTSC'))[:cfg.blocklen]  # any RF data

    rv_video, _ = rf.demodblock(data, mtf_level=0.5)

    bank = _bank64(cfg)
    R_os = jnp.fft.rfft(jnp.asarray(data, dtype=jnp.float64)[None, :])
    ours = D.demod_video_rfft(R_os, bank, cfg, jnp.float64(0.5),
                              rdtype=jnp.float64)
    for tap in ['demod', 'demod_05', 'demod_burst', 'demod_pilot']:
        # 0.5 Hz absolute ~ 6e-5 IRE at PAL's 8000 Hz/IRE — route rounding
        np.testing.assert_allclose(np.asarray(ours[tap][0]),
                                   rv_video[tap], rtol=1e-6, atol=0.5)


def test_demodblock_audio_parity(ntsc_cfg):
    cfg = ntsc_cfg
    rf = oracle.make_rf('NTSC')
    data = _synth(cfg)[:cfg.blocklen]

    _, rv_audio = rf.demodblock(data, mtf_level=0)

    bank = _bank64(cfg)
    R_os = jnp.fft.rfft(jnp.asarray(data, dtype=jnp.float64)[None, :])
    ours = D.demod_audio_rfft(R_os, bank, rdtype=jnp.float64)

    np.testing.assert_allclose(np.asarray(ours['audio_left'][0]),
                               rv_audio['audio_left'], atol=1e-3)
    np.testing.assert_allclose(np.asarray(ours['audio_right'][0]),
                               rv_audio['audio_right'], atol=1e-3)


def test_demod_stream_parity(ntsc_cfg):
    """Full overlap-save stream vs reference RFDecode.demod block loop."""
    cfg = ntsc_cfg
    core = oracle.install_array_loader()
    rf = oracle.make_rf('NTSC')

    samples = _synth(cfg)
    start, length = 2048, 300000
    infile = oracle.ArrayFile(samples)
    ref_video, ref_audio = rf.demod(infile, start, length, mtf_level=0)

    nblocks = 20
    assert nblocks * cfg.block_keep >= length
    bank = _bank64(cfg)
    ours_stream = jnp.asarray(samples[start - cfg.blockcut:
                                      start - cfg.blockcut
                                      + D.stream_len(cfg, nblocks)])
    video, audio = D.demod_stream(ours_stream, bank, cfg, nblocks,
                                  jnp.float64(0.0))

    ncmp = min(len(ref_video), nblocks * cfg.block_keep)
    for tap in ['demod', 'demod_05', 'demod_burst']:
        np.testing.assert_allclose(np.asarray(video[tap][:ncmp]),
                                   ref_video[tap][:ncmp], atol=1e-3)
    np.testing.assert_allclose(np.asarray(video['demod_sync'][:ncmp]),
                               ref_video['demod_sync'][:ncmp], atol=1e-6)


def test_demod_stream_float32_close(ntsc_cfg):
    """fp32 production path stays within a small fraction of an IRE of f64."""
    cfg = ntsc_cfg
    samples = _synth(cfg)[:D.stream_len(cfg, 7)]
    b64 = _bank64(cfg)
    b32 = F.make_demod_bank(cfg, dtype=np.complex64)

    v64, _ = D.demod_stream(jnp.asarray(samples), b64, cfg, 7, jnp.float64(0.0))
    v32, _ = D.demod_stream(jnp.asarray(samples), b32, cfg, 7, jnp.float32(0.0))

    hz_ire = cfg.sys.hz_ire
    err = np.abs(np.asarray(v64['demod'], np.float64)
                 - np.asarray(v32['demod'], np.float64)) / hz_ire
    assert np.percentile(err, 99.9) < 0.2, err.max()


@pytest.mark.parametrize('freq', [28.8, 32.0])
def test_demodblock_alternate_rates_parity(freq):
    """cxADC 28.8 MSa/s (8-bit) and Domesday Duplicator 32 MSa/s capture
    rates (reference lddecode.py:53-58, app/tbc modes -c / 16-bit)."""
    cfg = DecoderConfig(system='NTSC', freq_mhz=freq)
    rf = oracle.make_rf('NTSC', inputfreq=freq)
    data = _synth(cfg)[:cfg.blocklen]

    rv_video, rv_audio = rf.demodblock(data, mtf_level=0.5)

    bank = _bank64(cfg)
    R_os = jnp.fft.rfft(jnp.asarray(data, dtype=jnp.float64)[None, :])
    ours = D.demod_video_rfft(R_os, bank, cfg, jnp.float64(0.5),
                              rdtype=jnp.float64)
    for tap in ['demod', 'demod_05', 'demod_burst']:
        np.testing.assert_allclose(np.asarray(ours[tap][0]),
                                   rv_video[tap], atol=1e-3)
    np.testing.assert_allclose(np.asarray(ours['demod_sync'][0]),
                               rv_video['demod_sync'], atol=1e-6)

    oursa = D.demod_audio_rfft(R_os, bank, rdtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(oursa['audio_left'][0]),
                               rv_audio['audio_left'], atol=1e-3)
    np.testing.assert_allclose(np.asarray(oursa['audio_right'][0]),
                               rv_audio['audio_right'], atol=1e-3)
