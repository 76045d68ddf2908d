"""VHS/S-VHS tape profile (reference attic/vhs/vhs-decoder.py): the tape
carrier map + filter set through the standard batched demod."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.signal as sps

from ld_decode_tpu.utils.params import DecoderConfig, vhs_rf_params
from ld_decode_tpu.models import encode as E
from ld_decode_tpu.ops import demod as D
from ld_decode_tpu.tape import vhs as V


def test_vhs_deemp_matches_attic_coefficients():
    """Our (25, 600) deemp constants reproduce the attic's final f_deemp
    (vhs-decoder.py:184-186) at its 8*fsc rate."""
    cfg = V.vhs_config()
    d0, d1 = vhs_rf_params().video_deemp
    tf_b, tf_a = sps.zpk2tf(-d1 * 1e-10, -d0 * 1e-10, d0 / d1)
    b, a = sps.bilinear(tf_b, tf_a, 1.0 / cfg.freq_hz_half)
    np.testing.assert_allclose(
        b, [5.851707135547494e-02, -2.335100939622290e-02], rtol=1e-9)
    np.testing.assert_allclose(
        a, [1.0, -9.648339380407480e-01], rtol=1e-9)


@pytest.fixture(scope='module')
def vhs_decode():
    cfg = V.vhs_config()
    nblocks = 24
    n = D.stream_len(cfg, nblocks)
    nfields = int(np.ceil(n / (cfg.linelen_float * 262.5))) + 1
    samples = E.encode_frames(cfg, (nfields + 2) // 2,
                              E.EncodeSpec(pattern='flat50'))
    bank = V.make_vhs_bank(cfg)
    video, audio = V.decode_vhs(jnp.asarray(samples[:n].astype(np.float32)),
                                bank, cfg, nblocks)
    return cfg, video, audio


def test_vhs_levels(vhs_decode):
    """Flat-50 pattern decodes to 50 IRE, sync tips to -40 IRE, on the
    tape carrier map (0 IRE = 5.4 MHz, 16 kHz/IRE)."""
    cfg, video, audio = vhs_decode
    ire = cfg.hztoire(np.asarray(video['demod'], np.float64))
    ire = ire[2048:]                       # settle the filter edge
    tips = ire[ire < -25]
    assert tips.size > 3000                # 4.7 us pulses at 28.6 MSa/s
    # the tape deemp shelf is strong (24x HF cut, pole tau ~1 us), so
    # only the long hsync pulses settle to the tip; equalizing pulses
    # stay in the skirt.  Check the settled level, not the mixed median.
    assert abs(np.percentile(tips, 10) - (-40.0)) < 1.0
    assert -40.5 < np.median(tips) < -30.0, np.median(tips)
    flat = ire[(ire > 25) & (ire < 75)]
    assert abs(np.median(flat) - 50.0) < 1.0, np.median(flat)

    luma = np.asarray(video['luma'], np.float64)[2048:]
    got_ire = luma / V.OUT_SCALE + V.MIN_IRE
    m = (ire > 25) & (ire < 75)
    np.testing.assert_allclose(got_ire[m], ire[m], atol=0.01)


def test_vhs_audio_carriers(vhs_decode):
    """The attic decoder slices the same 2.301/2.812 MHz audio pair
    (vhs-decoder.py:203-204); stage-1 demod recovers them."""
    cfg, video, audio = vhs_decode
    assert 'audio_left' in audio
    l = np.median(np.asarray(audio['audio_left'], np.float64))
    r = np.median(np.asarray(audio['audio_right'], np.float64))
    # medians sit within a few kHz of the carriers (the synthetic tones
    # swing +-audio_dev around them); the channels are 511 kHz apart
    assert abs(l - cfg.sys.audio_lfreq) < 1e4, (l, cfg.sys.audio_lfreq)
    assert abs(r - cfg.sys.audio_rfreq) < 1e4, (r, cfg.sys.audio_rfreq)


def test_vhs_sync_channel_locks(vhs_decode):
    """The standard sync machinery sees tape sync pulses: the binary
    sync channel has per-line pulses at the NTSC line pitch."""
    from ld_decode_tpu.tbc import sync as S
    cfg, video, audio = vhs_decode
    window = max(int(cfg.linelen * 0.4), 2)
    idx, val = S.find_sync_peaks(jnp.asarray(video['demod_sync']), window)
    idx = np.asarray(idx)
    idx = idx[idx >= 0]
    assert idx.size > 100
    gaps = np.diff(idx)
    line_gaps = gaps[(gaps > cfg.linelen * 0.9) & (gaps < cfg.linelen * 1.1)]
    assert line_gaps.size > 0.7 * gaps.size
    assert abs(np.median(line_gaps) - cfg.linelen_float) < 2.0


def test_vhs_color_under_roundtrip():
    """Color-under chroma (beyond the attic's luma-only experiment):
    an fsc-band chroma signal written at 629 kHz next to the luma FM
    carrier is recovered back at fsc with its amplitude and phase."""
    cfg = V.vhs_config()
    fs = cfg.freq_hz
    fsc = cfg.sys.fsc_mhz * 1e6
    n = 1 << 19

    # ground truth: amplitude- and phase-modulated chroma at fsc
    t = np.arange(n, dtype=np.float64) / fs
    amp = 1.0 + 0.3 * np.sin(2 * np.pi * 500.0 * t)      # slow envelope
    phi = 0.6 * np.sin(2 * np.pi * 300.0 * t)            # hue wobble
    chroma = amp * np.cos(2 * np.pi * fsc * t + phi)

    # tape signal: luma FM at flat 50 IRE + color-under chroma + audio off
    hz = np.full(n, cfg.iretohz(50.0))
    rf = np.cos(np.cumsum(hz) * (2 * np.pi / fs))
    cu = V.encode_color_under(cfg, chroma)
    tape = (rf * 350.0 + 0.25 * 350.0 * cu + 512.0)

    got = np.asarray(V.recover_color_under(
        jnp.asarray(tape.astype(np.float32)), cfg), np.float64)
    got = got / (0.25 * 350.0)

    # compare in the middle (filtfilt/FFT edge transients at both ends)
    sl = slice(n // 8, -n // 8)
    ref = chroma[sl]
    out = got[sl]
    # scale-free correlation: > 0.98 means amplitude AND phase track
    corr = np.dot(ref, out) / np.sqrt(np.dot(ref, ref) * np.dot(out, out))
    assert corr > 0.98, corr
    # absolute amplitude within 10% (filter passband ripple)
    assert abs(np.sqrt(np.mean(out**2) / np.mean(ref**2)) - 1) < 0.10
