"""VHS/S-VHS tape FM video decode (reference attic/vhs/vhs-decoder.py).

The reference's VHS experiment is a parameterized FM decoder: video
bandpass 0.5-10 MHz, Hilbert demod, 4.4 MHz LPF + tape deemphasis, and
the u16 output scale minire -60 / maxire 140 at 655.34 counts per 100
IRE (vhs-decoder.py:263-268, 456).  It has no TBC and no chroma path —
tape color-under recovery never reached the reference tree.  This module
reproduces that capability through the standard batched demod bank
(`DecoderConfig(system='VHS')` selects the tape carrier map and filter
set in utils/params.py), so the whole hot path is the same overlap-save
rfft pipeline the LaserDisc profiles use, plus the analog audio chain.

Tape notes: VHS has no MTF (a LaserDisc pickup phenomenon), so decodes
always run mtf_level=0; head-switch transients show up as brief FM
dropouts and land in the same despackle/rot machinery as disc rot.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np
import scipy.signal as sps

from ld_decode_tpu.ops import demod as D
from ld_decode_tpu.ops.filters import DemodBank, filtfft, make_demod_bank
from ld_decode_tpu.utils.params import DecoderConfig

# u16 output scale (reference attic/vhs/vhs-decoder.py:263-268)
MIN_IRE = -60.0
MAX_IRE = 140.0
OUT_SCALE = 65534.0 / (MAX_IRE - MIN_IRE)


def vhs_config(freq_mhz: float = (315.0 / 88.0) * 8.0,
               **kw) -> DecoderConfig:
    """Tape decode configuration.  The default rate is the attic
    experiment's 8*fsc capture (vhs-decoder.py:15)."""
    return DecoderConfig(system='VHS', freq_mhz=freq_mhz, **kw)


def make_vhs_bank(cfg: DecoderConfig, dtype=np.complex64) -> DemodBank:
    assert cfg.system == 'VHS', cfg.system
    return make_demod_bank(cfg, dtype=dtype)


def luma_to_u16(cfg: DecoderConfig, demod_hz: jnp.ndarray) -> jnp.ndarray:
    """Demodulated Hz -> the attic's uint16 luma scale
    (vhs-decoder.py:263-268: minn = ire0 + hz_ire*minire, 327.67/IRE)."""
    ire = (demod_hz - cfg.sys.ire0) / cfg.sys.hz_ire
    out = (ire - MIN_IRE) * OUT_SCALE
    return jnp.clip(jnp.round(out), 0, 65535).astype(jnp.uint16)


def decode_vhs(samples: jnp.ndarray, bank: DemodBank, cfg: DecoderConfig,
               nblocks: int) -> Tuple[Dict[str, jnp.ndarray],
                                      Dict[str, jnp.ndarray]]:
    """Demodulate a tape RF stream: returns (video, audio) dicts.

    video: 'luma' (uint16, attic scale), 'demod' (Hz), 'demod_sync'
    (sync-detector channel: find_sync_peaks locks onto tape line pitch,
    tests/test_vhs.py — but the full NTSC/PAL TBC does not accept the
    VHS profile; a tape TBC would need its own field-parity/scale
    branches).  audio: instantaneous carrier Hz per channel at the
    stage-1 decimated rate (empty dict when audio is disabled).
    """
    assert cfg.system == 'VHS', cfg.system
    video, audio = D.demod_stream(samples, bank, cfg, nblocks,
                                  jnp.float32(0.0))   # tape: no MTF
    video = dict(video)
    video['luma'] = luma_to_u16(cfg, video['demod'])
    return video, dict(audio) if audio else {}


# ---------------------------------------------------------------------------
# Color-under chroma (beyond the reference: the attic experiment was
# luma-only).  VHS records chroma by heterodyning the fsc-centred band
# down to 40*f_H = 629.37 kHz (NTSC) and adding it to the tape signal as
# baseband AM below the luma FM carrier.  Recovery is the inverse
# heterodyne: lowpass the RF, multiply by the conversion carrier, and
# bandpass the product back at fsc for the standard comb machinery.

def color_under_freq(cfg: DecoderConfig) -> float:
    """NTSC VHS down-converted chroma carrier: 40 x line rate (Hz)."""
    return 40.0 * 1e6 / cfg.sys.line_period


def encode_color_under(cfg: DecoderConfig, chroma_at_fsc: np.ndarray,
                       phase0: float = 0.0) -> np.ndarray:
    """Heterodyne an fsc-centred chroma signal down to the color-under
    band (what a VHS recorder writes): x * 2cos(2pi(fsc - f_cu)t),
    lowpassed below luma.  Host-side fixture helper (float64 phase)."""
    fs = cfg.freq_hz
    f_conv = cfg.sys.fsc_mhz * 1e6 - color_under_freq(cfg)
    t = np.arange(len(chroma_at_fsc), dtype=np.float64) / fs
    mixed = chroma_at_fsc * 2.0 * np.cos(2 * np.pi * f_conv * t + phase0)
    b, a = sps.butter(3, 1.2e6 / (fs / 2), btype='low')
    return sps.filtfilt(b, a, mixed)


def recover_color_under(samples: jnp.ndarray, cfg: DecoderConfig,
                        blocklen: int = None, phase0: float = 0.0
                        ) -> jnp.ndarray:
    """Tape RF -> chroma restored at fsc (device compute).

    Lowpass below the luma FM carrier isolates the color-under band;
    multiplying by the conversion carrier relocates it to fsc (plus an
    image at fsc - 2*f_cu that the output bandpass rejects).  The
    conversion carrier here is a free-running oscillator with `phase0`;
    a production tape TBC would phase-lock it to the recovered burst
    per line (which also cancels head-switch phase rotation) — that
    lock is the tape-TBC work this module's docstring scopes out.
    """
    n = len(samples)
    fs = cfg.freq_hz
    f_cu = color_under_freq(cfg)
    f_conv = cfg.sys.fsc_mhz * 1e6 - f_cu
    fsc = cfg.sys.fsc_mhz * 1e6

    # FFT-domain filters over the whole buffer (fixture-scale lengths;
    # the streaming form would reuse the overlap-save block machinery).
    # Applied zero-phase (|H|^2, the frequency-domain filtfilt): an IIR
    # phase lag at 629 kHz would otherwise transfer straight into the
    # recovered chroma phase (hue) through the heterodyne.
    # bandpass, not lowpass: DC/hum in the tape signal would otherwise
    # mix onto the conversion carrier frequency right at the output
    # band edge and swamp the restored chroma
    cu_lpf = filtfft(sps.butter(3, [1e5 / (fs / 2), 1.2e6 / (fs / 2)],
                                btype='bandpass'), n)
    cu_lpf = (cu_lpf * np.conj(cu_lpf)).real
    out_bpf = filtfft(sps.butter(4, [(fsc - 5e5) / (fs / 2),
                                     (fsc + 5e5) / (fs / 2)],
                                 btype='bandpass'), n)
    out_bpf = (out_bpf * np.conj(out_bpf)).real
    # f64 host phase (f32 cos args overflow precision after ~0.1 s)
    t = np.arange(n, dtype=np.float64) / fs
    carrier = jnp.asarray((2.0 * np.cos(2 * np.pi * f_conv * t + phase0)
                           ).astype(np.float32))

    x = jnp.fft.irfft(jnp.fft.rfft(samples.astype(jnp.float32))
                      * jnp.asarray(cu_lpf[:n // 2 + 1]), n)
    up = x * carrier
    return jnp.fft.irfft(jnp.fft.rfft(up)
                         * jnp.asarray(out_bpf[:n // 2 + 1]), n)
