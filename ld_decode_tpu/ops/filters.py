"""FFT-domain filter bank construction.

Every LTI filter in the decode chain is represented as a length-`blocklen`
complex frequency response, applied by complex multiply inside the batched
overlap-save demodulator.  Design happens once on the host in float64 with
scipy; the results are shipped to the device as a FilterBank pytree.

Parity notes (reference files):
  * filtfft                      -> lddutils.py:256-257
  * hilbert kernel               -> lddutils.py:246-249
  * video filter chain           -> lddecode_core.py:147-214 (computevideofilters)
  * audio filter chain           -> lddecode_core.py:216-279 (computeaudiofilters)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import numpy as np
import scipy.signal as sps

from ld_decode_tpu.utils.params import DecoderConfig

TAU = 2 * np.pi


def filtfft(filt, blocklen: int) -> np.ndarray:
    """(b, a) filter coefficients -> complex frequency response at `blocklen`
    DFT bin centers (reference lddutils.py:256-257)."""
    return sps.freqz(filt[0], filt[1], blocklen, whole=True)[1]


def polar2z(r: float, theta: float) -> complex:
    return r * np.exp(1j * theta)


def hilbert_kernel(terms: int = 128) -> np.ndarray:
    """FIR Hilbert-transformer kernel (reference lddutils.py:242-249).

    Built by inverse-FFT of the ideal single-sideband selector; 128 terms was
    empirically chosen in the reference for filter-delay behavior.
    """
    spec = np.array([0] + [1] * terms + [0] * terms, dtype=np.complex128)
    return np.fft.fftshift(np.fft.ifft(spec))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class VideoFilterSpec:
    """Video filter bank: arrays are pytree data; scalars are static."""
    rf_video: np.ndarray        # BPF * audio notches * hilbert  (complex in, analytic out)
    mtf: np.ndarray             # MTF compensation response (raised to mtf_level)
    f_video: np.ndarray         # LPF * deemphasis           (applied to demod)
    f_video05: np.ndarray       # LPF * deemp * 0.5MHz FIR
    f_video_burst: np.ndarray   # LPF * deemp * burst BPF
    f_psync: np.ndarray         # sync detector LPF (applied to binary slice)
    f_emp: np.ndarray           # inverse emphasis (test-signal generation)
    f_video_pilot: Optional[np.ndarray]  # PAL only
    f05_offset: int = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AudioFilterSpec:
    """Audio (FM carrier) filter bank; stage-1 ops are defined on
    frequency-domain slices of the full-rate block FFT.  Arrays are pytree
    data; geometry scalars are static metadata (usable in jit slicing)."""
    lfilt: np.ndarray           # sliced left-carrier BPF * hilbert
    rfilt: np.ndarray           # sliced right-carrier BPF * hilbert
    lpf2: np.ndarray            # stage-2 21kHz LPF (at stage2 block length)
    deemp2: np.ndarray          # 75µs deemphasis (at stage2 block length)
    fdiv1: int = dataclasses.field(metadata=dict(static=True))
    fdiv2: int = dataclasses.field(metadata=dict(static=True))
    slice_lo: tuple = dataclasses.field(metadata=dict(static=True))
    slice_hi: tuple = dataclasses.field(metadata=dict(static=True))
    freq_arf: float = dataclasses.field(metadata=dict(static=True))
    freq_aud2: float = dataclasses.field(metadata=dict(static=True))
    lowfreq: float = dataclasses.field(metadata=dict(static=True))
    stage1_len: int = dataclasses.field(metadata=dict(static=True))
    stage1_keep: int = dataclasses.field(metadata=dict(static=True))


def deemp_ba(cfg: DecoderConfig):
    """Video deemphasis as digital (b, a) — a bilinear-transformed
    one-pole/one-zero pair (reference lddecode_core.py:185-189)."""
    d0, d1 = cfg.rf.video_deemp
    tf_b, tf_a = sps.zpk2tf(-d1 * (10 ** -10), -d0 * (10 ** -10), d0 / d1)
    return sps.bilinear(tf_b, tf_a, 1.0 / cfg.freq_hz_half)


def emp_ba(cfg: DecoderConfig):
    """Inverse (emphasis) pair, used in test-signal generation
    (reference lddecode_core.py:190-192, Femp)."""
    d0, d1 = cfg.rf.video_deemp
    tf_b, tf_a = sps.zpk2tf(-d0 * (10 ** -10), -d1 * (10 ** -10), d1 / d0)
    return sps.bilinear(tf_b, tf_a, 1.0 / cfg.freq_hz_half)


def v05_ba(cfg: DecoderConfig):
    """0.5 MHz video FIR (reference lddecode_core.py:199-202)."""
    return sps.firwin(65, [0.5 / cfg.freq_half], pass_zero=True), [1.0]


def psync_ba(cfg: DecoderConfig):
    """Sync-detector one-pole LPF (reference lddecode_core.py:211-214)."""
    return sps.butter(1, 0.05 / cfg.freq_half, btype='low')


def burst_ba(cfg: DecoderConfig):
    """Color-burst bandpass fsc±0.1 MHz (reference lddecode_core.py:204)."""
    fsc = cfg.sys.fsc_mhz
    return sps.butter(1, [(fsc - .1) / cfg.freq_half,
                          (fsc + .1) / cfg.freq_half], btype='bandpass')


def pilot_ba(cfg: DecoderConfig):
    """PAL pilot bandpass 3.7-3.8 MHz (reference lddecode_core.py:207)."""
    return sps.butter(1, [3.7 / cfg.freq_half, 3.8 / cfg.freq_half],
                      btype='bandpass')


def audio_stage2_rate(cfg: DecoderConfig) -> float:
    """Sample rate of the stage-2 decimated audio stream (Hz)."""
    fdiv1 = 32 if cfg.freq_mhz >= 32 else 16
    return cfg.freq_hz / (fdiv1 / 2) / 4


def audio_lpf_ba(cfg: DecoderConfig):
    """21 kHz stage-2 audio LPF (reference lddecode_core.py:262-271)."""
    return sps.firwin(65, [21000 / (audio_stage2_rate(cfg) / 2)]), [1.0]


def audio_deemp_ba(cfg: DecoderConfig):
    """75 µs audio deemphasis (reference lddecode_core.py:274-279)."""
    d75freq = 1e6 / (2 * np.pi * 75)
    return sps.butter(1, [d75freq / (audio_stage2_rate(cfg) / 2)],
                      btype='lowpass')


def design_video_filters(cfg: DecoderConfig) -> VideoFilterSpec:
    sp, dp = cfg.sys, cfg.rf
    n = cfg.blocklen
    fhz_half = cfg.freq_hz_half
    fhalf = cfg.freq_half

    # MTF equalizer poles (reference lddecode_core.py:153-159); the VHS
    # tape profile keeps the NTSC poles (MTF is a LaserDisc phenomenon —
    # tape decodes always run mtf_level=0, making this a no-op there)
    if cfg.system != 'PAL':
        poles = [polar2z(.7, np.pi * 12.5 / 20), polar2z(.7, np.pi * 27.5 / 20)]
    else:
        poles = [polar2z(.7, np.pi * 10 / 20), polar2z(.7, np.pi * 28 / 20)]
    mtf = filtfft(sps.zpk2tf([], poles, 1.11), n)

    hilbert = np.fft.fft(hilbert_kernel(), n)

    rf_bpf = sps.butter(dp.video_bpf_order,
                        [dp.video_bpf[0] / fhz_half, dp.video_bpf[1] / fhz_half],
                        btype='bandpass')
    rf_video = filtfft(rf_bpf, n)

    if sp.analog_audio:
        for carrier in (sp.audio_lfreq, sp.audio_rfreq):
            notch = sps.butter(
                dp.audio_notchorder,
                [(carrier - dp.audio_notchwidth) / fhz_half,
                 (carrier + dp.audio_notchwidth) / fhz_half],
                btype='bandstop')
            rf_video = rf_video * filtfft(notch, n)

    rf_video = rf_video * hilbert

    video_lpf = filtfft(sps.butter(dp.video_lpf_order,
                                   dp.video_lpf_freq / fhz_half, 'low'), n)

    # Deemphasis as a bilinear-transformed one-pole/one-zero pair
    # (reference lddecode_core.py:185-192).
    deemp = filtfft(deemp_ba(cfg), n)
    emp = filtfft(emp_ba(cfg), n)

    f_video = video_lpf * deemp

    f05 = filtfft(v05_ba(cfg), n)
    f_video05 = f_video * f05

    f_video_burst = f_video * filtfft(burst_ba(cfg), n)

    f_video_pilot = None
    if cfg.system == 'PAL':
        f_video_pilot = f_video * filtfft(pilot_ba(cfg), n)

    f_psync = filtfft(psync_ba(cfg), n)

    return VideoFilterSpec(
        rf_video=rf_video, mtf=mtf, f_video=f_video, f_video05=f_video05,
        f_video_burst=f_video_burst, f_psync=f_psync, f_emp=emp,
        f_video_pilot=f_video_pilot, f05_offset=32,
    )


def design_audio_filters(cfg: DecoderConfig) -> AudioFilterSpec:
    """Two-stage decimating FM audio demod filters
    (reference lddecode_core.py:223-279)."""
    sp = cfg.sys
    n = cfg.blocklen
    fhz = cfg.freq_hz
    fhz_half = cfg.freq_hz_half

    fdiv1 = 32 if cfg.freq_mhz >= 32 else 16
    afft_halfwidth = n // (fdiv1 * 2)
    freq_arf = fhz / (fdiv1 / 2)

    cfreq = float((sp.audio_rfreq + sp.audio_lfreq) // 2)
    afft_center = int((cfreq / fhz) * n)
    afft_start = int(afft_center - afft_halfwidth)
    afft_end = int(afft_center + afft_halfwidth)

    slice_lo = (afft_start, afft_end)
    slice_hi = (n - afft_end, n - afft_start)
    stage1_len = (afft_end - afft_start) * 2

    lowfreq = cfreq - (fhz / (2 * fdiv1))

    hilbert = np.fft.fft(hilbert_kernel(), n)

    apass = 150000.0
    afilt_len = 800

    def fdslice(full: np.ndarray) -> np.ndarray:
        return np.concatenate([full[slice_lo[0]:slice_lo[1]],
                               full[slice_hi[0]:slice_hi[1]]])

    afilt_left = filtfft([sps.firwin(afilt_len,
                                     [(sp.audio_lfreq - apass) / fhz_half,
                                      (sp.audio_lfreq + apass) / fhz_half],
                                     pass_zero=False), 1.0], n)
    afilt_right = filtfft([sps.firwin(afilt_len,
                                      [(sp.audio_rfreq - apass) / fhz_half,
                                       (sp.audio_rfreq + apass) / fhz_half],
                                      pass_zero=False), 1.0], n)
    lfilt = fdslice(afilt_left * hilbert)
    rfilt = fdslice(afilt_right * hilbert)

    fdiv2 = 4
    freq_aud2 = freq_arf / fdiv2

    lpf2 = filtfft(list(audio_lpf_ba(cfg)), n // fdiv2)
    deemp2 = filtfft(list(audio_deemp_ba(cfg)), n // fdiv2)

    # stage-1 decimation factor as realized by the slice: stage1_len samples
    # out per blocklen in.
    dec1 = n // stage1_len
    return AudioFilterSpec(
        lfilt=lfilt, rfilt=rfilt, lpf2=lpf2, deemp2=deemp2,
        fdiv1=fdiv1, fdiv2=fdiv2,
        slice_lo=slice_lo, slice_hi=slice_hi,
        freq_arf=freq_arf, freq_aud2=freq_aud2, lowfreq=lowfreq,
        stage1_len=stage1_len,
        stage1_keep=cfg.block_keep // dec1,
    )


class FilterBank(NamedTuple):
    """Host-side full-spectrum filter bank (design/verification form)."""
    video: VideoFilterSpec
    audio: Optional[AudioFilterSpec]


def design_filter_bank(cfg: DecoderConfig) -> FilterBank:
    video = design_video_filters(cfg)
    audio = design_audio_filters(cfg) if (cfg.decode_analog_audio
                                          and cfg.sys.analog_audio) else None
    return FilterBank(video=video, audio=audio)


def _onesided(F: np.ndarray) -> np.ndarray:
    n = len(F)
    return F[:n // 2 + 1]


def _conj_reflect_onesided(F: np.ndarray) -> np.ndarray:
    """Q[k] = conj(F[(N-k) mod N]) for k = 0..N/2."""
    n = len(F)
    idx = (n - np.arange(n // 2 + 1)) % n
    return np.conj(F[idx])


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DemodBank:
    """Device-resident demod filter bank in one-sided (rfft) form.

    Filters are carried as REAL arrays of shape (..., 2) (re/im pairs): the
    TPU runtime in this environment supports complex arithmetic and FFTs
    inside a compiled graph, but complex64 buffers cannot cross the
    host<->device boundary.  ops/demod.py reconstitutes complex values
    in-graph via lax.complex.

    Layout choices:
      * Hermitian filters (real b,a): one-sided response F[0..N/2]
      * the non-Hermitian RF chain (includes the Hilbert transformer):
        split into P[k]=F[k] and Q[k]=conj(F[(N-k)%N]) so the analytic
        signal comes out of one-sided spectra only (rfft-sized work)
      * the 0.5MHz tap's 32-sample roll is folded into its response as a
        linear phase term (circular shift theorem).
    """
    rf_p: np.ndarray
    rf_q: np.ndarray
    mtf_os: np.ndarray
    f_video_os: np.ndarray
    f_video05_os: np.ndarray      # roll(-32) folded in
    f_burst_os: np.ndarray
    f_psync_os: np.ndarray
    f_pilot_os: Optional[np.ndarray]
    # audio (None members when audio decode disabled)
    a_lfilt: Optional[np.ndarray]
    a_rfilt: Optional[np.ndarray]
    a_lpf2_os: Optional[np.ndarray]
    a_deemp2_os: Optional[np.ndarray]
    # static geometry
    blocklen: int = dataclasses.field(metadata=dict(static=True))
    f05_offset: int = dataclasses.field(metadata=dict(static=True))
    a_slice_lo: Optional[tuple] = dataclasses.field(metadata=dict(static=True))
    a_stage1_len: int = dataclasses.field(metadata=dict(static=True))
    a_stage1_keep: int = dataclasses.field(metadata=dict(static=True))
    a_freq_arf: float = dataclasses.field(metadata=dict(static=True))
    a_freq_aud2: float = dataclasses.field(metadata=dict(static=True))
    a_lowfreq: float = dataclasses.field(metadata=dict(static=True))
    a_fdiv2: int = dataclasses.field(metadata=dict(static=True))

    @property
    def has_audio(self) -> bool:
        return self.a_lfilt is not None

    @property
    def has_pilot(self) -> bool:
        return self.f_pilot_os is not None


def build_demod_bank(bank: FilterBank, cfg: DecoderConfig,
                     dtype=np.complex64) -> DemodBank:
    """Derive the device-side one-sided bank from the host design bank."""
    import jax.numpy as jnp

    v = bank.video
    n = cfg.blocklen
    rdtype = np.float64 if dtype == np.complex128 else np.float32

    def dev(x):
        if x is None:
            return None
        pair = np.stack([np.asarray(x).real, np.asarray(x).imag], axis=-1)
        return jnp.asarray(pair, dtype=rdtype)

    # fold the -32 circular roll into the 0.5MHz tap (shift theorem)
    k = np.arange(n // 2 + 1)
    roll_phase = np.exp(2j * np.pi * k * v.f05_offset / n)
    f05r = _onesided(v.f_video05) * roll_phase

    a = bank.audio
    if a is not None:
        audio_fields = dict(
            a_lfilt=dev(a.lfilt), a_rfilt=dev(a.rfilt),
            a_lpf2_os=dev(_onesided(a.lpf2)),
            a_deemp2_os=dev(_onesided(a.deemp2)),
            a_slice_lo=a.slice_lo, a_stage1_len=a.stage1_len,
            a_stage1_keep=a.stage1_keep, a_freq_arf=a.freq_arf,
            a_freq_aud2=a.freq_aud2, a_lowfreq=a.lowfreq, a_fdiv2=a.fdiv2,
        )
    else:
        audio_fields = dict(a_lfilt=None, a_rfilt=None, a_lpf2_os=None,
                            a_deemp2_os=None, a_slice_lo=None,
                            a_stage1_len=0, a_stage1_keep=0, a_freq_arf=0.0,
                            a_freq_aud2=0.0, a_lowfreq=0.0, a_fdiv2=1)

    return DemodBank(
        rf_p=dev(_onesided(v.rf_video)),
        rf_q=dev(_conj_reflect_onesided(v.rf_video)),
        mtf_os=dev(_onesided(v.mtf)),
        f_video_os=dev(_onesided(v.f_video)),
        f_video05_os=dev(f05r),
        f_burst_os=dev(_onesided(v.f_video_burst)),
        f_psync_os=dev(_onesided(v.f_psync)),
        f_pilot_os=dev(None if v.f_video_pilot is None
                       else _onesided(v.f_video_pilot)),
        blocklen=n,
        f05_offset=v.f05_offset,
        **audio_fields,
    )


def make_demod_bank(cfg: DecoderConfig, dtype=np.complex64) -> DemodBank:
    return build_demod_bank(design_filter_bank(cfg), cfg, dtype)
