"""PAL comb-filter chroma decoder (2D) for our 1135x625 .tbc format.

The reference's active tree defers PAL color to an external tool
(reference comb-pal.README:1); its attic PAL comb
(reference attic2/comb-pal.cxx) targets an older 1052x610 TBC geometry.
This module ports that algorithm to the current pilot-locked 4xfsc grid:

  * Split1D / adaptive Split2D as in the NTSC comb, but with the PAL
    +-4-line chroma period (attic2/comb-pal.cxx:236-341)
  * SplitUV demodulation at h%4 (the 4xfsc grid holds exactly 4 samples
    per subcarrier cycle)
  * per-line self-calibration from the swinging burst: the measured burst
    angle rotates each line's (U,V) so burst sits at 135 deg, absorbing
    the line-to-line subcarrier phase walk the pilot-locked grid leaves
    behind (attic2/comb-pal.cxx:544-586)
  * V-switch parity detected from the 4-line burst-angle pattern, then the
    attic's flip rule; YUV -> RGB (attic2/comb-pal.cxx:561-648)

Validated on synthetic PAL colorbars (known U/V per bar) since no
compatible reference binary exists for this geometry.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

PAL_Y, PAL_X = 625, 1135
IRESCALE = 376.32            # (0xd300-0x0100)/(100+42.857): our PAL scale
IREBASE = 256
VSYNC_IRE = -0.3 * (100 / 0.7)


@dataclass(frozen=True)
class CombPALConfig:
    dim: int = 2
    bw: bool = False
    adaptive2d: bool = True
    nr_y: float = 1.0
    brightness: float = 240.0
    black_ire: float = 0.0
    burst_cols: tuple = (20, 48)     # burst window after the hsync-end origin
    linesout: int = 576
    firstline: int = 24
    p_3dcore: float = 1.25           # 3D motion gate (IRE), as NTSC defaults
    p_3drange: float = 5.5
    # post-demod chroma LPF (the attic's FilterIQ behind f_colorlpf,
    # attic2/comb-pal.cxx:28,203-230 — OFF by default there and here):
    # one-pole I/Q-rate filters over the held U/V streams, the same
    # structure as the NTSC comb's filter_iq.  Cleans chroma demod
    # noise at the cost of chroma bandwidth.
    colorlpf: bool = False
    colorlpf_hq: bool = True
    # Philips pilot-disc 3.75 MHz pilot removal.  The reference keeps
    # the pilot in the .tbc (its PAL video LPF is 5.2 MHz,
    # lddecode_core.py:115, and its pilot TBC needs it in the stream,
    # :962-975), so on pilot discs the decoded picture carries a
    # full-height ~3.75 MHz pattern (measured ±14 IRE on the bench
    # capture) that no comb can remove — it is not chroma.  The pilot
    # is exactly 240 cycles per 64 µs line on the 1135-sample grid, so
    # one tapered rfft-bin notch per line kills it without touching
    # the 4.43 MHz chroma band (improvement beyond the reference,
    # which had no working PAL color path in its active tree).
    pilot_notch: bool = True


def _row_mask(lo, hi):
    r = jnp.arange(PAL_Y)[:, None]
    return (r >= lo) & (r < hi)


def _col_mask(lo, hi):
    c = jnp.arange(PAL_X)[None, :]
    return (c >= lo) & (c < hi)


def split1d_pal(raw):
    rp = jnp.pad(raw, ((0, 0), (2, 2)))
    tc1 = ((rp[:, 4:] + rp[:, :-4]) / 2) - raw
    mask = _row_mask(24, PAL_Y) & _col_mask(4, PAL_X - 4)
    return jnp.where(mask, tc1, 0.0)


def split2d_pal(clp0, adaptive: bool):
    """Adaptive 2D with the PAL +-4 line period
    (attic2/comb-pal.cxx:283-341)."""
    z = jnp.zeros_like(clp0)
    p1 = jnp.concatenate([z[:4], clp0[:-4]], axis=0)
    n1 = jnp.concatenate([clp0[4:], z[:4]], axis=0)
    c1 = clp0

    ac, ap, an = jnp.abs(c1), jnp.abs(p1), jnp.abs(n1)
    sh = lambda x: jnp.pad(x, ((0, 0), (1, 0)))[:, :-1]
    kp = (jnp.abs(ac - ap) + jnp.abs(sh(ac) - sh(ap)) - (ac + sh(ac)) * .10) / 2
    kn = (jnp.abs(ac - an) + jnp.abs(sh(ac) - sh(an)) - (ac + sh(an)) * .10) / 2
    rng = 45 * IRESCALE
    kp = jnp.clip(1 - kp / rng, 0, 1)
    kn = jnp.clip(1 - kn / rng, 0, 1)
    if not adaptive:
        kp = jnp.ones_like(kp)
        kn = jnp.ones_like(kn)
    both0 = (kp == 0) & (kn == 0)
    kp2 = jnp.where(kn > 3 * kp, 0.0, kp)
    kn2 = jnp.where(kp > 3 * kn, 0.0, kn)
    den = kn2 + kp2
    sc = jnp.maximum(jnp.where(den > 0, 2.0 / jnp.where(den > 0, den, 1.0),
                               1.0), 1.0)
    fb = (jnp.abs(ap - an) - jnp.abs((n1 + p1) * .2)) <= 0
    kp2 = jnp.where(both0, jnp.where(fb, 1.0, 0.0), kp2)
    kn2 = jnp.where(both0, jnp.where(fb, 1.0, 0.0), kn2)
    sc = jnp.where(both0, 1.0, sc)
    tc = ((c1 - p1) * kp2 * sc + (c1 - n1) * kn2 * sc) / 4

    inner = _row_mask(4, PAL_Y - 4) & _col_mask(18, PAL_X - 4)
    clp1 = jnp.where(inner, tc, 0.0)
    k1 = jnp.where(inner, 1.0, 0.0)
    outer = _row_mask(24, PAL_Y) & _col_mask(4, PAL_X - 4)
    k0 = jnp.where(outer & (k1 > 0), 0.0, 1.0)
    k0 = jnp.where(outer, k0, jnp.where(_row_mask(24, PAL_Y), 1.0, 0.0))
    return clp1, k1, k0


def split3d_pal(raw, prev_raw, next_raw, cfg: 'CombPALConfig'):
    """Temporal (3D) chroma + motion gate for PAL
    (attic2/comb-pal.cxx:355-397, corrected for the PAL frame phase).

    On the 4xfsc grid the PAL subcarrier walks 270 deg per frame (fsc x
    40 ms = 177344.75 cycles), and the 625-line frame flips the V-switch
    parity, so (prev+next)/2 cancels the neighbors' chroma entirely
    (rotations +-270 sum to 2*cos(270)*I = 0) and the difference from the
    current frame isolates -C.  The 1D/2D estimates carry -2C on this
    grid, hence the x2 blend scale.

    The attic's motion detector |prev-next| is wrong for PAL: prev and
    next are 540 deg = antiphase in chroma, so static color reads as
    motion.  We instead cancel chroma in the frame difference with the
    +-2-sample (antiphase) average and gate on the remaining luma motion,
    smoothed by the same fir1(16,0.1) the reference uses.
    """
    from ld_decode_tpu.comb.comb_ntsc import FILTERS

    clp2 = (((prev_raw + next_raw) / 2.0) - raw) * 2.0

    d = prev_raw - next_raw
    dp = jnp.pad(d, ((0, 0), (2, 2)))
    luma_d = jnp.abs((dp[:, :-4] + 2.0 * d + dp[:, 4:]) * 0.25) * 2.0
    luma_d = jnp.where(_col_mask(4, PAL_X), luma_d, 0.0)
    bj = jnp.asarray(FILTERS['lp3d'], luma_d.dtype)
    # precision='highest': TPU's default bf16 conv lowering injects
    # ~0.3 IRE noise (see comb_ntsc._causal_fir)
    k = jax.vmap(lambda row: jnp.convolve(row, bj, mode='full',
                                          precision='highest')[:PAL_X])(
        luma_d)
    k = jnp.roll(k, -8, axis=1)                  # remove the FIR group delay

    core = cfg.p_3dcore * IRESCALE
    rng = cfg.p_3drange * IRESCALE
    combk2 = jnp.clip(1 - ((k - core) / rng), 0, 1)
    mask = _row_mask(24, PAL_Y) & _col_mask(12, PAL_X - 12)
    return jnp.where(mask, clp2, 0.0), jnp.where(mask, combk2, 0.0)


def split_uv(raw, clps, ks):
    """Demodulate the blended chroma at h%4 (attic2/comb-pal.cxx:398-452,
    invertphase false for our flag-less PAL .tbc)."""
    cavg = sum(c * k for c, k in zip(clps, ks)) / 2.0
    cavg = -cavg
    h = jnp.arange(PAL_X)[None, :]
    phase = h % 4
    su_v = jnp.where(phase == 0, cavg, jnp.where(phase == 2, -cavg, 0.0))
    sv_v = jnp.where(phase == 1, -cavg, jnp.where(phase == 3, cavg, 0.0))
    prev = lambda x: jnp.pad(x, ((0, 0), (1, 0)))[:, :-1]
    u = jnp.where((phase % 2) == 0, su_v, prev(su_v))
    v = jnp.where((phase % 2) == 1, sv_v, prev(sv_v))
    mask = _row_mask(24, PAL_Y) & _col_mask(4, PAL_X - 4)
    return (jnp.where(mask, raw, 0.0), jnp.where(mask, u, 0.0),
            jnp.where(mask, v, 0.0))


def filter_uv(u, v, cfg: 'CombPALConfig'):
    """Post-demod chroma LPF over the held U/V sample streams (the
    attic's FilterIQ capability, attic2/comb-pal.cxx:203-230; the
    shared FilterIQ structure lives in comb_ntsc.chroma_lpf_pair — the
    attic reuses the NTSC-rate filter tables too).  hq mode filters V
    with the U (wider) LPF."""
    from ld_decode_tpu.comb.comb_ntsc import FILTERS, chroma_lpf_pair
    bu_au = FILTERS['lpi']
    bv_av = FILTERS['lpi'] if cfg.colorlpf_hq else FILTERS['lpq']
    return chroma_lpf_pair(u, v, bu_au, bv_av, PAL_X, PAL_Y,
                           row_lo=24, feed_hi=PAL_X - 4,
                           out_hi=PAL_X - 6)


def adjust_y_pal(y, u, v):
    """Remove the remodulated chroma from luma, shifting YUV left by 2
    (the attic's AdjustY, attic2/comb-pal.cxx:454-476).

    The output at h is y[h+2], whose subcarrier phase is (h+2)%4, so
    the modulated chroma there is [-u, v, u, -v] by h-phase (C(h) is
    [u, -v, -u, v] under split_uv's demod convention); y2 + comp with
    comp = [u2, -v2, -u2, v2] subtracts it.  (Round-5 fix: an extra
    sign flip here ADDED the chroma instead — the luma carried 2x the
    subcarrier amplitude as dot crawl on every saturated color, which
    the bar-mean hue tests integrated away to zero.  Caught by the
    bench's shipped-bytes accounting: the PAL RGB stream cost 0.81x
    raw where flat bars should be ~0.1x;
    tests/test_comb_pal.py::test_pal_comb_luma_chroma_separation now
    pins the interior flatness.)"""
    h = jnp.arange(PAL_X)[None, :]
    phase = h % 4
    shf = lambda x: jnp.pad(x, ((0, 0), (0, 2)))[:, 2:]
    y2, u2, v2 = shf(y), shf(u), shf(v)
    comp = jnp.where(phase == 0, u2,
                     jnp.where(phase == 1, -v2,
                               jnp.where(phase == 2, -u2, v2)))
    mask = _row_mask(24, PAL_Y) & _col_mask(2, PAL_X - 2)
    return (jnp.where(mask, y2 + comp, y), jnp.where(mask, u2, u),
            jnp.where(mask, v2, v))


def _pilot_notch_profile() -> np.ndarray:
    """Per-line rfft gain: unity everywhere except a raised-cosine
    notch (zero at center) around bin 240 = 3.75 MHz (see
    CombPALConfig.pilot_notch)."""
    prof = np.ones(PAL_X // 2 + 1, np.float32)
    center, width = 240, 8
    for i in range(-width, width + 1):
        prof[center + i] = 1.0 - 0.5 * (1 + np.cos(np.pi * i / (width + 1)))
    return prof


_PILOT_PROF = _pilot_notch_profile()


@functools.partial(jax.jit, static_argnames=('cfg',))
def comb_pal_frame(raw_u16, cfg: CombPALConfig, prev_u16=None, next_u16=None):
    """(linesout, 1135, 3) uint16 RGB + per-line burst angles (degrees)."""
    raw = raw_u16.astype(jnp.float32)
    if cfg.pilot_notch:
        # zero regions stay zero: the split/IQ masks re-zero everything
        # outside the picture area downstream of this filter
        raw = jnp.fft.irfft(jnp.fft.rfft(raw, axis=1)
                            * jnp.asarray(_PILOT_PROF), n=PAL_X, axis=1)
        if prev_u16 is not None:
            prev_u16 = jnp.fft.irfft(
                jnp.fft.rfft(prev_u16.astype(jnp.float32), axis=1)
                * jnp.asarray(_PILOT_PROF), n=PAL_X, axis=1)
        if next_u16 is not None:
            next_u16 = jnp.fft.irfft(
                jnp.fft.rfft(next_u16.astype(jnp.float32), axis=1)
                * jnp.asarray(_PILOT_PROF), n=PAL_X, axis=1)

    clp0 = split1d_pal(raw)
    if cfg.dim >= 2:
        clp1, k1, k0 = split2d_pal(clp0, cfg.adaptive2d)
    else:
        clp1 = jnp.zeros_like(raw)
        k1 = jnp.zeros_like(raw)
        k0 = jnp.where(_row_mask(24, PAL_Y) & _col_mask(4, PAL_X - 4),
                       1.0, 0.0)
    if cfg.dim >= 3 and prev_u16 is not None and next_u16 is not None:
        clp2, k2 = split3d_pal(raw, prev_u16.astype(jnp.float32),
                               next_u16.astype(jnp.float32), cfg)
        # blend (attic2/comb-pal.cxx:344-351): 2D yields to 3D, 1D takes
        # whatever remains
        k1 = k1 * (1 - k2)
        base = jnp.where(_row_mask(24, PAL_Y) & _col_mask(4, PAL_X - 4),
                         1.0, 0.0)
        k0 = jnp.clip(base - k2 - k1, 0.0, 1.0)
        y, u, v = split_uv(raw, (clp2, clp1, clp0), (k2, k1, k0))
    else:
        y, u, v = split_uv(raw, (clp1, clp0), (k1, k0))
    y, u, v = adjust_y_pal(y, u, v)
    if cfg.colorlpf:
        u, v = filter_uv(u, v, cfg)
    if cfg.bw:
        u = jnp.zeros_like(u)
        v = jnp.zeros_like(v)

    # per-line burst angle from the demodulated swinging burst
    b0, b1 = cfg.burst_cols
    bu = jnp.sum(u[:, b0:b1], axis=1)
    bv = jnp.sum(v[:, b0:b1], axis=1)
    angle = jnp.degrees(jnp.arctan2(bv, bu))            # (625,)

    # rotate each line so its burst lands at 135 deg: absorbs the
    # line-to-line subcarrier phase walk of the pilot-locked grid
    adj = jnp.radians(135.0 - angle)[:, None]
    mag = jnp.sqrt(u * u + v * v)
    th = jnp.arctan2(v, u) + adj
    u2 = jnp.cos(th) * mag
    v2 = jnp.sin(th) * mag

    # PAL V-switch: the swung lines need the (u,v)->(-v,-u) reflection
    # (attic2/comb-pal.cxx:625-636).  The switch alternates per transmitted
    # line, which in the woven frame appears as one of four row patterns;
    # the burst itself lies ON the reflection axis so it cannot pick the
    # polarity — select the candidate maximizing vertical chroma
    # correlation (correct flips make U/V fields smooth down the frame;
    # wrong ones decorrelate same-field neighbors).
    l = jnp.arange(PAL_Y)[:, None]
    cols = slice(64, PAL_X - 16, 4)
    best_score = jnp.float32(-jnp.inf)
    uf = u2
    vf = v2
    for phase in range(2):
        for pol in range(2):
            flip = ((((l + phase) % 4) // 2) == pol)
            uc = jnp.where(flip, -v2, u2)
            vc = jnp.where(flip, -u2, v2)
            us = uc[24:PAL_Y - 2:1, cols]
            vs = vc[24:PAL_Y - 2:1, cols]
            score = jnp.sum(us[:-2] * us[2:] + vs[:-2] * vs[2:])
            take = score > best_score
            best_score = jnp.where(take, score, best_score)
            uf = jnp.where(take, uc, uf)
            vf = jnp.where(take, vc, vf)

    rows = slice(cfg.firstline, cfg.firstline + cfg.linesout)
    yv = y[rows]
    uv_ = uf[rows] / IRESCALE
    vv_ = vf[rows] / IRESCALE

    y_ire = jnp.where(yv == 0, -100.0,
                      (yv - IREBASE) / IRESCALE + VSYNC_IRE)
    y2 = (y_ire - cfg.black_ire) * (100.0 / (100.0 - cfg.black_ire))
    r = y2 + 1.13983 * vv_
    g = y2 - 0.58060 * vv_ - 0.39465 * uv_
    b = y2 + 2.032 * uv_
    m = cfg.brightness * 255 / 100
    rgb = jnp.clip(jnp.stack([r, g, b], axis=-1) * m, 0, 65535)
    return rgb.astype(jnp.uint16), angle


class PALComb:
    """Frame-at-a-time driver for PAL .tbc frames (625*1135 uint16).

    With dim=3 a 3-frame ring is kept (like the NTSC comb / reference
    comb-ntsc.cxx:163-177): frame k's RGB is produced when frame k+1
    arrives; the first/last frames fall back to 2D."""

    def __init__(self, cfg: CombPALConfig = CombPALConfig()):
        self.cfg = cfg
        self._ring: list = []

    def process(self, framebuf: np.ndarray):
        """RGB for one input frame, or None while the dim-3 ring fills.

        dim-3 emits with one-frame latency: frame 0 comes back 2D
        immediately, frame k-1 comes back 3D on process(frame k), and
        flush() returns the final frame (2D).  Every frame is emitted
        exactly once, in order."""
        frame = jnp.asarray(np.asarray(framebuf).reshape(PAL_Y, PAL_X))
        if self.cfg.dim < 3:
            rgb, _ = comb_pal_frame(frame, self.cfg)
            return np.asarray(rgb)
        self._ring.append(frame)
        if len(self._ring) > 3:
            self._ring.pop(0)
        if len(self._ring) == 1:
            rgb, _ = comb_pal_frame(frame, self.cfg)     # first frame: 2D
            return np.asarray(rgb)
        if len(self._ring) == 2:
            return None                  # frame 1 pending its successor
        prev, cur, nxt = self._ring
        rgb, _ = comb_pal_frame(cur, self.cfg, prev, nxt)
        return np.asarray(rgb)

    def flush(self):
        """Emit the final pending frame (2D — it has no successor), or
        None if nothing is pending."""
        if self.cfg.dim < 3 or len(self._ring) < 2:
            return None
        rgb, _ = comb_pal_frame(self._ring[-1], self.cfg)
        return np.asarray(rgb)
