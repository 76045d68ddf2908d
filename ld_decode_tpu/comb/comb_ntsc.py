"""NTSC comb-filter chroma decoder (1D/2D/3D), TPU-native.

Re-implements the reference `comb` tool (reference comb-ntsc.cxx, class Comb,
lines 179-939) as fused whole-frame stencil passes over (525, 910) uint16
TBC frames:

  * Split1D  (comb-ntsc.cxx:246-288)  — ±2-sample line-local chroma
  * Split2D  (comb-ntsc.cxx:294-367)  — ±2-line comparison with adaptive
    similarity weights kp/kn (all elementwise; the reference's per-pixel
    branches become masks)
  * Split3D  (comb-ntsc.cxx:369-412)  — ±1-frame temporal chroma, gated
    either by the K-map (`-F` path) or by Farneback optical flow on each
    field's NR'd luma (comb-ntsc.cxx:600-662; cv2 on the host, the
    confidence map feeds the device kernel)
  * SplitIQ  (comb-ntsc.cxx:414-483)  — blend by combk, demodulate at h%4
    with per-line phase flags from TBC line word 0
  * AdjustY  (comb-ntsc.cxx:735-763), FilterIQ (212-243; one-pole IIRs as
    associative scans), DoYNR/DoCNR coring (485-553),
    ToRGB + burst AGC EMA (555-598), PostProcess crop/pulldown (894-938).

The sequential state (burst-AGC EMA across lines and frames, 3-frame ring)
is carried explicitly; everything else is data-parallel.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal as sps

IN_Y, IN_X = 525, 910
FREQ4 = 4 * 315.0 / 88.0
IRESCALE = 358.4          # comb-ntsc.cxx:60
IREBASE = 0x400

# frame line-0 flag word bits (reference ld-decoder.h:246-252)
FRAME_INFO_CLV = 0x1
FRAME_INFO_CAV_EVEN = 0x4
FRAME_INFO_CAV_ODD = 0x8
FRAME_INFO_CX = 0x10
FRAME_INFO_WHITE_ODD = 0x100
FRAME_INFO_WHITE_EVEN = 0x200


@dataclass(frozen=True)
class CombConfig:
    dim: int = 2
    bw: bool = False
    colorlpf: bool = True
    colorlpf_hq: bool = True
    adaptive2d: bool = True
    phase_invert: bool = False
    nr_y: float = 1.0          # IRE (scaled by irescale like the reference)
    nr_c: float = 0.0
    brightness: float = 236.0
    black_ire: float = 7.5
    p_3dcore: float = 1.25     # no-opticalflow defaults (comb-ntsc.cxx:1078)
    p_3drange: float = 5.5
    # optical-flow gate thresholds, in FLOW PIXELS, not IRE
    # (comb-ntsc.cxx:1074-1076: core 0.0, range 0.5 when f_opticalflow)
    of_3dcore: float = 0.0
    of_3drange: float = 0.5
    wide: bool = False
    linesout: int = 480
    opticalflow: bool = True   # dim 3: Farneback flow gating (reference
                               # default; False = the K-map `-F` path)
    debug2d: bool = False      # -D: replace chroma with the 2D-3D estimate
                               # difference over 50-IRE gray and report
                               # per-line/total MSE+ME (comb-ntsc.cxx:440-482)
    showk: bool = False        # -k: render combk[dim-1] as grayscale
                               # (comb-ntsc.cxx:575-579)
    debugline: int = -10000    # -l: expose + black out line debugline+25
                               # (comb-ntsc.cxx:581-591)
    optflow_engine: str = 'native'  # 'native' = our JAX Farneback
                                    # (comb/optflow.py); 'cv2' = OpenCV
                                    # host fallback / parity oracle

    @property
    def firstline(self) -> int:
        return 20 if self.linesout == IN_Y else 38


def _filters():
    """Comb-side filter kernels (designs from reference filtermaker.py)."""
    freq = FREQ4
    nr_b = sps.firwin(25, 1.80 / (freq / 2.0), window='hamming',
                      pass_zero=False)
    nrc_b = sps.firwin(17, 0.4 / (freq / 2.0), window='hamming',
                       pass_zero=False)
    lpi_b, lpi_a = sps.butter(1, 1.3 / (freq / 2), 'low')
    lpq_b, lpq_a = sps.butter(1, 0.6 / (freq / 2), 'low')
    # a = fir1(16, 0.1) (comb-ntsc.cxx:378-379)
    lp3d_b = sps.firwin(17, 0.1, window='hamming')
    return {
        'nr': np.asarray(nr_b), 'nrc': np.asarray(nrc_b),
        'lpi': (np.asarray(lpi_b), np.asarray(lpi_a)),
        'lpq': (np.asarray(lpq_b), np.asarray(lpq_a)),
        'lp3d': np.asarray(lp3d_b),
    }


FILTERS = _filters()


def _row_mask(lo, hi):
    r = jnp.arange(IN_Y)[:, None]
    return (r >= lo) & (r < hi)


def _col_mask(lo, hi):
    c = jnp.arange(IN_X)[None, :]
    return (c >= lo) & (c < hi)


def _causal_fir(x: jnp.ndarray, b: np.ndarray, start: int) -> jnp.ndarray:
    """Per-row streaming FIR like the reference's Filter::feed, fed from
    column `start` with zeroed initial state: out[h] = sum_k b[k]*x[h-k]
    with x treated as 0 before `start`.

    precision='highest': on TPU, XLA lowers f32 convolutions onto the
    MXU at bfloat16 input precision by default, which put ~±180-count
    (~0.3 IRE) noise into every NR correction — measured as the TPU
    comb's RGB stream shipping 1.19 MB/frame where the bit-identical
    CPU math ships 0.73 (docs/PERF.md round-5 notes).  Full-f32 passes
    cost 3 MXU passes on a trivially small conv — noise-free and
    cheap."""
    xm = jnp.where(_col_mask(start, IN_X), x, 0.0)
    bj = jnp.asarray(b, xm.dtype)
    return jax.vmap(
        lambda row: jnp.convolve(row, bj, mode='full',
                                 precision='highest')[:IN_X])(xm)


def _iir1_scan(x: jnp.ndarray, b: np.ndarray, a: np.ndarray) -> jnp.ndarray:
    """First-order IIR y[n] = b0 x[n] + b1 x[n-1] - a1 y[n-1] along the last
    axis via associative scan (state starts at zero)."""
    b0, b1 = float(b[0]), float(b[1])
    a1 = float(a[1])
    xprev = jnp.pad(x, ((0, 0), (1, 0)))[:, :-1]
    c = b0 * x + b1 * xprev
    A = jnp.full_like(c, -a1)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, bl * ar + br

    _, y = jax.lax.associative_scan(combine, (A, c), axis=1)
    return y


def split1d(raw: jnp.ndarray) -> jnp.ndarray:
    """(comb-ntsc.cxx:246-288); the un-filtered tc1 path used by dim>=2.
    The phase-invert sign cancels for this path."""
    rp = jnp.pad(raw, ((0, 0), (2, 2)))
    tc1 = ((rp[:, 4:] + rp[:, :-4]) / 2) - raw
    mask = _row_mask(44, IN_Y) & _col_mask(4, 840)
    return jnp.where(mask, tc1, 0.0)


def split1d_filtered(raw: jnp.ndarray, plain: jnp.ndarray,
                     invert_col: jnp.ndarray) -> jnp.ndarray:
    """dim-1 variant: the line-local chroma is phase-demodulated through the
    one-pole color LPFs and re-modulated, written 16 samples earlier
    (comb-ntsc.cxx:254-279, f_toffset=16); columns 824..839 keep the plain
    value (never overwritten by the h-16 store)."""
    rp = jnp.pad(raw, ((0, 0), (2, 2)))
    tc1 = ((rp[:, 4:] + rp[:, :-4]) / 2) - raw
    tc1 = jnp.where(invert_col[:, None], tc1, -tc1)

    h = jnp.arange(IN_X)[None, :]
    phase = h % 4
    sign = jnp.where((phase == 0) | (phase == 3), 1.0, -1.0)
    fed = tc1 * sign                       # tsi at even h, tsq at odd h
    fed = jnp.where(_col_mask(4, 840), fed, 0.0)

    bi, ai = FILTERS['lpi']
    bq, aq = FILTERS['lpq']
    fi = _iir1_scan(fed[:, 4::2], bi, ai)
    fq = _iir1_scan(fed[:, 5::2], bq, aq)

    # interleave back: filtered value at each h (fresh at its own phase)
    full = jnp.zeros_like(raw)
    full = full.at[:, 4::2].set(fi)
    full = full.at[:, 5::2].set(fq)
    tc1f = full * sign
    tc1f = jnp.where(invert_col[:, None], tc1f, -tc1f)

    # written at h-16 for h in 4..839
    out = jnp.pad(tc1f, ((0, 0), (0, 16)))[:, 16:]
    mask = _row_mask(44, IN_Y) & _col_mask(4, 824)
    return jnp.where(mask, out, plain)


def split2d(clp0: jnp.ndarray, combk2: jnp.ndarray,
            adaptive: bool) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(comb-ntsc.cxx:294-367).  Returns (clp1, combk1, combk0)."""
    z = jnp.zeros_like(clp0)
    p1 = jnp.concatenate([z[:2], clp0[:-2]], axis=0)
    n1 = jnp.concatenate([clp0[2:], z[:2]], axis=0)
    c1 = clp0

    ac, ap, an = jnp.abs(c1), jnp.abs(p1), jnp.abs(n1)
    acm1 = jnp.pad(ac, ((0, 0), (1, 0)))[:, :-1]
    apm1 = jnp.pad(ap, ((0, 0), (1, 0)))[:, :-1]
    anm1 = jnp.pad(an, ((0, 0), (1, 0)))[:, :-1]

    kp = jnp.abs(ac - ap) + jnp.abs(acm1 - apm1) - (ac + acm1) * .10
    # the reference's kn term mixes c1[h] with n1[h-1] (comb-ntsc.cxx:318)
    kn = jnp.abs(ac - an) + jnp.abs(acm1 - anm1) - (ac + anm1) * .10
    kp = kp / 2
    kn = kn / 2

    p_2drange = 45 * IRESCALE
    kp = jnp.clip(1 - (kp / p_2drange), 0, 1)
    kn = jnp.clip(1 - (kn / p_2drange), 0, 1)
    if not adaptive:
        kp = jnp.ones_like(kp)
        kn = jnp.ones_like(kn)

    both_zero = (kp == 0) & (kn == 0)
    kp2 = jnp.where((kn > 3 * kp), 0.0, kp)
    kn2 = jnp.where((kp > 3 * kn), 0.0, kn)
    denom = kn2 + kp2
    sc = jnp.where(denom > 0, 2.0 / jnp.where(denom > 0, denom, 1.0), 1.0)
    sc = jnp.maximum(sc, 1.0)
    # both-zero fallback (comb-ntsc.cxx:337-341)
    fb = (jnp.abs(ap - an) - jnp.abs((n1 + p1) * .2)) <= 0
    kp2 = jnp.where(both_zero, jnp.where(fb, 1.0, 0.0), kp2)
    kn2 = jnp.where(both_zero, jnp.where(fb, 1.0, 0.0), kn2)
    sc = jnp.where(both_zero, 1.0, sc)

    tc1 = ((c1 - p1) * kp2 * sc + (c1 - n1) * kn2 * sc) / 4.0

    inner = _row_mask(4, 524) & _col_mask(18, 840)
    clp1 = jnp.where(inner, tc1, 0.0)
    combk1 = jnp.where(inner, 1.0, 0.0)

    outer = _row_mask(36, IN_Y) & _col_mask(4, 840)
    k2mask = _row_mask(2, 524)            # 2 <= l <= 523
    combk1 = jnp.where(outer & k2mask, combk1 * (1 - combk2), combk1)
    combk0 = jnp.where(outer, 1.0 - combk2 - combk1, 0.0)
    # rows 44..IN_Y outside `outer` columns keep k0=1 from split1d; the
    # reference only updates combk0 inside the h 4..840 loop
    base0 = jnp.where(_row_mask(44, IN_Y) & _col_mask(4, 840), 1.0, 0.0)
    combk0 = jnp.where(outer, combk0, base0)
    return clp1, combk1, combk0


def split3d_optflow(raw: jnp.ndarray, prev_raw: jnp.ndarray,
                    combk2_in: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Temporal chroma for the optical-flow mode: clp2 = prev - cur with the
    externally computed flow confidence map (comb-ntsc.cxx:394-395, 600-662).
    """
    clp2 = prev_raw - raw
    mask = _row_mask(36, IN_Y) & _col_mask(4, 840)
    return jnp.where(mask, clp2, 0.0), jnp.where(mask, combk2_in, 0.0)


def split3d(raw: jnp.ndarray, prev_raw: jnp.ndarray, next_raw: jnp.ndarray,
            cfg: CombConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Temporal chroma + K-map motion gate, no-opticalflow path
    (comb-ntsc.cxx:369-412 with opt_flow=False).  Returns (clp2, combk2)."""
    clp2 = ((prev_raw + next_raw) / 2.0) - raw

    __k = jnp.abs(prev_raw - next_raw) * 2.0
    lp = _causal_fir(__k, FILTERS['lp3d'], 13)   # fed only for h>12
    # _k[h-8] = lp(h) for h in 13..839; _k[h] = __k[h] for h >= 836;
    # elsewhere the reference reads uninitialized stack (UB) — we use 0.
    h = jnp.arange(IN_X)[None, :]
    lp_sh = jnp.roll(lp, -8, axis=1)                   # lp[h+8] at h
    _k = jnp.where((h >= 5) & (h < 832), lp_sh, 0.0)
    _k = jnp.where(h >= 836, __k, _k)

    core = cfg.p_3dcore * IRESCALE
    rng = cfg.p_3drange * IRESCALE
    combk2 = jnp.clip(1 - ((_k - core) / rng), 0, 1)
    mask = _row_mask(36, IN_Y) & _col_mask(4, 840)
    clp2 = jnp.where(mask, clp2, 0.0)
    combk2 = jnp.where(mask, combk2, 0.0)
    return clp2, combk2


def split_iq(raw, clps, combks, invert_col: jnp.ndarray, cfg: CombConfig):
    """(comb-ntsc.cxx:414-483).  Returns (y, i, q) float arrays.

    With cfg.debug2d the blended chroma is replaced by the raw 2D-3D
    estimate difference and luma by 50-IRE gray (comb-ntsc.cxx:440-461);
    the MSE/ME statistics over that difference are computed separately
    by `debug2d_stats`."""
    if cfg.debug2d:
        cavg = clps[1] - clps[0]          # clp1 - clp2 (2D minus 3D)
    else:
        cavg = sum(c * k for c, k in zip(clps, combks)) / 2.0
    cavg = jnp.where(invert_col[:, None], cavg, -cavg)

    h = jnp.arange(IN_X)[None, :]
    phase = h % 4
    si_val = jnp.where(phase == 0, cavg, jnp.where(phase == 2, -cavg, 0.0))
    sq_val = jnp.where(phase == 1, -cavg, jnp.where(phase == 3, cavg, 0.0))
    prev = lambda x: jnp.pad(x, ((0, 0), (1, 0)))[:, :-1]
    si = jnp.where((phase == 0) | (phase == 2), si_val, prev(si_val))
    sq = jnp.where((phase == 1) | (phase == 3), sq_val, prev(sq_val))

    mask = _row_mask(36, IN_Y) & _col_mask(4, 840)
    # ire_to_u16(50) = (50+40)*irescale + irebase (comb-ntsc.cxx:150-155,461)
    ybase = jnp.full_like(raw, 50 * IRESCALE + 40 * IRESCALE + IREBASE) \
        if cfg.debug2d else raw
    y = jnp.where(mask, ybase, 0.0)
    i = jnp.where(mask, si, 0.0)
    q = jnp.where(mask, sq, 0.0)
    if cfg.bw:
        i = jnp.zeros_like(i)
        q = jnp.zeros_like(q)
    return y, i, q


def debug2d_stats(clp1, clp2):
    """Per-line and total MSE/ME of the 2D-3D chroma difference
    (comb-ntsc.cxx:440-445,476-482): columns 4..839, per-line mean over
    836 samples, totals over lines 36..523 (the SplitIQ loop floor
    intersected with the 6..523 print window)."""
    d = jnp.where(_col_mask(4, 840), clp1 - clp2, 0.0)
    msel = jnp.sum(d * d, axis=1) / 836.0
    sel = jnp.sum(jnp.abs(d), axis=1) / 836.0
    lr = jnp.arange(IN_Y)
    lmask = (lr >= 36) & (lr <= 523)
    return (msel, sel, jnp.sum(jnp.where(lmask, msel, 0.0)),
            jnp.sum(jnp.where(lmask, sel, 0.0)))


def adjust_y(y, i, q, invert_col: jnp.ndarray, cfg: CombConfig):
    """Remove chroma from luma; shifts the whole YIQ left by 2
    (comb-ntsc.cxx:735-763)."""
    h = jnp.arange(IN_X)[None, :]
    phase = h % 4
    sh = lambda x: jnp.pad(x, ((0, 0), (0, 2)))[:, 2:]     # x[h+2]
    y2, i2, q2 = sh(y), sh(i), sh(q)
    comp = jnp.where(phase == 0, i2,
                     jnp.where(phase == 1, -q2,
                               jnp.where(phase == 2, -i2, q2)))
    comp = jnp.where(invert_col[:, None], -comp, comp)
    ynew = y2 + comp
    mask = _row_mask(cfg.firstline, IN_Y) & _col_mask(2, 842)
    return (jnp.where(mask, ynew, y),
            jnp.where(mask, i2, i),
            jnp.where(mask, q2, q))


def chroma_lpf_pair(a, b, ba_a, ba_b, W: int, nrows: int, row_lo: int,
                    feed_hi: int, out_hi: int):
    """Post-demod chroma LPF over two held alternating sample streams
    (the FilterIQ structure, comb-ntsc.cxx:212-243 / the attic's PAL
    FilterIQ): one-pole IIRs fed at even/odd h from h=4, held outputs
    written back at h-2.  Shared by the NTSC comb (filter_iq) and the
    PAL comb (comb_pal.filter_uv) — parameterized on the frame
    geometry only."""
    col = jnp.arange(W)[None, :]
    row = jnp.arange(nrows)[:, None]
    fm = (col >= 4) & (col < feed_hi)
    a_in = jnp.where(fm, a, 0.0)
    b_in = jnp.where(fm, b, 0.0)
    fa = _iir1_scan(a_in[:, 4::2], ba_a[0], ba_a[1])
    fb = _iir1_scan(b_in[:, 5::2], ba_b[0], ba_b[1])

    # held outputs at each h (value from the last feed at or before h)
    def held(seq_out, first_col):
        up = jnp.repeat(seq_out, 2, axis=1)
        return jnp.pad(up, ((0, 0), (first_col, 0)))[:, :W]

    ha = held(fa, 4)
    hb = held(fb, 5)
    sh2 = lambda x: jnp.pad(x, ((0, 0), (0, 2)))[:, 2:]
    mask = (row >= row_lo) & (col >= 2) & (col < out_hi)
    return (jnp.where(mask, sh2(ha), a), jnp.where(mask, sh2(hb), b))


def filter_iq(i, q, cfg: CombConfig):
    """Post chroma LPF: one-pole IIRs over the alternating I/Q sample
    streams (comb-ntsc.cxx:212-243).  hq mode filters Q with the I LPF."""
    bi_ai = FILTERS['lpi']
    bq_aq = FILTERS['lpi'] if cfg.colorlpf_hq else FILTERS['lpq']
    return chroma_lpf_pair(i, q, bi_ai, bq_aq, IN_X, IN_Y,
                           row_lo=44, feed_hi=840, out_hi=838)


def do_ynr(y, cfg: CombConfig):
    """Luma coring NR (comb-ntsc.cxx:523-553)."""
    if cfg.nr_y <= 0:
        return y
    nr_y = cfg.nr_y * IRESCALE
    hp = _causal_fir(y, FILTERS['nr'], 40)
    a = jnp.pad(hp, ((0, 0), (0, 12)))[:, 12:]       # hp[h+12]
    a = jnp.clip(a, -nr_y, nr_y)
    mask = _row_mask(cfg.firstline, IN_Y) & _col_mask(40, 843)
    return jnp.where(mask, y - a, y)


def do_cnr(i, q, cfg: CombConfig, min_val: float = -1.0):
    """Chroma coring NR (comb-ntsc.cxx:485-521)."""
    nr_c = max(cfg.nr_c, min_val)
    if nr_c <= 0:
        return i, q
    nr_c = nr_c * IRESCALE
    out = []
    for chan in (i, q):
        hp = _causal_fir(chan, FILTERS['nrc'], 60)
        a = jnp.pad(hp, ((0, 0), (0, 12)))[:, 12:]
        a = jnp.clip(a, -nr_c, nr_c)
        mask = _row_mask(cfg.firstline, IN_Y) & _col_mask(60, 842)
        out.append(jnp.where(mask, chan - a, chan))
    return out[0], out[1]


def agc_ema_step(carry, b):
    """One line of the burst-AGC EMA (comb-ntsc.cxx:563-564): lines with
    burst > 3 IRE update the EMA (seed on first valid line)."""
    upd = b > 3
    c0 = jnp.where((carry < 0) & upd, b, carry)
    c1 = jnp.where(upd, c0 * .99 + b * .01, c0)
    return c1, c1


def to_rgb(y, i, q, raw, aburstlev, cfg: CombConfig):
    """YIQ -> RGB48 with burst-AGC EMA (comb-ntsc.cxx:555-598).

    aburstlev: scalar carry (the EMA persists across frames).
    Returns ((rows, 910, 3) uint16 for rows firstline..firstline+linesout,
    new aburstlev)."""
    first = cfg.firstline
    burstlev = raw[:, 1] / IRESCALE                  # per line

    aburstlev, levels = jax.lax.scan(agc_ema_step, aburstlev,
                                     burstlev[first:])
    gain = 10.0 / levels                              # (rows,)

    nrows = min(cfg.linesout, IN_Y - first)
    yv = y[first:first + nrows]
    iv = i[first:first + nrows] * gain[:nrows, None]
    qv = q[first:first + nrows] * gain[:nrows, None]

    y_ire = jnp.where(yv == 0, -100.0, -40.0 + (yv - IREBASE) / IRESCALE)
    y2 = (y_ire - cfg.black_ire) * (100.0 / (100.0 - cfg.black_ire))
    # NB: the reference swaps i/q names here (comb-ntsc.cxx:135-136)
    qq = iv / IRESCALE
    ii = qv / IRESCALE
    r = y2 + (.956 * ii) + (.621 * qq)
    g = y2 - (.272 * ii) - (.647 * qq)
    b = y2 - (1.106 * ii) + (1.703 * qq)
    m = cfg.brightness * 256 / 100
    rgb = jnp.stack([r, g, b], axis=-1) * m
    rgb = jnp.clip(rgb, 0, 65535).astype(jnp.uint16)
    if nrows < cfg.linesout:
        # linesout=525 with firstline=20: the reference zero-fills the
        # tail rows it never computes — keep the promised output shape
        rgb = jnp.pad(rgb, ((0, cfg.linesout - nrows), (0, 0), (0, 0)))
    return rgb, aburstlev


@functools.partial(jax.jit, static_argnames=('cfg',))
def flow_luma(raw_u16, cfg: CombConfig):
    """The NR'd adjusted luma the reference feeds Farneback
    (comb-ntsc.cxx:852-857: SplitIQ -> AdjustY -> YNR/CNR with min 4)."""
    raw = raw_u16.astype(jnp.float32)
    invert_col = raw_u16[:, 0] == 16384
    if cfg.phase_invert:
        invert_col = ~invert_col
    clp0 = split1d(raw)
    z = jnp.zeros_like(raw)
    clp1, k1, k0 = split2d(clp0, z, cfg.adaptive2d)
    y, i, q = split_iq(raw, (z, clp1, clp0), (z, k1, k0), invert_col, cfg)
    y, i, q = adjust_y(y, i, q, invert_col, cfg)
    # the reference's DoYNR/DoCNR 'min 4' floor is in raw units against
    # the already-irescaled nr (1 IRE = 358.4), so it never binds for
    # normal settings — floor at 4 RAW counts, not 4 IRE
    ycfg = CombConfig(dim=cfg.dim, nr_y=max(cfg.nr_y, 4.0 / IRESCALE),
                      nr_c=max(cfg.nr_c, 4.0 / IRESCALE),
                      linesout=cfg.linesout)
    y = do_ynr(y, ycfg)
    return y


def farneback_combk2(y_now: np.ndarray, prev_pics: dict, flows: dict,
                     fcount: int, p_3dcore: float = 0.0,
                     p_3drange: float = 0.5,
                     engine: str = 'native') -> np.ndarray:
    """Per-pixel 3D confidence from Farneback optical flow on each field's
    luma (comb-ntsc.cxx:600-662).  Mutates prev_pics/flows carries.

    engine='native' runs our JAX Farneback (comb/optflow.py) — the whole
    3D comb then has no host-side OpenCV dependency; engine='cv2' keeps
    the OpenCV call (parity oracle)."""
    cysize, cxsize = 252, IN_X - 70
    combk2 = np.zeros((IN_Y, IN_X), np.float32)
    cs = []
    for field in range(2):
        rows = np.clip(23 + field + 2 * np.arange(cysize), 0, IN_Y - 1)
        pic = np.ascontiguousarray(
            np.clip(y_now[rows, 70:70 + cxsize], 0, 65535)).astype(np.uint16)
        if fcount:
            use_init = fcount > 1
            flow = flows.get(field)
            if engine == 'cv2':
                import cv2
                flags = cv2.OPTFLOW_USE_INITIAL_FLOW if use_init else 0
                flow = cv2.calcOpticalFlowFarneback(
                    pic, prev_pics[field], flow, 0.5, 4, 60, 3, 7, 1.5,
                    flags)
            else:
                from ld_decode_tpu.comb.optflow import \
                    calc_optical_flow_farneback
                flow = np.asarray(calc_optical_flow_farneback(
                    pic, prev_pics[field], flow, 0.5, 4, 60, 3, 7, 1.5,
                    use_initial_flow=use_init))
            flows[field] = flow
            fl = np.asarray(flow, np.float64)
            mag = np.sqrt(fl[..., 1] ** 2 + (fl[..., 0] * 2) ** 2)
            cs.append(1.0 - np.clip((mag - p_3dcore) / p_3drange, 0, 1))
        prev_pics[field] = pic
    if cs:
        c = np.minimum(cs[0], cs[1])
        rows = 2 * np.arange(cysize)
        combk2[rows[:, None], 70 + np.arange(cxsize)[None, :]] = c
        combk2[(rows + 1)[:, None], 70 + np.arange(cxsize)[None, :]] = c
    return combk2


def _frame_core(raw_u16, prev_u16, next_u16, aburstlev, cfg: CombConfig,
                combk2_in=None):
    raw = raw_u16.astype(jnp.float32)
    invert_col = raw_u16[:, 0] == 16384
    if cfg.phase_invert:
        invert_col = ~invert_col

    # (A fused Mosaic VMEM stencil for the dim-2 chain existed through
    # round 3 but never earned a default: measured on the v5e it LOST
    # to XLA's own fusion of these whole-frame stencils — 2.24 vs
    # 2.16 ms/frame, with a 1-LSB f32-reassociation delta — so it was
    # deleted per the round-3 verdict; scripts/probe_comb2d.py is the
    # measurement, docs/PERF.md the record.)
    clp0 = split1d(raw)
    if cfg.dim == 1:
        clp0 = split1d_filtered(raw, clp0, invert_col)
    if cfg.dim >= 3 and combk2_in is not None:
        prev = prev_u16.astype(jnp.float32)
        clp2, combk2 = split3d_optflow(raw, prev, combk2_in)
    elif cfg.dim >= 3:
        prev = prev_u16.astype(jnp.float32)
        nxt = next_u16.astype(jnp.float32)
        clp2, combk2 = split3d(raw, prev, nxt, cfg)
    else:
        clp2 = jnp.zeros_like(raw)
        combk2 = jnp.zeros_like(raw)

    if cfg.dim >= 2:
        clp1, combk1, combk0 = split2d(clp0, combk2, cfg.adaptive2d)
    else:
        clp1 = jnp.zeros_like(raw)
        combk1 = jnp.zeros_like(raw)
        combk0 = jnp.where(_row_mask(44, IN_Y) & _col_mask(4, 840), 1.0, 0.0)

    if cfg.dim >= 3:
        # Split3D also rewrites combk1/combk0 (comb-ntsc.cxx:404-409)
        mask36 = _row_mask(36, IN_Y) & _col_mask(4, 840)
        k1row = _row_mask(2, 524)
        combk1 = jnp.where(mask36 & k1row, 1.0 - combk2, combk1)
        combk0 = jnp.where(mask36, 1.0 - combk2 - combk1, combk0)

    y, i, q = split_iq(raw, (clp2, clp1, clp0), (combk2, combk1, combk0),
                       invert_col, cfg)
    y, i, q = adjust_y(y, i, q, invert_col, cfg)
    if cfg.colorlpf:
        i, q = filter_iq(i, q, cfg)

    # VBI pass-through (comb-ntsc.cxx:876-882)
    # rows 20..43 copied up by 20: y[l-20] = raw[l]
    raw_sh = jnp.concatenate([raw[20:], raw[:20]], axis=0)
    vbi_dst = _row_mask(0, 24) & _col_mask(4, 840)
    y = jnp.where(vbi_dst, raw_sh, y)

    y = do_ynr(y, cfg)
    i, q = do_cnr(i, q, cfg)

    extras = {}
    if cfg.debug2d:
        msel, sel, mse, me = debug2d_stats(clp1, clp2)
        extras.update(mse_line=msel, me_line=sel, mse=mse, me=me)
    if cfg.showk:
        # -k: luma = combk[dim-1] rendered as 0..100 IRE, read 82 samples
        # ahead; chroma off (comb-ntsc.cxx:575-579)
        ksel = {1: combk0, 2: combk1, 3: combk2}[cfg.dim]
        ksh = jnp.pad(ksel, ((0, 0), (0, 82)))[:, 82:]
        y = jnp.clip((ksh * 100 + 40) * IRESCALE + IREBASE, 1, 65535)
        i = jnp.zeros_like(i)
        q = jnp.zeros_like(q)
    if cfg.debugline > -9999:
        l = cfg.debugline + 25
        extras.update(dbg_y=y[l], dbg_i=i[l], dbg_q=q[l])

    rgb, ab = to_rgb(y, i, q, raw, aburstlev, cfg)
    return rgb, ab, extras


@functools.partial(jax.jit, static_argnames=('cfg',))
def comb_frame(raw_u16, prev_u16, next_u16, aburstlev, cfg: CombConfig):
    return _frame_core(raw_u16, prev_u16, next_u16, aburstlev, cfg)


@functools.partial(jax.jit, static_argnames=('cfg',))
def comb_frame_of(raw_u16, newest_u16, combk2, aburstlev, cfg: CombConfig):
    return _frame_core(raw_u16, newest_u16, newest_u16, aburstlev, cfg,
                       combk2_in=combk2)


class PulldownAssembler:
    """3:2 pulldown film-frame reassembly (reference comb-ntsc.cxx:894-938,
    the `-p` flag at :1009).

    CAV picture-number / white-flag field parity in the frame's line-0
    flag word decides whether a video frame is a whole film frame
    (fstart==0 -> emit it), the odd-field start of one (fstart==1 ->
    hold its odd lines), or — when an odd frame is pending — the even
    half that completes it (merge current even lines into the held
    frame and emit).  Frames carrying no parity flags (fstart==-1) are
    the 3:2 redundancy and are dropped.  White flags outrank CAV flags,
    exactly like the reference's two if/else chains."""

    def __init__(self):
        self._odd = None           # held frame with valid odd lines
        self._framecode = 0        # CAV picture number of the held frame

    def process(self, rgb: np.ndarray, words: np.ndarray):
        """rgb: (rows, w, 3) uint16 comb output; words: that frame's 16
        line-0 metadata words (raw TBC line 0 / `frame_metadata_words`).
        Returns a list of (frame, framecode) emissions (0, 1, or 2)."""
        emits = []
        if self._odd is not None:
            merged = self._odd
            merged[0::2] = np.asarray(rgb)[0::2]
            emits.append((merged, self._framecode))
            self._odd = None
        flags = int(words[13])
        fstart = -1
        if flags & FRAME_INFO_CAV_ODD:
            fstart = 1
        elif flags & FRAME_INFO_CAV_EVEN:
            fstart = 0
        if flags & FRAME_INFO_WHITE_ODD:
            fstart = 1
        elif flags & FRAME_INFO_WHITE_EVEN:
            fstart = 0
        self._framecode = (int(words[14]) << 16) | int(words[15])
        if fstart == 0:
            emits.append((np.asarray(rgb).copy(), self._framecode))
        elif fstart == 1:
            self._odd = np.asarray(rgb).copy()
        return emits


class NTSCComb:
    """Stateful frame-at-a-time driver mirroring `Comb::Process`
    (comb-ntsc.cxx:834-938): 3-frame ring for dim 3, AGC carry, crop."""

    def __init__(self, cfg: CombConfig = CombConfig()):
        self.cfg = cfg
        self.ring = []
        self.aburstlev = jnp.float32(-1.0)
        self.framecount = 0
        self._of_prev = {}
        self._of_flows = {}
        self._of_count = 0
        self._of_combk2 = None
        # line-0 metadata words of the frame the last process() output
        # corresponds to (lags the input by one frame in dim-3 mode);
        # the pulldown assembler keys off these (comb-ntsc.cxx:911-921)
        self.last_frame_words = np.zeros(16, np.uint16)
        # debug surfaces: -D stats / -l line dump from the last frame
        # (comb-ntsc.cxx:476-482, 581-591)
        self.last_debug2d = None       # dict(mse, me, mse_line, me_line)
        self.last_debugline = None     # dict(y, i, q) pre-AGC YIQ row

    def process(self, framebuf: np.ndarray) -> Optional[np.ndarray]:
        """framebuf: (525*910,) or (525,910) uint16.  Returns RGB48
        (linesout, 744 or 910, 3) uint16, or None during dim-3 warmup."""
        cfg = self.cfg
        frame = jnp.asarray(np.asarray(framebuf).reshape(IN_Y, IN_X))
        if cfg.dim >= 3:
            self.ring.append(frame)
            if len(self.ring) > 3:
                self.ring.pop(0)
            if cfg.opticalflow and self.framecount >= 1:
                # flow between the newest frame's NR'd luma and the
                # previous one (comb-ntsc.cxx:852-858)
                y_now = np.asarray(flow_luma(frame, cfg))
                self._of_combk2 = farneback_combk2(
                    y_now, self._of_prev, self._of_flows, self._of_count,
                    cfg.of_3dcore, cfg.of_3drange, cfg.optflow_engine)
                self._of_count += 1
            if len(self.ring) < 3:
                self.framecount += 1
                return None
            nxt, cur, prv = self.ring[2], self.ring[1], self.ring[0]
            self.last_frame_words = np.asarray(cur)[0, :16].copy()
            # ring order: Frame[0]=new, Frame[1]=mid, Frame[2]=old;
            # Split3D(f=1): p3=Frame[0] (newest), n3=Frame[2] (oldest)
            if cfg.opticalflow:
                rgb, self.aburstlev, extras = comb_frame_of(
                    cur, nxt, jnp.asarray(self._of_combk2),
                    self.aburstlev, cfg)
            else:
                rgb, self.aburstlev, extras = comb_frame(
                    cur, nxt, prv, self.aburstlev, cfg)
        else:
            self.last_frame_words = np.asarray(frame)[0, :16].copy()
            rgb, self.aburstlev, extras = comb_frame(
                frame, frame, frame, self.aburstlev, cfg)
        self.framecount += 1
        out = np.asarray(rgb)
        if cfg.debug2d:
            self.last_debug2d = {
                'mse_line': np.asarray(extras['mse_line']),
                'me_line': np.asarray(extras['me_line']),
                'mse': float(extras['mse']), 'me': float(extras['me'])}
        if cfg.debugline > -9999:
            self.last_debugline = {k[4:]: np.asarray(extras[k])
                                   for k in ('dbg_y', 'dbg_i', 'dbg_q')}
            row = cfg.debugline + 25 - cfg.firstline
            if 0 <= row < out.shape[0]:
                out = out.copy()
                out[row] = 0           # blacked out (comb-ntsc.cxx:588-590)
        if not cfg.wide:
            out = out[:, 78:78 + 744]
        return out
