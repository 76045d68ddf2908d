"""Legacy-geometry PAL comb (attic2/comb-pal.cxx parity path).

The production PAL comb (`comb/comb_pal.py`) targets our 1135x625
pilot-locked .tbc grid.  The reference's only runnable PAL comb is the
attic prototype (reference attic2/comb-pal.cxx), which consumes the
older 1052x610 TBC geometry — so oracle parity has to be pinned on that
geometry.  This module re-implements the attic algorithm as whole-frame
stencil passes (same style as comb/comb_ntsc.py):

  * Split1D   (attic2/comb-pal.cxx:236-275)  — ±2-sample line chroma,
    invertphase hard-false, the dim-1 filtered store commented out
  * Split2D   (attic2/comb-pal.cxx:283-341)  — ±4-line adaptive compare
    (PAL chroma period), same kp/kn weights as the NTSC comb
  * Split3D is compiled out in the reference (#if 0 at :342); dim=3
    degenerates to 2D on the previous frame (Process's f=1 indexes the
    one-frame-old ring slot, attic2/comb-pal.cxx:826,866)
  * SplitIQ   (attic2/comb-pal.cxx:400-468)  — blend/demodulate at h%4
    with invertphase from rawbuffer[l][0]==16384
  * AdjustY   (attic2/comb-pal.cxx:790-817), DoYNR (:511-539);
    f_colorlpf defaults FALSE so FilterIQ is skipped, DoCNR is
    commented out (:871)
  * ToRGB     (attic2/comb-pal.cxx:541-648) — per-line burst angle from
    the demodulated swinging burst (h 25..54), rotate so burst sits at
    135°, V-switch flip on l%4 with the 4-line phase vote, burstlev
    hardcoded 8 so the AGC gain is a constant 10/8, YUV→RGB with the
    -43.122874 IRE offset and brightness 240
  * PostProcess crop to 974 dots from x=78 (:877-917)

Sequential state is nil on the default path (the AGC EMA is constant),
so the whole frame is one jitted call.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

L_Y, L_X = 610, 1052
IRESCALE = 376.32              # attic2/comb-pal.cxx:49
IRE_OFFSET = -43.122874        # u16_to_ire (attic2/comb-pal.cxx:108-113)
LINEOFFSET = 32                # firstline when linesout=576
LINESOUT = 576
CROP_X0, CROP_W = 78, 1052 - 78


@dataclass(frozen=True)
class LegacyPALConfig:
    dim: int = 2
    bw: bool = False
    adaptive2d: bool = True
    nr_y: float = 1.0          # IRE; scaled by irescale like the reference
    brightness: float = 240.0
    black_ire: float = 0.0
    wide: bool = False


def _rows(lo, hi):
    r = jnp.arange(L_Y)[:, None]
    return (r >= lo) & (r < hi)


def _cols(lo, hi):
    c = jnp.arange(L_X)[None, :]
    return (c >= lo) & (c < hi)


def _split1d(raw):
    """±2-sample chroma; the double phase negation cancels
    (attic2/comb-pal.cxx:236-275).  Integer (a+b)/2 like the C code."""
    rp = jnp.pad(raw, ((0, 0), (2, 2)))
    tc1 = jnp.floor((rp[:, 4:] + rp[:, :-4]) / 2) - raw
    mask = _rows(24, L_Y) & _cols(4, L_X - 4)
    return jnp.where(mask, tc1, 0.0)


def _split2d(clp0, adaptive):
    """±4-line adaptive comparison (attic2/comb-pal.cxx:283-341).
    Returns (clp1, combk1, combk0); combk2 is identically 0 (no 3D)."""
    z = jnp.zeros_like(clp0)
    p1 = jnp.concatenate([z[:4], clp0[:-4]], axis=0)
    n1 = jnp.concatenate([clp0[4:], z[:4]], axis=0)
    c1 = clp0

    ac, ap, an = jnp.abs(c1), jnp.abs(p1), jnp.abs(n1)
    sh = lambda x: jnp.pad(x, ((0, 0), (1, 0)))[:, :-1]
    kp = (jnp.abs(ac - ap) + jnp.abs(sh(ac) - sh(ap))
          - (ac + sh(ac)) * .10) / 2
    kn = (jnp.abs(ac - an) + jnp.abs(sh(ac) - sh(an))
          - (ac + sh(an)) * .10) / 2
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

    # inner 2D region: 24 <= l <= in_y-4 (outer loop floor 24), h 18..1047
    inner = _rows(24, L_Y - 3) & _cols(18, L_X - 4)
    clp1 = jnp.where(inner, tc, 0.0)
    combk1 = jnp.where(inner, 1.0, 0.0)
    # second pass (h 4..1047, rows >= 24): combk0 = 1 - combk2 - combk1
    outer = _rows(24, L_Y) & _cols(4, L_X - 4)
    combk0 = jnp.where(outer, 1.0 - combk1, 0.0)
    return clp1, combk1, combk0


def _split_iq(raw, clps, ks, invert_col):
    """Blend + demodulate at h%4 with hold-last I/Q
    (attic2/comb-pal.cxx:400-468)."""
    cavg = sum(c * k for c, k in zip(clps, ks)) / 2.0
    cavg = jnp.where(invert_col[:, None], cavg, -cavg)
    h = jnp.arange(L_X)[None, :]
    phase = h % 4
    si_val = jnp.where(phase == 0, cavg, jnp.where(phase == 2, -cavg, 0.0))
    sq_val = jnp.where(phase == 1, -cavg, jnp.where(phase == 3, cavg, 0.0))
    prev = lambda x: jnp.pad(x, ((0, 0), (1, 0)))[:, :-1]
    si = jnp.where((phase == 0) | (phase == 2), si_val, prev(si_val))
    sq = jnp.where((phase == 1) | (phase == 3), sq_val, prev(sq_val))
    mask = _rows(24, L_Y) & _cols(4, L_X - 4)
    return (jnp.where(mask, raw, 0.0), jnp.where(mask, si, 0.0),
            jnp.where(mask, sq, 0.0))


def _adjust_y(y, i, q, invert_col):
    """Remove chroma from luma, shifting YIQ left by 2
    (attic2/comb-pal.cxx:790-817; firstline=32)."""
    h = jnp.arange(L_X)[None, :]
    phase = h % 4
    shf = lambda x: jnp.pad(x, ((0, 0), (0, 2)))[:, 2:]
    y2, i2, q2 = shf(y), shf(i), shf(q)
    comp = jnp.where(phase == 0, i2,
                     jnp.where(phase == 1, -q2,
                               jnp.where(phase == 2, -i2, q2)))
    comp = jnp.where(invert_col[:, None], -comp, comp)
    mask = _rows(LINEOFFSET, L_Y) & _cols(2, L_X)
    return (jnp.where(mask, y2 + comp, y),
            jnp.where(mask, i2, i),
            jnp.where(mask, q2, q))


def _do_ynr(y, nr_y_ire):
    """Luma coring NR (attic2/comb-pal.cxx:511-539): highpass fed from
    h=40, core at hp[h+12], rows from firstline=32."""
    from ld_decode_tpu.comb.comb_ntsc import FILTERS
    if nr_y_ire <= 0:
        return y
    nr = nr_y_ire * IRESCALE
    xm = jnp.where(_cols(40, L_X), y, 0.0)
    b = jnp.asarray(FILTERS['nr'], xm.dtype)
    hp = jax.vmap(lambda row: jnp.convolve(row, b, mode='full',
                                           precision='highest')[:L_X])(xm)
    a = jnp.pad(hp, ((0, 0), (0, 12)))[:, 12:]
    a = jnp.clip(a, -nr, nr)
    mask = _rows(LINEOFFSET, L_Y) & _cols(40, L_X - 12)
    return jnp.where(mask, y - a, y)


def _to_rgb(y, u, v, cfg):
    """Per-line burst rotation + V-switch + YUV→RGB
    (attic2/comb-pal.cxx:541-648).  burstlev is hardcoded 8 so the AGC
    gain is the constant 10/8."""
    # burst angle per line from the demodulated burst, h 25..54
    bu = jnp.sum(u[:, 25:55], axis=1)
    bv = jnp.sum(v[:, 25:55], axis=1)
    angle = jnp.degrees(jnp.arctan2(bv, bu))          # (610,)

    # 4-line phase vote (attic2/comb-pal.cxx:566-573): l = 20,24,..,<606
    ls = jnp.arange(20, L_Y - 4, 4)
    votes = jnp.abs(angle[ls + 1] - angle[ls]) < 20
    phase = jnp.sum(votes) > (ls.shape[0] // 2)

    adj = jnp.radians(135.0 - angle)[:, None]
    mag = jnp.sqrt(u * u + v * v)
    th = jnp.arctan2(v, u) + adj
    gain = 10.0 / 8.0
    ug = jnp.cos(th) * mag * gain
    vg = jnp.sin(th) * mag * gain

    l = jnp.arange(L_Y)[:, None]
    rot = l % 4
    flip = (rot == 1) | (rot == 2)
    flip = jnp.where(phase, ~flip, flip)
    uf = jnp.where(flip, -vg, ug)
    vf = jnp.where(flip, -ug, vg)

    rows = slice(LINEOFFSET, LINEOFFSET + LINESOUT)   # l < in_y-2 → 576 rows
    yv, uv_, vv_ = y[rows], uf[rows] / IRESCALE, vf[rows] / IRESCALE
    y_ire = jnp.where(yv == 0, -100.0, yv / IRESCALE + IRE_OFFSET)
    y2 = (y_ire - cfg.black_ire) * (100.0 / (100.0 - cfg.black_ire))
    r = y2 + 1.13983 * vv_
    g = y2 - 0.58060 * vv_ - 0.39465 * uv_
    b = y2 + 2.032 * uv_
    m = cfg.brightness * 255 / 100
    rgb = jnp.clip(jnp.stack([r, g, b], axis=-1) * m, 0, 65535)
    return rgb.astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=('cfg',))
def comb_pal_legacy_frame(raw_u16, cfg: LegacyPALConfig):
    """One 1052x610 rawbuffer → (576, 1052, 3) uint16 RGB (pre-crop)."""
    raw = raw_u16.astype(jnp.float32)
    invert_col = raw_u16[:, 0] == 16384

    clp0 = _split1d(raw)
    if cfg.dim >= 2:
        clp1, k1, k0 = _split2d(clp0, cfg.adaptive2d)
    else:
        clp1 = jnp.zeros_like(raw)
        k1 = jnp.zeros_like(raw)
        k0 = jnp.where(_rows(24, L_Y) & _cols(4, L_X - 4), 1.0, 0.0)
    y, i, q = _split_iq(raw, (clp1, clp0), (k1, k0), invert_col)
    y, i, q = _adjust_y(y, i, q, invert_col)
    if cfg.bw:
        i = jnp.zeros_like(i)
        q = jnp.zeros_like(q)
    y = _do_ynr(y, cfg.nr_y)
    return _to_rgb(y, i, q, cfg)


class LegacyPALComb:
    """Frame driver mirroring Process/PostProcess
    (attic2/comb-pal.cxx:820-917).  dim=3 runs the 2D chain on the
    one-frame-old slot (Split3D is #if 0'd out), so the first output of
    a dim-3 run is the all-zero primer frame, exactly like the binary."""

    def __init__(self, cfg: LegacyPALConfig = LegacyPALConfig()):
        self.cfg = cfg
        self._prev = np.zeros((L_Y, L_X), np.uint16)

    def process(self, framebuf: np.ndarray) -> np.ndarray:
        frame = np.asarray(framebuf).reshape(L_Y, L_X).astype(np.uint16)
        if self.cfg.dim >= 3:
            work, self._prev = self._prev, frame
        else:
            work = frame
        rgb = np.asarray(comb_pal_legacy_frame(jnp.asarray(work), self.cfg))
        if not self.cfg.wide:
            rgb = rgb[:, CROP_X0:CROP_X0 + CROP_W]
        return rgb
