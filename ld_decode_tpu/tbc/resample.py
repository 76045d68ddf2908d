"""Batched line resampling onto the 4*fsc output grid (device side).

The reference resamples each scan line with a scipy cubic B-spline fit per
line (reference lddecode_core.py:789-812 `downscale`, lddutils.py:83-97
`scale`).  Here all lines of a field are resampled in one batched
cubic-convolution (Catmull-Rom) gather — the same kernel the reference's C++
TBC uses (`CubicInterpolate`, ld-decoder.h:218-225).  Catmull-Rom vs
interpolating B-spline differs only in out-of-band ringing behavior; parity
with the Python reference is held to a PSNR budget rather than sample
exactness (BASELINE.md: 0.5 dB on filtered paths).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def catmull_rom_weights(t: jnp.ndarray):
    """Keys cubic-convolution weights (a=-0.5) for the 4-tap neighborhood."""
    t2 = t * t
    t3 = t2 * t
    w0 = -0.5 * t3 + t2 - 0.5 * t
    w1 = 1.5 * t3 - 2.5 * t2 + 1.0
    w2 = -1.5 * t3 + 2.0 * t2 + 0.5 * t
    w3 = 0.5 * t3 - 0.5 * t2
    return w0, w1, w2, w3


def cubic_gather(data: jnp.ndarray, i0: jnp.ndarray,
                 t: jnp.ndarray) -> jnp.ndarray:
    """4-tap cubic interpolation at integer indices i0 + fraction t."""
    n = data.shape[0]
    i0 = jnp.clip(i0, 1, n - 3)
    w0, w1, w2, w3 = catmull_rom_weights(t.astype(data.dtype))
    return (w0 * data[i0 - 1] + w1 * data[i0]
            + w2 * data[i0 + 1] + w3 * data[i0 + 2])


def sample_cubic(data: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Cubic interpolation of 1-D `data` at fractional positions `pos`
    (any shape).  Positions are clamped to the valid interior."""
    pos = jnp.clip(pos, 1.0, data.shape[0] - 3.0)
    i0 = jnp.floor(pos).astype(jnp.int32)
    return cubic_gather(data, i0, pos - i0)


@functools.partial(jax.jit, static_argnames=('outwidth', 'nlines'))
def downscale_lines(data: jnp.ndarray, lineinfo: jnp.ndarray,
                    outwidth: int, nlines: int,
                    wow_scale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Resample `nlines` scan lines onto `outwidth` samples each.

    lineinfo: (nlines+1,) float sample locations of line starts; output
    sample k of line l is data interpolated at
    lineinfo[l] + k*(lineinfo[l+1]-lineinfo[l])/outwidth
    (reference lddutils.py:93-96 evaluation grid).

    wow_scale: optional (nlines,) per-line amplitude correction
    (reference lddecode_core.py:803-805: (len/nominal) wow factor).
    Returns (nlines, outwidth).
    """
    starts = lineinfo[:nlines]
    ends = lineinfo[1:nlines + 1]
    k = jnp.arange(outwidth, dtype=data.dtype)
    pos = starts[:, None] + (ends - starts)[:, None] * (k[None, :] / outwidth)
    out = sample_cubic(data, pos)
    if wow_scale is not None:
        out = out * wow_scale[:, None]
    return out


@functools.partial(jax.jit, static_argnames=('outwidth', 'nlines', 'col0',
                                             'ncols'))
def downscale_lines_split(data: jnp.ndarray, lli: jnp.ndarray,
                          llf: jnp.ndarray, outwidth: int, nlines: int,
                          wow_scale: Optional[jnp.ndarray] = None,
                          col0: int = 0, ncols: Optional[int] = None
                          ) -> jnp.ndarray:
    """downscale_lines with (int32 anchor, float32 offset) line locations.

    float32 absolute positions only resolve 1/16 sample at ~1e6; splitting
    keeps sub-sample precision (chroma phase needs ~1e-3 samples).

    col0/ncols restrict output to columns [col0, col0+ncols) of the
    nominal `outwidth` grid (positions are identical to slicing the full
    resample) — the burst refiner only reads a 48-column window, and the
    full-width gather would dominate the whole finish phase.
    """
    si = lli[:nlines]
    sf = llf[:nlines]
    steplen = (lli[1:nlines + 1] - si).astype(jnp.float32) \
        + (llf[1:nlines + 1] - sf)
    if ncols is None:
        ncols = outwidth
    k = jnp.arange(col0, col0 + ncols, dtype=jnp.float32)
    rel = sf[:, None] + steplen[:, None] * (k[None, :] / outwidth)
    relf = jnp.floor(rel)
    i0 = si[:, None] + relf.astype(jnp.int32)
    out = cubic_gather(data, i0, rel - relf)
    if wow_scale is not None:
        out = out * wow_scale[:, None]
    return out
