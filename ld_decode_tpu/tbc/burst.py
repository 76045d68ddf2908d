"""NTSC colorburst phase refinement (device side).

Vectorizes the reference's per-line burst zero-crossing walk
(reference lddecode_core.py:1054-1133 `refine_linelocs_burst`):
each line's scaled burst window (40 samples at 4*fsc covering ~0.6-2.9 µs
after hsync) yields sub-sample zero crossings classified into
rising/falling groups; per-group means (with first/last chopped) give the
line's phase offset against the 4-sample subcarrier grid.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=('hz_ire', 'win0'))
def burst_phase_offsets(scaled_burst: jnp.ndarray, hz_ire: float,
                        win0: int = 20):
    """Per-line burst phase estimates from the downscaled burst channel.

    scaled_burst: (L, W) resampled demod_burst lines; the 40-sample burst
    window starts at column `win0`, whose absolute output-grid column must
    be 20 (= 0 mod 4) so phases stay on the 4fsc grid — callers passing a
    narrow resample starting at grid column 16 use win0=4.
    Returns (phase_even, phase_odd, burstlevel, level_ok, counts_ok):
      phase pair = the reference's per-line `phaseaverages` columns
      (group means after the odd/even 180-degree flip), burstlevel the
      peak magnitude, level_ok=False where the reference zeroes the level
      (rot spike / weak burst), counts_ok=False for <3 crossings per group
      (line keeps its level but contributes no phase).
    """
    L = scaled_burst.shape[0]
    ba = scaled_burst[:, win0:win0 + 40]
    ba = ba - jnp.mean(ba, axis=1, keepdims=True)
    level = jnp.max(jnp.abs(ba), axis=1)
    std = jnp.std(ba, axis=1)

    # rot-spike / weak-burst rejection (reference lddecode_core.py:1077-1079)
    level_ok = ((level / hz_ire) <= 30) & ((std / hz_ire) >= 3)

    a = ba[:, :-1]
    b = ba[:, 1:]
    crossing = (a * b) < 0
    # amplitude gate: the reference only walks from samples >0.6*level; at 4
    # samples/cycle the sample before or two before a genuine crossing is
    # near the peak.
    prev = jnp.pad(jnp.abs(ba), ((0, 0), (1, 0)))[:, :a.shape[1]]
    gate = jnp.maximum(jnp.abs(a), prev)
    crossing = crossing & (gate > 0.6 * level[:, None])

    i = jnp.arange(a.shape[1], dtype=scaled_burst.dtype)
    frac = a / jnp.where(a - b == 0, 1.0, a - b)
    zc = i[None, :] + frac

    # offset against the 4fsc grid: (zc mod 4) + 1, folded to [-0.5, 3.5)
    offset = zc - (jnp.floor(zc / 4) * 4 - 1)
    offset = jnp.where(offset > 3.5, offset - 4, offset)

    falling = a > 0          # sample before crossing positive -> falling edge
    rising = ~falling

    def group_mean(mask):
        mask = crossing & mask
        # chop the first and last crossing of each group
        # (reference lddecode_core.py:1102-1104)
        csum = jnp.cumsum(mask, axis=1)
        total = csum[:, -1:]
        keep = mask & (csum > 1) & (csum < total)
        cnt = jnp.sum(keep, axis=1)
        s = jnp.sum(jnp.where(keep, offset, 0.0), axis=1)
        mean = s / jnp.maximum(cnt, 1)
        return mean, jnp.sum(mask, axis=1)

    mean_fall, n_fall = group_mean(falling)
    mean_rise, n_rise = group_mean(rising)
    counts_ok = (n_fall >= 3) & (n_rise >= 3)

    # per-line 180-degree flip: odd lines swap the rising/falling roles
    # (reference lddecode_core.py:1106-1110)
    odd = (jnp.arange(L) % 2) == 1
    ph0 = jnp.where(odd, 2.0 - mean_rise, 2.0 - mean_fall)
    ph1 = jnp.where(odd, 2.0 - mean_fall, 2.0 - mean_rise)

    return ph0, ph1, level, level_ok, counts_ok
