"""Sync-pulse detection and zero-crossing kernels (device side).

The reference walks the filtered sync channel with a data-dependent Python
while-loop (reference lddecode_core.py:497-516 `get_syncpeaks`) and refines
line locations with per-line scalar zero-crossing searches
(lddecode_core.py:715-787, lddutils.py:265-303 `calczc`).  Here both are
fixed-shape data-parallel programs: non-maximum suppression over a windowed
maximum for peak finding, and batched gather + first-true-index searches for
zero crossings.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_PEAKS = 1024


def sliding_max(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Centered sliding maximum over +-radius, via the van Herk/Gil-Werman
    two-pass trick: O(n) with block cummax instead of an O(n*w) window
    reduction (XLA reduce_window is pathological for w~2000)."""
    L = 2 * radius + 1
    n = x.shape[0]
    neg = jnp.array(-jnp.inf, x.dtype)
    xp = jnp.pad(x, (radius, radius), constant_values=-jnp.inf)
    m = xp.shape[0]
    nb = -(-m // L)
    xb = jnp.pad(xp, (0, nb * L - m), constant_values=-jnp.inf).reshape(nb, L)
    pre = jax.lax.cummax(xb, axis=1)
    suf = jnp.flip(jax.lax.cummax(jnp.flip(xb, 1), axis=1), 1)
    s = suf.reshape(-1)
    p = jnp.pad(pre.reshape(-1), (0, L), constant_values=-jnp.inf)
    # window starting at padded index i covers [i, i+L-1]
    starts = jnp.arange(n)
    return jnp.maximum(s[:n], p[L - 1:L - 1 + n])


@functools.partial(jax.jit, static_argnames=('window', 'threshold'))
def find_sync_peaks(ds: jnp.ndarray, window: int,
                    threshold: float = 0.2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Local maxima of the filtered sync channel.

    A sample is a peak if it equals the running max over +-window samples,
    exceeds `threshold`, and strictly rises from its left neighbor (plateau
    tie-break: first sample wins).  `window` must be smaller than the
    half-line pulse spacing and larger than a pulse width; the reference's
    sequential skip of 0.4*linelen (lddecode_core.py:512) implies the same
    constraint.

    The sparse indices are compacted hierarchically: top-2 peak positions
    per block of BL <= window samples, then a cumsum over per-block counts
    and one tiny scatter.  (jnp.nonzero(size=...) lowers to a full sort of
    the sample axis on TPU — 13x slower at demod scale.)  Two peaks can
    share a block only when they are exactly equal valued (each must equal
    the sliding max over a window that covers both), so top-2 per block is
    lossless short of >=3 bit-identical maxima within BL samples.

    Returns (idx, val): int32 indices padded with -1, and the peak values.
    """
    n = ds.shape[0]
    wmax = sliding_max(ds, window)
    left = jnp.concatenate([jnp.array([-jnp.inf], ds.dtype), ds[:-1]])
    is_peak = (ds >= wmax) & (ds > threshold) & (ds > left)

    BL = min(512, window)
    nb = -(-n // BL)
    mp = jnp.pad(is_peak, (0, nb * BL - n)).reshape(nb, BL)
    ar = jnp.arange(BL, dtype=jnp.int32)
    i1 = jnp.argmax(mp, axis=1).astype(jnp.int32)
    has1 = jnp.any(mp, axis=1)
    mp2 = mp & (ar[None, :] > i1[:, None])
    i2 = jnp.argmax(mp2, axis=1).astype(jnp.int32)
    has2 = jnp.any(mp2, axis=1)

    cnt = has1.astype(jnp.int32) + has2.astype(jnp.int32)
    off = jnp.cumsum(cnt) - cnt
    base = jnp.arange(nb, dtype=jnp.int32) * BL
    idxs = jnp.stack([base + i1, base + i2], axis=1).reshape(-1)
    pos = jnp.stack([off, off + 1], axis=1).reshape(-1)
    ok = jnp.stack([has1, has2], axis=1).reshape(-1)
    pos = jnp.where(ok & (pos < MAX_PEAKS), pos, MAX_PEAKS)
    idx = jnp.full(MAX_PEAKS + 1, -1, jnp.int32
                   ).at[pos].set(idxs, mode='drop')[:MAX_PEAKS]
    val = jnp.where(idx >= 0, ds[jnp.maximum(idx, 0)], 0.0)
    return idx, val


def first_crossing(rows: jnp.ndarray, target, rising: jnp.ndarray):
    """Vectorized `calczc` core (reference lddutils.py:265-303).

    rows: (L, W+1) windows where rows[:, j] = data[start-1+j]; the search
    begins at data[start] == rows[:, 1].  rising: (L,) bool, per-row edge
    direction.  Returns (zc, found): zc is the sub-sample crossing offset
    relative to `start` (can be -1 < zc < W-1), found is False when no
    crossing exists in the window (reference returns None).
    """
    target = jnp.asarray(target)
    tcol = target[:, None] if target.ndim == 1 else target
    body = rows[:, 1:]
    cond = jnp.where(rising[:, None], body >= tcol, body <= tcol)
    found = jnp.any(cond, axis=1)
    fidx = jnp.argmax(cond, axis=1)                      # first True
    # crossing between rows[:, fidx] (=data[x-1]) and rows[:, fidx+1] (=data[x])
    a = jnp.take_along_axis(rows, fidx[:, None], axis=1)[:, 0] - target
    b = jnp.take_along_axis(rows, fidx[:, None] + 1, axis=1)[:, 0] - target
    y = a / jnp.where(a - b == 0, 1.0, a - b)            # -a / (-a + b)
    zc = fidx - 1 + y
    return zc, found


def gather_windows(data: jnp.ndarray, starts: jnp.ndarray, width: int):
    """(L,) int starts -> (L, width) windows data[start + 0..width-1],
    clamped to the array bounds.

    Lowered as a slice-style `lax.gather` (one `width`-wide slice per
    start): measured 2.6x faster on TPU than the equivalent elementwise
    advanced-indexing gather for the hsync refiner's 402-sample windows,
    with identical results."""
    starts = jnp.clip(starts, 0, data.shape[0] - width)
    return jax.lax.gather(
        data, starts[:, None],
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(),
            start_index_map=(0,)),
        slice_sizes=(width,), mode='clip')


@functools.partial(jax.jit, static_argnames=('freq', 'ire_m20', 'ire_m60',
                                             'ire_p20', 'ire_p100', 'ire_m10',
                                             'ire_p10'))
def refine_hsync_zc(demod_05: jnp.ndarray, starts: jnp.ndarray,
                    freq: int, ire_m20: float, ire_m60: float, ire_p20: float,
                    ire_p100: float, ire_m10: float, ire_p10: float):
    """Vectorized hsync-end refinement (reference lddecode_core.py:715-767).

    For each line start (already adjusted -200 for the first lines by the
    host), find the -20 IRE crossing within 400 samples, run the reference's
    rot/wow sanity checks on the surrounding windows, and compute the
    mid-level re-crossing zc2.

    Returns (starts_i, zc_rel, refined_rel, bad, found): sub-sample positions
    are RELATIVE to the clipped integer starts (absolute float32 positions
    cannot hold sub-sample precision at ~1e6 samples); callers reconstruct
    absolute locations in float64 (host) or split int+frac form (device).
    """
    n = demod_05.shape[0]
    starts_i = jnp.clip(starts.astype(jnp.int32), 1, n - 402)

    rows = gather_windows(demod_05, starts_i - 1, 402)
    rising = rows[:, 1] < ire_m20
    zc_rel, found = first_crossing(rows, ire_m20, rising)
    zc_i = jnp.clip(starts_i + jnp.floor(zc_rel).astype(jnp.int32), 0, n - 1)

    # sanity windows (reference lddecode_core.py:737-743)
    w_hsync1 = gather_windows(demod_05, starts_i - 2 * freq, 4 * freq)
    w_hsync = gather_windows(demod_05, zc_i - 1 * freq, 4 * freq)
    # the burst window [zc+f, zc+3f) is the tail half of w_hsync
    # [zc-f, zc+3f) — reuse it instead of a third gather.  Clipping
    # analysis of the reuse (gather_windows clamps starts to
    # [0, n-width]): at the TAIL, the 4f window clamps iff
    # zc > n-3f, but then a dedicated 2f burst gather would clamp to
    # the same samples (zc+f >= n-2f), so the halves never diverge.
    # At the HEAD, the windows diverge iff zc_i < f (~1 us from the
    # buffer start): the 4f window clamps to 0 while a dedicated
    # burst gather would start at zc+f.  No framer-locked window
    # produces that — line 0 sits >= cfg.blockcut (= half the
    # overlap-save block) plus the vsync region into the decode
    # window, orders of magnitude beyond f — and these windows feed
    # only the bad-line range heuristic, so a degenerate unlocked
    # window at worst flags the line bad (the safe direction).
    w_burst = w_hsync[:, 2 * freq:4 * freq]

    bad_range = (
        (jnp.min(w_hsync, axis=1) < ire_m60) | (jnp.max(w_hsync, axis=1) > ire_p20)
        | (jnp.min(w_hsync1, axis=1) < ire_m60) | (jnp.max(w_hsync1, axis=1) > ire_p100)
        | (jnp.min(w_burst, axis=1) < ire_m10) | (jnp.max(w_burst, axis=1) > ire_p10)
    )

    # wow correction: re-cross at the mid level of the local low/high means
    # (reference lddecode_core.py:746-758)
    low = jnp.mean(w_hsync[:, 0:20], axis=1)
    high = jnp.mean(w_hsync[:, 100:120], axis=1)
    mid = (low + high) / 2
    rising2 = w_hsync[:, 0] < mid
    rows2 = jnp.concatenate([w_hsync[:, :1], w_hsync], axis=1)  # x-1 pad at 0
    zc2_rel, found2 = first_crossing(rows2, mid, rising2)
    # reference calczc returns None for a crossing at the very first sample
    found2 = found2 & (zc2_rel > 0)
    # express zc2 relative to starts_i, like zc_rel
    zc2r = zc2_rel + (zc_i - 1 * freq - starts_i).astype(zc2_rel.dtype)
    zc2_ok = found2 & (jnp.abs(zc2r - zc_rel) < freq / 4)

    refined_rel = jnp.where(zc2_ok & ~bad_range, zc2r, zc_rel)
    bad = ~found | bad_range | (~zc2_ok & ~bad_range)
    # per the reference, a failed zc2 (outside freq/4) marks the line bad but
    # keeps zc; a bad_range line keeps zc and is marked bad.
    return starts_i, zc_rel, refined_rel, bad, found
