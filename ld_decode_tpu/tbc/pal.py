"""PAL pilot-burst TBC refinement (device side).

Vectorizes the reference's per-line pilot zero-crossing walk
(reference lddecode_core.py:962-1021 `refine_linelocs_pilot`): each line's
pilot signal (demod minus its 0.5 MHz low-pass, over the 4.7 µs window
before the hsync end, reversed) yields sub-sample zero crossings; their
fractional phase against the wow-adjusted 3.75 MHz grid gives per-line
offsets whose medians drive the alignment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PILOT_W = 188           # usectoinpx(4.7) at 40 MSa/s


def _masked_median(x, mask):
    nan = jnp.float32(jnp.nan)
    return jnp.nanmedian(jnp.where(mask, x, nan))


def _masked_median_rows(x, mask):
    nan = jnp.float32(jnp.nan)
    return jnp.nanmedian(jnp.where(mask, x, nan), axis=1)


def pilot_offsets(demod: jnp.ndarray, demod05: jnp.ndarray,
                  lli: jnp.ndarray, llf: jnp.ndarray,
                  linelen: int, freq: float, pilot_mhz: float = 3.75):
    """Per-line pilot phase offsets (reference lddecode_core.py:972-1006).

    Returns (frac (L, W-1), valid_crossing mask, adj_possible mask).
    """
    from ld_decode_tpu.tbc.sync import gather_windows
    n = demod.shape[0]
    L = lli.shape[0]
    w0 = jnp.clip(lli - PILOT_W, 0, n - PILOT_W)
    # slice-style window gathers (2.6x the elementwise form, see
    # sync.gather_windows)
    pilot = gather_windows(demod, w0, PILOT_W) \
        - gather_windows(demod05, w0, PILOT_W)
    pilot = jnp.flip(pilot, axis=1)

    a = pilot[:, :-1]
    b = pilot[:, 1:]
    crossing = (a < 0) & (b >= 0)       # rising zero crossings
    # trigger gate: the reference walks from samples in (-300k, -100k);
    # at ~10.7 samples/cycle one of the 3 samples before a genuine rising
    # crossing lies in that window
    inr = (pilot > -300000.0) & (pilot < -100000.0)
    g0 = inr[:, :-1]
    g1 = jnp.pad(inr, ((0, 0), (1, 0)))[:, :-2]
    g2 = jnp.pad(inr, ((0, 0), (2, 0)))[:, :-3]
    g1 = jnp.pad(g1, ((0, 0), (0, 1)))[:, :g0.shape[1]]
    g2 = jnp.pad(g2, ((0, 0), (0, 2)))[:, :g0.shape[1]]
    crossing = crossing & (g0 | g1 | g2)

    i = jnp.arange(a.shape[1], dtype=jnp.float32)
    zc = i[None, :] + a / jnp.where(a - b == 0, 1.0, a - b)

    # wow-adjusted sample rate (reference lddecode_core.py:981-983)
    gaps = (lli - jnp.roll(lli, 1)).astype(jnp.float32) \
        + (llf - jnp.roll(llf, 1))
    adjfreq = jnp.where(jnp.arange(L) > 1,
                        freq / (gaps / linelen), freq)
    zcp = zc / (adjfreq[:, None] / pilot_mhz)
    frac = zcp - jnp.floor(zcp)
    return frac, crossing


def _refine_pilot_once(demod, demod05, lli, llf, linelen: int,
                       freq: float, relative_only: bool):
    """One damped pilot-alignment pass.

    relative_only=False is the reference's pass verbatim, INCLUDING
    its global phase shift toward tgt (lddecode_core.py:996-1006) —
    the oracle framing depends on it.  relative_only=True removes the
    per-line deviation around the lines' common phase WITHOUT moving
    the global position (used by the extra convergence passes: fully
    converging onto the pilot's absolute phase shifted the whole
    picture ~2.2 samples vs the reference framing)."""
    L = lli.shape[0]
    frac, crossing = pilot_offsets(demod, demod05, lli, llf, linelen, freq)

    # trim first/last crossing per line for l >= 2
    csum = jnp.cumsum(crossing, axis=1)
    total = csum[:, -1:]
    trimmed = crossing & (csum > 1) & (csum < total)
    l2 = (jnp.arange(L) >= 2)[:, None]
    use = jnp.where(l2, trimmed, crossing)

    global_med = _masked_median(frac, trimmed & l2)
    tgt = jnp.where((global_med >= 0.25) & (global_med <= 0.75), 0.5, 0.0)

    has = jnp.sum(use, axis=1) > 0
    if not relative_only:
        # the reference's pass verbatim: plain (non-circular) medians —
        # with tgt=0 and fracs near 1 this commands nearly a full-cycle
        # move, damped to a quarter; the oracle positions inherit
        # exactly that, so pass 1 must reproduce it
        line_med = _masked_median_rows(frac, use)
        adjustment = jnp.where(has, tgt - line_med, 0.0)
    else:
        # extra passes: circular deviation around the target (the
        # plain median breaks when fracs straddle the 0/1 wrap),
        # median-centred so only per-line jitter moves — the global
        # phase stays wherever the reference's pass put it
        dev = jnp.mod(frac - tgt + 0.5, 1.0) - 0.5
        line_dev = _masked_median_rows(dev, use)
        nanline = jnp.where(has, line_dev, jnp.float32(jnp.nan))
        line_dev = line_dev - jnp.nanmedian(nanline)
        adjustment = jnp.where(has, -line_dev, 0.0)
    adjustment = jnp.where(jnp.isnan(adjustment), 0.0, adjustment)

    llf2 = llf + adjustment * (freq / 3.75) * 0.25
    q = jnp.floor(llf2)
    return lli + q.astype(jnp.int32), llf2 - q


@functools.partial(jax.jit, static_argnames=('linelen', 'freq', 'passes'))
def refine_pilot(demod, demod05, lli, llf, linelen: int, freq: float,
                 passes: int = 1):
    """Apply the pilot alignment; returns adjusted (lli, llf).

    passes=1 (default) is the reference's single damped pass
    (lddecode_core.py:996-1006).  passes>1 iterates extra
    RELATIVE-only passes (pass 1 keeps the reference's global phase
    shift — the framing contract; extras are wrap-aware and
    median-centred).  Measured round 5 and left OFF: iterating drives
    the measured per-line pilot-phase scatter from 0.207 to 0.005
    input samples, but the PAL picture's noise floor and the RGB
    stream's shipped bytes do not move AT ALL — the "jitter" that
    converged was the zero-crossing median's own measurement noise,
    which extra passes merely imprint into the line positions
    (docs/PERF.md round-5 notes).  Kept as a knob because real
    (noisy) captures may have genuine jitter above the measurement
    floor."""
    for k in range(passes):
        lli, llf = _refine_pilot_once(demod, demod05, lli, llf,
                                      linelen, freq, relative_only=k > 0)
    return lli, llf
