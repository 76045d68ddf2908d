"""Pallas TPU kernel: fused 2D comb stencil chain.

Fuses Split1D -> adaptive Split2D -> SplitIQ -> AdjustY
(reference comb-ntsc.cxx:246-367, 414-483, 735-763) into a single pass:
each grid step holds a (8, 1024) row block plus its ±1 neighbor blocks in
VMEM, computes the ±2-sample / ±2-line chroma stencils with lane rolls
(no gathers), and writes Y/I/Q — one HBM round trip for the whole chain
instead of XLA's many intermediate (525, 910) buffers.

Column shifts use pltpu.roll (circular); every consumer masks columns to
the reference's 4..839 active window, so wraparound never leaks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ld_decode_tpu.comb.comb_ntsc import IRESCALE, IN_X, IN_Y

ROWS = 8
COLS = 1024          # 910 padded to the lane-tile multiple
NROWB = (IN_Y + ROWS - 1) // ROWS      # 66 row blocks (528 padded rows)


def _roll(x, shift):
    # pltpu.roll requires a non-negative shift; normalize circularly
    return pltpu.roll(x, shift % x.shape[1], axis=1)


def _kernel(raw_c, raw_u, raw_d, inv, y_out, i_out, q_out):
    bi = pl.program_id(0)

    # 24-row window: rows [8*bi-8, 8*bi+16)
    win = jnp.concatenate([raw_u[:], raw_c[:], raw_d[:]], axis=0)

    # --- Split1D: tc1 = ((x[h+2]+x[h-2])/2 - x[h]) on rows we need (±2),
    # masked to the reference's row/col window (rows 44.., cols 4..839) ---
    need = win[6:18]                      # rows [8bi-2, 8bi+10)
    nrow = (bi * ROWS - 2
            + jax.lax.broadcasted_iota(jnp.int32, (12, COLS), 0))
    ncol = jax.lax.broadcasted_iota(jnp.int32, (12, COLS), 1)
    tc0 = (_roll(need, -2) + _roll(need, 2)) * 0.5 - need
    clp0 = jnp.where((nrow >= 44) & (nrow < IN_Y)
                     & (ncol >= 4) & (ncol < 840), tc0, 0.0)

    c1 = clp0[2:10]                       # center rows
    p1 = clp0[0:8]                        # rows -2
    n1 = clp0[4:12]                       # rows +2
    raw = win[8:16]

    rowid = bi * ROWS + jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 0)
    colid = jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 1)

    # --- Split2D (comb-ntsc.cxx:294-367) ---
    ac, ap, an = jnp.abs(c1), jnp.abs(p1), jnp.abs(n1)
    acm1, apm1, anm1 = _roll(ac, 1), _roll(ap, 1), _roll(an, 1)
    kp = (jnp.abs(ac - ap) + jnp.abs(acm1 - apm1) - (ac + acm1) * .10) * 0.5
    kn = (jnp.abs(ac - an) + jnp.abs(acm1 - anm1) - (ac + anm1) * .10) * 0.5
    rng2d = 45.0 * IRESCALE
    kp = jnp.clip(1.0 - kp / rng2d, 0.0, 1.0)
    kn = jnp.clip(1.0 - kn / rng2d, 0.0, 1.0)

    both0 = (kp == 0.0) & (kn == 0.0)
    kp2 = jnp.where(kn > 3.0 * kp, 0.0, kp)
    kn2 = jnp.where(kp > 3.0 * kn, 0.0, kn)
    den = kn2 + kp2
    sc = jnp.where(den > 0, 2.0 / jnp.where(den > 0, den, 1.0), 1.0)
    sc = jnp.maximum(sc, 1.0)
    fb = (jnp.abs(ap - an) - jnp.abs((n1 + p1) * .2)) <= 0.0
    kp2 = jnp.where(both0, jnp.where(fb, 1.0, 0.0), kp2)
    kn2 = jnp.where(both0, jnp.where(fb, 1.0, 0.0), kn2)
    sc = jnp.where(both0, 1.0, sc)
    tc2 = ((c1 - p1) * kp2 * sc + (c1 - n1) * kn2 * sc) * 0.25

    inner = ((rowid >= 4) & (rowid < 524) & (colid >= 18) & (colid < 840))
    clp1 = jnp.where(inner, tc2, 0.0)
    combk1 = jnp.where(inner, 1.0, 0.0)

    outer = ((rowid >= 36) & (colid >= 4) & (colid < 840))
    base0 = jnp.where((rowid >= 44) & (colid >= 4) & (colid < 840), 1.0, 0.0)
    combk0 = jnp.where(outer, 1.0 - combk1, base0)

    # --- SplitIQ (comb-ntsc.cxx:414-483) ---
    invert = inv[:] > 0.5
    cavg = (clp1 * combk1 + c1 * combk0) * 0.5
    cavg = jnp.where(invert, cavg, -cavg)

    phase = colid % 4
    si_v = jnp.where(phase == 0, cavg, jnp.where(phase == 2, -cavg, 0.0))
    sq_v = jnp.where(phase == 1, -cavg, jnp.where(phase == 3, cavg, 0.0))
    si = jnp.where((phase % 2) == 0, si_v, _roll(si_v, 1))
    sq = jnp.where((phase % 2) == 1, sq_v, _roll(sq_v, 1))

    m36 = (rowid >= 36) & (colid >= 4) & (colid < 840)
    y = jnp.where(m36, raw, 0.0)
    iq_i = jnp.where(m36, si, 0.0)
    iq_q = jnp.where(m36, sq, 0.0)

    # --- AdjustY (comb-ntsc.cxx:735-763): shift left 2, add chroma back ---
    y2 = _roll(y, -2)
    i2 = _roll(iq_i, -2)
    q2 = _roll(iq_q, -2)
    comp = jnp.where(phase == 0, i2,
                     jnp.where(phase == 1, -q2,
                               jnp.where(phase == 2, -i2, q2)))
    comp = jnp.where(invert, -comp, comp)
    madj = (rowid >= 38) & (colid >= 2) & (colid < 842)
    y_out[:] = jnp.where(madj, y2 + comp, y)
    i_out[:] = jnp.where(madj, i2, iq_i)
    q_out[:] = jnp.where(madj, q2, iq_q)


@functools.partial(jax.jit, static_argnames=('interpret',))
def split_chain_2d(raw: jnp.ndarray, invert_col: jnp.ndarray,
                   interpret: bool = False):
    """raw: (525, 910) float32; invert_col: (525,) bool.
    Returns (y, i, q) as (525, 910) float32 (firstline=38 semantics)."""
    pad_r = NROWB * ROWS - IN_Y
    rawp = jnp.pad(raw.astype(jnp.float32), ((0, pad_r), (0, COLS - IN_X)))
    invp = jnp.pad(invert_col.astype(jnp.float32)[:, None],
                   ((0, pad_r), (0, COLS - 1)), mode='edge')

    nb = NROWB
    clamp = lambda i: jnp.clip(i, 0, nb - 1)
    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, COLS), lambda i: (clamp(i - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, COLS), lambda i: (clamp(i + 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
    )
    shape = jax.ShapeDtypeStruct((NROWB * ROWS, COLS), jnp.float32)
    y, i, q = pl.pallas_call(
        _kernel,
        out_shape=[shape, shape, shape],
        grid_spec=grid_spec,
        interpret=interpret,
    )(rawp, rawp, rawp, invp)
    return y[:IN_Y, :IN_X], i[:IN_Y, :IN_X], q[:IN_Y, :IN_X]