"""Pallas TPU kernel: batched per-line cubic resample (the TBC downscale).

The finish-phase picture downscale (reference lddecode_core.py:789-812
`downscale` / lddutils.py:83-97 `scale`) is a per-line fractional-stride
resample: output sample k of line l reads the demodulated signal at
``start[l] + k * steplen[l] / W`` with a 4-tap Catmull-Rom kernel
(ld-decoder.h:218-225 `CubicInterpolate`).  As an XLA gather this is the
single hottest op of the whole field pipeline (~10 ns/tap — a general
gather from a ~1 MSa HBM array); this kernel restructures it for the VPU:

  * each grid step DMAs the 8 lines' input windows from HBM into VMEM.
    HBM DMA offsets must be tile-aligned, so windows are fetched as 32
    aligned (128-lane) rows and the per-line phase (line start mod 1024)
    is normalized afterwards with dynamic sublane+lane rolls;
  * output columns are processed in 128-lane tiles; after normalization
    the tile's source span is *static* (line-start fraction + wow drift
    stay inside a 64-lane margin), so the 4 interpolation taps become
    lane-local ``tpu.dynamic_gather`` shuffles (Mosaic gathers only
    within one 128-lane vreg — the 640-lane reach is a 5-way chunk
    select);
  * weights/positions are computed in-register; the wow amplitude
    correction is fused into the final multiply-accumulate.

Numerics match ``resample.downscale_lines_split`` exactly (same float32
ops) away from capture edges; edge clamping differs only inside the first/
last window of the capture, which no active picture line touches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8            # lines per grid step
LANE = 128
WROW = 32           # window rows per line (32 x 128 = 4096 samples)
WIN = WROW * LANE
ALIGN = 1024        # HBM DMA offset granularity (8 sublanes x 128 lanes)
MARGIN = 8          # samples kept before each line start after normalize
SRC = 640           # static per-tile source span (5 x 128 lanes):
                    # worst case = 127 (tile-base rounding) + 64 (margin)
                    # + 361 (tile span at step<2.82) + 17 (frac+drift+taps)
SPAN_ROWS = 224     # group-DMA rows: covers 8 consecutive lines' windows
                    # (1023 align + 7 x 2560 x 1.01 lines + 4096 window)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flat_roll_left(win, s):
    """Roll a (WROW, LANE) window left by `s` samples in raster order."""
    q = s // LANE
    r = s % LANE
    lq = pltpu.roll(win, (WROW - q % WROW) % WROW, axis=0)
    lq1 = pltpu.roll(win, (WROW - (q + 1) % WROW) % WROW, axis=0)
    c1 = pltpu.roll(lq, (LANE - r) % LANE, axis=1)
    c2 = pltpu.roll(lq1, (LANE - r) % LANE, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (WROW, LANE), 1)
    return jnp.where(lane < LANE - r, c1, c2)


def _kernel(ga_ref, rjl_ref, lfi_ref, lff_ref, st_ref, wow_ref, d_ref,
            o_ref, gwin_ref, sem, *, ntiles: int, outwidth: int,
            st_nom: float, rows_per: int, col0: int):
    p = pl.program_id(0)
    row0 = p * ROWS
    b = row0 // rows_per          # field index (rows_per % ROWS == 0)

    # ONE group DMA per grid step: the 8 lines are consecutive in the
    # stream, so a single SPAN_ROWS fetch covers all their windows
    # (per-line DMAs are latency-bound)
    ga = pl.multiple_of(ga_ref[p], ALIGN // LANE)
    cp = pltpu.make_async_copy(d_ref.at[b, pl.ds(ga, SPAN_ROWS), :],
                               gwin_ref, sem)
    cp.start()

    lff = jnp.stack([lff_ref[row0 + j] for j in range(ROWS)])     # (8,)
    st = jnp.stack([st_ref[row0 + j] for j in range(ROWS)])       # (8,)
    wow = jnp.stack([wow_ref[row0 + j] for j in range(ROWS)])     # (8,)

    cp.wait()
    norm = []
    for j in range(ROWS):
        rjl = pl.multiple_of(rjl_ref[row0 + j], ALIGN // LANE)
        win = gwin_ref[pl.ds(rjl, WROW), :]
        # shift the line start (local index lfi) down to position MARGIN
        norm.append(_flat_roll_left(win, lfi_ref[row0 + j] - MARGIN))

    # line-major row stacks, built once: rows_all[c] = (ROWS, LANE) with
    # sublane j = samples [c*128, c*128+128) of line j's normalized window
    rows_all = [jnp.stack([norm[j][c] for j in range(ROWS)])
                for c in range(WROW)]

    for t in range(ntiles):
        k0 = col0 + t * LANE
        k = (k0 + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANE), 1)
             ).astype(jnp.float32)
        # same float32 op order as resample.downscale_lines_split:
        # rel = frac + steplen * (k / W); only the integer MARGIN offset
        # differs (added to the int index), so results match bit-exactly
        rel = lff[:, None] + st[:, None] * (k / np.float32(outwidth))
        relf = jnp.floor(rel)
        tt = rel - relf
        i0 = MARGIN + relf.astype(jnp.int32)

        t2 = tt * tt
        t3 = t2 * tt
        w0 = -0.5 * t3 + t2 - 0.5 * tt
        w1 = 1.5 * t3 - 2.5 * t2 + 1.0
        w2 = -1.5 * t3 + 2.0 * t2 + 0.5 * tt
        w3 = 0.5 * t3 - 0.5 * t2

        # static source chunks: nominal position +- 64-lane slack absorbs
        # the sub-sample fraction (<1) and wow drift (<16)
        nom = MARGIN + int(np.floor(k0 * st_nom / outwidth))
        c0 = min(max((nom - 64) // LANE, 0), WROW - SRC // LANE)
        a_t = c0 * LANE
        chunks = rows_all[c0:c0 + SRC // LANE]                    # (8,128) x5

        ixl = i0 - a_t
        acc = jnp.zeros((ROWS, LANE), jnp.float32)
        for tap, wt in ((-1, w0), (0, w1), (1, w2), (2, w3)):
            ixt = jnp.clip(ixl + tap, 0, SRC - 1)
            g = jnp.zeros((ROWS, LANE), jnp.float32)
            for c, Sc in enumerate(chunks):
                idx_c = jnp.clip(ixt - c * LANE, 0, LANE - 1)
                gc = jnp.take_along_axis(Sc, idx_c, axis=1,
                                         mode='promise_in_bounds')
                g = jnp.where((ixt >= c * LANE) & (ixt < (c + 1) * LANE),
                              gc, g)
            acc = acc + wt * g
        o_ref[:, t * LANE:(t + 1) * LANE] = acc * wow[:, None]


@functools.partial(jax.jit,
                   static_argnames=('outwidth', 'nlines', 'st_nom',
                                    'interpret', 'col0', 'ncols'))
def resample_lines_batch(data: jnp.ndarray, lli: jnp.ndarray,
                         llf: jnp.ndarray, outwidth: int, nlines: int,
                         st_nom: float, interpret: bool = False,
                         col0: int = 0, ncols: int = None
                         ) -> jnp.ndarray:
    """Batched cubic line resample on the TPU VPU.

    data: (B, nsamp) float32 demod streams.
    lli/llf: (B, >=nlines+1) split line locations (int32 anchor, f32 frac).
    outwidth: output samples per line (910/1135); st_nom: nominal line
    length in input samples (static, for tile window placement).
    col0/ncols restrict output to columns [col0, col0+ncols) of the
    nominal grid (the burst refiner's 48-column window) with the same
    f32 op order as the full resample.
    Returns (B, nlines, ncols or outwidth) float32, wow-corrected —
    identical semantics to vmapped ``downscale_lines_split(..., wow,
    col0, ncols)``.
    """
    B, nsamp = data.shape
    si = lli[:, :nlines]
    sf = llf[:, :nlines]
    steplen = (lli[:, 1:nlines + 1] - si).astype(jnp.float32) \
        + (llf[:, 1:nlines + 1] - sf)

    rows_per = _round_up(nlines, ROWS)
    rows = B * rows_per

    nsamp_p = max(_round_up(nsamp, ALIGN), SPAN_ROWS * LANE)
    if nsamp_p != nsamp:
        data = jnp.pad(data, ((0, 0), (0, nsamp_p - nsamp)))
    data3 = data.reshape(B, nsamp_p // LANE, LANE)

    # per-line aligned window anchors, clipped into the stream
    anchor = jnp.clip((si - MARGIN) // ALIGN * ALIGN, 0, nsamp_p - WIN)
    lf = si - anchor                                    # int, [0, ALIGN)
    wow = steplen / np.float32(st_nom)

    def padrows(x, fill, dtype):
        return jnp.pad(x, ((0, 0), (0, rows_per - nlines)),
                       constant_values=fill).reshape(rows).astype(dtype)

    anchor_f = padrows(anchor, 0, jnp.int32)
    lfi_f = padrows(lf, MARGIN, jnp.int32)
    lff_f = padrows(sf, 0.0, jnp.float32)
    st_f = padrows(steplen, float(st_nom), jnp.float32)
    wow_f = padrows(wow, 1.0, jnp.float32)

    # group anchors (one DMA per 8-line grid step) + per-line row offsets
    # into the group window
    ngroups = rows // ROWS
    ganchor = jnp.clip(anchor_f.reshape(ngroups, ROWS)[:, 0], 0,
                       nsamp_p - SPAN_ROWS * LANE)
    ga_f = (ganchor // LANE).astype(jnp.int32)                   # (ngroups,)
    rjl = (anchor_f - jnp.repeat(ganchor, ROWS)) // LANE
    rjl_f = jnp.clip(rjl, 0, SPAN_ROWS - WROW).astype(jnp.int32)

    if ncols is None:
        ncols = outwidth
    ntiles = _round_up(ncols, LANE) // LANE
    wpad = ntiles * LANE

    out = pl.pallas_call(
        functools.partial(_kernel, ntiles=ntiles, outwidth=outwidth,
                          st_nom=float(st_nom), rows_per=rows_per,
                          col0=col0),
        out_shape=jax.ShapeDtypeStruct((rows, wpad), jnp.float32),
        grid=(ngroups,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((ROWS, wpad), lambda p: (p, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SPAN_ROWS, LANE), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(ga_f, rjl_f, lfi_f, lff_f, st_f, wow_f, data3)

    return out.reshape(B, rows_per, wpad)[:, :nlines, :ncols]
