"""Fused device-side field pipeline (two round trips per field).

The sandbox TPU tunnel costs ~30 ms per host<->device round trip, so the
per-field decode is restructured into exactly two jitted calls:

  * `field_analyze`: dynamic-slice the device-resident capture, batched
    demod, sync-peak NMS -> one small packed transfer (peak list).
  * `field_finish`: hsync zero-crossing refinement (sequential bad-line
    propagation as a lax.scan), NTSC burst refinement x2 (neighbor repair as
    scans), color-phase offset, wow-corrected downscale + 16-bit scale +
    line-flag words, audio stage-2 + 48 kHz chase resample, VBI line-window
    gather -> ONE packed uint16 transfer.

Between the two calls the host runs the O(peaks) vsync/line-numbering logic
(reference semantics, see tbc/field.py).  All heavy arrays stay in HBM.

Parity: every step mirrors tbc/field.py's host/device split (which is
oracle-tested); tests/test_fused.py pins the two paths against each other.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ld_decode_tpu.ops import demod as D
from ld_decode_tpu.ops.filters import DemodBank
from ld_decode_tpu.tbc import sync as S
from ld_decode_tpu.tbc import resample as RS
from ld_decode_tpu.tbc import burst as B
from ld_decode_tpu.tbc import pal as PALK
from ld_decode_tpu.audio.stage2 import audio_stage2
from ld_decode_tpu.utils.params import DecoderConfig

PHILIPS_MARGIN = 16  # µs beyond one line gathered for the VBI slicer


def audio_maxt(cfg) -> int:
    """Fixed 48 kHz tick-buffer size > any field's tick count."""
    lc = cfg.sys.frame_lines // 2 + 1
    return int(np.ceil(cfg.sys.line_period * lc / 1e6 * 48000.0)) + 8


# ---------------------------------------------------------------------------
# split positions: float32 cannot hold absolute sample positions (~1e6) to
# sub-sample precision (1 ulp = 1/16 sample), which is fatal for chroma
# phase.  Line locations therefore travel as (int32 anchor, float32 offset)
# pairs; every update keeps the offset small and renormalizes.

def split_norm(i: jnp.ndarray, f: jnp.ndarray):
    q = jnp.floor(f)
    return (i + q.astype(jnp.int32), (f - q).astype(jnp.float32))


def split_sub(ai, af, bi, bf):
    """(a - b) as a plain float32 (valid when |a-b| is small)."""
    return (ai - bi).astype(jnp.float32) + (af - bf)


def chunked_scan(step, init, xs, chunk: int = 16):
    """lax.scan with `chunk` steps unrolled per scan iteration.

    The per-line repair recurrences scan ~270 tiny steps; on TPU the
    fixed per-iteration sequencing overhead dominates, so amortizing it
    16x is a large win.  The tail is zero-padded: padded outputs are
    sliced off and the final carry is NOT returned (callers here never
    use it; the padded steps would corrupt it)."""
    n = jax.tree_util.tree_leaves(xs)[0].shape[0]
    m = -(-n // chunk) * chunk
    xs_p = jax.tree_util.tree_map(
        lambda a: jnp.pad(a, [(0, m - n)] + [(0, 0)] * (a.ndim - 1)), xs)
    xs_c = jax.tree_util.tree_map(
        lambda a: a.reshape((m // chunk, chunk) + a.shape[1:]), xs_p)

    def cstep(carry, xc):
        outs = []
        for j in range(chunk):
            xj = jax.tree_util.tree_map(lambda a: a[j], xc)
            carry, o = step(carry, xj)
            outs.append(o)
        return carry, jax.tree_util.tree_map(lambda *ts: jnp.stack(ts),
                                             *outs)

    _, outs = jax.lax.scan(cstep, init, xs_c)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((m,) + a.shape[2:])[:n], outs)


# ---------------------------------------------------------------------------
# packing: many small outputs -> one uint16 buffer -> one D2H transfer

def _to_u16(x: jnp.ndarray) -> jnp.ndarray:
    if x.dtype == jnp.uint16:
        return x.reshape(-1)
    if x.dtype == jnp.int16:
        return jax.lax.bitcast_convert_type(x, jnp.uint16).reshape(-1)
    if x.dtype in (jnp.float32, jnp.int32, jnp.uint32):
        return jax.lax.bitcast_convert_type(x, jnp.uint16).reshape(-1)
    raise TypeError(f'cannot pack dtype {x.dtype}')


def pack_bundle(arrays: List[jnp.ndarray]) -> jnp.ndarray:
    return jnp.concatenate([_to_u16(a) for a in arrays])


# ---------------------------------------------------------------------------
# lossless picture codec: per-block bit-granular planes + Rice escape
#
# The axon tunnel's D2H link saturates near ~40 MB/s (collapsing to
# ~1 MB/s in bad weather) and the u16 picture is ~93% of every field
# bundle, so raw transfer caps end-to-end decode regardless of TPU
# speed.  The batched pipeline therefore ships the picture losslessly
# compressed, the rate adapted per 16-sample block (round-4 design;
# every choice below was rate-measured on REAL decoded fields with
# scripts/probe_codec_rate.py — synthetic pictures lie, see PERF.md):
#
#   transform  vertical delta against line l-k.  k=2 for NTSC (2 lines
#              = 455 subcarrier cycles exactly, so chroma/burst phase
#              matches; lddecode_core.py:56 linelen 910 = 227.5 cycles
#              x 4) and k=4 for PAL (4 lines = 1135 cycles).  Head
#              lines (l<k) carry a horizontal lag-1 delta of their raw
#              values instead.  (Round 3 ran a horizontal pass after
#              the vertical one; on real fields the residual is
#              fsc-band noise, nearly white along the line, and the
#              h-pass measured +0.015x raw — dropped.  A per-field
#              learned 15-tap multi-row predictor and a per-column
#              median profile were prototyped and measured useless:
#              +0.002x and -0.004x.)
#   residuals  mod-2^16, zigzag-mapped to 16-bit z; each 16-sample
#              BLOCK ships, per its own statistics, either
#                planes mode: the `b = bits(max z)` low one-bit planes
#                  (one u16 word per plane: 16 samples x 1 bit), or
#                rice mode: the k* low planes plus each sample's
#                  quotient q = z>>k* in unary (q zeros then a 1) on a
#                  per-field quotient bitstream, k* = argmin of the
#                  exact cost 16k + sum(q) + 16, used when that beats
#                  planes mode and fits CODEC_QCAP_BITS.
#              The 6-bit/block mode+count table rides the per-field
#              bundle.  (Bit-granular classes beat round 3's nibble
#              granularity by 0.06x; the Rice escape adds 0.023x; a
#              per-block min-subtraction escape measured +0.004x and
#              was dropped.)
#   compaction the used (field, plane, line, block) plane words of a
#              whole batch are gathered into ONE contiguous dense
#              buffer, the per-field quotient streams into a second,
#              and the host fetches only the USED PREFIX of each: the
#              transfer is sized by information content, per batch,
#              with no recompiles.  Plane capacity is all 16 planes, so
#              the codec is lossless with zero fallbacks for ALL
#              content; only bandwidth is content-dependent (measured:
#              real decoded ramp fields 0.52x raw, realistic-noise
#              fields 0.75x, flat fields 0.02x, white noise 1.02x
#              worst-case; round 3 shipped 0.60x/0.84x).
#
# The raw picture additionally stays device-resident per batch
# (`pic`), as a defensive fallback if a field's dense region were ever
# unavailable.

CODEC_BW = 16                     # block width in samples = bits per
                                  # plane word.  Real decoded fields
                                  # have ~100 high-residual samples per
                                  # line clustered in column regions
                                  # (sync edge, burst, blanking): per-
                                  # LINE classes get poisoned to 16
                                  # bits (measured 1.0x raw), 16-sample
                                  # blocks measure 0.55x on the same
                                  # fields.
CODEC_NPLANES = 16                # bit-granular plane classes
CODEC_QCAP_BITS = 64              # max quotient bits per rice block (at
                                  # the optimal k, sum(q) <= ~32, so the
                                  # bound almost never binds; it keeps
                                  # the stream capacity static at 4
                                  # words/block)

# cost matrix: sum_i(z_i >> k) = sum_{t>=k} 2^(t-k) * c_t where c_t is
# the block's count of samples with bit t set — so every Rice cost
# comes from one tiny constant matmul over the per-block bit counts.
_RICE_M = np.array([[1 << (t - k) if t >= k else 0 for t in range(16)]
                    for k in range(16)], np.int32)


def pic_codec_params(cfg: DecoderConfig):
    """(lines, width, padded width, words per compaction unit, lag)."""
    W = cfg.sys.outlinelen
    Wp = -(-W // CODEC_BW) * CODEC_BW
    L = max_linecount(cfg)
    k = 2 if cfg.system == 'NTSC' else 4
    return L, W, Wp, 1, k


def codec_cap_rows(cfg: DecoderConfig, batch: int) -> int:
    """Dense plane-buffer capacity in words: all 16 one-bit planes of
    every block, each plane prefix padded to the 32-word compaction
    unit (the worst case compact_planes can ship) — lossless with no
    overflow path; the host fetches only the used prefix, so capacity
    costs no bandwidth."""
    L, W, Wp, W4, k = pic_codec_params(cfg)
    N = L * (Wp // CODEC_BW)
    ncap = -(-N // _CODEC_UNIT) * _CODEC_UNIT
    return CODEC_NPLANES * ncap * batch


def codec_cap_words(nblocks: int, count: int = 1) -> int:
    """Dense plane-buffer capacity in words for `count` images of
    `nblocks` 16-sample blocks each: all 16 one-bit planes, each
    plane's prefix padded to the 32-word compaction unit (what
    compact_planes can ship in the worst case).  An UNROUNDED
    nblocks-multiple cap silently truncates the trailing units when
    nblocks % 32 != 0."""
    return CODEC_NPLANES * (-(-nblocks // _CODEC_UNIT) * _CODEC_UNIT) \
        * count


def codec_qcap_words(R: int, NB: int) -> int:
    """Per-image quotient-stream capacity in u16 words (multiple of the
    8-word compaction unit)."""
    return -(-R * NB * (CODEC_QCAP_BITS // 16) // 8) * 8


def _codec_residual(x: jnp.ndarray, k: int,
                    hpass: bool = False) -> jnp.ndarray:
    """(R, C) int image -> (R, C) zigzagged mod-2^16 residual.

    hpass=True adds a horizontal lag-1 pass over the body rows'
    vertical deltas (the 2D gradient predictor x-up-left+upleft): on
    the comb's RGB48 stream the vertical residual is horizontally
    bandlimited chroma leakage, and the extra pass measures 0.45x ->
    0.36x raw (scripts/probe_codec_rate.py rate_rgb); on the .tbc
    picture and 8-bit RGB it LOSES (noise boost > structure), so it is
    off there."""
    x = x.astype(jnp.int32)
    head = jnp.concatenate([x[:k, :1], x[:k, 1:] - x[:k, :-1]], axis=1)
    body = x[k:] - x[:-k]
    if hpass:
        body = jnp.concatenate([body[:, :1], body[:, 1:] - body[:, :-1]],
                               axis=1)
    r = jnp.concatenate([head, body], axis=0)
    ds = ((r + 0x8000) & 0xFFFF) - 0x8000
    return ((ds << 1) ^ (ds >> 15)) & 0xFFFF


def _bit_transpose16(zb: jnp.ndarray) -> jnp.ndarray:
    """(..., 16) u16-valued int32 -> (..., 16) where out[..., p] packs
    bit p of each of the 16 inputs (bit i = input i's bit p): the 16x16
    bit-matrix transpose, as 4 butterfly stages (Hacker's Delight 7-3
    adapted to u16) instead of 16 shift/and/reduce passes.  The raw
    butterfly yields the anti-transpose (out[15-p] bit 15-i); a lane
    reversal on entry and exit corrects it with no bit-reversal."""
    x = zb[..., ::-1]
    s = zb.shape[:-1]
    for j, m in ((8, 0x00FF), (4, 0x0F0F), (2, 0x3333), (1, 0x5555)):
        x = x.reshape(*s, CODEC_BW // (2 * j), 2, j)
        lo, hi = x[..., 0, :], x[..., 1, :]
        t = (lo ^ (hi >> j)) & m
        x = jnp.stack([lo ^ t, hi ^ (t << j)], axis=-2).reshape(*s, CODEC_BW)
    return x[..., ::-1]


def _popcount16(v: jnp.ndarray) -> jnp.ndarray:
    """Per-element popcount of 16-bit values (int32 carrier)."""
    v = v - ((v >> 1) & 0x5555)
    v = (v & 0x3333) + ((v >> 2) & 0x3333)
    v = (v + (v >> 4)) & 0x0F0F
    return (v + (v >> 8)) & 0x1F


def encode_image_planes(x: jnp.ndarray, k: int, hpass: bool = False):
    """Codec encode of one (R, C) u16/int image (C % CODEC_BW == 0).

    Returns (planes (16, R, NB) u16 one-bit-plane words,
    tab (R, NB) i32 6-bit table values `nwords | mode<<5`,
    qstream (codec_qcap_words,) u16 unary quotient bitstream,
    qwords () i32 used stream words).  Also used for the comb's RGB48
    output (k=1, planar, hpass=True — see _codec_residual)."""
    R, C = x.shape
    NB = C // CODEC_BW
    z = _codec_residual(x, k, hpass)
    zb = z.reshape(R, NB, CODEC_BW)

    # plane words via the 4-stage bit-matrix butterfly (vs the naive 16
    # shift/and/reduce passes); bit counts are popcounts of those words
    pt = _bit_transpose16(zb)                      # (R, NB, 16)
    planes = jnp.moveaxis(pt, -1, 0).astype(jnp.uint16)  # (16, R, NB)
    c = _popcount16(pt)                            # (R, NB, 16)
    nb = jnp.max(jnp.where(c > 0, jnp.arange(1, 17, dtype=jnp.int32), 0),
                 axis=-1)                          # bits(max z): 0..16
    # rice costs for every k at once: 16k + 16 + sum_t 2^(t-k) c_t
    costs = (CODEC_BW * jnp.arange(16, dtype=jnp.int32)[:, None, None]
             + CODEC_BW
             + jnp.einsum('kt,rnt->krn', jnp.asarray(_RICE_M), c))
    kbest = jnp.argmin(costs, axis=0).astype(jnp.int32)
    cmin = jnp.min(costs, axis=0)
    qb = cmin - CODEC_BW * kbest                   # sum(q) + 16
    elig = (cmin < CODEC_BW * nb) & (qb <= CODEC_QCAP_BITS)
    nwords = jnp.where(elig, kbest, nb)
    tab = nwords | (elig.astype(jnp.int32) << 5)

    # per-field unary quotient stream: sample i (row-major) emits q_i
    # zeros then a stop 1.  Built per BLOCK (local 64-bit window,
    # vectorized shifts — a per-sample scatter into the field stream
    # measured 37 ms/batch), then merged at exact bit offsets.
    # Scatters cost ~10 ns/UPDATE regardless of width, so the merge
    # works in 32-bit words: the 64-bit window spans 3 u32 words at any
    # shift = 3 scatter-adds per block (vs 5 at u16 granularity).
    zb16 = zb.reshape(-1, CODEC_BW)
    q = (zb16 >> kbest.reshape(-1, 1)) + 1         # qlen per sample
    pcum = jnp.cumsum(q, axis=1)
    pos = pcum - 1                                 # local stop bit 0..63
    eligf = elig.reshape(-1)
    l = []                                         # local words
    for j in range(CODEC_QCAP_BITS // 16):
        lj = jnp.sum(jnp.where((pos >> 4) == j, 1 << (pos & 15), 0),
                     axis=1)
        l.append(jnp.where(eligf, lj, 0))
    qbits = jnp.where(eligf, pcum[:, -1], 0)
    off = jnp.cumsum(qbits) - qbits                # exclusive bit offset
    lo32 = l[0].astype(jnp.uint32) | (l[1].astype(jnp.uint32) << 16)
    hi32 = l[2].astype(jnp.uint32) | (l[3].astype(jnp.uint32) << 16)
    sh = (off & 31).astype(jnp.uint32)
    base = off >> 5
    qcap = codec_qcap_words(R, NB)
    out = jnp.zeros(qcap // 2, jnp.uint32)
    # (x >> 1) >> (31 - sh) == x >> (32 - sh) without the undefined
    # 32-bit shift at sh == 0
    w0 = lo32 << sh
    w1 = ((lo32 >> 1) >> (31 - sh)) | (hi32 << sh)
    w2 = (hi32 >> 1) >> (31 - sh)
    for j, wj in enumerate((w0, w1, w2)):
        out = out.at[base + j].add(jnp.where(eligf, wj, 0), mode='drop')
    qstream = jnp.stack([out & 0xFFFF, out >> 16],
                        axis=-1).reshape(-1).astype(jnp.uint16)
    total_bits = off[-1] + qbits[-1]
    # used words, rounded to the 8-word compaction unit (the pad region
    # is zeros, which the host's unary decode ignores)
    qwords = (((total_bits + 15) >> 4) + 7) // 8 * 8
    return planes, tab, qstream, qwords.astype(jnp.int32)


def pack_tab(tab: jnp.ndarray) -> jnp.ndarray:
    """(R, NB) 6-bit table values -> flat u16 words (little-endian 6-bit
    fields, values straddling word boundaries)."""
    flat = tab.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    nw = tab_words(n)
    off = 6 * jnp.arange(n, dtype=jnp.int32)
    w, sh = off >> 4, off & 15
    out = jnp.zeros(nw + 1, jnp.int32)
    out = out.at[w].add((flat << sh) & 0xFFFF)
    out = out.at[w + 1].add(flat >> (16 - sh))
    return (out[:nw] & 0xFFFF).astype(jnp.uint16)


def unpack_tab(words: np.ndarray, R: int, NB: int) -> np.ndarray:
    """Host inverse of pack_tab -> (R, NB) int table values."""
    bits = np.unpackbits(np.ascontiguousarray(
        np.asarray(words).astype('<u2')).view(np.uint8),
        bitorder='little')
    v = bits[:R * NB * 6].reshape(-1, 6).astype(np.int32)
    return (v @ (1 << np.arange(6, dtype=np.int32))).reshape(R, NB)


def tab_words(nblocks: int) -> int:
    return -(-(nblocks * 6) // 16)


def bcls_words(R: int, NB: int) -> int:
    """Packed table words for an (R, NB) block grid (bundle layout)."""
    return tab_words(R * NB)


def decode_image_planes(tab: np.ndarray, dense_words: np.ndarray,
                        qstream: np.ndarray, shape, k: int,
                        rank_gt=None, hpass: bool = False) -> np.ndarray:
    """Invert encode_image_planes for one image from its contiguous
    dense plane region + quotient stream (host).  tab: (R, NB) 6-bit
    table values (see unpack_tab).  rank_gt: optional precomputed
    _block_rank_np result (the caller often needs it too).

    This runs per field on the consumer path, so it is tuned: int32
    throughout (int64 doubled the memory traffic for nothing — the
    mod-2^16 reconstruction is exact under int32 wraparound), planes
    accumulate in RANK space (contiguous prefixes, one gather back to
    block order at the end instead of 16 fancy-index RMWs), and the
    plane loop stops at the first empty plane (gt is non-increasing)."""
    R, C = shape
    NB = C // CODEC_BW
    tab = np.asarray(tab)
    nwords = (tab & 0x1F).reshape(-1).astype(np.int32)
    mode = ((tab >> 5) & 1).reshape(-1).astype(bool)
    dw = np.asarray(dense_words).astype(np.int32)
    # replay the device's deterministic block ranking (compact_planes):
    # plane p's words are the first cnt[p] of its 32-word-aligned
    # prefix, in rank order
    rank, gt = rank_gt if rank_gt is not None else _block_rank_np(nwords)
    zr = np.zeros((R * NB, CODEC_BW), np.int32)
    pos = 0
    sample_sh = np.arange(CODEC_BW, dtype=np.int32)
    for p in range(CODEC_NPLANES):
        cnt = int(gt[p])
        if not cnt:
            break                     # gt is non-increasing
        shipped = -(-cnt // _CODEC_UNIT) * _CODEC_UNIT
        w = dw[pos:pos + shipped][:cnt]
        pos += shipped
        zr[:cnt] |= ((w[:, None] >> sample_sh) & 1) << p
    z = zr[rank]                      # rank space -> block order
    if mode.any():
        bits = np.unpackbits(np.ascontiguousarray(
            np.asarray(qstream).astype('<u2')).view(np.uint8),
            bitorder='little')
        nsamp = int(mode.sum()) * CODEC_BW
        ones = np.nonzero(bits)[0][:nsamp]
        q = np.diff(np.concatenate([[-1], ones])) - 1
        z[mode] += (q.reshape(-1, CODEC_BW) << nwords[mode, None]
                    ).astype(np.int32)
    z = z.reshape(R, C)
    d = ((z >> 1) ^ -(z & 1))                      # un-zigzag
    if hpass:                                      # invert the h pass
        d[k:] = np.cumsum(d[k:], axis=1)
    x = np.zeros((R, C), np.int32)
    x[:k] = np.cumsum(d[:k], axis=1)               # head rows: h-delta
    for c in range(k):                             # vertical chains
        x[c::k] = np.cumsum(
            np.concatenate([x[c:c + 1], d[c + k::k]]), axis=0)
    return (x & 0xFFFF).astype(np.uint16)


def encode_picture_planes(pic: jnp.ndarray, cfg: DecoderConfig):
    """(L*W,) u16 picture -> encode_image_planes outputs for the padded
    (L, Wp) image."""
    L, W, Wp, W4, k = pic_codec_params(cfg)
    x = pic.reshape(L, W)
    x = jnp.pad(x.astype(jnp.int32), ((0, 0), (0, Wp - W)), mode='edge')
    return encode_image_planes(x, k)


_CODEC_UNIT = 32                  # compaction unit in words (see below)


def _block_rank(nw: jnp.ndarray):
    """Deterministic dense rank of each block under (nwords DESC,
    block-index ASC) ordering, plus cnt[p] = #blocks with nwords > p.
    Pure integer arithmetic (17 bins), replayed exactly by
    _block_rank_np on the host — no reliance on sort stability.
    nw: (N,) int32 in 0..16.

    The running equal-count (a 17-bin prefix sum along the 15k-block
    axis) rides the MXU in (17, N) orientation (bins on sublanes,
    blocks on lanes — the (N, 17) layout pads 17 lanes to 128 and
    measured 7.5x worse): 128-chunk inclusive prefixes via one
    upper-triangular 128x128 matmul plus a tiny chunk-total cumsum;
    XLA's native cumsum on the same data measured ~6 ms/batch
    (scripts/probe_compaction.py).  The own-bin count comes from a
    one-hot reduce instead of a per-element gather.  Counts are
    <= N < 2^24 so f32 accumulation is exact."""
    N = nw.shape[0]
    C = 128
    Np = -(-N // C) * C
    eq = (nw[None, :] == jnp.arange(17, dtype=jnp.int32)[:, None])
    e = jnp.pad(eq, ((0, 0), (0, Np - N))).astype(jnp.float32)
    e = e.reshape(17, Np // C, C)
    # triU[c, d] = 1 for c <= d: inclusive prefix along the lane axis
    triU = (jnp.arange(C)[:, None] <= jnp.arange(C)[None, :]
            ).astype(jnp.float32)
    within = jnp.einsum('tgc,cd->tgd', e, triU,
                        preferred_element_type=jnp.float32)
    totals = within[:, :, -1].astype(jnp.int32)         # (17, G)
    run = jnp.cumsum(totals, axis=1)                    # inclusive
    cum_eq = (within.astype(jnp.int32)
              + (run - totals)[:, :, None]).reshape(17, Np)[:, :N]
    hist = run[:, -1]
    # gt[v] = # blocks with nwords > v
    gt = jnp.cumsum(hist[::-1])[::-1] - hist
    own = jnp.sum(jnp.where(eq, cum_eq, 0), axis=0)     # count among equals
    rank = jnp.take(gt, nw) + own - 1
    return rank, gt


def _block_rank_np(nw: np.ndarray):
    """Host replay of _block_rank (identical integer arithmetic; int32
    — counts are < 2^31 by construction)."""
    nw = np.asarray(nw).astype(np.int32)
    eq = (nw[:, None] == np.arange(17, dtype=np.int32)).astype(np.int32)
    cum_eq = np.cumsum(eq, axis=0, dtype=np.int32)
    hist = cum_eq[-1]
    gt = np.cumsum(hist[::-1], dtype=np.int32)[::-1] - hist
    rank = gt[nw] + cum_eq[np.arange(nw.size), nw] - 1
    return rank, gt


def shipped_plane_words_np(nwords: np.ndarray, rank_gt=None) -> int:
    """Host: exact dense-word count compact_planes ships for one image
    ((R, NB) or flat nwords) — the pipeline's consistency check.
    rank_gt: optional precomputed _block_rank_np result."""
    _, gt = (rank_gt if rank_gt is not None
             else _block_rank_np(np.asarray(nwords).reshape(-1)))
    cnt = gt[:CODEC_NPLANES]
    return int((-(-cnt.astype(np.int64) // _CODEC_UNIT)
                * _CODEC_UNIT).sum())


def compact_planes(planes: jnp.ndarray, tab: jnp.ndarray, cap: int):
    """planes (B, 16, R, NB) u16 + tab (B, R, NB) -> (dense (cap,) u16,
    rows (B,) i32 shipped word counts).

    Unit-count economics (measured): nonzero costs ~9.5 ns/unit and
    gathers ~7 ns/row regardless of width, so compacting 3.9M
    single-word units costs ~68 ms/batch.  This version makes each
    plane's used words a CONTIGUOUS PREFIX first: blocks are ranked by
    nwords descending (deterministic counting rank, _block_rank), so
    plane p is used exactly by the first cnt[p] ranked blocks.  One
    244k-row gather reorders the blocks, then compaction runs at
    32-word units over the per-plane prefixes — 122k units, word-exact
    rate (alignment waste <= 31 words per plane per field, ~0.1%).
    Dense layout: per image, per plane p: ceil(cnt[p]/32)*32 words of
    which the first cnt[p] are real (rank order); rows[b] = their sum.
    The pad words come from ranks >= cnt[p] (zero planes for
    planes-mode blocks; rice high-bit planes) — the decoder slices
    them off."""
    B, _, R, NB = planes.shape
    N = R * NB
    Ncap = -(-N // _CODEC_UNIT) * _CODEC_UNIT
    nwords = (tab & 0x1F).reshape(B, N)

    def one(pl, nw):
        rank, gt = _block_rank(nw)
        # reorder as ONE row scatter to rank positions (unique indices,
        # ~10 ns/row) instead of inverting the permutation with a
        # scatter and then row-gathering by it (two passes)
        pr = jnp.zeros((Ncap, CODEC_NPLANES), pl.dtype).at[rank].set(
            pl.reshape(CODEC_NPLANES, N).T).T
        cnt = gt[:CODEC_NPLANES]                   # used blocks per plane
        used = -(-cnt // _CODEC_UNIT) * _CODEC_UNIT
        umask = (jnp.arange(Ncap // _CODEC_UNIT)[None, :]
                 * _CODEC_UNIT) < cnt[:, None]
        return pr, umask, jnp.sum(used).astype(jnp.int32)

    pr, umask, rows = jax.vmap(one)(planes, nwords)
    src = pr.reshape(-1, _CODEC_UNIT)
    idx = jnp.nonzero(umask.reshape(-1), size=cap // _CODEC_UNIT,
                      fill_value=0)[0]
    return jnp.take(src, idx, axis=0).reshape(-1), rows


def compact_qstreams(qstreams: jnp.ndarray, qwords: jnp.ndarray, cap: int):
    """qstreams (B, qcap) u16 + qwords (B,) i32 (multiples of 8) ->
    (dense (cap,) u16, qwords).  Each image's used stream prefix lands
    contiguously; compaction runs at 8-word granularity (the pad words
    are zeros, ignored by the unary decode)."""
    B, qcap = qstreams.shape
    mask = jnp.arange(qcap // 8)[None, :] < (qwords // 8)[:, None]
    idx = jnp.nonzero(mask.reshape(-1), size=cap // 8, fill_value=0)[0]
    src = qstreams.reshape(-1, 8)
    return jnp.take(src, idx, axis=0).reshape(-1), qwords


def decode_picture_planes(tab: np.ndarray, dense_words: np.ndarray,
                          qstream: np.ndarray, cfg: DecoderConfig,
                          rank_gt=None) -> np.ndarray:
    """Invert encode_picture_planes+compaction for ONE field: tab
    (L, NB) values (via unpack_tab at the caller), the field's
    contiguous dense plane region and its quotient stream."""
    L, W, Wp, W4, k = pic_codec_params(cfg)
    x = decode_image_planes(tab, dense_words, qstream, (L, Wp), k,
                            rank_gt=rank_gt)
    return x[:, :W].reshape(-1)


class BundleSpec:
    """Static layout of a packed uint16 buffer."""

    def __init__(self, fields: List[Tuple[str, tuple, np.dtype]]):
        self.fields = fields
        self.offsets = []
        off = 0
        for name, shape, dtype in fields:
            n = int(np.prod(shape)) * (np.dtype(dtype).itemsize // 2)
            self.offsets.append((name, off, n, shape, dtype))
            off += n
        self.total = off

    def unpack(self, buf: np.ndarray) -> Dict[str, np.ndarray]:
        out = {}
        for name, off, n, shape, dtype in self.offsets:
            raw = np.ascontiguousarray(buf[off:off + n])
            out[name] = raw.view(dtype).reshape(shape)
        return out


# ---------------------------------------------------------------------------
# phase A

def _analyze_core(capture: jnp.ndarray, start: jnp.ndarray, bank: DemodBank,
                  cfg: DecoderConfig, nblocks: int, mtf_level: jnp.ndarray):
    """Demod + sync peaks from a device-resident capture.

    start: scalar file-sample index of demod output 0 (the head cut is
    applied here).  Returns (video_dict, audio_dict, packed_peaks)."""
    n = D.stream_len(cfg, nblocks)
    s0 = jnp.clip(start - cfg.blockcut, 0, capture.shape[0] - n)
    stream = jax.lax.dynamic_slice(capture, (s0,), (n,)).astype(jnp.float32)

    blocks = D.overlap_blocks(stream, cfg, nblocks)
    R_os = jnp.fft.rfft(blocks)
    video = D.demod_video_rfft(R_os, bank, cfg, mtf_level)
    keep = cfg.block_keep
    video = {k: v[:, cfg.blockcut:cfg.blockcut + keep].reshape(-1)
             for k, v in video.items()}

    audio = None
    if bank.has_audio:
        a = D.demod_audio_rfft(R_os, bank)
        dec1 = cfg.blocklen // bank.a_stage1_len
        acut = cfg.blockcut // dec1
        audio = {k: v[:, acut:acut + bank.a_stage1_keep].reshape(-1)
                 for k, v in a.items()}

    idx, val = S.find_sync_peaks(video['demod_sync'],
                                 int(cfg.linelen * 0.4))
    return video, audio, idx.astype(jnp.int32), val.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=('cfg', 'nblocks'))
def field_analyze(capture, start, bank: DemodBank, cfg: DecoderConfig,
                  nblocks: int, mtf_level):
    video, audio, idx, val = _analyze_core(capture, start, bank, cfg,
                                           nblocks, mtf_level)
    return video, audio, pack_bundle([idx, val])


@functools.partial(jax.jit, static_argnames=('cfg', 'nblocks'))
def field_analyze_batch(capture, starts, bank: DemodBank, cfg: DecoderConfig,
                        nblocks: int, mtf_level):
    """vmap of the analyze phase over a batch of window starts; the
    capture and filter bank are broadcast."""
    fn = lambda s: _analyze_core(capture, s, bank, cfg, nblocks, mtf_level)
    video, audio, idx, val = jax.vmap(fn)(starts)
    packed = jax.vmap(lambda i, v: pack_bundle([i, v]))(idx, val)
    return video, audio, packed.reshape(-1)


PEAKS_SPEC = BundleSpec([
    ('idx', (S.MAX_PEAKS,), np.int32),
    ('val', (S.MAX_PEAKS,), np.float32),
])


# ---------------------------------------------------------------------------
# phase B helpers (all traced; linecount static)

def _hsync_refine(video, lli, llf, linebad, lc, cfg: DecoderConfig):
    """Device version of FieldDecoder.refine_linelocs_hsync incl. the
    sequential repairs (reference lddecode_core.py:715-787); line locations
    in split (int, frac) form.  lc: traced field line count (the arrays are
    padded to the max count; the tail sanitizer tracks the true end)."""
    freq = int(round(cfg.freq_mhz))
    n = lli.shape[0]
    idx = jnp.arange(n)
    si = jnp.where(idx < 9, lli - 200, lli)

    starts_i, zc_rel, refined_rel, bad_dev, found = S.refine_hsync_zc(
        video['demod_05'], si, freq,
        cfg.iretohz(-20), cfg.iretohz(-60), cfg.iretohz(20),
        cfg.iretohz(100), cfg.iretohz(-10), cfg.iretohz(10))

    usable = found & ~linebad
    chosen = jnp.where(idx >= 10, refined_rel, zc_rel)
    # unchanged lines keep their original (si, llf) position
    bi = jnp.where(usable, starts_i, si)
    bf = jnp.where(usable, chosen, llf)
    bad = jnp.where(usable, linebad | ((idx >= 10) & bad_dev), True)
    bf = jnp.where(idx < 10, bf + 4.72 * cfg.freq_mhz, bf)
    bi, bf = split_norm(bi, bf)

    def step(carry, x):
        p1i, p1f, p2i, p2f = carry
        cbi, cbf, isbad, i = x
        vi = p1i + (p1i - p2i)
        vf = p1f + (p1f - p2f)
        take = isbad & (i > 10)
        oi = jnp.where(take, vi, cbi)
        of = jnp.where(take, vf, cbf)
        return (oi, of, p1i, p1f), (oi, of)

    ll2i, ll2f = chunked_scan(
        step, (jnp.int32(0), jnp.float32(0.), jnp.int32(0), jnp.float32(0.)),
        (bi, bf, bad, idx))

    # head/tail gap sanitizers: short sequential walks over scalar
    # carries (10/11 steps).  The former unrolled .at[i].set formulation
    # rebuilt the whole line table 20 times per field and cost ~15 ms of
    # an 88 ms 16-field batch; the scans emit the same values bit-exactly
    # and write each region back once.
    lo = cfg.linelen - (cfg.freq_mhz * .2)
    hi = cfg.linelen + (cfg.freq_mhz * .2)

    def head_step(carry, x):
        ci, cf = carry                          # sanitized ll2[i + 1]
        oi, of = x                              # original ll2[i]
        gap = split_sub(ci, cf, oi, of)
        gap = jnp.where((gap >= lo) & (gap <= hi), gap, float(cfg.linelen))
        return (ci, cf - gap), (ci, cf - gap)

    _, (hio, hfo) = jax.lax.scan(head_step, (ll2i[10], ll2f[10]),
                                 (ll2i[9::-1], ll2f[9::-1]))
    ll2i = ll2i.at[:10].set(hio[::-1])
    ll2f = ll2f.at[:10].set(hfo[::-1])

    # tail sanitizer over the last 10 TRUE lines (true nlines = lc + 4,
    # reference lddecode_core.py:780-785); arrays may be padded by one.
    nlines_true = lc + 4

    def tail_step(carry, x):
        pi, pf = carry                          # sanitized ll2[k - 1]
        oi, of, active = x                      # original ll2[k]
        gap = split_sub(oi, of, pi, pf)
        gap = jnp.where((gap >= lo) & (gap <= hi), gap, float(cfg.linelen))
        ni = jnp.where(active, pi, oi)
        nf = jnp.where(active, pf + gap, of)
        return (ni, nf), (ni, nf)

    ks = jnp.arange(n - 11, n)
    _, (tio, tfo) = jax.lax.scan(
        tail_step, (ll2i[n - 12], ll2f[n - 12]),
        (ll2i[n - 11:], ll2f[n - 11:], ks >= (nlines_true - 10)))
    ll2i = ll2i.at[n - 11:].set(tio)
    ll2f = ll2f.at[n - 11:].set(tfo)
    return split_norm(ll2i, ll2f) + (bad,)


def _burst_refine(video, lli, llf, max_lc: int, lc, cfg: DecoderConfig):
    """Device version of FieldDecoder.refine_linelocs_burst
    (reference lddecode_core.py:1054-1133); split line locations.
    max_lc: static row count; lc: traced true line count (mask)."""
    W = cfg.sys.outlinelen
    gaps = (lli[1:] - lli[:-1]).astype(jnp.float32) + (llf[1:] - llf[:-1])
    wow = (gaps[:max_lc] / cfg.linelen).astype(jnp.float32)
    # only grid columns [16, 64) feed the phase estimator (burst window is
    # 20:60); resampling the full W-wide line here costs ~40x more gather
    scaled = RS.downscale_lines_split(video['demod_burst'], lli, llf, W,
                                      max_lc, wow, col0=16, ncols=48)
    return _burst_refine_post(scaled, lli, llf, max_lc, lc, cfg)


def _burst_refine_post(scaled, lli, llf, max_lc: int, lc,
                       cfg: DecoderConfig):
    """Burst phase estimation + repair from the 48-column scaled burst
    windows (the window resample itself runs batch-level in the Pallas
    kernel on TPU, see _refine_batch)."""
    n = lli.shape[0]
    hz_ire = 1700000 / 140
    ph0, ph1, level, level_ok, counts_ok = B.burst_phase_offsets(scaled,
                                                                 hz_ire,
                                                                 win0=4)
    inrow = jnp.arange(max_lc) < lc
    ok = level_ok & counts_ok & inrow
    pad = n - max_lc
    pa0 = jnp.pad(jnp.where(ok, ph0, 0.), (0, pad))
    pa1 = jnp.pad(jnp.where(ok, ph1, 0.), (0, pad))
    bl = jnp.pad(jnp.where(level_ok & inrow, level, 0.), (0, pad))

    has = (pa0 != 0) | (pa1 != 0)
    nan = jnp.float32(jnp.nan)
    med0 = jnp.nanmedian(jnp.where(has, pa0, nan))
    med1 = jnp.nanmedian(jnp.where(has, pa1, nan))
    use1 = jnp.abs(med0) >= jnp.abs(med1)      # else group 0
    any_valid = jnp.any(has)

    adjset = jnp.where(use1, pa1, pa0)
    adjset = jnp.where(any_valid, adjset, 0.)
    pgidx = use1.astype(jnp.int32)
    parity = (jnp.arange(n) % 2) == (pgidx % 2)
    # (with no valid burst lines the reference returns before flip/adjust)
    bl = jnp.where(parity & any_valid, -bl, bl)

    badadj = (jnp.abs(adjset) > 2) & any_valid
    bl = jnp.where(badadj, 0., bl)
    px = cfg.freq_mhz / (4 * 315 / 88)
    o_i = lli
    o_f = jnp.where(badadj, llf, llf - adjset * px)

    # sequential neighbor repair for zero-burst lines:
    # ll3[l] = (ll3[l-1] + orig[l+1]) / 2, with ll3[l-1] possibly repaired
    ni = jnp.concatenate([o_i[1:], o_i[-1:]])
    nf = jnp.concatenate([o_f[1:], o_f[-1:]])
    lidx = jnp.arange(n)

    def step(carry, x):
        pi, pf = carry
        oi, of, nxi, nxf, blz, l = x
        s_i = pi + nxi
        s_f = pf + nxf
        vi = s_i // 2
        vf = (s_f + (s_i % 2).astype(jnp.float32)) / 2
        # true table length is lc+4 (reference range(2, len-1))
        take = blz & (l >= 2) & (l <= lc + 2)
        ri = jnp.where(take, vi, oi)
        rf = jnp.where(take, vf, of)
        return (ri, rf), (ri, rf)

    r_i, r_f = chunked_scan(step, (o_i[0], o_f[0]),
                            (o_i, o_f, ni, nf, bl == 0, lidx))
    r_i, r_f = split_norm(r_i, r_f)
    return r_i, r_f, bl


def _picture_scaled_xla(video, lli, llf, max_lc: int, cfg: DecoderConfig):
    """Wow-corrected picture resample, XLA gather path (single-field /
    non-TPU); the batch path uses the Pallas kernel instead."""
    W = cfg.sys.outlinelen
    lineoffset = 1 if cfg.system == 'NTSC' else 3
    ci = lli[lineoffset:]
    cf = llf[lineoffset:]
    gaps = (ci[1:] - ci[:-1]).astype(jnp.float32) + (cf[1:] - cf[:-1])
    wow = (gaps[:max_lc] / cfg.linelen).astype(jnp.float32)
    return RS.downscale_lines_split(video['demod'], ci, cf, W, max_lc, wow)


def _scale_u16(out, max_lc: int, lc, burstlevel, cfg: DecoderConfig,
               colorlevel: float):
    """(reference lddecode_core.py:789-812, 1135-1158)."""
    sp = cfg.sys

    reduced = (out - sp.ire0) / sp.hz_ire - sp.vsync_ire
    if cfg.system == 'NTSC':
        out_scale = float(0xc800 - 0x0400) / (100 - sp.vsync_ire)
        offset = 1024
    else:
        out_scale = float(0xd300 - 0x0100) / (100 - sp.vsync_ire)
        offset = 256
    lines16 = jnp.clip(reduced * out_scale + offset, 0, 65535)
    lines16 = jnp.floor(lines16 + 0.5)

    if burstlevel is not None:
        hz_ire_scale = 1700000 / 140
        clevel = (1 / colorlevel) / hz_ire_scale
        row = jnp.arange(max_lc)
        flagrow = (row >= 1) & (row < lc - 1)
        bl = burstlevel[:max_lc]
        flags = jnp.where(bl > 0, 16384.0, 32768.0)
        levels = jnp.floor(327.67 * clevel * jnp.abs(bl)).astype(jnp.float32)
        lines16 = lines16.at[:, 0].set(
            jnp.where(flagrow, flags, lines16[:, 0]))
        lines16 = lines16.at[:, 1].set(
            jnp.where(flagrow, levels, lines16[:, 1]))
    return lines16.astype(jnp.uint16).reshape(-1)


def _downscale_audio_dev(a2l, a2r, lli, llf, lc, audio_offset,
                         cfg: DecoderConfig):
    """(reference lddecode_core.py:431-484); fixed-size output + valid count.
    lc: traced line count."""
    sp = cfg.sys
    maxt = audio_maxt(cfg)
    frametime = (sp.line_period * lc.astype(jnp.float32)) / 1e6
    gap = 1.0 / 48000.0
    n = lli.shape[0]

    ticks = audio_offset + jnp.arange(maxt) * gap
    count = jnp.ceil((frametime + gap - audio_offset) / gap).astype(jnp.int32)
    count = jnp.clip(count, 1, maxt)

    linenum = (ticks * 1e6) / sp.line_period + 1
    li = jnp.clip(linenum.astype(jnp.int32), 0, n - 1)
    cur_i = lli[li]
    cur_f = llf[li]
    has_next = (li + 1) < n
    li1 = jnp.clip(li + 1, 0, n - 1)
    delta = jnp.where(
        has_next,
        (lli[li1] - cur_i).astype(jnp.float32) + (llf[li1] - cur_f),
        jnp.float32(cfg.linelen))
    frac = (linenum - jnp.floor(linenum)).astype(jnp.float32)
    # sampleloc = cur + delta*frac; int(sampleloc/64) needs only the floor
    sl_f = cur_f + delta * frac
    sl_i = cur_i + jnp.floor(sl_f).astype(jnp.int32)
    swow = delta / cfg.linelen
    idx = jnp.clip(sl_i // 64, 0, a2l.shape[0] - 1)
    left = a2l[idx] * swow - sp.audio_lfreq
    right = a2r[idx] * swow - sp.audio_rfreq

    def to16(x):
        v = jnp.round(x * 32767.0 / 150000.0)
        return jnp.clip(v, -32766, 32766).astype(jnp.int16)

    inter = jnp.stack([to16(left), to16(right)], axis=1).reshape(-1)
    next_offset = (audio_offset + (count - 1) * gap - frametime)
    return inter, count, next_offset.astype(jnp.float32)


# ---------------------------------------------------------------------------
# phase B

def max_linecount(cfg: DecoderConfig) -> int:
    return cfg.sys.frame_lines // 2 + 1


def max_nlines(cfg: DecoderConfig) -> int:
    return max_linecount(cfg) + 4


def finish_bundle_spec(cfg: DecoderConfig) -> BundleSpec:
    W = cfg.sys.outlinelen
    wp = philips_window_len(cfg)
    linecount = max_linecount(cfg)
    nlines = max_nlines(cfg)
    return BundleSpec([
        ('picture', (linecount * W,), np.uint16),
        ('audio', (audio_maxt(cfg) * 2,), np.int16),
        ('linelocs_i', (nlines,), np.int32),
        ('linelocs_f', (nlines,), np.float32),
        ('burstlevel', (nlines,), np.float32),
        ('philips', (len(cfg.sys.philips_codelines), wp), np.float32),
        ('philips_frac', (len(cfg.sys.philips_codelines),), np.float32),
        ('audio_count', (1,), np.int32),
        ('audio_next_offset', (1,), np.float32),
    ])


def philips_window_len(cfg: DecoderConfig) -> int:
    return cfg.linelen + int(PHILIPS_MARGIN * cfg.freq_mhz)


def pad_linelocs(linelocs1: np.ndarray, linebad: np.ndarray, nmax: int,
                 linelen: int):
    """Pad a host line-location table to the max length by linear
    extrapolation (padded lines are beyond every consumer's reach)."""
    npad = nmax - len(linelocs1)
    if npad <= 0:
        return np.asarray(linelocs1, np.float64), np.asarray(linebad, bool)
    ext = linelocs1[-1] + linelen * np.arange(1, npad + 1)
    ll = np.concatenate([np.asarray(linelocs1, np.float64), ext])
    bad = np.concatenate([np.asarray(linebad, bool), np.zeros(npad, bool)])
    return ll, bad


def _ntsc_refine_tail(ll2i, ll2f, burst_pass, colorphase: float,
                      cfg: DecoderConfig):
    """The NTSC refinement tail shared by the per-field and batched
    paths: two burst passes (via the given window+post function) then
    the color-phase shift (reference lddecode_core.py:1181-1186)."""
    lli, llf, bl = ll2i, ll2f, None
    for _pass in range(2):
        lli, llf, bl = burst_pass(lli, llf)
    shift33 = colorphase * (np.pi / 180)
    px = cfg.freq_mhz / (4 * 315 / 88)
    lli, llf = split_norm(lli, llf + (shift33 - 8) * px)
    return lli, llf, bl


def _finish_refine(video, ll1i, ll1f, linebad, lc, cfg: DecoderConfig,
                   colorphase: float):
    """hsync + burst/pilot refinement -> final split line locations."""
    max_lc = max_linecount(cfg)
    ll2i, ll2f, bad = _hsync_refine(video, ll1i, ll1f, linebad, lc, cfg)

    if cfg.system == 'NTSC':
        return _ntsc_refine_tail(
            ll2i, ll2f,
            lambda i_, f_: _burst_refine(video, i_, f_, max_lc, lc, cfg),
            colorphase, cfg)
    lli, llf = PALK.refine_pilot(
        video['demod'], video['demod_05'], ll2i, ll2f,
        cfg.linelen, cfg.freq_mhz)
    return lli, llf, jnp.zeros_like(ll2f)


def _refine_batch(video, ll1i, ll1f, linebad, lc, cfg: DecoderConfig,
                  colorphase: float, pallas: bool):
    """Batched _finish_refine.  With pallas=True (TPU, NTSC) the two
    burst-window resamples run as batch-level Pallas kernel calls
    (col0=16, ncols=48) instead of per-field XLA gathers — the gathers
    were ~20 ms of an 88 ms 16-field batch.  The kernel issues the same
    f32 op ORDER, but Mosaic's fusion is not bit-exact vs XLA on
    hardware: the verify skill's pallas-vs-XLA check bounds the
    divergence at <= 4 u16 LSB on the resampled picture (CI runs
    pallas=False, so that hardware check is the binding contract)."""
    if cfg.system != 'NTSC' or not pallas:
        fn = lambda v, i_, f_, b_, l_: _finish_refine(
            v, i_, f_, b_, l_, cfg, colorphase)
        return jax.vmap(fn)(video, ll1i, ll1f, linebad, lc)

    from ld_decode_tpu.tbc.pallas_resample import resample_lines_batch
    max_lc = max_linecount(cfg)
    W = cfg.sys.outlinelen
    hs = lambda v, i_, f_, b_, l_: _hsync_refine(v, i_, f_, b_, l_, cfg)
    lli, llf, _bad = jax.vmap(hs)(video, ll1i, ll1f, linebad, lc)

    def burst_pass(i_, f_):
        scaled = resample_lines_batch(
            video['demod_burst'], i_, f_, W, max_lc,
            float(cfg.linelen), col0=16, ncols=48)
        post = lambda s, pi, pf, l_: _burst_refine_post(
            s, pi, pf, max_lc, l_, cfg)
        return jax.vmap(post)(scaled, i_, f_, lc)

    return _ntsc_refine_tail(lli, llf, burst_pass, colorphase, cfg)


def _finish_output(video, audio1, lli, llf, scaled, lc, audio_offset,
                   bank: DemodBank, cfg: DecoderConfig, n_audio1: int,
                   colorlevel: float, burstlevel,
                   philips_windows: bool = True,
                   split_picture: bool = False):
    """Output generation from refined line locations + resampled picture.

    philips_windows=True ships the raw VBI line windows for the host
    slicer (finish_bundle_spec); False runs the Philips slicer on-device
    and ships just the nibbles (pipeline_bundle_spec) — the windows were
    ~7% of the per-field transfer on a ~45 MB/s tunnel."""
    max_lc = max_linecount(cfg)
    picture = _scale_u16(scaled, max_lc, lc,
                         burstlevel if cfg.system == 'NTSC' else None,
                         cfg, colorlevel)

    # audio: stage 2 + chase resample
    if audio1 is not None:
        a2l, a2r = audio_stage2(audio1['audio_left'], audio1['audio_right'],
                                bank, n_audio1)
        audio, acount, anext = _downscale_audio_dev(
            a2l, a2r, lli, llf, lc, audio_offset, cfg)
    else:
        audio = jnp.zeros(audio_maxt(cfg) * 2, jnp.int16)
        acount = jnp.int32(1)
        anext = jnp.float32(0.)

    # VBI line windows: ship raw (host slicer) or slice on-device
    wp = philips_window_len(cfg)
    wins = []
    fracs = []
    nsamp = video['demod'].shape[0]
    for l in cfg.sys.philips_codelines:
        w0 = jnp.clip(lli[l], 0, nsamp - wp)
        wins.append(jax.lax.dynamic_slice(video['demod'], (w0,), (wp,)))
        fracs.append((lli[l] - w0).astype(jnp.float32) + llf[l])

    if philips_windows:
        philips = jnp.stack(wins).astype(jnp.float32)
        philips_frac = jnp.stack(fracs).astype(jnp.float32)
        tail = [philips, philips_frac]
    else:
        from ld_decode_tpu.vbi.philips import slice_philips_dev
        nibs = []
        oks = []
        for w, fr in zip(wins, fracs):
            nb, ok = slice_philips_dev(w.astype(jnp.float32), fr,
                                       cfg.freq_mhz, cfg.iretohz(50))
            nibs.append(nb)
            oks.append(ok)
        tail = [jnp.stack(nibs).astype(jnp.int32),
                jnp.stack(oks).astype(jnp.int32)]

    rest = pack_bundle([
        audio,
        lli.astype(jnp.int32),
        llf.astype(jnp.float32),
        burstlevel.astype(jnp.float32),
    ] + tail + [
        acount.reshape(1),
        anext.reshape(1),
    ])
    if split_picture:
        return picture, rest
    return jnp.concatenate([pack_bundle([picture]), rest])


def field_finish_core(video, audio1, ll1i, ll1f, linebad, lc, audio_offset,
                      bank: DemodBank, cfg: DecoderConfig, n_audio1: int,
                      colorlevel: float = 1.45, colorphase: float = 91.5):
    """Refinement + output generation; returns one packed uint16 buffer.

    Line locations travel in split (int32, float32) form; arrays are padded
    to max_nlines(cfg) and the true field line count `lc` is traced, so one
    compiled graph serves both 262- and 263-line fields and the whole
    function vmaps over a batch of fields."""
    lli, llf, burstlevel = _finish_refine(video, ll1i, ll1f, linebad, lc,
                                          cfg, colorphase)
    scaled = _picture_scaled_xla(video, lli, llf, max_linecount(cfg), cfg)
    return _finish_output(video, audio1, lli, llf, scaled, lc, audio_offset,
                          bank, cfg, n_audio1, colorlevel, burstlevel)


@functools.partial(jax.jit, static_argnames=('cfg', 'n_audio1', 'colorlevel',
                                             'colorphase'))
def field_finish(video, audio1, ll1i, ll1f, linebad, lc, audio_offset,
                 bank: DemodBank, cfg: DecoderConfig, n_audio1: int,
                 colorlevel: float = 1.45, colorphase: float = 91.5):
    return field_finish_core(video, audio1, ll1i, ll1f, linebad, lc,
                             audio_offset, bank, cfg, n_audio1,
                             colorlevel, colorphase)


@functools.partial(jax.jit, static_argnames=('cfg', 'n_audio1', 'colorlevel',
                                             'colorphase', 'pallas'))
def field_finish_batch(video, audio1, ll1i, ll1f, linebad, lc, audio_offset,
                       bank: DemodBank, cfg: DecoderConfig, n_audio1: int,
                       colorlevel: float = 1.45, colorphase: float = 91.5,
                       pallas: bool = False):
    """Batched finish over a leading batch-of-fields axis.

    With pallas=True (TPU) the hot picture resample runs once for the
    whole batch in the Pallas kernel (tbc/pallas_resample.py) between two
    vmapped stages; otherwise everything is one vmapped XLA graph."""
    if not pallas:
        fn = lambda v, a, i_, f_, b_, l_, o_: field_finish_core(
            v, a, i_, f_, b_, l_, o_, bank, cfg, n_audio1,
            colorlevel, colorphase)
        out = jax.vmap(fn)(video, audio1, ll1i, ll1f, linebad, lc,
                           audio_offset)
        # 2-D device->host transfers hang on the axon tunnel; ship flat
        return out.reshape(-1)

    from ld_decode_tpu.tbc.pallas_resample import resample_lines_batch

    lli, llf, burstlevel = _refine_batch(video, ll1i, ll1f, linebad, lc,
                                         cfg, colorphase, pallas)

    lineoffset = 1 if cfg.system == 'NTSC' else 3
    max_lc = max_linecount(cfg)
    scaled = resample_lines_batch(
        video['demod'], lli[:, lineoffset:], llf[:, lineoffset:],
        cfg.sys.outlinelen, max_lc, float(cfg.linelen))

    outfn = lambda v, a, i_, f_, s_, l_, o_, bl_: _finish_output(
        v, a, i_, f_, s_, l_, o_, bank, cfg, n_audio1, colorlevel, bl_)
    out = jax.vmap(outfn)(video, audio1, lli, llf, scaled, lc,
                          audio_offset, burstlevel)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# fully-fused batch pipeline: analyze + vsync/linelocs + finish in ONE call

def pipeline_bundle_spec(cfg: DecoderConfig) -> BundleSpec:
    """Like finish_bundle_spec but with the Philips codes sliced
    on-device (nibbles instead of raw line windows) and the picture
    shipped separately (per-block adaptive codec: only the packed
    6-bit mode+count table rides the bundle; the dense bit planes and
    the quotient streams go out as batch-level prefix-fetched buffers),
    plus per-field meta (valid/istop/lc/nfo/npeaks/nvsyncs/readsample/
    white-flag int32 words, then the audio offset this field
    consumed)."""
    L, W, Wp, W4, k = pic_codec_params(cfg)
    nlines = max_nlines(cfg)
    ncl = len(cfg.sys.philips_codelines)
    return BundleSpec([
        ('pic_tab', (bcls_words(L, Wp // CODEC_BW),), np.uint16),
        ('audio', (audio_maxt(cfg) * 2,), np.int16),
        ('linelocs_i', (nlines,), np.int32),
        ('linelocs_f', (nlines,), np.float32),
        ('burstlevel', (nlines,), np.float32),
        ('philips_nib', (ncl, 6), np.int32),
        ('philips_ok', (ncl,), np.int32),
        ('audio_count', (1,), np.int32),
        ('audio_next_offset', (1,), np.float32),
        ('meta_i', (8,), np.int32),
        ('meta_f', (1,), np.float32),
    ])


def _audio_offset_chain(offset0, lcs, cfg: DecoderConfig):
    """Chained 48 kHz resampler carry offsets across the batch, with the
    exact float32 op order of `_downscale_audio_dev` (a mismatched count
    would shift an audio tick)."""
    maxt = audio_maxt(cfg)
    lp = cfg.sys.line_period

    def step(off, lcb):
        frametime = (lp * lcb.astype(jnp.float32)) / 1e6
        gap = 1.0 / 48000.0
        count = jnp.ceil((frametime + gap - off) / gap).astype(jnp.int32)
        count = jnp.clip(count, 1, maxt)
        nxt = (off + (count - 1) * gap - frametime).astype(jnp.float32)
        return nxt, off

    final, offs = jax.lax.scan(step, jnp.asarray(offset0, jnp.float32), lcs)
    return offs, final


def pipeline_starts(start0, batch_index, nbatch: int, field_pitch: int,
                    valid_len, cfg: DecoderConfig, nblocks: int):
    """Clamped speculative window starts for fields [batch_index,
    batch_index + nbatch) of a batch chain.  valid_len (traced scalar)
    marks real samples when the capture buffer is zero-padded to a
    constant shape (segmented file tail); windows clamp at the REAL end
    so EOF keeps its duplicate-start semantics instead of decoding the
    pad."""
    n_stream = D.stream_len(cfg, nblocks)
    smax = jnp.asarray(valid_len, jnp.int32) - (n_stream - cfg.blockcut)
    return jnp.clip(
        jnp.asarray(start0, jnp.int32)
        + (batch_index + jnp.arange(nbatch, dtype=jnp.int32)) * field_pitch,
        cfg.blockcut, smax)


def pipeline_analyze(capture, starts, mtf_level, bank: DemodBank,
                     cfg: DecoderConfig, nblocks: int):
    """Demod + sync peaks + device-side vsync voting / line numbering for
    a batch of field windows.  Fields are independent — this stage has no
    cross-field dataflow, so it shards cleanly over a device mesh
    (parallel/mesh.py::build_pipeline_batch_sharded).

    Returns (video, audio1, lld, lc, valid, istop, nfo, nv, vs_count)."""
    from ld_decode_tpu.tbc import sync_dev as SD

    fn = lambda s: _analyze_core(capture, s, bank, cfg, nblocks, mtf_level)
    video, audio1, pidx, pval = jax.vmap(fn)(starts)

    P = pidx.shape[1]
    nv = jnp.sum(pidx >= 0, axis=1).astype(jnp.int32)
    is_pal = cfg.system == 'PAL'
    R = max_nlines(cfg)
    field_lines = cfg.sys.frame_lines // 2

    vsd = jax.vmap(lambda p, v, n: SD.determine_vsyncs_dev(
        p, v, n, cfg.linelen, is_pal))(pidx, pval, nv)

    istop = vsd.istop[:, 0]
    lc = (field_lines + istop.astype(jnp.int32)).astype(jnp.int32)
    line0_1 = vsd.line0[:, 1]
    valid_vs = (vsd.count >= 2) & (nv >= line0_1 + 4)

    lld = jax.vmap(lambda p, v, n, m, t, a, b_, l_: SD.compute_linelocs_dev(
        p, v, n, m, t, a, b_, l_, cfg.linelen, R))(
        pidx, pval, nv, vsd.med, vsd.tol, vsd.line0[:, 0], line0_1, lc)
    valid = valid_vs & lld.ok

    bidx = jnp.arange(starts.shape[0])
    nfo = pidx[bidx, jnp.clip(line0_1 - 10, 0, P - 1)]
    return video, audio1, lld, lc, valid, istop, nfo, nv, vsd.count


def pipeline_finish(video, audio1, lld, lc, valid, istop, nfo, nv, vs_count,
                    starts, offs_used, bank: DemodBank, cfg: DecoderConfig,
                    n_audio1: int, colorlevel: float, colorphase: float,
                    pallas: bool, codec: bool = True):
    """Refinement + outputs + picture codec + per-field meta for a batch
    (same stages as field_finish_batch).  Returns per-field bundle rows
    (batch, words), the raw device-resident picture (defensive
    fallback), and the compacted dense bit planes / quotient streams +
    per-field counts (2, batch) — the adaptive picture codec's
    prefix-fetched payloads.  Per-field like `pipeline_analyze`, so it
    shards over the batch (each shard compacts its own fields)."""
    lli, llf, burstlevel = _refine_batch(video, lld.lli, lld.llf,
                                         lld.bad, lc, cfg, colorphase,
                                         pallas)

    lineoffset = 1 if cfg.system == 'NTSC' else 3
    max_lc = max_linecount(cfg)
    if pallas:
        from ld_decode_tpu.tbc.pallas_resample import resample_lines_batch
        scaled = resample_lines_batch(
            video['demod'], lli[:, lineoffset:], llf[:, lineoffset:],
            cfg.sys.outlinelen, max_lc, float(cfg.linelen))
    else:
        scaled = jax.vmap(lambda v, i_, f_: _picture_scaled_xla(
            v, i_, f_, max_lc, cfg))(video, lli, llf)

    outfn = lambda v, a, i_, f_, s_, l_, o_, bl_: _finish_output(
        v, a, i_, f_, s_, l_, o_, bank, cfg, n_audio1, colorlevel, bl_,
        philips_windows=False, split_picture=True)
    pic, rest = jax.vmap(outfn)(video, audio1, lli, llf, scaled, lc,
                                offs_used, burstlevel)

    L, W, Wp, W4, k = pic_codec_params(cfg)
    if codec:
        planes, tab, qstreams, qwords = jax.vmap(
            lambda p: encode_picture_planes(p, cfg))(pic)
        dense, rows = compact_planes(planes, tab,
                                     codec_cap_rows(cfg, starts.shape[0]))
        qcap = codec_qcap_words(L, Wp // CODEC_BW) * starts.shape[0]
        dense_q, qw = compact_qstreams(qstreams, qwords, qcap)
        rows2 = jnp.stack([rows, qw])
    else:
        # device-resident chain mode: the picture never leaves HBM
        # (the comb reads it directly), so skip the ~21 ms/batch codec
        # and ship token-empty payloads (bundle layout unchanged)
        tab = jnp.zeros((starts.shape[0], L, Wp // CODEC_BW), jnp.int32)
        dense = jnp.zeros(8, jnp.uint16)
        dense_q = jnp.zeros(8, jnp.uint16)
        rows2 = jnp.zeros((2, starts.shape[0]), jnp.int32)

    # white flag on device (reference tbc.cpp:1633-1644, same row
    # window + threshold arithmetic as vbi/metadata.white_flag): in
    # device-chain mode the picture never reaches the host, so the
    # host slicer cannot compute it — ship the bit in the meta words
    # instead (and everywhere else too: one code path, bit-equal).
    W = cfg.sys.outlinelen
    out_scale = ((0xc800 - 0x0400) if cfg.system == 'NTSC'
                 else (0xd300 - 0x0100)) / (100 - cfg.sys.vsync_ire)
    pic_off = 1024 if cfg.system == 'NTSC' else 256
    thresh = (80.0 - cfg.sys.vsync_ire) * out_scale + pic_off
    wrows = pic.reshape(starts.shape[0], max_lc, W)[:, 8:12, 2:]
    white = jnp.any(
        jnp.sum(wrows.astype(jnp.float32) > jnp.float32(thresh),
                axis=2) >= 200, axis=1) & (lc > 11)

    meta_i = jnp.stack([valid.astype(jnp.int32), istop.astype(jnp.int32),
                        lc, nfo, nv, vs_count, starts,
                        white.astype(jnp.int32)], axis=1)
    meta = jax.vmap(lambda mi, mf: pack_bundle([mi, mf.reshape(1)]))(
        meta_i, offs_used)
    bundle = jnp.concatenate([jax.vmap(pack_tab)(tab),
                              rest.reshape(starts.shape[0], -1), meta],
                             axis=1)
    return bundle, pic, dense, dense_q, rows2


@functools.partial(jax.jit, static_argnames=('cfg', 'nblocks', 'n_audio1',
                                             'batch', 'field_pitch',
                                             'colorlevel', 'colorphase',
                                             'pallas', 'codec'))
def field_pipeline_batch(capture, start0, audio_offset0, mtf_level,
                         bank: DemodBank, cfg: DecoderConfig, nblocks: int,
                         n_audio1: int, batch: int, field_pitch: int,
                         colorlevel: float = 1.45,
                         colorphase: float = 91.5, pallas: bool = False,
                         valid_len=None, codec: bool = True):
    """The whole speculative field batch as ONE jitted call + ONE D2H.

    Demod + sync peaks, device-side vsync voting and line numbering
    (tbc/sync_dev.py), hsync/burst refinement, picture/audio downscale and
    VBI windows, per-field validity + nextfieldoffset meta — the host only
    unpacks the returned buffer.

    `start0`/`audio_offset0` are device scalars and the chained
    (next_start0, next_offset0) come back as device scalars, so
    consecutive speculative batches chain device-to-device: the prefetcher
    keeps DEPTH (3) in flight and the tunnel transfer of batch k overlaps
    the compute of batch k+1 with no host synchronization between them."""
    if valid_len is None:
        valid_len = capture.shape[0]
    starts = pipeline_starts(start0, 0, batch, field_pitch, valid_len,
                             cfg, nblocks)

    (video, audio1, lld, lc, valid, istop, nfo, nv,
     vs_count) = pipeline_analyze(capture, starts, mtf_level, bank, cfg,
                                  nblocks)

    offs_used, next_offset0 = _audio_offset_chain(audio_offset0, lc, cfg)
    next_start0 = starts[-1] + nfo[-1]

    bundle, pic, dense, dense_q, rows2 = pipeline_finish(
        video, audio1, lld, lc, valid, istop, nfo, nv, vs_count, starts,
        offs_used, bank, cfg, n_audio1, colorlevel, colorphase, pallas,
        codec=codec)
    # The bundle (linelocs/audio/meta/block tables) ships in a couple
    # of eagerly-fetched chunks; the picture ships as the compacted
    # dense bit-plane buffer + quotient streams, of which the
    # prefetcher fetches only the used prefixes (rows2 tells it how
    # much) in ~256 KB concurrent streams — the tunnel D2H link is the
    # throughput wall and the transfer is now sized by information
    # content, not by worst case.  The raw picture stays
    # device-resident (`pic`) as a defensive fallback.
    nchunks = max(1, min(2, batch // 4))
    per = -(-batch // nchunks)
    chunks = tuple(bundle[i * per:(i + 1) * per].reshape(-1)
                   for i in range(nchunks))
    return chunks, next_start0, next_offset0, pic, dense, dense_q, rows2
