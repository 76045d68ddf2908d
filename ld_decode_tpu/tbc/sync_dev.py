"""Device-side vsync detection + line numbering (fixed-shape masked ops).

Ports the last remaining host stages of the field pipeline — hsync level
statistics (reference lddecode_core.py:518-532), vsync candidate voting
(lddecode_core.py:544-636 `determine_field`/`determine_vsyncs`) and integer
line numbering with gap interpolation (lddecode_core.py:638-713
`compute_linelocs`) — to fixed-shape jnp programs over the padded
(MAX_PEAKS,) sync-peak arrays, so one jitted call (and one device->host
transfer) covers a whole speculative field batch.

Shapes/semantics:
  * peak lists stay (P,) with -1 padding (tbc/sync.py `find_sync_peaks`);
  * the candidate list keeps the first MAX_VSYNCS=8 valid vsyncs;
  * line tables are (max_nlines,) with the true line count traced;
  * positions use (int32 anchor, float32 frac) splits — peaks are exact
    int32 sample indices, interpolated lines carry a small f32 remainder,
    matching the host float64 path to ~1e-5 samples.

Parity: tests/test_sync_dev.py pins every output against the host
implementations (tbc/field.py) over synthetic and corrupted fields.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ld_decode_tpu.tbc.sync import MAX_PEAKS

MAX_VSYNCS = 8


def _masked_median(x: jnp.ndarray, mask: jnp.ndarray, cnt: jnp.ndarray):
    """np.median over masked elements (average of the two middles)."""
    big = jnp.where(mask, x, jnp.inf)
    s = jnp.sort(big)
    c = jnp.maximum(cnt, 1)
    lo = s[jnp.maximum((c - 1) // 2, 0)]
    hi = s[jnp.maximum(c // 2, 0)]
    return (lo + hi) * 0.5


def hsync_stats_dev(vals: jnp.ndarray, valid: jnp.ndarray):
    """(reference lddecode_core.py:518-532): median/2*std of peak values in
    the regular-hsync band 0.6..0.8."""
    sel = valid & (vals >= 0.6) & (vals <= 0.8)
    cnt = jnp.sum(sel)
    med = _masked_median(vals, sel, cnt)
    c = jnp.maximum(cnt, 1).astype(jnp.float32)
    mean = jnp.sum(jnp.where(sel, vals, 0.0)) / c
    var = jnp.sum(jnp.where(sel, (vals - mean) ** 2, 0.0)) / c
    tol = jnp.maximum(jnp.sqrt(var) * 2, 0.01)
    med = jnp.where(cnt == 0, 0.7, med)
    tol = jnp.where(cnt == 0, 0.01, tol)
    return med, tol


class VsyncsDev(NamedTuple):
    idx: jnp.ndarray      # (MAX_VSYNCS,) peak index of each vsync candidate
    line0: jnp.ndarray    # (MAX_VSYNCS,) repaired line0 peak index
    istop: jnp.ndarray    # (MAX_VSYNCS,) bool, vote < 0
    count: jnp.ndarray    # scalar int32
    med: jnp.ndarray
    tol: jnp.ndarray


def determine_vsyncs_dev(peaks: jnp.ndarray, vals: jnp.ndarray,
                         nv: jnp.ndarray, inlinelen: int,
                         is_pal: bool) -> VsyncsDev:
    """(reference lddecode_core.py:544-636) as masked vector ops + an
    unrolled repair pass over the first MAX_VSYNCS candidates."""
    P = peaks.shape[0]
    ar = jnp.arange(P)
    valid = ar < nv
    med, tol = hsync_stats_dev(vals, valid)
    reg = valid & (vals >= med - tol) & (vals <= med + tol)

    prevval = jnp.concatenate([jnp.ones((1,), vals.dtype), vals[:-1]])
    cand = valid & (vals > 0.9) & (prevval < med - tol * 2)

    # determine_field, vectorized for every position i:
    # backward scan j = i-1 .. max(i-20,-1)+1 for the first regular peak
    offs = jnp.arange(1, 20)
    jb = ar[:, None] - offs[None, :]
    mb = (jb >= 0) & (jb > jnp.maximum(ar[:, None] - 20, -1)) \
        & reg[jnp.maximum(jb, 0)]
    foundb = jnp.any(mb, axis=1)
    ob = jnp.argmax(mb, axis=1)
    line0 = ar - 1 - ob                     # valid where foundb
    l0c = jnp.maximum(line0, 0)
    gap1 = peaks[jnp.minimum(l0c + 1, P - 1)] - peaks[l0c]
    vote_b = jnp.where((l0c + 1 < nv) & (gap1 > inlinelen * 0.75), -1, 0)

    # forward scan j = i .. min(i+20, nv)-1 for the first regular peak
    offf = jnp.arange(0, 20)
    jf = ar[:, None] + offf[None, :]
    mf = (jf < nv) & reg[jnp.minimum(jf, P - 1)]
    foundf = jnp.any(mf, axis=1)
    of = jnp.argmax(mf, axis=1)
    je = jnp.minimum(ar + of, P - 1)
    gap2 = peaks[je] - peaks[jnp.maximum(je - 1, 0)]
    fvote = -1 if is_pal else 1
    vote_f = jnp.where(foundf & (gap2 > inlinelen * 0.75), fvote, 0)

    vote = vote_b + vote_f + (1 if is_pal else 0)
    keep = cand & (ar >= 11) & foundb

    kidx = jnp.nonzero(keep, size=MAX_VSYNCS, fill_value=-1)[0]
    kvalid = kidx >= 0
    ki = jnp.where(kvalid, kidx, 0)
    k_i = jnp.where(kvalid, ki, -1).astype(jnp.int32)
    k_line0 = jnp.where(kvalid, line0[ki], -1).astype(jnp.int32)
    k_vote = jnp.where(kvalid, vote[ki], 0).astype(jnp.int32)
    count = jnp.sum(kvalid).astype(jnp.int32)
    # reference bails out entirely with < 200 peaks
    count = jnp.where(nv < 200, 0, count)

    # repair pass (host field.py:155-165); the reference only runs it when
    # >= 2 candidates exist.  NB the host loop converts each vote to its
    # 0/1 istop form IN PLACE, so iteration k reads the *raw* vote of k+1
    # but the *converted* (0/1) vote of k-1 — replicated exactly.
    back = 6 if is_pal else 7
    l0 = list(k_line0)
    raw = list(k_vote)
    conv = []
    run = count >= 2
    for k in range(MAX_VSYNCS):
        inrange = run & (k < count)
        zero = raw[k] == 0
        l0[k] = jnp.where(inrange & zero, -1, l0[k])
        nxt = raw[k + 1] if k + 1 < MAX_VSYNCS else jnp.int32(0)
        nxt_ok = (k + 1 < count) & (nxt != 0)
        prv = conv[k - 1] if k >= 1 else jnp.int32(0)
        prv_ok = (k >= 1) & (prv != 0)
        newv = jnp.where(nxt_ok, -nxt, jnp.where(prv_ok, -prv, 0))
        vk = jnp.where(inrange & zero, newv, raw[k])
        l0[k] = jnp.where(inrange & (l0[k] <= 0), k_i[k] - back, l0[k])
        conv.append(jnp.where(inrange, (vk < 0).astype(jnp.int32), 0))

    istop = jnp.stack([c > 0 for c in conv])
    return VsyncsDev(k_i, jnp.stack(l0), istop, count, med, tol)


def _rolling_ok_median(gap: jnp.ndarray, ok: jnp.ndarray,
                       has_prev: jnp.ndarray, inlinelen: int):
    """For each gap position j, the reference's rolling median of the last
    25 regular gaps before j, seeded with the nominal line length
    (reference lddecode_core.py: hist = [linelen]+gaps[:j][ok], [-25:])."""
    P = gap.shape[0]
    ordn = jnp.cumsum(ok.astype(jnp.int32))          # inclusive count
    # dense sequence of ok gaps: okg[ordn[j]-1] = gap[j] for ok j
    okg = jnp.zeros(P + 1, gap.dtype).at[
        jnp.where(ok, ordn - 1, P)].set(jnp.where(ok, gap, 0.0))
    cbefore = ordn - ok.astype(jnp.int32)            # ok gaps strictly before
    # window of the last 25 entries of [seed] + okg[:cbefore]
    w = jnp.arange(25)
    widx = cbefore[:, None] - 25 + w[None, :]        # -1 => seed, <-1 => pad
    vals = jnp.where(widx[:, :] >= 0,
                     okg[jnp.clip(widx, 0, P)],
                     jnp.where(widx == -1, float(inlinelen), jnp.inf))
    m = widx >= -1
    cnt = jnp.sum(m, axis=1)
    s = jnp.sort(jnp.where(m, vals, jnp.inf), axis=1)
    lo = jnp.take_along_axis(s, ((cnt - 1) // 2)[:, None], axis=1)[:, 0]
    hi = jnp.take_along_axis(s, (cnt // 2)[:, None], axis=1)[:, 0]
    return (lo + hi) * 0.5


class LinelocsDev(NamedTuple):
    lli: jnp.ndarray      # (R,) int32 anchors
    llf: jnp.ndarray      # (R,) float32 fractions
    bad: jnp.ndarray      # (R,) bool
    ok: jnp.ndarray       # scalar bool: numbering succeeded


def compute_linelocs_dev(peaks: jnp.ndarray, vals: jnp.ndarray,
                         nv: jnp.ndarray, med, tol,
                         v0_line0: jnp.ndarray, v1_line0: jnp.ndarray,
                         lc: jnp.ndarray, inlinelen: int,
                         max_nlines: int) -> LinelocsDev:
    """(reference lddecode_core.py:638-713) with fixed-shape tables.

    Rows l = 1..max_nlines map to table entries 0..max_nlines-1; entries
    beyond the traced lc+4 are linearly extrapolated (pad_linelocs
    semantics)."""
    P = peaks.shape[0]
    R = max_nlines
    ar = jnp.arange(P)
    valid = ar < nv
    end = jnp.clip(v1_line0, 0, P)
    reg = valid & (vals >= med - tol) & (vals <= med + tol) & (ar < end)

    # previous regular peak for each position
    prev_reg = jnp.concatenate([
        jnp.full((1,), -1, jnp.int32),
        jax.lax.cummax(jnp.where(reg, ar, -1).astype(jnp.int32))[:-1]])
    has_prev = reg & (prev_reg >= 0)
    gap = (peaks - peaks[jnp.maximum(prev_reg, 0)]).astype(jnp.float32)
    rel = gap / inlinelen
    ok = has_prev & (rel >= 0.98) & (rel <= 1.02)

    med25 = _rolling_ok_median(gap, ok, has_prev, inlinelen)
    inc = jnp.where(ok, 1,
                    jnp.where(has_prev,
                              jnp.round(gap / med25).astype(jnp.int32), 0))

    # first regular peak and its line number
    any_reg = jnp.any(reg)
    fidx = jnp.argmax(reg)
    v0 = peaks[jnp.clip(v0_line0, 0, P - 1)]
    first = jnp.round((peaks[fidx] - v0).astype(jnp.float32)
                      / inlinelen).astype(jnp.int32)
    num = first + jnp.cumsum(jnp.where(has_prev, inc, 0))
    num = jnp.where(reg, num, jnp.int32(-(1 << 20)))   # sentinel

    # ---- table build over rows l = 1..R ----
    lrow = jnp.arange(1, R + 1)                       # (R,)

    # prev: largest num <= l with num > -10; among equal nums the LAST
    # peak wins (dict overwrite). key = num*P + j, maximized.
    pmask = reg[None, :] & (num[None, :] <= lrow[:, None]) \
        & (num[None, :] > -10)
    pkey = num[None, :] * P + ar[None, :]
    pk = jnp.max(jnp.where(pmask, pkey, jnp.iinfo(jnp.int32).min), axis=1)
    has_p = jnp.any(pmask, axis=1)
    pj = jnp.where(has_p, pk - jnp.floor_divide(pk, P) * P, 0)
    pnum = jnp.where(has_p, jnp.floor_divide(pk, P), 0)
    ploc = peaks[jnp.clip(pj, 0, P - 1)]

    # next: smallest num >= l with num <= lc; among equal nums the LAST
    # peak wins. key = num*P + (P-1-j), minimized.
    nmask = reg[None, :] & (num[None, :] >= lrow[:, None]) \
        & (num[None, :] <= lc)
    nkey = num[None, :] * P + (P - 1 - ar[None, :])
    nk = jnp.min(jnp.where(nmask, nkey, jnp.iinfo(jnp.int32).max), axis=1)
    has_n = jnp.any(nmask, axis=1)
    nj = jnp.where(has_n, P - 1 - (nk - jnp.floor_divide(nk, P) * P), 0)
    nnum = jnp.where(has_n, jnp.floor_divide(nk, P), 0)
    nloc = peaks[jnp.clip(nj, 0, P - 1)]

    exact = jnp.any(pmask & (num[None, :] == lrow[:, None]), axis=1)

    # pass 1: rows with an exact peak, interpolation, or head extrapolation
    dd_p = (lrow - pnum).astype(jnp.float32)
    dd_n = (nnum - lrow)
    # head: no prev -> nloc - linelen*(next-l)  (all-integer, exact)
    head_i = nloc - inlinelen * dd_n
    # both: prev + avglen*(l-prev), split into int + small f32 remainder
    avglen = (nloc - ploc).astype(jnp.float32) \
        / jnp.maximum((nnum - pnum).astype(jnp.float32), 1.0)
    ai = jnp.round(avglen)
    mid_i = ploc + (ai * dd_p).astype(jnp.int32)
    mid_f = (avglen - ai) * dd_p

    f1_i = jnp.where(has_p, mid_i, head_i)
    f1_f = jnp.where(has_p, mid_f, 0.0)
    tail = has_p & ~has_n

    # pass 2..: tail rows need avglen = ploc - filled[pnum-1]; the chain
    # through nums > lc is at most ~MAX(4) deep (rows stop at lc+4)
    fi, ff = f1_i, f1_f
    for _ in range(5):
        ref_row = jnp.clip(pnum - 2, 0, R - 1)        # table idx of l=pnum-1
        av_t = (ploc - fi[ref_row]).astype(jnp.float32) - ff[ref_row]
        at = jnp.round(av_t)
        t_i = ploc + (at * dd_p).astype(jnp.int32)
        t_f = (av_t - at) * dd_p
        fi = jnp.where(tail, t_i, f1_i)
        ff = jnp.where(tail, t_f, f1_f)

    # rows beyond lc+4: linear extrapolation from row lc+3 (pad_linelocs)
    last_row = jnp.clip(lc + 3, 0, R - 1)
    over = lrow > lc + 4
    ext_i = fi[last_row] + inlinelen * (lrow - (lc + 4))
    fi = jnp.where(over, ext_i, fi)
    ff = jnp.where(over, ff[last_row], ff)

    # renormalize so |frac| < 1
    q = jnp.floor(ff)
    fi = (fi + q.astype(jnp.int32)).astype(jnp.int32)
    ff = (ff - q).astype(jnp.float32)

    bad = ~exact & ~over
    bad = bad.at[:10].set(False)

    # failure modes the host path surfaces as exceptions -> invalid field:
    # no regular peaks at all, an in-range row with neither neighbor, or a
    # tail chain reaching below line 1 (host would KeyError)
    inrange = lrow <= lc + 4
    fillable = jnp.all(jnp.where(inrange, has_p | has_n, True))
    chain_ok = jnp.all(jnp.where(inrange & tail, pnum >= 2, True))
    okflag = any_reg & fillable & chain_ok
    return LinelocsDev(fi, ff, bad, okflag)
