"""VBI Philips-code (IEC 60857) slicing and interpretation.

The slicer walks 50-IRE crossings at ~2 µs spacing across a VBI line and
packs 24 Manchester-coded bits into six nibbles
(reference lddecode_core.py:814-834); interpretation covers CAV picture
numbers, CLV timecodes and status codes (lddecode_core.py:836-884).  The
richer IEC 60857 field set (chapters, lead-in/out, programme status) follows
the C++ interpreter (reference app/tbc/interpretvbi.cpp:31-310).

Host-side: the walk is ~24 crossings over 3 lines per field.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ld_decode_tpu.utils.params import DecoderConfig


def calczc_host(data: np.ndarray, start: float, target: float,
                count: float) -> Optional[float]:
    """Sub-sample zero-crossing search (reference lddutils.py:265-303)."""
    s = int(start)
    c = int(count) + 1
    if s < 0 or s >= len(data):
        return None
    seg = data[s:s + c]
    if len(seg) == 0:
        return None
    if seg[0] < target:
        locs = np.nonzero(seg >= target)[0]
    else:
        locs = np.nonzero(seg <= target)[0]
    if len(locs) == 0:
        return None
    x = s + int(locs[0])
    if x == 0:
        return None
    a = data[x - 1] - target
    b = data[x] - target
    den = (-a + b)
    y = -a / den if den != 0 else 0.0
    return x - 1 + y


def decode_philips_line(data, linestart: float,
                        cfg: DecoderConfig) -> Optional[List[int]]:
    """Slice one VBI line into six nibbles, or None if invalid.

    `data` may be a jnp array; only a single line window is transferred.
    """
    usec = cfg.freq_mhz
    w0 = int(linestart)
    w1 = min(w0 + cfg.linelen + int(16 * usec), data.shape[0])
    if w0 < 0 or w1 - w0 < cfg.linelen // 2:
        return None
    win = np.asarray(data[w0:w1], dtype=np.float64)
    ire50 = cfg.iretohz(50)

    rel0 = linestart - w0
    curzc = calczc_host(win, rel0 + 2 * usec, ire50, 12 * usec)
    zcs = []
    while curzc is not None:
        before = int(curzc - 0.5 * usec)
        bit = bool(win[before] < ire50) if 0 <= before < len(win) else False
        zcs.append((curzc, bit))
        curzc = calczc_host(win, curzc + 1.9 * usec, ire50, 0.2 * usec)

    if len(zcs) != 24:
        return None
    gaps = np.diff([z[0] for z in zcs]) / usec
    if gaps.min() <= 1.85 or gaps.max() >= 2.15:
        return None

    bits = [z[1] for z in zcs]
    nibbles = []
    for b in range(0, 24, 4):
        n = (bits[b] << 3) | (bits[b + 1] << 2) | (bits[b + 2] << 1) \
            | bits[b + 3]
        nibbles.append(n)
    return nibbles


def interpret_philips(linecode: Dict[int, Optional[List[int]]]) -> dict:
    """Merge the per-line codes into the field VBI record
    (reference lddecode_core.py:836-884)."""
    vbi = {
        'minutes': None, 'seconds': None, 'clvframe': None, 'framenr': None,
        'statuscode': None, 'status': None, 'isclv': False,
    }
    for l, lc in linecode.items():
        if lc is None:
            continue
        if lc[0] == 15 and lc[2] == 13:          # CLV timecode (hours/min)
            vbi['minutes'] = 60 * lc[1] + lc[4] * 10 + lc[5]
            vbi['isclv'] = True
        elif lc[0] == 15:                        # CAV picture number
            vbi['framenr'] = ((lc[1] & 7) * 10000 + lc[2] * 1000
                              + lc[3] * 100 + lc[4] * 10 + lc[5])
        else:
            h = 0
            for nib in lc:
                h = (h << 4) | nib
            if lc[2] == 0xE:                     # CLV seconds/frame
                vbi['seconds'] = (lc[1] - 10) * 10 + lc[3]
                vbi['clvframe'] = lc[4] * 10 + lc[5]
                vbi['isclv'] = True
            htop = h >> 12
            if htop in (0x8dc, 0x8ba):           # programme status code
                vbi['status'] = h
            if h == 0x87ffff:
                vbi['isclv'] = True
    return vbi


def slice_philips_dev(win, rel0, usec: float, ire50: float):
    """Device port of `decode_philips_line` + `calczc_host`: slice one VBI
    line window into six nibbles entirely on-device (the ~3k-sample
    windows were 7% of the per-field transfer).

    win: (W,) float demod window starting at the line anchor; rel0: the
    line-start fraction.  Returns (nibbles (6,) int32, ok bool) with the
    host path's exact semantics: 24 crossings walked at ~2 us spacing,
    per-crossing bit from the sample 0.5 us before, 1.85..2.15 us gap
    gate.
    """
    import jax
    import jax.numpy as jnp

    W = win.shape[0]
    iusec = usec

    def calczc(start, span_i, count_c):
        """(zc, found): first 50-IRE crossing in win[s : s+count+1]."""
        s = start.astype(jnp.int32)          # host int() truncation; s >= 0
        inb = (s >= 0) & (s < W)
        sc = jnp.clip(s, 0, W - 1)
        # the slice start clamps at W-span_i near the window end, so
        # address seg[] by its TRUE sample index s0+k (a search starting
        # within span_i of the end would otherwise misreport positions)
        s0 = jnp.clip(sc, 0, max(W - span_i, 0))
        seg = jax.lax.dynamic_slice(win, (s0,), (span_i,))
        first = win[sc]
        rising = first < ire50
        cond = jnp.where(rising, seg >= ire50, seg <= ire50)
        k = jnp.arange(span_i)
        idx = s0 + k
        cond = cond & (idx >= sc) & (idx - sc < count_c) & (idx < W)
        found = jnp.any(cond) & inb
        fidx = jnp.argmax(cond)
        x = s0 + fidx
        found = found & (x > 0)
        xm = jnp.clip(x, 1, W - 1)
        a = win[xm - 1] - ire50
        b = win[xm] - ire50
        den = b - a
        y = jnp.where(den != 0, -a / jnp.where(den == 0, 1.0, den), 0.0)
        return (x - 1 + y).astype(win.dtype), found

    span0 = int(12 * iusec) + 2               # covers count+1
    spann = int(0.2 * iusec) + 2

    zc, active = calczc(rel0 + 2 * iusec, span0,
                        jnp.int32(int(12 * iusec) + 1))
    zcs = [zc]
    acts = [active]
    for _ in range(24):                        # 23 more + overrun probe
        zc2, f2 = calczc(zcs[-1] + 1.9 * iusec, spann,
                         jnp.int32(int(0.2 * iusec) + 1))
        nxt_active = acts[-1] & f2
        zcs.append(jnp.where(nxt_active, zc2, zcs[-1]))
        acts.append(nxt_active)

    nfound = sum(a.astype(jnp.int32) for a in acts)
    ok = nfound == 24                          # exactly 24 (25th must fail)

    z = jnp.stack(zcs[:24])
    gaps = (z[1:] - z[:-1]) / iusec
    ok = ok & (jnp.min(gaps) > 1.85) & (jnp.max(gaps) < 2.15)

    before = (z - 0.5 * iusec).astype(jnp.int32)
    binb = (before >= 0) & (before < W)
    bits = jnp.where(binb, win[jnp.clip(before, 0, W - 1)] < ire50, False)

    weights = jnp.asarray([8, 4, 2, 1], jnp.int32)
    nibbles = jnp.sum(bits.reshape(6, 4).astype(jnp.int32)
                      * weights[None, :], axis=1)
    return nibbles, ok
