"""Batched streaming driver for the NTSC comb: one jitted call per
window of frames.

The frame-at-a-time driver (`comb_ntsc.NTSCComb.process`) mirrors the
reference's stdin loop (comb-ntsc.cxx:1099-1117) and is correct, but on
a remote-tunneled TPU it pays, per frame: a dispatch round trip for the
flow luma + a full-frame fetch of it, two Farneback dispatches with
their flow-field fetches, and a final comb dispatch plus the RGB48
fetch — ~6 round trips and ~8 MB of transfers each, which caps the
full decode->RGB chain near 1 fps regardless of compute speed.

This driver runs the SAME math as the streaming one — `flow_luma`,
the Farneback chain (optflow.py), `_frame_core` — but restructured the
TPU-native way:

  * a window of M frames uploads in one host->device put;
  * ONE jitted call emits all M-1 frames: the per-field optical-flow
    chain is a `lax.scan` (the flow of emission e seeds emission e+1,
    exactly the streaming OPTFLOW_USE_INITIAL_FLOW protocol), and the
    burst-AGC EMA rides the same scan carry;
  * the RGB48 output comes back as per-frame chunks fetched eagerly on
    executor threads (the same saturation trick tbc/pipeline.py uses).

PALCombBatch applies the same restructuring to the PAL comb — simpler,
because the PAL driver carries no cross-frame state at all (no AGC EMA,
no flow), so whole windows vmap instead of scanning.

Emission protocol parity with NTSCComb (pinned by tests/test_comb_batch.py):
dim 3 + optical flow never emits frame 0 and emits frame e when frame
e+1 arrives; dim 3 without flow emits e from the (e-1, e, e+1) ring;
dims 1/2 emit every frame immediately.  The first flow of a stream uses
a zero initial field, which is bit-identical to the streaming path's
use_initial_flow=False (the pyramid seeds zeros either way).
"""

from __future__ import annotations

import concurrent.futures
import functools
import threading
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ld_decode_tpu.comb.comb_ntsc import (
    CombConfig, IN_X, IN_Y, _frame_core, flow_luma)
from ld_decode_tpu.comb.comb_pal import (
    CombPALConfig, PAL_X, PAL_Y, comb_pal_frame)
from ld_decode_tpu.comb.optflow import _farneback_jit

# flow-field geometry (comb-ntsc.cxx:606-615): each field's luma is a
# 252x840 image; the pyramid cap keeps both dims >= 32 px, which for
# 252 rows at pyr_scale 0.5 caps the requested 4 levels to 2
_CYSIZE, _CXSIZE = 252, IN_X - 70
_FB_LEVELS = 2

_FALLBACK_LOCK = threading.Lock()


def _field_pics(lum: jnp.ndarray) -> jnp.ndarray:
    """(Y, X) luma -> (2, 252, 840) u16-quantized field images, the
    exact extraction the streaming driver feeds the flow engine."""
    out = []
    for field in range(2):
        rows = np.clip(23 + field + 2 * np.arange(_CYSIZE), 0, IN_Y - 1)
        pic = jnp.clip(lum[rows, 70:70 + _CXSIZE], 0, 65535
                       ).astype(jnp.uint16)
        out.append(pic)
    return jnp.stack(out)


def _crop(rgb: jnp.ndarray, cfg: CombConfig) -> jnp.ndarray:
    return rgb if cfg.wide else rgb[:, 78:78 + 744]


@functools.partial(jax.jit, static_argnames=('cfg',))
def _comb_window_of(win, flow0, ab0, cfg: CombConfig):
    """win: (M, Y, X) u16.  Emits frames win[0..M-2], each against its
    successor, chaining the per-field flow and the burst AGC."""
    lum = jax.vmap(lambda f: flow_luma(f, cfg))(win)
    pics = jax.vmap(_field_pics)(lum)              # (M, 2, 252, 840)

    def step(carry, x):
        flow_c, ab = carry
        cur, nxt, pc, pn = x
        flows = []
        for field in range(2):
            # streaming arg order: prev_img = the NEWER field image
            # (farneback_combk2: pic=now, prev_pics=older)
            flows.append(_farneback_jit(
                pn[field], pc[field], flow_c[field], 0.5, _FB_LEVELS,
                60, 3, 7, 1.5, True))
        flow_n = jnp.stack(flows)
        mag = jnp.sqrt(flow_n[..., 1] ** 2 + (flow_n[..., 0] * 2) ** 2)
        c = 1.0 - jnp.clip((mag - cfg.of_3dcore) / cfg.of_3drange, 0, 1)
        c = jnp.minimum(c[0], c[1])
        combk2 = jnp.pad(jnp.repeat(c, 2, axis=0),
                         ((0, IN_Y - 2 * _CYSIZE), (70, 0)))
        rgb, ab2, _ = _frame_core(cur, nxt, nxt, ab, cfg,
                                  combk2_in=combk2)
        return (flow_n, ab2), (_crop(rgb, cfg), cur[0, :16])

    xs = (win[:-1], win[1:], pics[:-1], pics[1:])
    (flow_n, ab), (rgb, words) = jax.lax.scan(step, (flow0, ab0), xs)
    return rgb, words, flow_n, ab


@functools.partial(jax.jit, static_argnames=('cfg',))
def _comb_window_ring(win, ab0, cfg: CombConfig):
    """No-opticalflow dim 3: emit win[1..M-2] from (e-1, e, e+1) rings."""
    def step(ab, x):
        prv, cur, nxt = x
        rgb, ab2, _ = _frame_core(cur, prv, nxt, ab, cfg)
        return ab2, (_crop(rgb, cfg), cur[0, :16])

    xs = (win[:-2], win[1:-1], win[2:])
    ab, (rgb, words) = jax.lax.scan(step, ab0, xs)
    return rgb, words, ab


@jax.jit
def _to_rgb8(rgb):
    return (rgb >> 8).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=('cap', 'hpass'))
def _rgb_encode(rgb, cap: int, hpass: bool = False):
    """Adaptive-plane codec for the RGB48 output stream (the same
    machinery as the picture codec, fused.encode_image_planes): planar
    layout, vertical lag-1 delta per channel (RGB48 adds the horizontal
    gradient pass — fused._codec_residual hpass, 0.45x -> 0.36x raw
    measured on real comb output), per-block bit planes with the Rice
    escape.  RGB48 is 2 MB/frame raw — the dominant D2H stream of the
    full chain on tunneled hosts; the host fetches only the used
    prefixes."""
    from ld_decode_tpu.tbc import fused as FU
    E, rows0, W, _ = rgb.shape
    img = jnp.moveaxis(rgb, 3, 1).reshape(E, 3 * rows0, W).astype(jnp.int32)
    Wp = -(-W // FU.CODEC_BW) * FU.CODEC_BW
    if Wp != W:
        img = jnp.pad(img, ((0, 0), (0, 0), (0, Wp - W)), mode='edge')
    planes, tab, qstreams, qwords = jax.vmap(
        lambda im: FU.encode_image_planes(im, 1, hpass))(img)
    dense, rows = FU.compact_planes(planes, tab, cap)
    qcap = FU.codec_qcap_words(3 * rows0, Wp // FU.CODEC_BW) * E
    dense_q, qw = FU.compact_qstreams(qstreams, qwords, qcap)
    return dense, dense_q, jnp.stack([rows, qw]), \
        jax.vmap(FU.pack_tab)(tab)


class _RgbCodecMixin:
    """Shared encode-dispatch / prefix-fetch / decode for the batched
    comb drivers' RGB48 output."""

    def _note_decode_fallback(self):
        """Record (and, once, announce) a failed lossless-RGB decode.
        The counter is written from up to 12 concurrent decode threads,
        so it takes a (module-level — triggers are rare) lock; the
        first trigger warns on stderr: a silently blacked frame in the
        output stream must be visible to callers (ADVICE r4)."""
        import sys
        with _FALLBACK_LOCK:
            n = self.stats.get('rgb_decode_fallback', 0) + 1
            self.stats['rgb_decode_fallback'] = n
            if n == 1:
                print('WARNING: RGB codec consistency gate failed; '
                      'emitting a black frame (see '
                      'stats["rgb_decode_fallback"])', file=sys.stderr)

    def _codec_exec(self):
        if getattr(self, '_codec_ex', None) is None:
            # latency-shaped bad weather needs 8+ concurrent streams to
            # hold 40+ MB/s (scripts/probe_link_shape.py).  Dedicated
            # to TRANSFERS: the per-frame native decodes used to share
            # this pool and parked fetch chunks behind ~14 ms decode
            # jobs — the link idled at ~50% while pass timings blamed
            # the weather (BENCH r5 noflow pass asymmetry)
            self._codec_ex = concurrent.futures.ThreadPoolExecutor(
                max_workers=12)
        return self._codec_ex

    def _decode_exec(self):
        if getattr(self, '_decode_ex', None) is None:
            # native codec decode jobs (~14 ms each, GIL-dropping)
            self._decode_ex = concurrent.futures.ThreadPoolExecutor(
                max_workers=8)
        return self._decode_ex

    def _codec_dispatch(self, rgb, out8=False):
        from ld_decode_tpu.tbc import fused as FU
        from ld_decode_tpu.tbc.pipeline import (grid_fetch_chunks,
                                                grid_round_up)
        E, rows0, W, _ = rgb.shape
        Wp = -(-W // FU.CODEC_BW) * FU.CODEC_BW
        # per-image block count rounded to the compaction unit — an
        # unrounded cap truncates the trailing units whenever
        # 3*rows0*NB % 32 != 0 (e.g. the 525-line -L mode)
        cap = FU.codec_cap_words(3 * rows0 * (Wp // FU.CODEC_BW), E)
        # the 2D gradient pass pays on full-depth RGB48 only (rgb8's
        # residuals are already near the noise floor; the pass loses
        # 0.082x -> 0.091x there — probe_codec_rate.py)
        hpass = not out8
        dense, dense_q, rows2, wtab = _rgb_encode(rgb, cap, hpass)
        # speculative EMA-sized prefix fetch, same trick as the
        # pipeline's picture codec (tbc/pipeline.py::_dispatch): the
        # transfers start the moment the device finishes the window
        # instead of waiting a tunnel round trip for the exact counts
        # — the counts only gate the rare top-up on underestimate
        spec = spec_q = None
        if getattr(self, '_rows_ema', None) is not None \
                and getattr(self, '_qw_ema', None) is not None:
            ex = self._codec_exec()
            n_est = min(cap, grid_round_up(int(self._rows_ema * 1.25)))
            spec = (n_est, grid_fetch_chunks(ex, dense, n_est))
            n_est_q = min(int(dense_q.shape[0]),
                          grid_round_up(int(self._qw_ema * 1.25)))
            spec_q = (n_est_q, grid_fetch_chunks(ex, dense_q, n_est_q))
        # submission order matters: rows/wtab before fetch_decode, so
        # the FIFO pool can never park fetch_decode ahead of the
        # futures it joins
        fut_rows = self._ex.submit(np.asarray, rows2)
        fut_wtab = self._ex.submit(np.asarray, wtab)
        fut_frames = self._ex.submit(self._codec_fetch_decode,
                                     (dense, dense_q), fut_rows,
                                     fut_wtab, (E, rows0, W, out8),
                                     spec, spec_q)
        self.stats['windows'] += 1
        return ('codec', fut_frames)

    def _prefix(self, dense, n, spec):
        """Assemble dense[:n], reusing the speculative prefix and
        topping up only on underestimate (pipeline._fetch_prefix)."""
        from ld_decode_tpu.tbc.pipeline import grid_fetch_chunks
        if n <= 0:
            return np.zeros(0, np.uint16)
        ex = self._codec_exec()
        if spec is None:
            return np.concatenate(
                [f.result() for f in grid_fetch_chunks(ex, dense, n)])
        n_est, futs = spec
        parts = [f.result() for f in futs]
        if n_est < n:
            parts += [f.result() for f in
                      grid_fetch_chunks(ex, dense, n - n_est, n_est)]
        return np.concatenate(parts)[:n] if parts else \
            np.zeros(0, np.uint16)

    def _codec_fetch_decode(self, denses, fut_rows, fut_wtab, shape,
                            spec=None, spec_q=None):
        """Runs on an _ex worker: prefix-fetch both dense buffers
        (chunk sets submitted together so the transfers interleave on
        the link), then decode every frame concurrently on the codec
        executor.  The consumer's collect() joins a finished (or
        nearly finished) result instead of fetching + decoding E
        frames serially on its own thread — that serial path was ~90%
        of the no-flow chain's wall time (scripts/probe_chain.py)."""
        from ld_decode_tpu.tbc import fused as FU
        from ld_decode_tpu.tbc import native_codec as NC
        E, rows0, W, out8 = shape
        hpass = not out8              # must mirror _codec_dispatch
        rows2 = fut_rows.result().astype(np.int64)
        total = int(rows2[0].sum())
        totq = int(rows2[1].sum())
        with _FALLBACK_LOCK:          # summed across decode workers
            self.stats['shipped_u16'] = (self.stats.get('shipped_u16', 0)
                                         + int(rows2.sum()))
            self.stats['frames_out'] = (self.stats.get('frames_out', 0)
                                        + E)
            # EMA feeds the next window's speculative prefix (benign
            # staleness; top-up covers undershoot)
            self._rows_ema = total if getattr(self, '_rows_ema', None) \
                is None else 0.5 * self._rows_ema + 0.5 * total
            self._qw_ema = totq if getattr(self, '_qw_ema', None) \
                is None else 0.5 * self._qw_ema + 0.5 * totq
        dense = self._prefix(denses[0], total, spec)
        dense_q = self._prefix(denses[1], totq, spec_q)
        wtab = fut_wtab.result()
        Wp = -(-W // FU.CODEC_BW) * FU.CODEC_BW
        NB = Wp // FU.CODEC_BW
        offs = np.concatenate([[0], np.cumsum(rows2[0])])
        offs_q = np.concatenate([[0], np.cumsum(rows2[1])])
        native = NC.available()

        def one(e):
            dv = dense[offs[e]:offs[e + 1]]
            qv = dense_q[offs_q[e]:offs_q[e + 1]]
            img = None
            if native:
                tab = NC.unpack_tab(wtab[e], 3 * rows0 * NB)
                got = NC.decode_image(tab, dv, qv, (3 * rows0, Wp), 1,
                                      hpass)
                if got is not None and got[1] == rows2[0][e]:
                    img = got[0]
            if img is None and not native:
                tab = FU.unpack_tab(wtab[e], 3 * rows0, NB)
                if FU.shipped_plane_words_np(tab & 0x1F) == rows2[0][e]:
                    img = FU.decode_image_planes(tab, dv, qv,
                                                 (3 * rows0, Wp), 1,
                                                 hpass=hpass)
            if img is None:
                # consistency gate failed (short fetch / corrupt
                # counts): a black frame beats crashing the stream
                self._note_decode_fallback()
                img = np.zeros((3 * rows0, Wp), np.uint16)
            arr = np.ascontiguousarray(
                np.moveaxis(img[:, :W].reshape(3, rows0, W), 0, 2))
            return arr.astype(np.uint8) if out8 else arr

        return list(self._decode_exec().map(one, range(E)))

    def _codec_decode(self, handle):
        return handle[1].result()


@functools.partial(jax.jit, static_argnames=('cfg',))
def _comb_window_simple(win, ab0, cfg: CombConfig):
    """dims 1/2: every frame emits; only the AGC chains."""
    def step(ab, cur):
        rgb, ab2, _ = _frame_core(cur, cur, cur, ab, cfg)
        return ab2, (_crop(rgb, cfg), cur[0, :16])

    ab, (rgb, words) = jax.lax.scan(step, ab0, win)
    return rgb, words, ab


@functools.partial(jax.jit, static_argnames=('cfg',))
def _pal_window_simple(win, cfg):
    """PAL dims 1/2: no cross-frame state at all — pure vmap."""
    return jax.vmap(lambda f: comb_pal_frame(f, cfg)[0])(win)


@functools.partial(jax.jit, static_argnames=('cfg',))
def _pal_window_3d(win, cfg):
    """PAL dim 3: emit win[1..M-2] from (e-1, e, e+1) rings; the PAL
    comb has no AGC carry, so the whole window vmaps (no scan)."""
    return jax.vmap(
        lambda p, c, n: comb_pal_frame(c, cfg, p, n)[0])(
        win[:-2], win[1:-1], win[2:])


@functools.partial(jax.jit, static_argnames=('cfg',))
def _pal_frame_2d(frame, cfg):
    return comb_pal_frame(frame, cfg)[0]


class PALCombBatch(_RgbCodecMixin):
    """Batched drop-in for PALComb with the NTSCCombBatch feed/collect
    protocol.  Emission order matches the streaming driver exactly:
    frame 0 comes back 2D, frame k-1 3D when frame k arrives, flush()
    returns the final pending frame 2D."""

    def __init__(self, cfg: CombPALConfig = CombPALConfig(),
                 fetch_streams=8, out8: bool = False, codec: bool = True):
        self.cfg = cfg
        self.out8 = out8
        self.codec = codec
        self._pend = None           # (k, Y, X) device, k <= 2 (dim 3)
        self._first = True
        self._ex = concurrent.futures.ThreadPoolExecutor(
            max_workers=fetch_streams)
        self.stats = {'t_feed': 0.0, 't_collect': 0.0, 'windows': 0}

    def feed(self, frames: np.ndarray):
        import time as _time
        t0 = _time.perf_counter()
        cfg = self.cfg
        if isinstance(frames, jax.Array):
            # device-resident chain input: no host round trip
            dev = frames.reshape(-1, PAL_Y, PAL_X)
        else:
            dev = jnp.asarray(
                np.asarray(frames).reshape(-1, PAL_Y, PAL_X))
        try:
            if cfg.dim < 3:
                if not dev.shape[0]:
                    return None
                return self._fetch(_pal_window_simple(dev, cfg))
            head = None
            if self._first and dev.shape[0]:
                head = _pal_frame_2d(dev[0], cfg)[None]  # frame 0: 2D
                self._first = False
            if self._pend is not None:
                dev = jnp.concatenate([self._pend, dev]) \
                    if dev.shape[0] else self._pend
            if dev.shape[0] < 3:
                self._pend = dev
                return self._fetch(head) if head is not None else None
            self._pend = dev[-2:]
            rgb = _pal_window_3d(dev, cfg)
            if head is not None:
                rgb = jnp.concatenate([head, rgb])
            return self._fetch(rgb)
        finally:
            self.stats['t_feed'] += _time.perf_counter() - t0

    def _fetch(self, rgb):
        if self.codec:
            if self.out8:
                # 8-bit output still rides the codec (raw u8 is
                # 1 MB/frame -- transfer-capped on the tunnel)
                return self._codec_dispatch(
                    _to_rgb8(rgb).astype(jnp.uint16), out8=True)
            return self._codec_dispatch(rgb)
        if self.out8:
            rgb = _to_rgb8(rgb)
        flat = rgb.reshape(-1)
        n = int(flat.shape[0])
        k = max(1, min(64, n // (128 * 1024)))
        step = -(-n // k)
        futs = [self._ex.submit(np.asarray, flat[i * step:(i + 1) * step])
                for i in range(k)]
        self.stats['windows'] += 1
        return ('raw', futs, rgb.shape)

    def collect(self, handle):
        """(rgb_list, words_list) — words are None (PAL has no pulldown
        metadata), keeping the NTSCCombBatch API shape."""
        if handle is None:
            return [], []
        import time as _time
        t0 = _time.perf_counter()
        if handle[0] == 'codec':
            out = self._codec_decode(handle)
        else:
            _, futs, shape = handle
            out = list(np.concatenate([f.result() for f in futs]
                                      ).reshape(shape))
        self.stats['t_collect'] += _time.perf_counter() - t0
        return out, [None] * len(out)

    def process_many(self, frames: np.ndarray):
        return self.collect(self.feed(frames))[0]

    def flush(self):
        """Final pending frame, 2D (no successor) — streaming parity."""
        if self.cfg.dim < 3 or self._pend is None or self._pend.shape[0] < 2:
            return None
        rgb = np.asarray(_pal_frame_2d(self._pend[-1], self.cfg))
        if self.out8:
            rgb = (rgb >> 8).astype(np.uint8)
        return rgb


class NTSCCombBatch(_RgbCodecMixin):
    """Batched drop-in for NTSCComb: `feed(frames)` dispatches a window,
    `collect(handle)` returns (rgb_list, words_list); `process_many` is
    the blocking combination.  Debug surfaces (-D/-k/-l) stay on the
    streaming driver."""

    def __init__(self, cfg: CombConfig = CombConfig(), fetch_streams=8,
                 out8: bool = False, codec: bool = True):
        if cfg.debug2d or cfg.showk or cfg.debugline > -9999:
            raise ValueError('debug surfaces need the streaming NTSCComb')
        self.cfg = cfg
        # comb -8 on device: top byte only, halving the D2H bytes;
        # codec=True (RGB48 only): the adaptive-plane codec instead,
        # losslessly — typically a ~2-3x smaller stream than -8
        self.out8 = out8
        self.codec = codec
        self._pend: Optional[jnp.ndarray] = None   # (k, Y, X) device
        self._flow = jnp.zeros((2, _CYSIZE, _CXSIZE, 2), jnp.float32)
        self.aburstlev = jnp.float32(-1.0)
        self._started = False
        self._ex = concurrent.futures.ThreadPoolExecutor(
            max_workers=fetch_streams)
        self.stats = {'t_feed': 0.0, 't_collect': 0.0, 'windows': 0}

    def feed(self, frames: np.ndarray):
        """frames: (N, IN_Y*IN_X) or (N, IN_Y, IN_X) uint16.  Dispatches
        the comb for every emittable frame; returns a handle for
        collect(), or None if nothing can emit yet."""
        import time as _time
        t0 = _time.perf_counter()
        cfg = self.cfg
        if isinstance(frames, jax.Array):
            # device-resident chain input: no host round trip
            dev = frames.reshape(-1, IN_Y, IN_X)
        else:
            dev = jnp.asarray(
                np.asarray(frames).reshape(-1, IN_Y, IN_X))
        try:
            return self._feed(dev)
        finally:
            self.stats['t_feed'] += _time.perf_counter() - t0

    def _feed(self, dev):
        cfg = self.cfg
        if cfg.dim < 3:
            rgb, words, self.aburstlev = _comb_window_simple(
                dev, self.aburstlev, cfg)
            return self._eager_fetch(rgb, words)

        if not self._started and cfg.opticalflow and dev.shape[0]:
            # stream start: frame 0 is never emitted in flow mode (its
            # ring slot is the unused prv input, comb-ntsc.cxx:860-866)
            dev = dev[1:]
            self._started = True
        if self._pend is not None:
            dev = jnp.concatenate([self._pend, dev]) \
                if dev.shape[0] else self._pend
        keep = 1 if cfg.opticalflow else 2
        if dev.shape[0] <= keep:
            self._pend = dev
            return None
        self._pend = dev[-keep:]
        if cfg.opticalflow:
            rgb, words, self._flow, self.aburstlev = _comb_window_of(
                dev, self._flow, self.aburstlev, cfg)
        else:
            rgb, words, self.aburstlev = _comb_window_ring(
                dev, self.aburstlev, cfg)
        return self._eager_fetch(rgb, words)

    def _eager_fetch(self, rgb, words):
        if self.codec:
            if self.out8:
                return self._codec_dispatch(
                    _to_rgb8(rgb).astype(jnp.uint16), out8=True), words
            return self._codec_dispatch(rgb), words
        if self.out8:
            rgb = _to_rgb8(rgb)
        # the tunnel D2H link wants many small concurrent streams
        # (measured: 64 x 256 KB on 8 workers ~3x one 2 MB/frame slice)
        flat = rgb.reshape(-1)
        n = int(flat.shape[0])
        k = max(1, min(64, n // (128 * 1024)))
        step = -(-n // k)
        futs = [self._ex.submit(np.asarray, flat[i * step:(i + 1) * step])
                for i in range(k)]
        self.stats['windows'] += 1
        return ('raw', futs, rgb.shape), words

    def collect(self, handle) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        if handle is None:
            return [], []
        import time as _time
        t0 = _time.perf_counter()
        payload, words = handle
        w = np.asarray(words)
        if payload[0] == 'codec':
            out = self._codec_decode(payload)
        else:
            _, futs, shape = payload
            out = list(np.concatenate([f.result() for f in futs]
                                      ).reshape(shape))
        self.stats['t_collect'] += _time.perf_counter() - t0
        return out, [w[e] for e in range(len(out))]

    def process_many(self, frames: np.ndarray) -> List[np.ndarray]:
        rgbs, _ = self.collect(self.feed(frames))
        return rgbs
