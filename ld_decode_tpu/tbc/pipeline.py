"""Speculative field-batch prefetcher.

Round-trip latency to the device (~30 ms here) dominates sequential field
decoding, so fields are decoded in speculative batches: predicted window
starts (nominal field pitch from the last known position) are analyzed in
one vmapped call, the host runs its O(peaks) logic per field, and one
vmapped finish call produces every field's packed bundle — two round trips
per BATCH instead of per field.  Fields self-lock onto their own sync peaks,
so start-prediction error only shifts the analysis window, not the output;
a mispredicted/invalid window falls back to the sequential path.

Deviation from the reference (documented): in batched mode the audio chase
resampler's carry offset advances every field, not once per frame — the
reference's per-frame staleness (lddecode_core.py:1203, 1289) is a quirk,
and the per-field chain is deterministic host arithmetic:
    count = ceil((frametime + gap - offset)/gap)
    offset' = offset + (count-1)*gap - frametime.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ld_decode_tpu.tbc import fused as FU
from ld_decode_tpu.tbc.field import FieldDecoder, FieldResult
from ld_decode_tpu.vbi.philips import decode_philips_line, interpret_philips


@dataclass
class _Entry:
    readsample: int
    result: FieldResult
    mtf_level: float
    audio_offset: float


def chain_audio_offset(offset: float, linecount: int, line_period: float,
                       freq: float = 48000.0) -> float:
    """Replicates fused._downscale_audio_dev's float32 arithmetic exactly
    (op order included) so host-predicted offsets match the device chain
    bit-for-bit — a mismatched count would shift a tick and flush the
    prefetch queue."""
    f = np.float32
    frametime = f(f(f(line_period) * f(linecount)) / f(1e6))
    gap = f(1.0 / freq)
    count = int(np.ceil(f(f(f(frametime + gap) - f(offset)) / gap)))
    count = max(count, 1)
    return float(f(f(f(offset) + f(f(count - 1) * gap)) - frametime))


class FieldPrefetcher:
    """Supplies FieldResults to the Framer from speculative batches.

    With `pipelined=True` a single worker thread runs one batch of
    lookahead: while the consumer drains batch k, batch k+1's device
    dispatches and (dominant) D2H transfers proceed in the background.
    The worker is the only thread issuing jax calls for this decoder."""

    def __init__(self, decoder: FieldDecoder, capture_dev, batch: int = 8,
                 pipelined: bool = True):
        self.decoder = decoder
        self.capture = capture_dev
        self.batch = batch
        self.queue: List[_Entry] = []
        cfg = decoder.cfg
        # nominal field pitch in capture samples
        self.field_pitch = int(round(cfg.freq_hz / cfg.sys.fps / 2))
        self.tol = cfg.linelen * 20
        self.stats = {'refills': 0, 'hits': 0, 'flush_sample': 0,
                      'flush_mtf': 0, 'flush_audio': 0, 'seq_fallback': 0,
                      'lookahead_used': 0, 'lookahead_wasted': 0}
        self.pipelined = pipelined
        self._executor = None
        self._pending = None      # (future -> List[_Entry], pred_sample,
                                  #  mtf, audio_offset)

    def flush(self):
        self.queue.clear()

    # -------------------------------------------------------------- look-ahead

    def _exec(self):
        if self._executor is None:
            import concurrent.futures
            self._executor = concurrent.futures.ThreadPoolExecutor(
                max_workers=1)
        return self._executor

    def _chain_after(self, e: _Entry):
        nxt_sample = e.readsample + e.result.nextfieldoffset
        nxt_offset = chain_audio_offset(e.audio_offset, e.result.linecount,
                                        self.decoder.cfg.sys.line_period)
        return nxt_sample, e.mtf_level, nxt_offset

    def _maybe_schedule(self):
        if not self.pipelined or self._pending is not None or not self.queue:
            return
        last = self.queue[-1]
        if not last.result.valid:
            return
        sample, mtf, off = self._chain_after(last)
        fut = self._exec().submit(self._build_entries, sample, mtf, off)
        self._pending = (fut, sample, mtf, off)

    def _harvest(self, want_sample=None, mtf_level=None, audio_offset=None):
        """Merge a finished (or awaited) lookahead batch into the queue."""
        if self._pending is None:
            return
        fut, psample, pmtf, poff = self._pending
        must_wait = (want_sample is not None
                     and abs(psample - want_sample) <= self.tol
                     and abs(pmtf - mtf_level) <= .02
                     and abs(poff - audio_offset) < 2e-5)
        if not fut.done() and not must_wait:
            return
        self._pending = None
        try:
            entries = fut.result()
        except Exception:
            entries = []
        if entries and not self.queue:
            self.queue.extend(entries)
            self.stats['lookahead_used'] += 1
        elif entries and self.queue:
            # only append if it chains after the current tail
            exp, _, _ = self._chain_after(self.queue[-1])
            if abs(entries[0].readsample - exp) <= self.tol:
                self.queue.extend(entries)
                self.stats['lookahead_used'] += 1
            else:
                self.stats['lookahead_wasted'] += 1
        else:
            self.stats['lookahead_wasted'] += 1

    # ------------------------------------------------------------------

    def get(self, sample: int, mtf_level: float, audio_offset: float
            ) -> Optional[FieldResult]:
        """FieldResult for a window at `sample` (or None at EOF)."""
        if not self.queue:
            self._harvest(sample, mtf_level, audio_offset)
        if self.queue:
            e = self.queue[0]
            # mtf tolerance well below the reference's 0.1 re-decode
            # threshold: a CAV mtf jump flushes the queue so batched and
            # sequential decodes see the same equalizer level
            if (abs(e.readsample - sample) <= self.tol
                    and abs(e.mtf_level - mtf_level) <= .02
                    and abs(e.audio_offset - audio_offset) < 2e-5):
                self.queue.pop(0)
                self.stats['hits'] += 1
                if len(self.queue) <= max(2, self.batch // 4):
                    self._harvest()
                    self._maybe_schedule()
                return e.result
            if abs(e.readsample - sample) > self.tol:
                self.stats['flush_sample'] += 1
            elif abs(e.mtf_level - mtf_level) > .02:
                self.stats['flush_mtf'] += 1
            else:
                self.stats['flush_audio'] += 1
            self.flush()
        if self._pending is not None:
            # drain the stale lookahead (worker owns the jax stream)
            try:
                self._pending[0].result()
            except Exception:
                pass
            self._pending = None
            self._harvest(sample, mtf_level, audio_offset)
            if self.queue:
                return self.get(sample, mtf_level, audio_offset)
        self._refill(sample, mtf_level, audio_offset)
        if not self.queue:
            return None
        entry = self.queue.pop(0)
        self._maybe_schedule()
        return entry.result

    # ------------------------------------------------------------------

    def _refill(self, sample: int, mtf_level: float, audio_offset: float):
        self.queue.extend(self._build_entries(sample, mtf_level,
                                              audio_offset))

    def _build_entries(self, sample: int, mtf_level: float,
                       audio_offset: float) -> List[_Entry]:
        import time as _time
        _t0 = _time.perf_counter()
        self.stats['refills'] += 1
        out: List[_Entry] = []
        dec = self.decoder
        cfg = dec.cfg
        from ld_decode_tpu.ops import demod as D
        n_stream = D.stream_len(cfg, dec.nblocks)
        cap_len = self.capture.shape[0]

        smax = cap_len - n_stream + cfg.blockcut
        starts = []
        n_real = 0
        s = max(int(sample), cfg.blockcut)
        for _ in range(self.batch):
            if s <= smax:
                starts.append(s)
                n_real += 1
            else:
                # keep the compiled batch shape: clamp to the last valid
                # window; the duplicate decodes are discarded below
                starts.append(smax)
            s += self.field_pitch
        if n_real == 0:
            return out

        B = len(starts)
        videoB, audioB, packedB = FU.field_analyze_batch(
            self.capture, jnp.asarray(starts, jnp.int32), dec.bank, cfg,
            dec.nblocks, jnp.float32(mtf_level))
        pk_all = np.asarray(packedB).reshape(B, -1)
        _t1 = _time.perf_counter()

        nmax = FU.max_nlines(cfg)
        ll1i = np.zeros((B, nmax), np.int32)
        ll1f = np.zeros((B, nmax), np.float32)
        badB = np.ones((B, nmax), bool)
        lcB = np.zeros(B, np.int32)
        offB = np.zeros(B, np.float32)
        metas = []
        offset = audio_offset

        nominal = np.arange(nmax, dtype=np.float64) * cfg.linelen + 2000.0
        good = True
        for b in range(B):
            pk = FU.PEAKS_SPEC.unpack(pk_all[b])
            nv = int((pk['idx'] >= 0).sum())
            peaks, vals = pk['idx'][:nv], pk['val'][:nv]
            meta = None
            if good and len(peaks) > 0:
                vsyncs = dec.determine_vsyncs(peaks, vals)
                if len(vsyncs) >= 2 and len(peaks) >= vsyncs[1][1] + 4:
                    istop = bool(vsyncs[0][2])
                    lc = dec.field_lines + (1 if istop else 0)
                    try:
                        ll1, linebad = dec.compute_linelocs(
                            peaks, vals, vsyncs, lc)
                        nfo = int(peaks[vsyncs[1][1] - 10])
                        meta = (istop, lc, ll1, linebad, nfo,
                                len(peaks), len(vsyncs))
                    except Exception:
                        meta = None
            if meta is None:
                # a failed window poisons prediction for later windows;
                # decode only the prefix speculatively
                good = False
                metas.append(None)
                lcB[b] = dec.field_lines
                ll1i[b] = np.floor(nominal).astype(np.int32)
                continue
            istop, lc, ll1, linebad, nfo, npk, nvs = meta
            llp, badp = FU.pad_linelocs(ll1, linebad, nmax, cfg.linelen)
            ll1i[b] = np.floor(llp).astype(np.int32)
            ll1f[b] = (llp - np.floor(llp)).astype(np.float32)
            badB[b] = badp
            lcB[b] = lc
            offB[b] = offset
            metas.append(meta)
            offset = chain_audio_offset(offset, lc, cfg.sys.line_period)

        n_audio1 = dec.nblocks * dec.bank.a_stage1_keep \
            if audioB is not None else 0
        import jax
        bundles = FU.field_finish_batch(
            videoB, audioB, jnp.asarray(ll1i), jnp.asarray(ll1f),
            jnp.asarray(badB), jnp.asarray(lcB), jnp.asarray(offB),
            dec.bank, cfg, n_audio1,
            colorlevel=dec.colorlevel, colorphase=dec.colorphase,
            pallas=jax.default_backend() == 'tpu')
        _t2 = _time.perf_counter()
        bun_all = np.asarray(bundles).reshape(B, -1)
        _t3 = _time.perf_counter()

        spec = FU.finish_bundle_spec(cfg)
        W = cfg.sys.outlinelen
        for b in range(n_real):
            if metas[b] is None:
                break
            istop, lc, ll1, linebad, nfo, npk, nvs = metas[b]
            data = spec.unpack(bun_all[b])
            nlines = len(ll1)
            linelocs = (data['linelocs_i'].astype(np.float64)
                        + data['linelocs_f'].astype(np.float64))[:nlines]
            linecode = {}
            for i, l in enumerate(cfg.sys.philips_codelines):
                linecode[l] = decode_philips_line(
                    data['philips'][i], float(data['philips_frac'][i]), cfg)
            r = FieldResult(
                True, nfo, istop=istop, linecount=lc, tbcstart=nfo,
                peak_count=npk, vsync_count=nvs, linelocs=linelocs,
                burstlevel=data['burstlevel'].astype(np.float64)[:nlines],
                vbi=interpret_philips(linecode), linecode=linecode)
            r.dspicture = data['picture'][:lc * W]
            nout = (int(data['audio_count'][0]) - 1) * 2
            r.dsaudio = data['audio'][:nout]
            r.audio_next_offset = float(data['audio_next_offset'][0])
            out.append(_Entry(starts[b], r, mtf_level, float(offB[b])))
        _t4 = _time.perf_counter()
        for k, v in (('t_analyze', _t1 - _t0), ('t_host', _t2 - _t1),
                     ('t_bundle', _t3 - _t2), ('t_unpack', _t4 - _t3)):
            self.stats[k] = self.stats.get(k, 0.0) + v

        if not out:
            # batch head failed: decode one field sequentially (handles
            # resync/invalid paths exactly)
            self.stats['seq_fallback'] += 1
            r = self.decoder.process_resident(self.capture, int(sample),
                                              mtf_level, audio_offset, True)
            if r is not None:
                out.append(_Entry(int(sample), r, mtf_level, audio_offset))
        return out
