"""Field engine / time-base correction orchestrator.

Maps the reference's `Field`/`FieldNTSC`/`FieldPAL` classes
(reference lddecode_core.py:489-1191) onto a TPU-friendly split:

* device (jit): batched demod (ops/demod.py), sync-peak NMS and vectorized
  zero-crossing refinement (tbc/sync.py), batched line resampling
  (tbc/resample.py), burst phase estimation (tbc/burst.py), audio stage-2
  (audio/stage2.py).
* host (numpy, O(peaks+lines) — microseconds per field): vsync voting,
  line numbering with gap repair, the sequential bad-line propagation, and
  the resync policy.  These mirror the reference's failure/repair semantics,
  which are irreducibly sequential but tiny.

The decision split keeps all O(samples) work on the device; host<->device
traffic per field is the peak list (~KB), line tables (~KB), and the final
picture/audio buffers.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field as dfield
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ld_decode_tpu.ops import demod as D
from ld_decode_tpu.ops.filters import DemodBank
from ld_decode_tpu.tbc import sync as S
from ld_decode_tpu.tbc import resample as RS
from ld_decode_tpu.tbc import burst as B
from ld_decode_tpu.tbc import fused as FU
from ld_decode_tpu.audio.stage2 import audio_stage2
from ld_decode_tpu.audio.downscale import downscale_audio
from ld_decode_tpu.vbi.philips import decode_philips_line, interpret_philips
from ld_decode_tpu.utils.params import DecoderConfig


@dataclass
class FieldResult:
    valid: bool
    nextfieldoffset: int                  # input samples, relative to read start
    istop: bool = False
    linecount: int = 0
    tbcstart: int = 0
    peak_count: int = 0
    vsync_count: int = 0
    linelocs: Optional[np.ndarray] = None
    burstlevel: Optional[np.ndarray] = None
    dspicture: Optional[np.ndarray] = None    # uint16 (linecount*outlinelen)
    # device-resident picture handle (batch_pictures_dev, index): set by
    # the batched prefetcher so chain consumers (comb) can read the
    # picture straight from HBM without the codec D2H + host decode +
    # re-upload round trip.  batch_pictures_dev is (batch, max_lc*W) u16.
    dev_picture: Optional[tuple] = None
    dsaudio: Optional[np.ndarray] = None      # int16 interleaved
    audio_next_offset: float = 0.0
    vbi: Optional[dict] = None
    linecode: Optional[dict] = None
    # Actual decode-window start (input samples).  The batched pipeline
    # decodes speculative windows that can sit a few lines off the
    # caller's request; `nextfieldoffset` is measured from THIS position,
    # so advancing from the request instead would accumulate the
    # prediction error (+0.25 line/field measured) until the chain
    # flushes.  -1 = the window started exactly at the caller's request
    # (sequential paths).
    readsample: int = -1
    # device-computed white flag (fused.pipeline_finish meta word 7):
    # set by the batched pipeline so metadata words stay correct in
    # device-chain mode where dspicture never reaches the host; None on
    # the sequential paths (the host slicer computes it from dspicture).
    white_flag: Optional[bool] = None


def hsync_stats(vals: np.ndarray) -> Tuple[float, float]:
    """Median/tolerance of regular-hsync peak levels
    (reference lddecode_core.py:518-532)."""
    sel = vals[(vals >= 0.6) & (vals <= 0.8)]
    if len(sel) == 0:
        return 0.7, 0.01
    med = float(np.median(sel))
    tol = max(float(np.std(sel)) * 2, .01)
    return med, tol


class FieldDecoder:
    """Decodes one field per call from a raw sample buffer.

    Owns the jitted device pipeline for a fixed `nblocks` read geometry
    (the reference reads 1e6 samples per field attempt,
    lddecode_core.py:1319; 66 blocks ~ 1.01M samples).
    """

    def __init__(self, cfg: DecoderConfig, bank: DemodBank, nblocks: int = 66):
        if cfg.system == 'VHS':
            # the TBC's NTSC/PAL branches (field parity vote, lineoffset,
            # u16 output scale, burst/pilot refinement) have no tape
            # variants; the VHS profile is demod-level (tape/vhs.py)
            raise ValueError("system='VHS' is demod-only: use "
                             "ld_decode_tpu.tape.vhs, not the TBC")
        # the analysis window must cover one full field plus the next
        # field's vsync region, or the decode silently fails to lock
        # (PAL fields are 800k samples at 40 MSa/s — they need more
        # blocks than NTSC's 667k)
        need_lines = cfg.sys.field_lines + 0.5 + 21
        window_lines = nblocks * cfg.block_keep / cfg.linelen_float
        if window_lines < need_lines:
            raise ValueError(
                f'nblocks={nblocks} gives a {window_lines:.0f}-line window '
                f'but a {cfg.system} field needs >= {need_lines:.0f} lines '
                f'(use nblocks >= '
                f'{int(np.ceil(need_lines * cfg.linelen_float / cfg.block_keep))})')
        self.cfg = cfg
        self.bank = bank
        self.nblocks = nblocks
        self.inlinelen = cfg.linelen
        self.outlinelen = cfg.sys.outlinelen
        sys = cfg.sys
        self.field_lines = sys.frame_lines // 2
        self.freq = int(round(cfg.freq_mhz))

        # colorphase/colorlevel (reference lddecode_core.py:1169-1170, HE010)
        self.colorphase = 90 + 1.5
        self.colorlevel = 1.45

    # ---------------- device-side wrappers ----------------

    def demod(self, samples: np.ndarray, mtf_level: float):
        video, audio = D.demod_stream(
            jnp.asarray(samples), self.bank, self.cfg, self.nblocks,
            jnp.float32(mtf_level))
        return video, audio

    def sync_peaks(self, video) -> Tuple[np.ndarray, np.ndarray]:
        window = int(self.inlinelen * 0.4)
        idx, val = S.find_sync_peaks(video['demod_sync'], window)
        idx = np.asarray(idx)
        val = np.asarray(val)
        n = int((idx >= 0).sum())
        return idx[:n], val[:n]

    # ---------------- host-side sync logic ----------------

    def determine_field(self, peaks, vals, i, med, tol):
        """Field polarity vote from half-line gaps around a vsync
        (reference lddecode_core.py:544-588)."""
        if i < 11:
            return None, 0
        reg = (vals >= med - tol) & (vals <= med + tol)
        vote = 0
        line0 = None
        for j in range(i - 1, max(i - 20, -1), -1):
            if reg[j]:
                line0 = j
                if j + 1 < len(peaks):
                    gap1 = peaks[j + 1] - peaks[j]
                    if gap1 > self.inlinelen * .75:
                        vote -= 1
                break
        linee = None
        for j in range(i, min(i + 20, len(peaks))):
            if reg[j]:
                linee = j
                gap2 = peaks[j] - peaks[j - 1]
                if gap2 > self.inlinelen * .75:
                    vote += 1 if self.cfg.system == 'NTSC' else -1
                break
        if self.cfg.system == 'PAL':
            vote += 1
        return line0, vote

    def determine_vsyncs(self, peaks, vals) -> List[List[int]]:
        """(reference lddecode_core.py:590-636); the candidate scan is
        vectorized — only actual vsync candidates run the voting logic."""
        if len(peaks) < 200:
            return []
        med, tol = hsync_stats(vals)
        prev = np.concatenate([[1.0], vals[:-1]])
        cands = np.nonzero((vals > .9) & (prev < med - tol * 2))[0]
        out = []
        for i in cands:
            line0, vote = self.determine_field(peaks, vals, int(i), med, tol)
            if line0 is not None:
                out.append([int(i), line0, vote])
        if len(out) < 2:
            return out

        back = 6 if self.cfg.system == 'PAL' else 7
        for i in range(len(out)):
            if out[i][2] == 0:
                out[i][1] = -1
                if i < len(out) - 1 and out[i + 1][2] != 0:
                    out[i][2] = -out[i + 1][2]
                elif i >= 1 and out[i - 1][2] != 0:
                    out[i][2] = -out[i - 1][2]
            if out[i][1] <= 0:
                out[i][1] = out[i][0] - back
            out[i][2] = int(out[i][2] < 0)
        return out

    def compute_linelocs(self, peaks, vals, vsyncs, linecount):
        """Integer line numbering + gap interpolation
        (reference lddecode_core.py:638-713).

        Vectorized: regular-peak gaps are classified in one pass; the
        rolling 25-gap median the reference recomputes per peak is only
        ever *used* at abnormal gaps (and the first peak), so it is
        evaluated just at those points — numerically identical."""
        med, tol = hsync_stats(vals)
        reg = (vals >= med - tol) & (vals <= med + tol)

        end = vsyncs[1][1]
        reg_idx = np.nonzero(reg[:end])[0]
        linelocs: Dict[int, float] = {}
        if len(reg_idx):
            ps = peaks[reg_idx].astype(np.float64)
            gaps = np.diff(ps)
            ok = (gaps / self.inlinelen >= .98) & (gaps / self.inlinelen
                                                   <= 1.02)
            inc = np.where(ok, 1, 0)
            for j in np.nonzero(~ok)[0]:
                hist = np.concatenate(
                    [[float(self.inlinelen)], gaps[:j][ok[:j]]])[-25:]
                inc[j] = int(round(gaps[j] / np.median(hist)))
            first = int(round((ps[0] - peaks[vsyncs[0][1]])
                              / self.inlinelen))
            nums = first + np.concatenate([[0], np.cumsum(inc)])
            for n, p in zip(nums, ps):       # later duplicates overwrite
                linelocs[int(n)] = float(p)

        present = np.array(sorted(linelocs), dtype=np.int64)
        locs = np.array([linelocs[k] for k in present])
        filled = dict(linelocs)
        for l in range(1, linecount + 5):
            if l in linelocs:
                continue
            # prev valid: largest key <= l with key > -10; next: smallest
            # key >= l with key <= linecount (reference's scan bounds)
            ins = np.searchsorted(present, l)
            prev_valid = None
            if ins > 0 and present[ins - 1] > -10:
                prev_valid = int(present[ins - 1])
            next_valid = None
            if ins < len(present) and present[ins] <= linecount:
                next_valid = int(present[ins])
            if prev_valid is None:
                filled[l] = linelocs[next_valid] - (self.inlinelen
                                                    * (next_valid - l))
            elif next_valid is not None:
                avglen = ((linelocs[next_valid] - linelocs[prev_valid])
                          / (next_valid - prev_valid))
                filled[l] = linelocs[prev_valid] + (avglen * (l - prev_valid))
            else:
                avglen = linelocs[prev_valid] - filled[prev_valid - 1]
                filled[l] = linelocs[prev_valid] + (avglen * (l - prev_valid))

        ll = np.array([filled[l] for l in range(1, linecount + 5)])
        bad = np.array([l not in linelocs for l in range(1, linecount + 5)])
        bad[:10] = False
        return ll, bad

    def refine_linelocs_hsync(self, video, linelocs1, linebad):
        """(reference lddecode_core.py:715-787) — vectorized zc on device,
        sequential repair on host."""
        cfg = self.cfg
        ll = linelocs1.copy()
        starts = ll.copy()
        starts[:9] -= 200          # search for the *beginning* of hsync

        starts_i, zc_rel, refined_rel, bad_dev, found = S.refine_hsync_zc(
            video['demod_05'], jnp.asarray(starts), self.freq,
            cfg.iretohz(-20), cfg.iretohz(-60), cfg.iretohz(20),
            cfg.iretohz(100), cfg.iretohz(-10), cfg.iretohz(10))
        starts_i = np.asarray(starts_i, np.float64)
        zc = starts_i + np.asarray(zc_rel, np.float64)
        refined = starts_i + np.asarray(refined_rel, np.float64)
        bad_dev = np.asarray(bad_dev)
        found = np.asarray(found)

        ll2 = starts.copy()
        bad = linebad.copy()
        n = len(ll2)
        for i in range(n):
            if found[i] and not bad[i]:
                if i >= 10:
                    ll2[i] = refined[i]
                    if bad_dev[i]:
                        bad[i] = True
                else:
                    ll2[i] = zc[i]
            else:
                bad[i] = True
            if i < 10:
                ll2[i] += 4.72 * cfg.freq_mhz
            if i > 10 and bad[i]:
                ll2[i] = ll2[i - 1] + (ll2[i - 1] - ll2[i - 2])

        # end-of-range gap sanitizers (reference lddecode_core.py:769-785)
        lo = self.inlinelen - (cfg.freq_mhz * .2)
        hi = self.inlinelen + (cfg.freq_mhz * .2)
        for i in range(9, -1, -1):
            gap = ll2[i + 1] - ll2[i]
            if not (lo <= gap <= hi):
                gap = self.inlinelen
            ll2[i] = ll2[i + 1] - gap
        for i in range(n - 10, n):
            gap = ll2[i] - ll2[i - 1]
            if not (lo <= gap <= hi):
                gap = self.inlinelen
            ll2[i] = ll2[i - 1] + gap
        return ll2, bad

    # ---------------- NTSC burst refinement ----------------

    def refine_linelocs_burst(self, video, linelocs, linecount):
        """(reference lddecode_core.py:1054-1133)."""
        cfg = self.cfg
        wow = (np.diff(linelocs)[:linecount] / self.inlinelen)
        lli = np.floor(linelocs).astype(np.int32)
        llf = (linelocs - lli).astype(np.float32)
        scaled = RS.downscale_lines_split(
            video['demod_burst'], jnp.asarray(lli), jnp.asarray(llf),
            self.outlinelen, linecount, jnp.asarray(wow, np.float32))

        hz_ire = 1700000 / 140
        ph0, ph1, level, level_ok, counts_ok = B.burst_phase_offsets(
            scaled, hz_ire)
        ph0 = np.asarray(ph0, np.float64)
        ph1 = np.asarray(ph1, np.float64)
        level = np.asarray(level, np.float64)
        level_ok = np.asarray(level_ok)
        counts_ok = np.asarray(counts_ok)

        n = len(linelocs)
        phaseavg = np.zeros((n, 2))
        ok = level_ok & counts_ok
        phaseavg[:linecount, 0] = np.where(ok, ph0, 0.0)
        phaseavg[:linecount, 1] = np.where(ok, ph1, 0.0)
        burstlevel = np.zeros(n, np.float64)
        burstlevel[:linecount] = np.where(level_ok, level, 0.0)

        cut = phaseavg[(phaseavg[:, 0] != 0) | (phaseavg[:, 1] != 0)]
        if len(cut) == 0:
            return linelocs.copy(), burstlevel
        if abs(np.median(cut[:, 0])) < abs(np.median(cut[:, 1])):
            pg = 0
        else:
            pg = 1

        adjset = phaseavg[:, pg]
        burstlevel[pg::2] = -burstlevel[pg::2]

        ll3 = linelocs.copy()
        px_per_phase = cfg.freq_mhz / (4 * 315 / 88)
        for l in range(n):
            if abs(adjset[l]) > 2:
                burstlevel[l] = 0
                continue
            ll3[l] -= adjset[l] * px_per_phase
        for l in range(2, n - 1):
            if burstlevel[l] == 0:
                ll3[l] = (ll3[l - 1] + ll3[l + 1]) / 2
        return ll3, burstlevel

    # ---------------- output ----------------

    def downscale_picture(self, video, linelocs, linecount, burstlevel):
        """Final wow-corrected resample + 16-bit scale + line-flag words
        (reference lddecode_core.py:789-812, 1135-1158)."""
        cfg = self.cfg
        lineoffset = 1 if cfg.system == 'NTSC' else 3
        li = linelocs[lineoffset:]        # lineinfo[l], l from lineoffset
        wow = (np.diff(li)[:linecount] / self.inlinelen)
        lli = np.floor(li).astype(np.int32)
        llf = (li - lli).astype(np.float32)
        out = RS.downscale_lines_split(
            video['demod'], jnp.asarray(lli), jnp.asarray(llf),
            self.outlinelen, linecount, jnp.asarray(wow, np.float32))
        dsout = np.asarray(out, np.float64).reshape(-1)

        sp = cfg.sys
        reduced = (dsout - sp.ire0) / sp.hz_ire - sp.vsync_ire
        if cfg.system == 'NTSC':
            out_scale = float(0xc800 - 0x0400) / (100 - sp.vsync_ire)
            offset = 1024
        else:
            out_scale = float(0xd300 - 0x0100) / (100 - sp.vsync_ire)
            offset = 256
        lines16 = np.clip((reduced * out_scale) + offset, 0, 65535)
        lines16 = (lines16 + 0.5).astype(np.uint16)

        if burstlevel is not None:
            hz_ire_scale = 1700000 / 140
            clevel = (1 / self.colorlevel) / hz_ire_scale
            for i in range(1, linecount - 1):
                lines16[i * self.outlinelen] = 16384 if burstlevel[i] > 0 \
                    else 32768
                lines16[i * self.outlinelen + 1] = np.uint16(
                    327.67 * clevel * abs(burstlevel[i]))
        return lines16

    def decode_vbi(self, video, linelocs):
        """Philips code slicing on the configured VBI lines
        (reference lddecode_core.py:814-884)."""
        cfg = self.cfg
        linecode = {}
        for l in cfg.sys.philips_codelines:
            linecode[l] = decode_philips_line(video['demod'], linelocs[l],
                                              cfg)
        return linecode, interpret_philips(linecode)

    # ---------------- fused device-resident path ----------------

    def analyze_resident(self, capture_dev, readsample: int,
                         mtf_level: float):
        """Phase A on a device-resident capture: demod + peaks (one
        transfer).  Returns (video, audio, peaks, vals) or None at EOF."""
        cfg = self.cfg
        n = D.stream_len(cfg, self.nblocks)
        readsample = max(readsample, cfg.blockcut)
        if readsample - cfg.blockcut + n > capture_dev.shape[0]:
            return None
        video, audio, packed = FU.field_analyze(
            capture_dev, jnp.int32(readsample), self.bank, cfg,
            self.nblocks, jnp.float32(mtf_level))
        pk = FU.PEAKS_SPEC.unpack(np.asarray(packed))
        nvalid = int((pk['idx'] >= 0).sum())
        return video, audio, pk['idx'][:nvalid], pk['val'][:nvalid]

    def process_resident(self, capture_dev, readsample: int,
                         mtf_level: float = 0.0, audio_offset: float = 0.0,
                         full_decode: bool = True) -> Optional[FieldResult]:
        """Fused two-round-trip field decode (see tbc/fused.py).

        Mirrors process(); returns None at EOF (like a loader short read).
        """
        cfg = self.cfg
        rv = self.analyze_resident(capture_dev, readsample, mtf_level)
        if rv is None:
            return None
        video, audio, peaks, vals = rv

        if len(peaks) == 0:
            return FieldResult(False, cfg.linelen * 200, peak_count=0,
                               vsync_count=0)
        vsyncs = self.determine_vsyncs(peaks, vals)
        if len(vsyncs) == 0:
            return FieldResult(False, cfg.linelen * 200,
                               peak_count=len(peaks), vsync_count=0)
        if len(vsyncs) == 1 or len(peaks) < vsyncs[1][1] + 4:
            jumpto = int(peaks[max(vsyncs[0][1] - 10, 0)])
            nfo = jumpto if jumpto != 0 else cfg.linelen * 240
            return FieldResult(False, nfo, peak_count=len(peaks),
                               vsync_count=len(vsyncs))

        nextfieldoffset = int(peaks[vsyncs[1][1] - 10])
        istop = bool(vsyncs[0][2])
        linecount = self.field_lines + (1 if istop else 0)

        try:
            linelocs1, linebad = self.compute_linelocs(peaks, vals, vsyncs,
                                                       linecount)
        except Exception:
            return FieldResult(False, nextfieldoffset,
                               peak_count=len(peaks), vsync_count=len(vsyncs))

        n_audio1 = self.nblocks * self.bank.a_stage1_keep \
            if audio is not None else 0
        nmax = FU.max_nlines(cfg)
        ll1p, badp = FU.pad_linelocs(linelocs1, linebad, nmax, cfg.linelen)
        ll1i = np.floor(ll1p).astype(np.int32)
        ll1f = (ll1p - ll1i).astype(np.float32)
        bundle = FU.field_finish(
            video, audio, jnp.asarray(ll1i), jnp.asarray(ll1f),
            jnp.asarray(badp), jnp.int32(linecount),
            jnp.float32(audio_offset), self.bank, cfg, n_audio1,
            colorlevel=self.colorlevel, colorphase=self.colorphase)
        spec = FU.finish_bundle_spec(cfg)
        data = spec.unpack(np.asarray(bundle))

        nlines = len(linelocs1)
        linelocs = (data['linelocs_i'].astype(np.float64)
                    + data['linelocs_f'].astype(np.float64))[:nlines]
        linecode = {}
        for i, l in enumerate(cfg.sys.philips_codelines):
            linecode[l] = decode_philips_line(
                data['philips'][i], float(data['philips_frac'][i]), cfg)
        vbi = interpret_philips(linecode)

        result = FieldResult(
            True, nextfieldoffset, istop=istop, linecount=linecount,
            tbcstart=nextfieldoffset, peak_count=len(peaks),
            vsync_count=len(vsyncs), linelocs=linelocs,
            burstlevel=data['burstlevel'].astype(np.float64)[:nlines],
            vbi=vbi, linecode=linecode)
        if full_decode:
            result.dspicture = data['picture'][:linecount
                                               * cfg.sys.outlinelen]
            if audio is not None:
                nout = (int(data['audio_count'][0]) - 1) * 2
                result.dsaudio = data['audio'][:nout]
                result.audio_next_offset = float(
                    data['audio_next_offset'][0])
        return result

    # ---------------- top level ----------------

    def process(self, samples: np.ndarray, mtf_level: float = 0.0,
                audio_offset: float = 0.0,
                full_decode: bool = True) -> FieldResult:
        """Decode one field from `samples` (length stream_len(cfg, nblocks)).

        Mirrors Field.__init__ orchestration + FieldNTSC/PAL refinement
        (reference lddecode_core.py:889-957, 1165-1191, 1037-1048).
        """
        cfg = self.cfg
        video, audio = self.demod(samples, mtf_level)
        peaks, vals = self.sync_peaks(video)

        if len(peaks) == 0:
            return FieldResult(False, cfg.linelen * 200, peak_count=0,
                               vsync_count=0)
        vsyncs = self.determine_vsyncs(peaks, vals)

        if len(vsyncs) == 0:
            return FieldResult(False, cfg.linelen * 200,
                               peak_count=len(peaks), vsync_count=0)
        if len(vsyncs) == 1 or len(peaks) < vsyncs[1][1] + 4:
            jumpto = int(peaks[max(vsyncs[0][1] - 10, 0)])
            nfo = jumpto if jumpto != 0 else cfg.linelen * 240
            return FieldResult(False, nfo, peak_count=len(peaks),
                               vsync_count=len(vsyncs))

        nextfieldoffset = int(peaks[vsyncs[1][1] - 10])
        istop = bool(vsyncs[0][2])
        linecount = self.field_lines + (1 if istop else 0)

        try:
            linelocs1, linebad = self.compute_linelocs(peaks, vals, vsyncs,
                                                       linecount)
            linelocs2, linebad = self.refine_linelocs_hsync(video, linelocs1,
                                                            linebad)
        except Exception:
            return FieldResult(False, nextfieldoffset,
                               peak_count=len(peaks), vsync_count=len(vsyncs))

        burstlevel = None
        if cfg.system == 'NTSC' and full_decode:
            ll3, burstlevel = self.refine_linelocs_burst(video, linelocs2,
                                                         linecount)
            ll4, burstlevel = self.refine_linelocs_burst(video, ll3,
                                                         linecount)
            shift33 = self.colorphase * (np.pi / 180)
            px_per_phase = cfg.freq_mhz / (4 * 315 / 88)
            linelocs = ll4 + (shift33 - 8) * px_per_phase
        elif cfg.system == 'PAL' and full_decode:
            from ld_decode_tpu.tbc import pal as PALK
            lli = np.floor(linelocs2).astype(np.int32)
            llf = (linelocs2 - lli).astype(np.float32)
            li2, lf2 = PALK.refine_pilot(
                video['demod'], video['demod_05'], jnp.asarray(lli),
                jnp.asarray(llf), cfg.linelen, cfg.freq_mhz)
            linelocs = (np.asarray(li2, np.float64)
                        + np.asarray(lf2, np.float64))
        else:
            linelocs = linelocs2

        linecode, vbi = self.decode_vbi(video, linelocs)

        result = FieldResult(
            True, nextfieldoffset, istop=istop, linecount=linecount,
            tbcstart=nextfieldoffset, peak_count=len(peaks),
            vsync_count=len(vsyncs), linelocs=linelocs,
            burstlevel=burstlevel, vbi=vbi, linecode=linecode)

        if full_decode:
            result.dspicture = self.downscale_picture(
                video, linelocs, linecount, burstlevel)
            if audio is not None:
                n1 = len(audio['audio_left'])
                l2, r2 = audio_stage2(audio['audio_left'],
                                      audio['audio_right'],
                                      self.bank, n1)
                a2 = {'audio_left': np.asarray(l2),
                      'audio_right': np.asarray(r2)}
                result.dsaudio, result.audio_next_offset = downscale_audio(
                    a2, linelocs, cfg, linecount, audio_offset)
        return result
