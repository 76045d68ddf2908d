"""Frame assembly: field pairing, interlace weave, resync policy, MTF
feedback, and frame-accurate seek.

Mirrors the reference `Framer`/`findframe` orchestration
(reference lddecode_core.py:1193-1378) around the device field pipeline.
All logic here is host-side control flow over per-field results; the
compute stays in FieldDecoder's jitted kernels.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

from ld_decode_tpu.ops import demod as D
from ld_decode_tpu.ops.filters import DemodBank
from ld_decode_tpu.tbc.field import FieldDecoder, FieldResult
from ld_decode_tpu.utils.params import DecoderConfig


def _weave_go(pa, ia, pb, ib, half_, lf_, tok, W_: int, outlines_: int):
    # module-level jit (below): a jit object created per call would
    # miss the trace cache and recompile EVERY frame (~150 ms each,
    # measured — it silently capped the device chain at ~10 MSa/s)
    import jax
    import jax.numpy as jnp
    L = pa.shape[1] // W_
    top = jax.lax.dynamic_index_in_dim(pa, ia, 0,
                                       keepdims=False).reshape(L, W_)
    bot = jax.lax.dynamic_index_in_dim(pb, ib, 0,
                                       keepdims=False).reshape(L, W_)
    fld = jnp.stack([top, bot])
    r = jnp.arange(outlines_, dtype=jnp.int32)
    is_main = r < 2 * half_
    is_tail = r == 2 * half_
    fidx = jnp.where(is_main, r & 1, lf_)
    lidx = jnp.minimum(jnp.where(is_main, r >> 1, half_), L - 1)
    ok = is_main | (is_tail & tok)
    out = jnp.where(ok[:, None], fld[fidx, lidx], 0)
    return out.reshape(-1).astype(jnp.uint16)


_weave_go_jit = None
_set_words_jit = None


def _weave_device_jit(picsA, iA, picsB, iB, half, lf_sel, tail_ok,
                      W: int, outlines: int):
    """Interlace weave entirely on device (same semantics as
    Framer.formatoutput): fields stay in HBM so the chain's comb can
    read them without the codec D2H + host decode + re-upload round
    trip.  picsA/picsB: (batch, max_lc*W) u16 batch pictures; iA/iB the
    field indices (the pair may straddle two batches)."""
    global _weave_go_jit
    if _weave_go_jit is None:
        import functools
        import jax
        _weave_go_jit = functools.partial(
            jax.jit, static_argnames=('W_', 'outlines_'))(_weave_go)
    return _weave_go_jit(picsA, np.int32(iA), picsB, np.int32(iB),
                         np.int32(half), np.int32(lf_sel), bool(tail_ok),
                         W_=W, outlines_=outlines)


def _set_frame_words(frame, words: np.ndarray):
    """Device frame[:16] = metadata words, through one cached jit."""
    global _set_words_jit
    if _set_words_jit is None:
        import jax
        _set_words_jit = jax.jit(lambda f, w: f.at[:16].set(w))
    return _set_words_jit(frame, np.asarray(words, np.uint16))


class Framer:
    def __init__(self, cfg: DecoderConfig, bank: DemodBank,
                 loader: Callable = None, full_decode: bool = True,
                 nblocks: int = 66, capture: np.ndarray = None,
                 batch: int = 1, despackle: bool = False,
                 segment_samples: int = 0, rot_level: float = 40.0,
                 flip_fields: bool = False, bff: bool = False,
                 fetch_picture: bool = True, pic_mode: str = 'auto'):
        """Either `loader` (streaming file reads, reference-style) or
        `capture` (whole capture kept device-resident; two fused device
        calls per field — the fast path) must be given.  batch>1 adds the
        speculative field-batch prefetcher (tbc/pipeline.py): two device
        round trips per BATCH of fields; audio carry then advances per
        field rather than per frame.

        loader + batch>1 + segment_samples>0 is the SEGMENTED fast path
        for captures too large for HBM: the framer keeps a sliding
        device-resident window of `segment_samples` samples, swaps it as
        decode/seek positions move (one prefetcher flush per swap — a
        segment is minutes of video, so the amortized cost is nil), and
        runs the same batched pipeline inside each segment.

        pic_mode: how the picture crosses the device->host link in
        batched mode — 'codec' (lossless plane codec: device encode
        cuts bytes ~2x, right on slow links), 'raw' (chunked raw
        fetch: skips the ~21 ms/batch encode, right on PCIe-class
        links), 'auto' (default: probe the link once and pick)."""
        self.cfg = cfg
        self.bank = bank
        self.loader = loader
        self.capture_dev = None
        self.prefetcher = None
        self._seg_samples = 0
        self._seg_base = 0
        if capture is not None:
            import jax
            arr = np.asarray(capture)
            if np.issubdtype(arr.dtype, np.signedinteger):
                # .r16 captures are signed, zero-centred; recentre like
                # the segment loader path below does
                arr = (arr.astype(np.int32) + 32768).astype(np.uint16)
            self.capture_dev = jax.device_put(arr.astype(np.uint16))
        self.full_decode = full_decode
        self.despackle = despackle
        # app/tbc operational knobs (reference main.cpp:152-168): -r rot
        # detection level (despackle window, see tbc/despackle.py) and -f
        # field flip (swap which field weaves to even/odd output rows)
        self.rot_level = rot_level
        self.flip_fields = flip_fields
        # -m "magnetic video mode" (reference main.cpp:148-150): start
        # frames on the bottom field (VHS-style) instead of sys.topfirst
        self.bff = bff
        self.decoder = FieldDecoder(cfg, bank, nblocks)
        if loader is not None and batch > 1 and segment_samples <= 0:
            segment_samples = 256 << 20      # 512 MB of u16 by default
        if batch > 1 and (self.capture_dev is not None
                          or (loader is not None and segment_samples > 0)):
            from ld_decode_tpu.tbc.pipeline import FieldPrefetcher
            self.prefetcher = FieldPrefetcher(self.decoder, self.capture_dev,
                                              batch,
                                              fetch_picture=fetch_picture,
                                              pic_mode=pic_mode)
            if self.capture_dev is None:
                # lookahead the chain needs resident beyond any request
                horizon = ((self.prefetcher.DEPTH + 1) * batch
                           * self.prefetcher.field_pitch
                           + D.stream_len(cfg, nblocks))
                self._seg_samples = max(int(segment_samples), 2 * horizon)
                self._seg_horizon = horizon
                self._seg_base = -1          # nothing loaded yet
                self._seg_eof = False
                self._seg_valid = 0
        self.nblocks = nblocks

        self.outwidth = cfg.sys.outlinelen
        self.outlines = cfg.sys.frame_lines
        self.clvfps = 25 if cfg.system == 'PAL' else 30
        self.audio_offset = 0.0
        self.mtf_level = 1.0
        self.vbi = {'framenr': None, 'isclv': False, 'minutes': None}

    # ------------------------------------------------------------------

    def _load(self, infile, readsample: int) -> Optional[np.ndarray]:
        """Fetch the demod window so output index 0 == file sample
        `readsample` (reference head-cut alignment, lddecode_core.py:376-379).
        """
        start = readsample - self.cfg.blockcut
        n = D.stream_len(self.cfg, self.nblocks)
        if start < 0:
            data = self.loader(infile, 0, n + start)
            if data is None:
                return None
            return np.concatenate([np.zeros(-start, data.dtype), data])
        return self.loader(infile, start, n)

    def _ensure_segment(self, infile, sample: int) -> bool:
        """Segmented mode: make [sample, sample+horizon) device-resident.
        Returns False at end of file (nothing loadable at `sample`)."""
        if self._seg_samples == 0:
            return True
        n_stream = D.stream_len(self.cfg, self.nblocks)
        lo = self._seg_base
        seg_len = self._seg_valid if self.capture_dev is not None else 0
        if lo >= 0 and lo + self.cfg.blockcut <= sample and (
                sample + self._seg_horizon <= lo + seg_len
                # at the file tail no reload can extend coverage: accept
                # while one decode window still fits
                or (self._seg_eof and sample - lo + n_stream <= seg_len)):
            return True
        import jax
        from ld_decode_tpu.io.loaders import file_samples, load_available
        base = max(int(sample) - self.cfg.blockcut - 8 * self.cfg.linelen, 0)
        avail = file_samples(self.loader, infile)
        if avail is not None:
            n = min(self._seg_samples, avail - base)
            data = self.loader(infile, base, n) if n >= n_stream else None
        else:
            # unknown-ratio loader: bisect the largest satisfiable read
            data = load_available(self.loader, infile, base,
                                  self._seg_samples, n_stream)
        if data is None or len(data) < n_stream:
            return False
        self._seg_eof = len(data) < self._seg_samples
        self._seg_valid = len(data)
        arr = np.asarray(data)
        if np.issubdtype(arr.dtype, np.signedinteger):
            # .r16 captures are signed, zero-centred; the device capture
            # is uint16 (a DC shift is invisible to the FM demod's RF
            # bandpass, but a wraparound is not)
            arr = (arr.astype(np.int32) + 32768).astype(np.uint16)
        else:
            arr = arr.astype(np.uint16)
        if len(arr) < self._seg_samples:
            # keep the device shape constant across segments: jit
            # specializes on shape, and a one-off tail length would
            # recompile the whole fused pipeline (7-600 s cold)
            arr = np.pad(arr, (0, self._seg_samples - len(arr)))
        self.capture_dev = jax.device_put(arr)
        self._seg_base = base
        self.prefetcher.set_capture(self.capture_dev, base,
                                    valid_len=self._seg_valid)
        return True

    def readfield(self, infile, sample: int):
        """(reference lddecode_core.py:1194-1223)."""
        cfg = self.cfg
        readsample = int(sample)
        while True:
            if self.prefetcher is not None:
                if not self._ensure_segment(infile, readsample):
                    return None, None, None
                f = self.prefetcher.get(readsample, self.mtf_level,
                                        self.audio_offset)
                if f is None:
                    return None, None, None
                if f.valid and f.dsaudio is not None:
                    # batched mode: per-field audio carry (see pipeline.py)
                    self.audio_offset = f.audio_next_offset
            elif self.capture_dev is not None:
                f = self.decoder.process_resident(
                    self.capture_dev, readsample, self.mtf_level,
                    self.audio_offset, self.full_decode)
                if f is None:
                    return None, None, None
            else:
                stream = self._load(infile, readsample)
                if stream is None:
                    return None, None, None
                f = self.decoder.process(stream, self.mtf_level,
                                         self.audio_offset, self.full_decode)
            # advance from the actual decode-window start (batched windows
            # may sit a few lines off the request; see FieldResult.readsample)
            base = f.readsample if f.readsample >= 0 else readsample
            nextsample = base + f.nextfieldoffset
            if not f.valid:
                if f.peak_count < 100:
                    # no recognizable data: jump 10s past possible spin-up
                    nextsample = readsample + int(cfg.freq_hz * 10)
                elif f.vsync_count == 0:
                    nextsample = readsample + int(cfg.freq_hz * 1)
                readsample = nextsample
            else:
                return f, readsample, nextsample

    def mergevbi(self, fields) -> dict:
        """(reference lddecode_core.py:1225-1236)."""
        merged = dict(fields[0].vbi)
        for k, v in fields[1].vbi.items():
            if v is not None:
                merged[k] = v
        if merged.get('seconds') is not None:
            merged['framenr'] = (merged['minutes'] * 60 * self.clvfps
                                 + merged['seconds'] * self.clvfps
                                 + merged['clvframe'])
        return merged

    def formatoutput(self, fields) -> np.ndarray:
        """Interlace weave incl. the visible half-line
        (reference lddecode_core.py:1238-1252).  In device-chain mode
        (fetch_picture=False) both fields live only in HBM and the
        weave runs on device, returning a jax array."""
        if all(f.dspicture is None and f.dev_picture is not None
               for f in fields):
            top, bot = ((fields[1], fields[0]) if self.flip_fields
                        else fields)
            half = min(fields[0].linecount, fields[1].linecount)
            lf = int(np.argmax([fields[0].linecount,
                                fields[1].linecount]))
            tail_ok = (half + 1) <= fields[lf].linecount
            lf_sel = (1 - lf) if self.flip_fields else lf
            pa, ia = top.dev_picture
            pb, ib = bot.dev_picture
            return _weave_device_jit(pa, ia, pb, ib, half, lf_sel,
                                     tail_ok, self.outwidth,
                                     self.outlines)
        for f in fields:
            if f.dspicture is None and f.dev_picture is not None:
                # mixed pair (rare: one field came from the sequential
                # fallback): materialize the device one
                pics, i = f.dev_picture
                f.dspicture = np.asarray(pics[i])[
                    :f.linecount * self.outwidth]
        W = self.outwidth
        half = min(fields[0].linecount, fields[1].linecount)
        linecount = half * 2
        combined = np.zeros(W * self.outlines, dtype=np.uint16)
        rows = combined.reshape(self.outlines, W)
        top, bot = (fields[1], fields[0]) if self.flip_fields else fields
        rows[0:linecount:2] = top.dspicture[:half * W].reshape(-1, W)
        rows[1:linecount:2] = bot.dspicture[:half * W].reshape(-1, W)
        lf = int(np.argmax([fields[0].linecount, fields[1].linecount]))
        cur = linecount // 2
        if (cur + 1) * W <= len(fields[lf].dspicture):
            combined[linecount * W:(linecount + 1) * W] = \
                fields[lf].dspicture[cur * W:cur * W + W]
        return combined

    def readframe(self, infile, sample: int, firstframe: bool = False,
                  CAV: bool = False):
        """(reference lddecode_core.py:1254-1311)."""
        cfg = self.cfg
        fieldcount = 0
        fields = [None, None]
        audio = []
        f = None

        while fieldcount < 2:
            f, readsample, nextsample = self.readfield(infile, sample)
            if f is not None:
                if f.istop:
                    fields[0] = f
                else:
                    fields[1] = f
                if ((not CAV and (f.istop == (cfg.sys.topfirst ^ self.bff)))
                        or (CAV and (f.vbi['framenr'] or f.vbi['minutes']))):
                    fieldcount = 1
                elif fieldcount == 1:
                    fieldcount = 2
                if (fieldcount or not firstframe) and f.dsaudio is not None:
                    audio.append(f.dsaudio)
            elif readsample is None:
                return None, None, None, None
            sample = nextsample

        if audio:
            conaudio = np.concatenate(audio)
            self.audio_offset = f.audio_next_offset
        else:
            conaudio = None

        combined = self.formatoutput(fields) if self.full_decode else None
        if combined is not None and self.despackle \
                and not isinstance(combined, np.ndarray):
            # despackle is a host np pass; materialize the device frame
            combined = np.asarray(combined)
        if combined is not None and self.despackle:
            # rot concealment post-pass (reference tbc.cpp:1528-1565)
            from ld_decode_tpu.tbc.despackle import despackle as _dsp
            scale = ((0xc800 - 0x0400) if cfg.system == 'NTSC'
                     else (0xd300 - 0x0100)) / (100 - cfg.sys.vsync_ire)
            off = 1024 if cfg.system == 'NTSC' else 256
            combined = _dsp(combined, self.outwidth, scale, off,
                            cfg.sys.vsync_ire, rot_level=self.rot_level)
        self.vbi = self.mergevbi(fields)

        if combined is not None:
            # full line-0 metadata words (ld-decoder.h:227-252 spec; the
            # reference Python pipeline left these as picture samples)
            from ld_decode_tpu.vbi.metadata import frame_metadata_words
            words = frame_metadata_words(fields, self.vbi, cfg)
            if isinstance(combined, np.ndarray):
                combined[:16] = words
            else:                     # device frame: tiny async update
                combined = _set_frame_words(combined, words)

        # MTF compensation feedback: CAV frame number drives the RF
        # equalizer level; a large change forces a re-decode
        # (reference lddecode_core.py:1300-1309).
        if not f.vbi['isclv'] and f.vbi['framenr'] is not None:
            newmtf = max(1 - (f.vbi['framenr'] / 10000), 0)
            oldmtf = self.mtf_level
            self.mtf_level = newmtf
            if abs(newmtf - oldmtf) > .1:
                return self.readframe(infile, sample, firstframe, CAV)

        return combined, conaudio, sample, fields


def findframe(infile, framer: Framer, target: int,
              nextsample: int = 0) -> Optional[int]:
    """Frame-accurate seek by decode-probe + jump
    (reference lddecode_core.py:1338-1378)."""
    cfg = framer.cfg
    samples_per_frame = int(cfg.freq_hz / cfg.sys.fps)
    framer.vbi = {'framenr': None, 'isclv': False, 'minutes': None}

    iscav = False
    tolerance = 0
    rv = None
    retry = 5
    while framer.vbi.get('framenr') is None and retry:
        rv = framer.readframe(infile, nextsample, CAV=False)
        if framer.vbi.get('isclv'):
            tolerance = 1
        else:
            tolerance = 0
            iscav = True
        if framer.vbi.get('framenr') is None:
            # only jump the 10 s spin-up distance on a FAILED probe —
            # jumping after a successful one would strand an early hit
            # hundreds of frames past the target
            nextsample = (rv[2] if rv[2] is not None else nextsample) \
                + int(cfg.freq_hz * 10)
        retry -= 1

    if framer.vbi.get('framenr') is None:
        return None

    if abs(target - framer.vbi['framenr']) <= tolerance:
        # probe already landed on the target: point back at the frame the
        # probe consumed (same alignment the jump loop below returns)
        return rv[2] + samples_per_frame * (target - 1
                                            - framer.vbi['framenr'])

    retry = 5
    while abs(target - framer.vbi['framenr']) > tolerance and retry:
        if rv is None or rv[2] is None:
            return None
        offset = samples_per_frame * (target - 1 - framer.vbi['framenr'])
        nextsample = rv[2] + offset
        rv = framer.readframe(infile, nextsample, CAV=iscav)
        retry -= 1

    return nextsample
