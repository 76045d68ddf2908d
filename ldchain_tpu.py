#!/usr/bin/env python
"""One-command RF -> RGB video + expanded audio: the device-resident
full chain as a product CLI.

TPU-native equivalent of the reference's one-line `encode-ntsc` /
`encode-pal` pipelines (`lddecode | comb -d3 | ffmpeg`, reference
encode-ntsc:1-5) — but with NO intermediate `.tbc` file and NO picture
D2H round trip: the TBC picture stays in HBM
(`Framer(fetch_picture=False)`), the interlace weave runs on device,
the batched comb (comb/batch.py) reads the woven frames straight from
HBM, and only the codec-compressed RGB + audio come down the link.
This is the wiring the bench's full-chain stages measure at 60-100
MSa/s where the two-CLI `.tbc` round trip pays the picture transfer
twice.

Output format matches `ldexport_tpu.py` exactly (same comb emission
protocol, same rgb48le/rgb24 stream or .mp4 mux, same CX-expanded
s16 pcm) — pinned by tests/test_chain_cli.py.
"""

import argparse
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description='Decode RF capture straight to RGB video + expanded '
                    'audio (device-resident chain; no .tbc round trip)')
    p.add_argument('infile', help='RF capture (.lds/.r30/.r16/.u8)')
    p.add_argument('out', help='output base name (.mp4 with ffmpeg, '
                               'else .rgb) + .audio.pcm')
    p.add_argument('-p', '--pal', action='store_true')
    p.add_argument('-s', '--start', type=int, default=0,
                   help='rough jump to frame n of capture')
    p.add_argument('-S', '--seek', type=int, default=-1,
                   help='seek to frame n of capture (CAV/CLV aware)')
    p.add_argument('-l', '--length', type=int, default=None,
                   help='max output frames')
    p.add_argument('-d', '--dim', type=int, default=3,
                   help='comb dimensions (default 3, like encode-ntsc)')
    p.add_argument('-F', '--no-opticalflow', action='store_true',
                   help='NTSC dim 3: K-map motion gate instead of '
                        'Farneback optical flow (comb -F)')
    p.add_argument('-8', '--write8bit', action='store_true',
                   dest='write8bit', help='8-bit RGB output')
    p.add_argument('-W', '--wide', action='store_true',
                   help='NTSC: full 910-dot width')
    p.add_argument('-B', '--bw', action='store_true', help='B&W output')
    p.add_argument('--pulldown', action='store_true',
                   help='NTSC: reassemble 3:2 pulldown film frames')
    p.add_argument('-b', '--brightness', type=float, default=None)
    p.add_argument('-I', '--black-ire', type=float, default=None)
    p.add_argument('-n', '--nr-y', type=float, default=None)
    p.add_argument('-N', '--nr-c', type=float, default=None)
    p.add_argument('-c', '--threedcore', type=float, default=None)
    p.add_argument('-r', '--threedrange', type=float, default=None)
    p.add_argument('--no-cx', action='store_true',
                   help='skip CX expansion of the analog audio')
    p.add_argument('--no-pilot-notch', action='store_true',
                   help='PAL: keep the 3.75 MHz pilot band in the '
                        'picture (see ldexport_tpu.py)')
    p.add_argument('--pal-colorlpf', action='store_true',
                   help='PAL: enable the post-demod chroma LPF '
                        '(see ldexport_tpu.py)')
    p.add_argument('--no-audio', action='store_true',
                   help='no audio output')
    p.add_argument('--batch', type=int, default=16,
                   help='speculative field-batch size (framer pipeline)')
    p.add_argument('--comb-batch', type=int, default=8,
                   help='frames per comb window')
    p.add_argument('--depth', type=int, default=3,
                   help='comb windows in flight (fetch/decode overlap)')
    p.add_argument('--segment-mb', type=int, default=512,
                   help='device-resident capture window, MB')
    p.add_argument('--raw', action='store_true',
                   help='write raw .rgb even when ffmpeg is available')
    p.add_argument('--efm', action='store_true',
                   help='additionally extract LaserDisc digital audio '
                        '(EFM -> CIRC -> Q subcode) to <out>.efm.pcm + '
                        '<out>.subcode.log, same as lddecode_tpu --efm')
    p.add_argument('-q', '--quiet', action='store_true')
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ld_decode_tpu.utils import log
    log.configure_from_flags(quiet=args.quiet, debug=False)
    from ld_decode_tpu.utils.params import DecoderConfig
    from ld_decode_tpu.ops import filters as F
    from ld_decode_tpu.io import loaders as L
    from ld_decode_tpu.tbc import framer as FR
    from ld_decode_tpu.audio.cx import CXExpander

    system = 'PAL' if args.pal else 'NTSC'
    cfg = DecoderConfig(system=system, freq_mhz=40.0)
    bank = F.make_demod_bank(cfg, dtype=np.complex64)
    loader = L.loader_for_path(args.infile)
    samples_per_frame = int(cfg.freq_hz / cfg.sys.fps) + 1

    fd = open(args.infile, 'rb')
    framer = FR.Framer(cfg, bank, loader, batch=max(args.batch, 2),
                       segment_samples=args.segment_mb * (1 << 20) // 2,
                       fetch_picture=False)

    if args.seek >= 0:
        nextsample = FR.findframe(fd, framer, args.seek,
                                  args.start * samples_per_frame)
        if nextsample is None:
            log.critical('SEEK ERROR: unable to find a usable frame')
            return 1
    else:
        nextsample = args.start * samples_per_frame
    start_first = nextsample              # EFM span start

    # ----- comb (batched drivers; same emission protocol as ldexport)
    Y, X = cfg.sys.frame_lines, cfg.sys.outlinelen
    if args.pal:
        from ld_decode_tpu.comb.batch import PALCombBatch
        from ld_decode_tpu.comb.comb_pal import CombPALConfig
        pkw = dict(dim=args.dim, bw=args.bw)
        if args.brightness is not None:
            pkw['brightness'] = args.brightness
        if args.black_ire is not None:
            pkw['black_ire'] = args.black_ire
        if args.nr_y is not None:
            pkw['nr_y'] = args.nr_y
        if args.threedcore is not None:
            pkw['p_3dcore'] = args.threedcore
        if args.threedrange is not None:
            pkw['p_3drange'] = args.threedrange
        if args.no_pilot_notch:
            pkw['pilot_notch'] = False
        if args.pal_colorlpf:
            pkw['colorlpf'] = True
        comb = PALCombBatch(CombPALConfig(**pkw), out8=args.write8bit)
        width, height, fps = X, pkw.get('linesout', 576), '25'
    else:
        from ld_decode_tpu.comb.batch import NTSCCombBatch
        from ld_decode_tpu.comb.comb_ntsc import CombConfig
        nkw = dict(dim=args.dim, bw=args.bw, wide=args.wide,
                   opticalflow=not args.no_opticalflow)
        if args.brightness is not None:
            nkw['brightness'] = args.brightness
        if args.black_ire is not None:
            nkw['black_ire'] = args.black_ire
        if args.nr_y is not None:
            nkw['nr_y'] = args.nr_y
        if args.nr_c is not None:
            nkw['nr_c'] = args.nr_c
        if args.threedcore is not None:
            nkw['of_3dcore' if not args.no_opticalflow
                else 'p_3dcore'] = args.threedcore
        if args.threedrange is not None:
            nkw['of_3drange' if not args.no_opticalflow
                else 'p_3drange'] = args.threedrange
        comb = NTSCCombBatch(CombConfig(**nkw), out8=args.write8bit)
        width = X if args.wide else 744
        height = 480
        fps = '24000/1001' if args.pulldown else '30000/1001'

    # ----- sinks (shared with ldexport_tpu.py: one place owns the
    # stream formats)
    from ld_decode_tpu.io.export_sink import VideoSink
    audio_path = args.out + '.audio.pcm'
    out_audio = None if args.no_audio else open(audio_path, 'wb')
    sink = VideoSink(args.out, width, height, fps,
                     write8bit=args.write8bit, force_raw=args.raw,
                     quiet_ffmpeg=True)

    pulldown = None
    if args.pulldown and not args.pal:
        from ld_decode_tpu.comb.comb_ntsc import PulldownAssembler
        pulldown = PulldownAssembler()
    cx = CXExpander()

    def emit(rgb, words):
        if args.length is not None and sink.nframes >= args.length:
            return
        if pulldown is not None:
            for film, _code in pulldown.process(rgb, words):
                sink.write(film)
        else:
            sink.write(rgb)

    def harvest(handle):
        rgbs, words = comb.collect(handle)
        for rgb, w in zip(rgbs, words):
            emit(rgb, w)

    # ----- the chain loop (the bench's _ChainStage wiring, productized):
    # frames accumulate device-resident; every comb-batch frames ONE
    # jitted comb call dispatches, and up to --depth windows stay in
    # flight so window k's RGB fetch + native decode overlap the decode
    # of the next frames
    from collections import deque
    import jax.numpy as jnp
    pending = deque()
    buf = []

    def flush_windows(drain=False):
        if buf:
            if any(not isinstance(x, np.ndarray) for x in buf):
                frames = jnp.stack([jnp.asarray(x) for x in buf])
            else:
                frames = np.stack(buf)
            h = comb.feed(frames)
            if h is not None:
                pending.append(h)
            buf.clear()
        limit = 0 if drain else args.depth
        while len(pending) > limit:
            harvest(pending.popleft())

    first = True
    while args.length is None or sink.nframes < args.length:
        combined, audio, nextsample, fields = framer.readframe(
            fd, nextsample, first)
        first = False
        if combined is None:
            break
        buf.append(combined.reshape(Y, X))
        if len(buf) >= args.comb_batch:
            flush_windows()
        if audio is not None and out_audio is not None:
            pcm = np.asarray(audio).ravel()
            out = cx.process(pcm) if not args.no_cx \
                else (pcm.astype(np.int64) + 32768).astype(np.uint16)
            out_audio.write((out.astype(np.int32) - 32768
                             ).astype('<i2').tobytes())
    flush_windows(drain=True)
    if hasattr(comb, 'flush'):
        tail = comb.flush()
        if tail is not None:
            if args.write8bit and np.asarray(tail).dtype != np.uint8:
                tail = (np.asarray(tail) >> 8).astype(np.uint8)
            emit(tail, None)

    sink.close()
    if out_audio is not None:
        out_audio.close()
        # the audio stream is produced DURING the decode (unlike
        # ldexport, which has the whole .pcm up front and muxes in one
        # pass), so the mp4 gets its audio in a second stream-copy remux
        sink.remux_audio(audio_path)
    if args.efm:
        from ld_decode_tpu.audio import efm as EFM
        nspan = (args.length + 2 if args.length is not None
                 else max(sink.nframes + 8, 4)) * samples_per_frame
        dec = EFM.extract_digital_audio(loader, fd, start_first, nspan,
                                        cfg.freq_hz)
        if dec is not None:
            EFM.write_digital_audio_outputs(dec, args.out)
            print(f'EFM: {dec["samples"].shape[0]} digital-audio '
                  f'samples, {len(dec["q"])} valid Q packets',
                  file=sys.stderr)
    print(f'wrote {sink.nframes} frames', file=sys.stderr)
    return 0


if __name__ == '__main__':
    sys.exit(main())
