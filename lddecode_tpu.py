#!/usr/bin/env python
"""CLI front-end: extract video and audio from raw RF LaserDisc captures.

TPU-native equivalent of the reference driver (reference lddecode.py):
same arguments, same output files (<out>.tbc 4fsc 16-bit fields,
<out>.pcm 16-bit 48kHz stereo), plus loader selection by extension
(reference lddecode.py:53-58).
"""

import argparse
import os
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description='Extract audio and video from raw RF laserdisc captures '
                    '(TPU-native)')
    p.add_argument('infile', type=str, help='source file')
    p.add_argument('outfile', type=str, help='base name for destination files')
    p.add_argument('-s', '--start', type=int, default=0,
                   help='rough jump to frame n of capture (default 0)')
    p.add_argument('-S', '--seek', type=int, default=-1,
                   help='seek to frame n of capture')
    p.add_argument('-E', '--end', type=int, default=-1,
                   help='cutting: last frame')
    p.add_argument('-l', '--length', type=int, default=None,
                   help='limit length to n frames')
    p.add_argument('-p', '--pal', action='store_true',
                   help='source is in PAL format')
    p.add_argument('-n', '--ntsc', action='store_true',
                   help='source is in NTSC format')
    p.add_argument('-c', '--cut', action='store_true',
                   help='cut (to r16) instead of decode')
    p.add_argument('--batch', type=int, default=8,
                   help='speculative field-batch size for the device '
                        'pipeline (1 = sequential reference-style decode; '
                        '16 measures ~20%% faster on real TPU hardware)')
    p.add_argument('--segment-mb', type=int, default=512,
                   help='device-resident capture window, MB of u16 '
                        'samples (the batched pipeline decodes inside a '
                        'sliding HBM segment of the file)')
    p.add_argument('--pic-mode', choices=['auto', 'codec', 'raw'],
                   default='auto',
                   help='picture transfer mode for the batched pipeline: '
                        'lossless codec (slow links), chunked raw (fast '
                        'PCIe-class links), or auto (probe once and pick)')
    p.add_argument('--f64', action='store_true',
                   help='run the filter bank at float64 (CPU only)')
    # app/tbc operational knobs (reference app/tbc/main.cpp:152-168)
    p.add_argument('--despackle', action='store_true',
                   help='conceal laser-rot dropouts in the output picture')
    p.add_argument('-r', '--rot', type=float, default=40.0,
                   help='laser-rot detection level for --despackle '
                        '(IRE margin outside 0..100; default 40.0 = the '
                        'reference -20..140 IRE window)')
    p.add_argument('-f', '--flip', action='store_true',
                   help='flip video fields (swap even/odd weave order)')
    p.add_argument('-z', '--freeze', action='store_true',
                   help='freeze-frame: decode one frame and repeat it '
                        'for the requested length')
    p.add_argument('-m', '--bff', action='store_true',
                   help='magnetic video mode: pair frames bottom-field '
                        'first (VHS-style)')
    p.add_argument('-A', '--audio-only', action='store_true',
                   help='output only audio (no .tbc file; the reference '
                        'app/tbc -s flag — the decode still runs the full '
                        'TBC because the 48 kHz chase resampler needs the '
                        'line clock)')
    p.add_argument('--efm', action='store_true',
                   help='additionally extract LaserDisc digital audio: '
                        'band-split the EFM carrier from the composite '
                        'RF, decode EFM -> CIRC -> Q subcode, write '
                        '<out>.efm.pcm (stereo s16 44.1 kHz) and '
                        '<out>.subcode.log (valid Q packets + CIRC '
                        'stats).  Decodes the same -s/-S/-l frame span '
                        'as the video (held in host memory: ~2.7 MB '
                        'per NTSC frame)')
    p.add_argument('-q', '--quiet', action='store_true',
                   help='warnings and errors only')
    p.add_argument('-d', '--debug', action='store_true',
                   help='debug output (per-frame progress percentage)')
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ld_decode_tpu.utils import log
    log.configure_from_flags(quiet=args.quiet, debug=args.debug)
    if args.pal and args.ntsc:
        log.critical('Can only be PAL or NTSC')
        return 1

    from ld_decode_tpu.utils.params import DecoderConfig
    from ld_decode_tpu.ops import filters as F, demod as D
    from ld_decode_tpu.io import loaders as L
    from ld_decode_tpu.tbc import framer as FR

    system = 'PAL' if args.pal else 'NTSC'
    cfg = DecoderConfig(system=system, freq_mhz=40.0)
    bank = F.make_demod_bank(
        cfg, dtype=np.complex128 if args.f64 else np.complex64)
    loader = L.loader_for_path(args.infile)

    samples_per_frame = int(cfg.freq_hz / cfg.sys.fps) + 1
    bytes_per_sample = L.bytes_per_sample_for_path(args.infile)
    bytes_per_frame = int(samples_per_frame * bytes_per_sample)

    infile_size = os.path.getsize(args.infile)
    if (infile_size // bytes_per_frame - args.start) < 2:
        log.critical('start frame is past end of file')
        return 1
    num_frames = args.length if args.length is not None \
        else infile_size // bytes_per_frame - args.start

    fd = open(args.infile, 'rb')
    if args.batch > 1:
        # segmented fast path: batched device pipeline over a sliding
        # HBM-resident window of the capture
        framer = FR.Framer(cfg, bank, loader, batch=args.batch,
                           segment_samples=args.segment_mb * (1 << 20) // 2,
                           despackle=args.despackle, rot_level=args.rot,
                           flip_fields=args.flip, bff=args.bff,
                           pic_mode=args.pic_mode)
    else:
        framer = FR.Framer(cfg, bank, loader, despackle=args.despackle,
                           rot_level=args.rot, flip_fields=args.flip,
                           bff=args.bff)

    if args.seek >= 0:
        nextsample = FR.findframe(fd, framer, args.seek,
                                  args.start * samples_per_frame)
        if nextsample is None:
            log.critical('SEEK ERROR: unable to find a usable frame')
            return 1
    else:
        nextsample = args.start * samples_per_frame
    first_sample = nextsample             # EFM span start (below)

    if args.cut:
        outfile = open(args.outfile + '.r16', 'wb')
        lastsample = FR.findframe(fd, framer, args.end, nextsample)
        lastsample += int(samples_per_frame * .25)
        for i in range(int(nextsample), int(lastsample), 16384):
            n = min(16384, int(lastsample) - i)
            data = loader(fd, i, n)
            if data is None:
                break
            outfile.write(np.asarray(data, dtype=np.int16).tobytes())
        outfile.close()
        return 0

    # --audio-only: the reference app/tbc -s mode writes no video file
    # (app/tbc/main.cpp:157-158, tbcpal.cpp:402)
    out_video = None if args.audio_only else open(args.outfile + '.tbc', 'wb')
    out_audio = open(args.outfile + '.pcm', 'wb')

    frozen = None
    for f in range(num_frames):
        if frozen is not None:
            # -z freeze-frame (reference app/tbc/main.cpp:160-162): the
            # first decoded frame repeats for the requested length
            if out_video is not None:
                out_video.write(frozen.tobytes())
            continue
        # EOF is signalled by the framer itself (fd.tell() is useless
        # here: the segmented framer reads a whole segment ahead)
        combined, audio, nextsample, fields = framer.readframe(
            fd, nextsample, f == 0)
        if combined is None:
            if args.length is not None and f < num_frames - 1:
                log.warning('end of file before requested frame count')
            break
        log.info(f'frame {framer.vbi.get("framenr")}')
        if log.get_level() <= log.DEBUG:
            log.progress(nextsample * bytes_per_sample, infile_size)
        if out_video is not None:
            out_video.write(combined.tobytes())
        if audio is not None:
            out_audio.write(audio.tobytes())
        if args.freeze:
            frozen = combined

    if out_video is not None:
        out_video.close()
    out_audio.close()

    if args.efm:
        # digital audio rides the composite below the video FM
        # (reference attic2/cd-decoder.py:330-443 prototype; ours adds
        # CIRC correction + Q subcode).  One-shot decode over the same
        # frame span the video pass used — the EFM frame stream and
        # CIRC interleave are continuous, so the span loads whole.
        from ld_decode_tpu.audio import efm as EFM
        dec = EFM.extract_digital_audio(
            loader, fd, first_sample,
            (num_frames + 2) * samples_per_frame, cfg.freq_hz)
        if dec is None:
            log.critical('EFM: no samples readable at decode start')
            return 1
        EFM.write_digital_audio_outputs(dec, args.outfile)
        log.info(f'EFM: {dec["samples"].shape[0]} digital-audio samples, '
                 f'{len(dec["q"])} valid Q packets')
    return 0


if __name__ == '__main__':
    sys.exit(main())
