#!/usr/bin/env python
"""Packaging front-end: .tbc (+ .pcm) -> RGB48 video (+ expanded audio).

TPU-native equivalent of the reference's `encode-ntsc` / `encode-pal`
pipelines (`cat x.tbc | comb -d3 | ffmpeg ...`): runs the comb chroma
decoder and CX expander and either pipes rgb48le into ffmpeg (when
available) or writes raw .rgb / .pcm files with the exact stream formats
the reference scripts used (rgb48, 744x480 @29.97 NTSC interlaced).
"""

import argparse
import os
import shutil
import subprocess
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='Package decoded .tbc into video')
    p.add_argument('intbc', help='input .tbc file')
    p.add_argument('out', help='output base name (.mp4 with ffmpeg, else .rgb)')
    p.add_argument('--pal', action='store_true')
    p.add_argument('-p', '--pulldown', action='store_true',
                   help='reassemble 3:2 pulldown film frames from white '
                        'flag / CAV frame # (NTSC; reference comb -p)')
    p.add_argument('-d', '--dim', type=int, default=3,
                   help='comb dimensions (1/2/3, default 3 like encode-ntsc)')
    p.add_argument('-a', '--audio', default=None, help='input .pcm (48kHz s16)')
    p.add_argument('--no-cx', action='store_true',
                   help='skip CX expansion of the audio')
    p.add_argument('-B', '--bw', action='store_true', help='B&W output')
    p.add_argument('-W', '--wide', action='store_true',
                   help='full 910-dot width (no crop)')
    p.add_argument('-l', '--length', type=int, default=None,
                   help='max frames')
    p.add_argument('-D', '--debug2d', action='store_true',
                   help='render the 2D-3D chroma difference over gray and '
                        'print per-line/total MSE+ME (reference comb -D; '
                        'forces -d 3)')
    p.add_argument('-k', '--show-k', action='store_true',
                   help='render the K-map (combk[dim-1]) as grayscale '
                        '(reference comb -k)')
    p.add_argument('--debug-line', type=int, default=None,
                   help='dump + black out TBC line N+25 (reference comb -l)')
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ld_decode_tpu.audio.cx import CXExpander

    if args.pal:
        from ld_decode_tpu.comb.comb_pal import PALComb, CombPALConfig, \
            PAL_X, PAL_Y
        comb = PALComb(CombPALConfig(dim=min(args.dim, 2), bw=args.bw))
        IN_X, IN_Y = PAL_X, PAL_Y
        width, height = PAL_X, 576
        fps = '25'
    else:
        from ld_decode_tpu.comb.comb_ntsc import NTSCComb, CombConfig, \
            IN_X, IN_Y
        comb = NTSCComb(CombConfig(
            dim=3 if args.debug2d else args.dim, bw=args.bw, wide=args.wide,
            debug2d=args.debug2d, showk=args.show_k,
            debugline=args.debug_line if args.debug_line is not None
            else -10000))
        width = IN_X if args.wide else 744
        height = 480
        fps = '24000/1001' if args.pulldown else '30000/1001'

    ffmpeg = shutil.which('ffmpeg')
    frame_bytes = IN_X * IN_Y * 2

    # audio: CX expand to a side .pcm
    audio_path = None
    if args.audio:
        cx = CXExpander()
        audio_path = args.out + '.audio.pcm'
        with open(args.audio, 'rb') as fa, open(audio_path, 'wb') as fo:
            while True:
                buf = fa.read(1 << 20)
                if not buf:
                    break
                pcm = np.frombuffer(buf[:len(buf) // 4 * 4], '<i2')
                out = cx.process(pcm) if not args.no_cx \
                    else (pcm.astype(np.int64) + 32768).astype(np.uint16)
                fo.write((out.astype(np.int32) - 32768
                          ).astype('<i2').tobytes())

    if ffmpeg:
        cmd = [ffmpeg, '-y', '-f', 'rawvideo', '-pix_fmt', 'rgb48le',
               '-s', f'{width}x{height}', '-r', fps, '-i', '-']
        if audio_path:
            cmd += ['-f', 's16le', '-ar', '48000', '-ac', '2',
                    '-i', audio_path]
        cmd += ['-flags', '+ildct+ilme', args.out + '.mp4']
        sink = subprocess.Popen(cmd, stdin=subprocess.PIPE)
        out_f = sink.stdin
    else:
        print('ffmpeg not found; writing raw rgb48 stream to '
              f'{args.out}.rgb', file=sys.stderr)
        sink = None
        out_f = open(args.out + '.rgb', 'wb')

    pulldown = None
    if args.pulldown and not args.pal:
        from ld_decode_tpu.comb.comb_ntsc import PulldownAssembler
        pulldown = PulldownAssembler()

    nframes = 0
    with open(args.intbc, 'rb') as f:
        while args.length is None or nframes < args.length:
            buf = f.read(frame_bytes)
            if len(buf) < frame_bytes:
                break
            frame = np.frombuffer(buf, np.uint16)
            rgb = comb.process(frame)
            if rgb is None:          # 3D warmup
                continue
            if getattr(comb, 'last_debug2d', None) is not None:
                d = comb.last_debug2d
                for li in range(36, 524):
                    print(f'{li} {d["mse_line"][li]:.6g} ME '
                          f'{d["me_line"][li]:.6g}', file=sys.stderr)
                print(f'TOTAL MSE {d["mse"]:.6g} ME {d["me"]:.6g}',
                      file=sys.stderr)
            if pulldown is not None:
                for film, _code in pulldown.process(
                        rgb, comb.last_frame_words):
                    out_f.write(np.ascontiguousarray(film).tobytes())
                    nframes += 1
            else:
                out_f.write(np.ascontiguousarray(rgb).tobytes())
                nframes += 1

    if hasattr(comb, 'flush'):
        tail = comb.flush()
        if tail is not None:
            out_f.write(np.ascontiguousarray(tail).tobytes())
            nframes += 1

    out_f.close()
    if sink:
        sink.wait()
    print(f'wrote {nframes} frames', file=sys.stderr)
    return 0


if __name__ == '__main__':
    sys.exit(main())
