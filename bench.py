#!/usr/bin/env python
"""End-to-end decode benchmark (driver-run on real TPU hardware).

Measures NTSC RF decode throughput — batched FM demod + full TBC to .tbc
picture + analog audio — in megasamples of RF input per second, against the
real-time capture rate baseline (40 MSa/s, BASELINE.md).

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": "MSa/s", "vs_baseline": ...}
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ld_decode_tpu.utils.params import DecoderConfig
    from ld_decode_tpu.models import encode as E
    from ld_decode_tpu.ops import filters as F
    from ld_decode_tpu.io import loaders as L
    from ld_decode_tpu.tbc import framer as FR

    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    print(f'# backend: {jax.default_backend()}', file=sys.stderr)

    # enough frames that warmup + 3 timed passes never hit EOF (an EOF
    # clamp flushes the whole in-flight chain and poisons the pass).
    # The synthetic encode runs ~3 s/frame on the host, so the capture is
    # cached on disk across bench runs.
    nframes_cap = 132
    cache = os.path.expanduser(
        f'~/.cache/ldd_tpu_bench_ntsc40_ramp_{nframes_cap}_v1.npy')
    if os.path.exists(cache):
        samples = np.load(cache)
    else:
        samples = E.encode_frames(cfg, nframes_cap,
                                  E.EncodeSpec(pattern='ramp',
                                               cav_start_frame=900))
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.save(cache, samples)
    bank = F.make_demod_bank(cfg, dtype=np.complex64)

    samples_per_frame = cfg.freq_hz / cfg.sys.fps
    start = 33046

    # warmup: compiles every kernel variant; capture stays device-resident.
    # 52-block windows (~797k samples) still cover the next field's vsync
    # (the reference reads 1M for the same purpose) with 21% less demod.
    fr = FR.Framer(cfg, bank, capture=samples, batch=8, nblocks=52)
    t0 = time.time()
    f0, rs0, _ = fr.readfield(None, start)
    assert f0 is not None, 'warmup field failed'
    start = rs0          # first valid field position (skips the VI head)
    rv = fr.readframe(None, start, True)
    assert rv[0] is not None, 'warmup frame failed'
    rv = fr.readframe(None, rv[2], False)
    assert rv[0] is not None
    print(f'# warmup/compile: {time.time()-t0:.1f}s', file=sys.stderr)

    # timed: one continuous decode through the capture — no wraps, no
    # warmup stock riding (the pass count x reps fits inside the capture).
    # Three timed passes, median reported: the axon tunnel's transfer
    # rate swings several-fold between runs (measured 7-335 s cumulative
    # fetch wait for identical work), and the median de-noises that
    # without hiding a real regression.
    profile_dir = os.environ.get('LD_TPU_PROFILE_DIR')
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    reps = 35
    rates = []
    sample = rv[2]
    for p in range(3):
        nframes = 0
        eof = False
        t0 = time.time()
        for _ in range(reps):
            rv = fr.readframe(None, sample, False)
            if rv[0] is None:
                eof = True
                break
            sample = rv[2]
            nframes += 1
        dt = time.time() - t0
        if nframes:
            rates.append(nframes * samples_per_frame / dt / 1e6)
            print(f'# pass {p}: {nframes} frames in {dt:.2f}s '
                  f'-> {rates[-1]:.2f} MSa/s', file=sys.stderr)
        if eof:
            # capture exhausted: report what completed rather than
            # letting zero-frame passes poison the median
            print('# EOF mid-pass (capture too short?)', file=sys.stderr)
            break
    if profile_dir:
        jax.profiler.stop_trace()

    if fr.prefetcher is not None:
        print(f'# prefetcher stats: {fr.prefetcher.stats}', file=sys.stderr)
    assert rates, 'no pass completed any frames'
    msa_s = sorted(rates)[len(rates) // 2]
    baseline = 40.0
    print(json.dumps({
        'metric': 'ntsc_demod_tbc_throughput',
        'value': round(msa_s, 2),
        'unit': 'MSa/s',
        'vs_baseline': round(msa_s / baseline, 3),
    }))


if __name__ == '__main__':
    main()
