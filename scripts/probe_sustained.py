"""Profile the sustained decode loop host-side (where does the time go
per batch in steady state?).

Runs the bench's headline stage geometry for a few passes with
per-phase wall clocks + cProfile over the pass loop, printing the top
cumulative entries.  Separates: framer readframe wait, prefetcher
dispatch, fetch futures, host codec unpack.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_sustained.py
"""
import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

from ld_decode_tpu.utils.params import DecoderConfig
from ld_decode_tpu.ops import filters as F
from ld_decode_tpu.tbc import framer as FR

cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
spf = cfg.freq_hz / cfg.sys.fps
bank = F.make_demod_bank(cfg, dtype=np.complex64)
cap = np.load(os.path.expanduser(
    '~/.cache/ldd_tpu_bench_ntsc40_ramp_132_v1.npy'))
fr = FR.Framer(cfg, bank, capture=cap, batch=16, nblocks=52)

t0 = time.time()
f0, rs0, _ = fr.readfield(None, 33046)
rv = fr.readframe(None, rs0, True)
rv = fr.readframe(None, rv[2], False)
print(f'# warmup {time.time() - t0:.1f}s', file=sys.stderr)
s = rv[2]

for p in range(2):
    t0 = time.time()
    for _ in range(32):
        rv = fr.readframe(None, s, False)
        s = rv[2]
    dt = time.time() - t0
    print(f'pass {p}: {32 * spf / dt / 1e6:.2f} MSa/s '
          f'(stats {fr.prefetcher.stats})')

pr = cProfile.Profile()
pr.enable()
t0 = time.time()
for _ in range(32):
    rv = fr.readframe(None, s, False)
    s = rv[2]
dt = time.time() - t0
pr.disable()
print(f'profiled pass: {32 * spf / dt / 1e6:.2f} MSa/s')
out = io.StringIO()
ps = pstats.Stats(pr, stream=out).sort_stats('cumulative')
ps.print_stats(28)
print(out.getvalue())
