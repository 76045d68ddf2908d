"""Profile the full-chain path (decode -> 3D comb -> RGB + CX) to find
the host-side serializer: bench records 9-15 MSa/s while the no-flow
comb compute is ~2 ms/frame and the decode sustains 50+.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_chain.py [--flow]
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
from ld_decode_tpu.comb.batch import NTSCCombBatch
from ld_decode_tpu.comb.comb_ntsc import CombConfig
from ld_decode_tpu.audio.cx import CXExpander

flow = '--flow' in sys.argv
cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
spf = cfg.freq_hz / cfg.sys.fps
bank = F.make_demod_bank(cfg, dtype=np.complex64)
cap = np.load(os.path.expanduser(
    '~/.cache/ldd_tpu_bench_ntsc40_ramp_132_v1.npy'))
fr = FR.Framer(cfg, bank, capture=cap, batch=16, nblocks=52,
               fetch_picture=not ('--host' in sys.argv))
comb = NTSCCombBatch(CombConfig(dim=3, opticalflow=flow))
cx = CXExpander()

from collections import deque
sink = {'rgb': 0, 'pcm': 0, 'buf': [], 'pending': deque(),
        't_comb': 0.0, 't_cx': 0.0, 't_decode': 0.0}
CB, DEPTH = 8, 3


def chain(rv):
    t0 = time.perf_counter()
    sink['buf'].append(rv[0].reshape(525, 910))
    if len(sink['buf']) == CB:
        import jax.numpy as jnp
        b = sink['buf']
        if any(not isinstance(x, np.ndarray) for x in b):
            frames = jnp.stack([jnp.asarray(x) for x in b])
        else:
            frames = np.stack(b)
        sink['pending'].append(comb.feed(frames))
        sink['buf'] = []
        while len(sink['pending']) > DEPTH:
            rgbs, _ = comb.collect(sink['pending'].popleft())
            for rgb in rgbs:
                sink['rgb'] += rgb.nbytes
    t1 = time.perf_counter()
    if rv[1] is not None:
        sink['pcm'] += cx.process(np.asarray(rv[1]).ravel()).nbytes
    t2 = time.perf_counter()
    sink['t_comb'] += t1 - t0
    sink['t_cx'] += t2 - t1


t0 = time.time()
f0, rs0, _ = fr.readfield(None, 33046)
rv = fr.readframe(None, rs0, True)
rv = fr.readframe(None, rv[2], False)
s = rv[2]
for _ in range(CB):
    rv = fr.readframe(None, s, False)
    chain(rv)
    s = rv[2]
print(f'# warmup+fill {time.time() - t0:.1f}s', file=sys.stderr)

for p in range(2):
    sink['t_comb'] = sink['t_cx'] = 0.0
    t0 = time.time()
    t_read = 0.0
    for _ in range(24):
        tr = time.perf_counter()
        rv = fr.readframe(None, s, False)
        t_read += time.perf_counter() - tr
        chain(rv)
        s = rv[2]
    dt = time.time() - t0
    print(f'pass {p}: {24 * spf / dt / 1e6:.2f} MSa/s  '
          f'(read {t_read:.2f}s comb {sink["t_comb"]:.2f}s '
          f'cx {sink["t_cx"]:.2f}s of {dt:.2f}s)')
print(f'comb stats: {comb.stats}')

pr = cProfile.Profile()
pr.enable()
t0 = time.time()
for _ in range(24):
    rv = fr.readframe(None, s, False)
    chain(rv)
    s = rv[2]
dt = time.time() - t0
pr.disable()
print(f'profiled pass: {24 * spf / dt / 1e6:.2f} MSa/s')
out = io.StringIO()
pstats.Stats(pr, stream=out).sort_stats('cumulative').print_stats(22)
print(out.getvalue())
