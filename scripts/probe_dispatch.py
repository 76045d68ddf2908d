"""Does the axon tunnel overlap CONCURRENT jit-dispatch RPCs?

In latency weather a single dispatch+ack round trip costs 0.4-0.8 s
and the decode chain pays it once per batch (t_dispatch ~0.73 s/batch
in the bench's prefetcher stats, capping throughput at ~15-25 MSa/s
while the D2H probes read a healthy 40 MB/s).  If dispatch RPCs from
different threads overlap the fix is a dispatcher pool; if they
serialize, the lever is fewer+bigger batches.

Times: N sequential dispatches (one thread, no fetch, then one scalar
fetch) vs the same N dispatches issued from N threads.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_dispatch.py
"""
import time
import concurrent.futures as cf

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def work(x, s):
    # ~5 ms of device work, input-dependent so calls never dedup
    y = x + s
    for _ in range(4):
        y = jnp.fft.irfft(jnp.fft.rfft(y, axis=-1), axis=-1)
    return jnp.sum(y[:, :8], axis=-1)


def main():
    x = jnp.asarray(np.random.default_rng(0).random((64, 16384), np.float32))
    outs = [work(x, jnp.float32(i)) for i in range(3)]
    _ = [float(np.asarray(o[0])) for o in outs]       # warm + drain

    N = 8
    for trial in range(2):
        t0 = time.time()
        outs = [work(x, jnp.float32(10 + trial * N + i)) for i in range(N)]
        t_disp = time.time() - t0
        _ = float(np.asarray(outs[-1][0]))
        print(f'sequential: {N} dispatches issued in {t_disp:.2f}s '
              f'({t_disp / N * 1e3:.0f} ms each)')

        t0 = time.time()
        with cf.ThreadPoolExecutor(N) as ex:
            outs = list(ex.map(
                lambda i: work(x, jnp.float32(100 + trial * N + i)),
                range(N)))
        t_disp = time.time() - t0
        _ = float(np.asarray(outs[-1][0]))
        print(f'threaded:   {N} dispatches issued in {t_disp:.2f}s '
              f'({t_disp / N * 1e3:.0f} ms each)')


if __name__ == '__main__':
    main()
