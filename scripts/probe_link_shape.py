"""Characterize the axon tunnel's D2H collapse shape.

When the link probe reads <1 MB/s the question is WHERE the time goes:
per-transfer latency (fixed cost per fetch call -> bigger chunks win),
per-byte bandwidth (nothing helps but fewer bytes), or head-of-line
blocking (more concurrency wins).  Sweeps chunk size x thread count on
a device-resident buffer and prints MB/s + per-call latency for each
cell, plus H2D and dispatch RT for reference.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_link_shape.py
"""
import sys
import time
import concurrent.futures as cf

import numpy as np
import jax
import jax.numpy as jnp


def fetch(buf, nbytes_total, chunk_bytes, threads):
    n = max(1, nbytes_total // chunk_bytes)
    cw = chunk_bytes // 2                      # u16 words per chunk
    t0 = time.time()
    if threads == 1:
        parts = [np.asarray(buf[i * cw:(i + 1) * cw]) for i in range(n)]
    else:
        with cf.ThreadPoolExecutor(threads) as ex:
            parts = list(ex.map(
                lambda i: np.asarray(buf[i * cw:(i + 1) * cw]), range(n)))
    dt = time.time() - t0
    mb = sum(p.nbytes for p in parts) / 1e6
    return mb / dt, dt / n


def main():
    print(f'# backend: {jax.default_backend()}', file=sys.stderr)
    big = jax.jit(lambda: jnp.arange(16 * 1024 * 1024, dtype=jnp.uint16))()
    big.block_until_ready()

    # dispatch round trip (scalar fetch)
    s = jax.jit(lambda x: jnp.sum(x[:8].astype(jnp.int32)))(big)
    for _ in range(2):
        t0 = time.time()
        v = jax.jit(lambda x: jnp.sum(x[:8].astype(jnp.int32)))(big)
        _ = int(v)
        print(f'dispatch+scalar RT: {(time.time() - t0) * 1e3:.0f} ms')

    # H2D
    h = np.zeros(8 * 1024 * 1024, np.uint16)
    t0 = time.time()
    d = jnp.asarray(h)
    d.block_until_ready()
    print(f'H2D 16MB: {h.nbytes / 1e6 / (time.time() - t0):.0f} MB/s')

    total = 4 * 1024 * 1024                    # 4 MB per cell
    for chunk_kb in (64, 256, 1024, 4096):
        for threads in (1, 8, 32):
            rate, lat = fetch(big, total, chunk_kb * 1024, threads)
            print(f'D2H chunk={chunk_kb:5d}KB threads={threads:2d}: '
                  f'{rate:8.2f} MB/s  ({lat * 1e3:7.0f} ms/call)')
            sys.stdout.flush()


if __name__ == '__main__':
    main()
