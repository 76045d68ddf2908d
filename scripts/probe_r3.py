"""TPU microprobes for round 3 (run via the axon tunnel, one at a time).

1. codec-v2 row-gather compaction cost (per-line adaptive nibble planes)
2. dynamic-prefix D2H fetch pattern (slice + chunked np.asarray)
3. Farneback flow stage decomposition (poly expansion / update+warp /
   box blur) and the 2-field vmap variant

Timing protocol: N dispatches queued back-to-back, then ONE data-
dependent scalar fetch; subtract nothing (amortized per-op cost =
total / N).  block_until_ready is NOT a barrier through the tunnel.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(tag, fn, *args, n=20):
    fn(*args)                      # compile
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))  # sync
    t0 = time.time()
    outs = [fn(*args) for _ in range(n)]
    s = sum(float(jnp.asarray(o).ravel()[0].astype(jnp.float32))
            for o in outs[-1:])
    dt = (time.time() - t0) / n
    print(f'{tag}: {dt * 1e3:.2f} ms/op  (sink {s:.3g})', flush=True)
    return dt


def probe_codec():
    B, L, W4 = 16, 263, 228
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 65535, (B * 4 * L, W4)
                                   ).astype(np.uint16))
    nrows = int(B * 3.5 * L)
    idx = jnp.asarray(np.sort(rng.choice(B * 4 * L, nrows, replace=False))
                      .astype(np.int32))
    mask = jnp.asarray(rng.random(B * 4 * L) < 0.6)

    @jax.jit
    def row_gather(src, idx):
        return src[idx]

    @jax.jit
    def nz(mask):
        return jnp.nonzero(mask, size=nrows, fill_value=0)[0]

    timed(f'row gather {nrows}x{W4} u16', row_gather, src, idx)
    timed('nonzero(size=...) over 16832', nz, mask)

    # dynamic-prefix fetch: slice then chunked pulls
    dense = row_gather(src, idx).reshape(-1)
    for frac in (0.3, 1.0):
        n = int(dense.shape[0] * frac) // 2048 * 2048
        t0 = time.time()
        flat = dense[:n]
        k = max(1, n * 2 // (256 * 1024))
        step = -(-n // k)
        import concurrent.futures as cf
        with cf.ThreadPoolExecutor(8) as ex:
            parts = list(ex.map(
                lambda i: np.asarray(flat[i * step:(i + 1) * step]),
                range(k)))
        dt = time.time() - t0
        mb = n * 2 / 1e6
        print(f'prefix fetch {mb:.1f} MB in {k} chunks: {dt * 1e3:.0f} ms '
              f'({mb / dt:.1f} MB/s)', flush=True)


def probe_farneback():
    from ld_decode_tpu.comb import optflow as OF
    H, W = 252, 840
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, 65535, (H, W)).astype(np.uint16))
    b = jnp.asarray(rng.integers(0, 65535, (H, W)).astype(np.uint16))
    f0 = jnp.zeros((H, W, 2), jnp.float32)

    fb = jax.jit(lambda x, y, f: OF._farneback_jit(
        x, y, f, 0.5, 2, 60, 3, 7, 1.5, True))
    timed('farneback full (1 field)', fb, a, b, f0, n=10)

    fb2 = jax.jit(lambda x, y, f: jax.vmap(
        lambda xx, yy, ff: OF._farneback_jit(
            xx, yy, ff, 0.5, 2, 60, 3, 7, 1.5, True))(x, y, f))
    a2 = jnp.stack([a, b])
    b2 = jnp.stack([b, a])
    f02 = jnp.zeros((2, H, W, 2), jnp.float32)
    timed('farneback vmap x2 fields', fb2, a2, b2, f02, n=10)

    # stage decomposition at the finest level
    pe = jax.jit(lambda x: OF.poly_expansion(x.astype(jnp.float32), 7, 1.5))
    timed('poly_expansion 252x840', pe, a, n=20)

    R0 = pe(a)
    R1 = pe(b)
    bscale = jnp.asarray(OF._border_scale(H, W))

    R1q = jax.jit(OF._quad_expand)(R1)
    upd = jax.jit(lambda r0, r1q, f: OF._update_matrices(r0, r1q, f,
                                                         bscale))
    timed('update_matrices (quad-take bilinear warp)', upd, R0, R1q, f0,
          n=20)

    M = upd(R0, R1q, f0)
    blur = jax.jit(lambda m: OF._box_blur(m, 60))
    timed('box_blur win60 5ch', blur, M, n=20)

    solve = jax.jit(OF._solve_flow)
    timed('solve_flow', solve, blur(M), n=20)


if __name__ == '__main__':
    print(f'backend: {jax.default_backend()}', flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if which in ('all', 'codec'):
        probe_codec()
    if which in ('all', 'farneback'):
        probe_farneback()
