"""Measure codec-encode lowerings on the TPU (round-4 compute shave).

The v4 encoder extracts 16 one-bit planes + per-bit counts with a
16-iteration shift/and/reduce loop (~32 passes over the residual).  A
16x16 bit-matrix butterfly transpose (Hacker's Delight 7-3 adapted to
u16) produces the plane words in 4 stages, and the counts fall out as
popcounts of those words — ~4x less elementwise work.  This probe
checks exact equality of (planes, counts) between the two lowerings
and times full encode_image_planes before/after on real batch
geometry.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_codec_encode.py
(CPU check only: JAX_PLATFORMS=cpu ... --check)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ld_decode_tpu.tbc import fused as FU


def loop_planes(zb):
    """The v4 16-iteration lowering (reference for equality)."""
    w_pack = (1 << jnp.arange(16, dtype=jnp.int32))[None, None, :]
    planes, counts = [], []
    for p in range(16):
        bp = (zb >> p) & 1
        planes.append(jnp.sum(bp * w_pack, axis=2).astype(jnp.uint16))
        counts.append(jnp.sum(bp, axis=2))
    return jnp.stack(planes), jnp.stack(counts, axis=-1)


def butterfly_planes(zb):
    pt = FU._bit_transpose16(zb)
    c = FU._popcount16(pt)
    return jnp.moveaxis(pt, -1, 0).astype(jnp.uint16), c


def timed(fn, *args, n=20):
    fn(*args)[0].block_until_ready()
    # N queued dispatches + one data-dependent fetch (tunnel protocol)
    t0 = time.time()
    outs = [fn(*args) for _ in range(n)]
    s = sum(int(np.asarray(o[0][:1].astype(jnp.int32)).sum())
            for o in outs[-1:])
    dt = (time.time() - t0 - 0.028) / n
    return dt, s


def main():
    rng = np.random.default_rng(0)
    R, NB = 263, 57
    B = 16
    zb = jnp.asarray(rng.integers(0, 65536, (B * R, NB, 16)), jnp.int32)

    lp, lc = jax.jit(loop_planes)(zb)
    bp, bc = jax.jit(butterfly_planes)(zb)
    np.testing.assert_array_equal(np.asarray(lp), np.asarray(bp))
    np.testing.assert_array_equal(np.asarray(lc), np.asarray(bc))
    print('butterfly == loop (planes, counts): exact', file=sys.stderr)

    if '--check' in sys.argv:
        return

    jl = jax.jit(loop_planes)
    jb = jax.jit(butterfly_planes)
    for tag, fn in (('loop', jl), ('butterfly', jb)):
        dt, _ = timed(fn, zb)
        print(f'{tag}: {dt * 1e3:.2f} ms/batch-equivalent')

    # full encoder on real-ish residual statistics
    x = jnp.asarray(rng.integers(0, 65536, (B, R, NB * 16)), jnp.int32)
    enc = jax.jit(jax.vmap(lambda im: FU.encode_image_planes(im, 2)))
    enc(x)[0].block_until_ready()
    t0 = time.time()
    n = 10
    for _ in range(n):
        o = enc(x)
    o[0].block_until_ready()
    print(f'encode_image_planes (white noise): '
          f'{(time.time() - t0) / n * 1e3:.1f} ms/batch')


if __name__ == '__main__':
    main()
