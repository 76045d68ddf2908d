"""TPU probes for the Farneback warp optimization (round 4).

1. quad-take: gather the 4 bilinear corners as ONE flat take of 20-wide
   rows from a quad-expanded (H*W, 20) R1 (corner shifts precomputed
   with exact edge-clamp semantics) vs the shipped 4x5-wide takes.
2. dynamic_gather microbenchmarks: shapes/axes that lower, and their
   throughput, to size a future Mosaic warp kernel.

Timing: N dispatches queued back-to-back, ONE data-dependent scalar
fetch (block_until_ready is not a barrier through the tunnel).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(tag, fn, *args, n=20):
    try:
        fn(*args)
        out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    except Exception as e:                         # noqa: BLE001
        print(f'{tag}: FAILED {type(e).__name__}: {str(e)[:200]}',
              flush=True)
        return None
    t0 = time.time()
    outs = [fn(*args) for _ in range(n)]
    s = sum(float(jnp.asarray(o).ravel()[0].astype(jnp.float32))
            for o in outs[-1:])
    dt = (time.time() - t0) / n
    print(f'{tag}: {dt * 1e3:.3f} ms/op  (sink {s:.3g})', flush=True)
    return dt


def probe_quad():
    from ld_decode_tpu.comb import optflow as OF
    H, W = 252, 840
    rng = np.random.default_rng(1)
    R0 = jnp.asarray(rng.normal(0, 1, (H, W, 5)).astype(np.float32))
    R1 = jnp.asarray(rng.normal(0, 1, (H, W, 5)).astype(np.float32))
    flow = jnp.asarray(rng.normal(0, 2, (H, W, 2)).astype(np.float32))
    bscale = jnp.asarray(OF._border_scale(H, W))

    # pre-round-4 form: 4 separate takes of 5-wide rows per warp
    def upd_4take(r0, r1, f):
        Rf = r1.reshape(H * W, 5)
        yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32),
                              indexing='ij')
        fx = jnp.clip(xx + f[..., 0], 0.0, W - 1.001)
        fy = jnp.clip(yy + f[..., 1], 0.0, H - 1.001)
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        ax = (fx - x0)[..., None]
        ay = (fy - y0)[..., None]
        x1 = jnp.minimum(x0 + 1, W - 1)
        y1 = jnp.minimum(y0 + 1, H - 1)
        tk = lambda y, x: jnp.take(Rf, (y * W + x).reshape(-1),
                                   axis=0).reshape(r1.shape)
        return (tk(y0, x0) * (1 - ay) * (1 - ax)
                + tk(y0, x1) * (1 - ay) * ax
                + tk(y1, x0) * ay * (1 - ax) + tk(y1, x1) * ay * ax)

    upd = jax.jit(upd_4take)
    timed('bilinear warp, round-3 form (4x take of 5-wide)', upd, R0, R1,
          flow)

    Rq = jax.jit(OF._quad_expand)(R1)
    jupq = jax.jit(lambda r0, rq, f: OF._update_matrices(r0, rq, f,
                                                         bscale))
    timed('update_matrices quad (1x take of 20-wide, expand amortized)',
          jupq, R0, Rq, flow)
    # warp parity: quad path vs 4-take path
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing='ij')
    fx = jnp.asarray(xx) + flow[..., 0]
    fy = jnp.asarray(yy) + flow[..., 1]
    a = np.asarray(upd(R0, R1, flow))
    b = np.asarray(jax.jit(lambda rq, fx_, fy_: OF._bilinear_gather_quad(
        rq, H, W, 5, fx_, fy_))(Rq, fx, fy))
    print(f'warp parity quad vs 4-take: max|d| = {np.abs(a - b).max():.3e}',
          flush=True)

    # quad expand cost (once per level, shared by the 3 iterations)
    timed('quad_expand (once per level)', jax.jit(OF._quad_expand), R1)

    # wide-row take throughput scan: how does slice width change ns/elt?
    for wrow in (5, 10, 20, 40):
        Rw = jnp.asarray(rng.normal(0, 1, (H * W, wrow)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, H * W, H * W).astype(np.int32))
        f = jax.jit(lambda R, i: jnp.take(R, i, axis=0))
        dt = timed(f'take {H*W} rows of width {wrow}', f, Rw, idx)
        if dt:
            print(f'   -> {dt / (H * W * wrow) * 1e9:.3f} ns/elt', flush=True)


def probe_dyngather():
    """tpu.dynamic_gather shape/axis support + throughput."""
    rng = np.random.default_rng(2)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def mk_kernel(shape, axis):
        def kern(op_ref, idx_ref, out_ref):
            out_ref[...] = jnp.take_along_axis(op_ref[...], idx_ref[...],
                                               axis=axis)
        return kern

    for shape, axis in (((8, 128), 1), ((64, 128), 1), ((256, 128), 1),
                        ((8, 128), 0), ((128, 128), 0), ((512, 512), 1)):
        op = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, min(shape[axis], 128),
                                       shape).astype(np.int32))
        try:
            fn = pl.pallas_call(
                mk_kernel(shape, axis),
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32))
            jfn = jax.jit(fn)
            out = np.asarray(jfn(op, idx))
            ref = np.take_along_axis(np.asarray(op), np.asarray(idx), axis)
            ok = np.array_equal(out, ref)
            print(f'dynamic_gather {shape} axis={axis}: lowers, '
                  f'exact={ok}', flush=True)
            n = 200
            t0 = time.time()
            outs = [jfn(op, idx) for _ in range(n)]
            _ = float(outs[-1].ravel()[0])
            dt = (time.time() - t0) / n
            print(f'   {dt * 1e6:.1f} us/call -> '
                  f'{dt / op.size * 1e9:.3f} ns/elt', flush=True)
        except Exception as e:                     # noqa: BLE001
            print(f'dynamic_gather {shape} axis={axis}: FAIL '
                  f'{type(e).__name__}: {str(e)[:160]}', flush=True)


if __name__ == '__main__':
    print(f'backend: {jax.default_backend()}', flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if which in ('all', 'quad'):
        probe_quad()
    if which in ('all', 'dyn'):
        probe_dyngather()
