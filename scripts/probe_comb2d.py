"""VERDICT r3 #5 record: the comb's Mosaic dim-2 stencil kernel
(`split_chain_2d`, comb/pallas_kernels.py through round 3) was
benchmarked on the v5e against XLA's lowering of the same whole-frame
stencils and LOST — 2.24 ms/frame (pallas) vs 2.16 ms/frame (XLA),
max 1 u16 LSB f32-reassociation delta on 0.007% of pixels — so it was
DELETED (a kernel that is never default and never faster is neither
coverage nor perf).  XLA fuses these elementwise/shift stencils well
on its own; Mosaic only wins where XLA's lowering is structurally bad
(the cubic resample's per-line dynamic windows, tbc/pallas_resample).

This script re-times the surviving XLA dim-2 path so the PERF.md row
stays reproducible."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from ld_decode_tpu.comb.comb_ntsc import CombConfig, _frame_core


def main():
    print(f'backend: {jax.default_backend()}', flush=True)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 65535, (525, 910)).astype(np.uint16)
    frame[:, 0] = 16384
    fd = jnp.asarray(frame)
    ab = jnp.float32(-1.0)

    cfg = CombConfig(dim=2)
    fn = jax.jit(lambda f, a: _frame_core(f, f, f, a, cfg)[:2])
    fn(fd, ab)
    out = fn(fd, ab)
    _ = float(jnp.asarray(out[0]).ravel()[0].astype(jnp.float32))
    n = 20
    t0 = time.time()
    outs = [fn(fd, ab) for _ in range(n)]
    _ = float(jnp.asarray(outs[-1][0]).ravel()[0].astype(jnp.float32))
    print(f'dim-2 _frame_core (XLA): {(time.time() - t0) / n * 1e3:.2f} '
          f'ms/frame', flush=True)


if __name__ == '__main__':
    main()
