"""Break down compact_planes cost on the TPU (round-4 compute shave).

Times each component of the rank-prefix compaction separately on the
real batch geometry (B=16, N=R*NB~15k blocks/field) with realistic
nwords statistics, so the next optimization targets the real hotspot:
  1. _block_rank (the (N,17) cumsum)
  2. the 244k-row reorder gather
  3. nonzero over 32-word units
  4. the unit gather
  5. full compact_planes

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_compaction.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from ld_decode_tpu.tbc import fused as FU

B, R, NB = 16, 263, 57
N = R * NB
Ncap = -(-N // FU._CODEC_UNIT) * FU._CODEC_UNIT
rng = np.random.default_rng(0)
# realistic nwords: mostly 4-9 bits, some 0, some 16
_p = np.array([8, 2, 2, 4, 10, 14, 18, 16, 10, 6, 3, 2, 1, 1, 1, 1, 1.0])
nw = rng.choice(17, (B, N), p=_p / _p.sum())
tab = jnp.asarray(nw, jnp.int32).reshape(B, R, NB)
planes = jnp.asarray(
    rng.integers(0, 65536, (B, 16, R, NB)), jnp.uint16)
cap = FU.codec_cap_rows.__wrapped__ if hasattr(FU.codec_cap_rows, '__wrapped__') else None


def timed(f, *a, n=20):
    o = f(*a)
    _ = int(np.asarray(o))            # block_until_ready lies via the
    t0 = time.time()                  # tunnel; fetch a scalar instead
    for _ in range(n):
        o = f(*a)
    _ = int(np.asarray(o))
    return ((time.time() - t0) - 0.028) / n * 1e3


@jax.jit
def rank_only(tab):
    nwords = (tab & 0x1F).reshape(B, N)
    r, g = jax.vmap(FU._block_rank)(nwords)
    return r.sum() + g.sum()


@jax.jit
def rank_reorder(planes, tab):
    nwords = (tab & 0x1F).reshape(B, N)

    def one(pl, nwi):
        rank, gt = FU._block_rank(nwi)
        pr = jnp.zeros((Ncap, 16), pl.dtype).at[rank].set(
            pl.reshape(16, N).T).T
        return pr
    pr = jax.vmap(one)(planes, nwords)
    return pr.astype(jnp.uint32).sum()


CAPW = 16 * (-(-N // 32) * 32) * B


@jax.jit
def full(planes, tab):
    dense, rows = FU.compact_planes(planes, tab, CAPW)
    return dense.astype(jnp.uint32).sum() + rows.sum()


@jax.jit
def nz_only(tab):
    nwords = (tab & 0x1F).reshape(B, N)

    def one(nwi):
        _, gt = FU._block_rank(nwi)
        cnt = gt[:16]
        umask = (jnp.arange(Ncap // 32)[None, :] * 32) < cnt[:, None]
        return umask
    um = jax.vmap(one)(tab.reshape(B, N) & 0x1F)
    idx = jnp.nonzero(um.reshape(-1), size=CAPW // 32, fill_value=0)[0]
    return idx.sum()


for tag, f, a in (('rank only', rank_only, (tab,)),
                  ('rank+reorder', rank_reorder, (planes, tab)),
                  ('rank+nonzero', nz_only, (tab,)),
                  ('full compact_planes', full, (planes, tab))):
    print(f'{tag}: {timed(f, *a):.2f} ms/batch')
