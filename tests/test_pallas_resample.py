"""Pallas cubic line-resample kernel vs the XLA gather reference.

Runs the kernel in interpreter mode (CPU CI); on real TPU hardware the
same comparison is exercised by scratch drivers and the bench path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ld_decode_tpu.tbc import resample as RS
from ld_decode_tpu.tbc.pallas_resample import resample_lines_batch


@pytest.mark.parametrize('outwidth,linelen', [(910, 2542.27), (1135, 2560.0)])
def test_matches_xla_gather(outwidth, linelen):
    rng = np.random.default_rng(7)
    B, nsamp = 2, 1 << 18
    nlines = 40

    data = jnp.asarray(rng.standard_normal((B, nsamp)).astype(np.float32))
    ll = (np.arange(nlines + 4) * linelen + 1500.0
          + np.cumsum(rng.uniform(-1, 1, nlines + 4)) * 0.2)
    ll = np.tile(ll[None], (B, 1)) + rng.uniform(0, 1, (B, 1))
    lli = jnp.asarray(np.floor(ll).astype(np.int32))
    llf = jnp.asarray((ll - np.floor(ll)).astype(np.float32))

    def one(d, i_, f_):
        gaps = (i_[1:] - i_[:-1]).astype(jnp.float32) + (f_[1:] - f_[:-1])
        wow = (gaps[:nlines] / linelen).astype(jnp.float32)
        return RS.downscale_lines_split(d, i_, f_, outwidth, nlines, wow)

    ref = np.asarray(jax.vmap(one)(data, lli, llf))
    got = np.asarray(resample_lines_batch(data, lli, llf, outwidth, nlines,
                                          linelen, interpret=True))
    # identical math modulo FMA contraction differences in `rel`
    assert np.abs(ref - got).max() < 1e-2
    assert np.abs(ref - got).mean() < 1e-4


def test_edge_lines_clipped_not_crashing():
    """Lines whose windows fall outside the stream produce finite output."""
    B, nsamp = 1, 1 << 15
    nlines = 8
    linelen = 2542.27
    data = jnp.asarray(np.ones((B, nsamp), np.float32))
    # last lines run off the end of the stream
    ll = np.arange(nlines + 2) * linelen + (nsamp - 3 * linelen)
    lli = jnp.asarray(np.floor(ll).astype(np.int32))[None]
    llf = jnp.asarray((ll - np.floor(ll)).astype(np.float32))[None]
    got = np.asarray(resample_lines_batch(data, lli, llf, 910, nlines,
                                          linelen, interpret=True))
    assert np.isfinite(got).all()


def test_burst_window_matches_xla_gather():
    """col0/ncols mode (the burst refiner's 48-column window) against the
    XLA gather path with identical positions and wow."""
    rng = np.random.default_rng(11)
    B, nsamp = 2, 1 << 18
    nlines, outwidth, linelen = 40, 910, 2542.27

    data = jnp.asarray(rng.standard_normal((B, nsamp)).astype(np.float32))
    ll = (np.arange(nlines + 4) * linelen + 1500.0
          + np.cumsum(rng.uniform(-1, 1, nlines + 4)) * 0.2)
    ll = np.tile(ll[None], (B, 1)) + rng.uniform(0, 1, (B, 1))
    lli = jnp.asarray(np.floor(ll).astype(np.int32))
    llf = jnp.asarray((ll - np.floor(ll)).astype(np.float32))

    def one(d, i_, f_):
        gaps = (i_[1:] - i_[:-1]).astype(jnp.float32) + (f_[1:] - f_[:-1])
        wow = (gaps[:nlines] / linelen).astype(jnp.float32)
        return RS.downscale_lines_split(d, i_, f_, outwidth, nlines, wow,
                                        col0=16, ncols=48)

    ref = np.asarray(jax.vmap(one)(data, lli, llf))
    got = np.asarray(resample_lines_batch(
        data, lli, llf, outwidth, nlines, linelen, interpret=True,
        col0=16, ncols=48))
    assert got.shape == ref.shape == (B, nlines, 48)
    assert np.abs(ref - got).max() < 1e-2
    assert np.abs(ref - got).mean() < 1e-4
