"""Multi-chip sharded demod vs single-device reference (virtual CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ld_decode_tpu.ops import demod as D
from ld_decode_tpu.ops import filters as F
from ld_decode_tpu.parallel import mesh as M
from ld_decode_tpu.utils.params import DecoderConfig


@pytest.fixture(scope='module')
def small_cfg():
    return DecoderConfig(system='NTSC', freq_mhz=40.0, blocklen=2048,
                         blockcut=128, blockcut_end=32)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_sharded_demod_matches_single(small_cfg):
    cfg = small_cfg
    bank = F.make_demod_bank(cfg, np.complex64)
    mesh = M.make_mesh(8)
    n_dp, n_sp = mesh.shape['dp'], mesh.shape['sp']
    nblocks = 2 * n_sp
    nfields = n_dp

    rng = np.random.default_rng(0)
    keep = cfg.block_keep
    total = nblocks * keep + (cfg.blocklen - keep)
    streams = rng.integers(0, 1024, (nfields, total)).astype(np.float32)

    # single-device reference per field
    ref = []
    for f in range(nfields):
        video, _ = D.demod_stream(jnp.asarray(streams[f]), bank, cfg,
                                  nblocks, jnp.float32(1.0))
        ref.append(np.asarray(video['demod']))
    ref = np.stack(ref)

    # sharded: bodies only (the sharded step reads the halo via ppermute;
    # the halo after the last block wraps, so compare all but the last
    # block's output)
    step = M.build_sharded_demod(cfg, bank, mesh, nblocks, nfields)
    body = jnp.asarray(streams[:, :nblocks * keep])
    body = jax.device_put(body, NamedSharding(mesh, P('dp', 'sp')))
    demod, pidx, pval = step(body, jnp.float32(1.0))
    got = np.asarray(demod)

    ncmp = (nblocks - 1) * keep
    np.testing.assert_allclose(got[:, :ncmp], ref[:, :ncmp],
                               rtol=1e-4, atol=200.0)

    # peak lists replicated along sp and plausible
    assert pidx.shape == (nfields, 1024)
