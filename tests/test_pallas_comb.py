"""Fused Pallas comb stencil vs the jnp comb functions (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ld_decode_tpu.comb import comb_ntsc as C
from ld_decode_tpu.comb.pallas_kernels import split_chain_2d
from ld_decode_tpu.models import encode as E
from ld_decode_tpu.ops import filters as F
from ld_decode_tpu.tbc import framer as FR
from ld_decode_tpu.utils.params import DecoderConfig


@pytest.fixture(scope='module')
def tbc_frame():
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    samples = E.encode_frames(cfg, 3, E.EncodeSpec(pattern='bars',
                                                   cav_start_frame=900))
    bank = F.make_demod_bank(cfg, np.complex64)
    fr = FR.Framer(cfg, bank, capture=samples)
    rv = fr.readframe(None, 33046, True)
    return np.asarray(rv[0], np.uint16).reshape(C.IN_Y, C.IN_X)


def test_pallas_matches_jnp(tbc_frame):
    cfg = C.CombConfig(dim=2)
    raw = jnp.asarray(tbc_frame).astype(jnp.float32)
    invert = jnp.asarray(tbc_frame[:, 0] == 16384)

    clp0 = C.split1d(raw)
    clp1, k1, k0 = C.split2d(clp0, jnp.zeros_like(raw), True)
    y0, i0, q0 = C.split_iq(raw, (jnp.zeros_like(raw), clp1, clp0),
                            (jnp.zeros_like(raw), k1, k0), invert, cfg)
    y0, i0, q0 = C.adjust_y(y0, i0, q0, invert, cfg)

    y1, i1, q1 = split_chain_2d(raw, invert, interpret=True)

    for a, b, name in [(y0, y1, 'y'), (i0, i1, 'i'), (q0, q1, 'q')]:
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert d.max() < 1e-2, (name, d.max(),
                                np.unravel_index(np.argmax(d), d.shape))
