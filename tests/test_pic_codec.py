"""Lossless picture codec round trips (fused.encode_picture_dev /
decode_picture_host): the batched pipeline ships the u16 TBC picture
compressed because the tunnel's D2H link is the end-to-end throughput
wall (~93% of each field bundle is picture)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ld_decode_tpu.tbc import fused as FU
from ld_decode_tpu.utils.params import DecoderConfig


def _roundtrip(pic, cfg):
    lw, hidx, hval, nhi = FU.encode_picture_dev(jnp.asarray(pic), cfg)
    data = {'pic_low': np.asarray(lw), 'pic_hi_idx': np.asarray(hidx),
            'pic_hi_val': np.asarray(hval),
            'pic_hi_n': np.asarray(nhi).reshape(1)}
    return FU.decode_picture_host(data, cfg), int(nhi)


@pytest.mark.parametrize('system', ['NTSC', 'PAL'])
def test_codec_roundtrip_synthetic_field(system):
    """A TBC-like field (sync + burst-ish chroma + luma ramp) round-trips
    exactly and stays within the sparse budget."""
    cfg = DecoderConfig(system=system, freq_mhz=40.0)
    L, W, Wp, cap, k = FU.pic_codec_params(cfg)
    w = np.arange(W)
    line = np.full(W, 0x3C00, np.int64)
    line[:65] = 0x0400                       # sync tip
    line[80:120] += (3000 * np.sin(w[80:120] * np.pi / 2)).astype(np.int64)
    line[160:] = 0x3C00 + (w[160:] - 160) * 45          # luma ramp
    line += (7000 * np.sin(w * np.pi / 2 + 0.3)).astype(np.int64)  # 4fsc chroma
    pic = np.tile(line, L).reshape(L, W)
    pic[: k] += 17                            # head lines differ slightly
    pic = (pic & 0xFFFF).astype(np.uint16).reshape(-1)

    got, n_hi = _roundtrip(pic, cfg)
    assert got is not None
    np.testing.assert_array_equal(got, pic)
    # static content: only the head lines carry big residuals
    assert n_hi < cap


@pytest.mark.parametrize('system', ['NTSC', 'PAL'])
def test_codec_roundtrip_moderate_noise(system):
    """Per-line varying content with moderate noise still round-trips."""
    cfg = DecoderConfig(system=system, freq_mhz=40.0)
    L, W, Wp, cap, k = FU.pic_codec_params(cfg)
    rng = np.random.default_rng(5)
    base = 0x4000 + rng.integers(-40, 40, (L, W))       # fits the low byte
    base[:, :60] = 0x0400
    pic = (base & 0xFFFF).astype(np.uint16).reshape(-1)
    got, n_hi = _roundtrip(pic, cfg)
    assert got is not None
    np.testing.assert_array_equal(got, pic)


def test_codec_overflow_flags_fallback():
    """Full-range random content overflows the sparse plane and is
    reported (n_hi > cap, decode returns None) rather than corrupted."""
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    L, W, Wp, cap, k = FU.pic_codec_params(cfg)
    rng = np.random.default_rng(6)
    pic = rng.integers(0, 65536, L * W).astype(np.uint16)
    lw, hidx, hval, nhi = FU.encode_picture_dev(jnp.asarray(pic), cfg)
    assert int(nhi) > cap
    data = {'pic_low': np.asarray(lw), 'pic_hi_idx': np.asarray(hidx),
            'pic_hi_val': np.asarray(hval),
            'pic_hi_n': np.asarray(nhi).reshape(1)}
    assert FU.decode_picture_host(data, cfg) is None


def test_codec_exact_at_capacity_boundary():
    """Exactly-at-cap spills nothing: decode stays exact."""
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    L, W, Wp, cap, k = FU.pic_codec_params(cfg)
    pic = np.zeros((L, W), np.uint16)
    # place exactly cap big vertical residuals (beyond the k head lines)
    rows = k + (np.arange(cap) % (L - k))
    cols = (np.arange(cap) * 7) % W
    # big alternating values so every touched pixel yields >=1 sparse entry
    pic[rows, cols] = 0x7F00
    lw, hidx, hval, nhi = FU.encode_picture_dev(jnp.asarray(pic.reshape(-1)),
                                                cfg)
    n = int(nhi)
    data = {'pic_low': np.asarray(lw), 'pic_hi_idx': np.asarray(hidx),
            'pic_hi_val': np.asarray(hval),
            'pic_hi_n': np.asarray(nhi).reshape(1)}
    got = FU.decode_picture_host(data, cfg)
    if n <= cap:
        np.testing.assert_array_equal(got, pic.reshape(-1))
    else:
        assert got is None
