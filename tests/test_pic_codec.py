"""Lossless picture codec round trips (fused.encode_picture_planes /
compact_planes / decode_picture_planes): the batched pipeline ships the
u16 TBC picture compressed because the tunnel's D2H link is the
end-to-end throughput wall (~93% of each field bundle is picture).  The
codec is per-16-sample-block adaptive: each block ships only the nibble
planes its own max residual needs, and the host fetches only the used
prefix of the batch-compacted dense buffer."""

import numpy as np
import jax.numpy as jnp
import pytest

from ld_decode_tpu.tbc import fused as FU
from ld_decode_tpu.utils.params import DecoderConfig


def _roundtrip_batch(pics, cfg):
    """pics: (B, L*W) u16.  Encode+compact+decode every field; returns
    (decoded list, rows array, dense words used)."""
    import jax
    B = pics.shape[0]
    planes, wcls = jax.vmap(
        lambda p: FU.encode_picture_planes(p, cfg))(jnp.asarray(pics))
    dense, rows = FU.compact_planes(planes, wcls,
                                    FU.codec_cap_rows(cfg, B))
    dense = np.asarray(dense)
    rows = np.asarray(rows).astype(np.int64)
    W4 = FU.pic_codec_params(cfg)[3]
    offs = np.concatenate([[0], np.cumsum(rows)])
    out = [FU.decode_picture_planes(np.asarray(wcls[b]),
                                    dense[offs[b] * W4:offs[b + 1] * W4],
                                    cfg)
           for b in range(B)]
    return out, rows, int(rows.sum()) * W4


@pytest.mark.parametrize('system', ['NTSC', 'PAL'])
def test_codec_roundtrip_synthetic_field(system):
    """A TBC-like field (sync + burst-ish chroma + luma ramp) round-trips
    exactly, and static content compresses far below the old fixed
    12-bit dense rate (0.848x raw)."""
    cfg = DecoderConfig(system=system, freq_mhz=40.0)
    L, W, Wp, W4, k = FU.pic_codec_params(cfg)
    w = np.arange(W)
    line = np.full(W, 0x3C00, np.int64)
    line[:65] = 0x0400                       # sync tip
    line[80:120] += (3000 * np.sin(w[80:120] * np.pi / 2)).astype(np.int64)
    line[160:] = 0x3C00 + (w[160:] - 160) * 45          # luma ramp
    line += (7000 * np.sin(w * np.pi / 2 + 0.3)).astype(np.int64)  # 4fsc
    pic = np.tile(line, L).reshape(L, W)
    pic[: k] += 17                            # head lines differ slightly
    pic = (pic & 0xFFFF).astype(np.uint16).reshape(-1)

    got, rows, used_words = _roundtrip_batch(pic[None], cfg)
    np.testing.assert_array_equal(got[0], pic)
    # static content: everything beyond the k raw head lines is a
    # zero-residual or 1-nibble line
    assert used_words * 2 < 0.35 * pic.nbytes


@pytest.mark.parametrize('system', ['NTSC', 'PAL'])
def test_codec_roundtrip_moderate_noise(system):
    """Per-line varying content with moderate noise round-trips exactly
    and lands near the 12-bit-block rate (a 16-sample block's max of
    +-80-count noise usually zigzags past 256) — below the old fixed
    codec's 0.848x."""
    cfg = DecoderConfig(system=system, freq_mhz=40.0)
    L, W, Wp, W4, k = FU.pic_codec_params(cfg)
    rng = np.random.default_rng(5)
    base = 0x4000 + rng.integers(-40, 40, (L, W))
    base[:, :60] = 0x0400
    pic = (base & 0xFFFF).astype(np.uint16).reshape(-1)
    got, rows, used_words = _roundtrip_batch(pic[None], cfg)
    np.testing.assert_array_equal(got[0], pic)
    assert used_words * 2 < 0.75 * pic.nbytes


def test_codec_white_noise_stays_lossless():
    """Full-range random content: the adaptive codec has no overflow
    path — every line just ships all 4 planes (1.0x raw) and the
    round trip stays exact."""
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    L, W, Wp, W4, k = FU.pic_codec_params(cfg)
    rng = np.random.default_rng(6)
    pic = rng.integers(0, 65536, L * W).astype(np.uint16)
    got, rows, used_words = _roundtrip_batch(pic[None], cfg)
    np.testing.assert_array_equal(got[0], pic)
    assert rows[0] == 4 * L * (Wp // FU.CODEC_BW)   # all planes, all blocks


def test_codec_batch_mixed_content():
    """A batch mixing clean, noisy, and white-noise fields: each field's
    region of the shared dense buffer decodes exactly, and the row
    counts reflect each field's own content."""
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    L, W, Wp, W4, k = FU.pic_codec_params(cfg)
    rng = np.random.default_rng(7)
    clean = np.tile(np.full(W, 0x3C00, np.uint16), L)
    noisy = ((0x3C00 + rng.integers(-300, 300, L * W)) & 0xFFFF
             ).astype(np.uint16)
    wild = rng.integers(0, 65536, L * W).astype(np.uint16)
    pics = np.stack([clean, noisy, wild, clean])
    got, rows, used = _roundtrip_batch(pics, cfg)
    for b in range(4):
        np.testing.assert_array_equal(got[b], pics[b])
    assert rows[0] == rows[3] < rows[1] < rows[2] == 4 * L * (Wp // FU.CODEC_BW)


def test_codec_per_line_adaptivity():
    """Lines with small residuals ship fewer planes even when other
    lines in the same field are wild (the round-2 fixed-12-bit codec
    charged every line the worst line's rate)."""
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    L, W, Wp, W4, k = FU.pic_codec_params(cfg)
    rng = np.random.default_rng(8)
    pic = np.tile(np.full(W, 0x2000, np.uint16), L).reshape(L, W)
    pic[100:110] = rng.integers(0, 65536, (10, W)).astype(np.uint16)
    flat = pic.reshape(-1)
    got, rows, used = _roundtrip_batch(flat[None], cfg)
    np.testing.assert_array_equal(got[0], flat)
    # ~12 wild/altered lines at 4 planes + everything else near-free:
    # the wild region must not drag the whole field to 4 planes
    assert rows[0] < 4 * 30 * (Wp // FU.CODEC_BW)


def test_rgb_image_codec_roundtrip():
    """encode_image_planes/decode_image_planes on planar RGB48-like
    content (k=1, the comb output codec in comb/batch.py): exact round
    trip and a real compression win on smooth content."""
    import jax
    rng = np.random.default_rng(9)
    rows0, W = 480, 744
    Wp = -(-W // FU.CODEC_BW) * FU.CODEC_BW
    yy, xx = np.meshgrid(np.arange(rows0), np.arange(W), indexing='ij')
    img = np.stack([
        (20000 + 40 * yy + 20 * xx) % 60000,
        (10000 + 30 * yy) % 60000,
        (5000 + 25 * xx) % 60000,
    ]).reshape(3 * rows0, W).astype(np.uint16)
    img = (img + rng.integers(0, 7, img.shape)).astype(np.uint16)
    pad = np.pad(img.astype(np.int32), ((0, 0), (0, Wp - W)), mode='edge')

    planes, wcls = FU.encode_image_planes(jnp.asarray(pad), 1)
    dense, rows = FU.compact_planes(planes[None], wcls[None],
                                    4 * 3 * rows0 * (Wp // FU.CODEC_BW))
    rows = int(np.asarray(rows)[0])
    got = FU.decode_image_planes(np.asarray(wcls),
                                 np.asarray(dense)[:rows * (FU.CODEC_BW // 4)],
                                 (3 * rows0, Wp), 1)
    np.testing.assert_array_equal(got[:, :W], img)
    # smooth gradients + tiny noise: ~0.50x the raw bytes (2 nibble
    # planes/row; the %60000 wrap rows cost a little more)
    assert rows * (FU.CODEC_BW // 4) * 2 < 0.55 * img.nbytes
