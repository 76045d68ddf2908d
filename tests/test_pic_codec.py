"""Lossless picture codec round trips (fused.encode_picture_planes /
compact_planes / compact_qstreams / decode_picture_planes): the batched
pipeline ships the u16 TBC picture compressed because the tunnel's D2H
link is the end-to-end throughput wall (~93% of each field bundle is
picture).  The round-4 codec is per-16-sample-block adaptive with
bit-granular plane classes and a per-block Rice escape: each block
ships either the bits(max residual) one-bit planes or, when cheaper,
k* low planes plus unary quotients on a per-field bitstream; the host
fetches only the used prefixes of the batch-compacted buffers."""

import numpy as np
import jax.numpy as jnp
import pytest

from ld_decode_tpu.tbc import fused as FU
from ld_decode_tpu.utils.params import DecoderConfig


def _roundtrip_batch(pics, cfg):
    """pics: (B, L*W) u16.  Encode+compact+decode every field; returns
    (decoded list, rows2 (2, B), total shipped u16 words incl. table)."""
    import jax
    B = pics.shape[0]
    L, W, Wp, W4, k = FU.pic_codec_params(cfg)
    NB = Wp // FU.CODEC_BW
    planes, tab, qstreams, qwords = jax.vmap(
        lambda p: FU.encode_picture_planes(p, cfg))(jnp.asarray(pics))
    dense, rows = FU.compact_planes(planes, tab,
                                    FU.codec_cap_rows(cfg, B))
    dq, qw = FU.compact_qstreams(qstreams, qwords,
                                 FU.codec_qcap_words(L, NB) * B)
    dense = np.asarray(dense)
    dq = np.asarray(dq)
    rows = np.asarray(rows).astype(np.int64)
    qw = np.asarray(qw).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(rows)])
    offs_q = np.concatenate([[0], np.cumsum(qw)])
    out = []
    for b in range(B):
        # through the packed-table wire format, like the pipeline
        tab_b = FU.unpack_tab(np.asarray(FU.pack_tab(tab[b])), L, NB)
        np.testing.assert_array_equal(tab_b, np.asarray(tab[b]))
        out.append(FU.decode_picture_planes(
            tab_b, dense[offs[b]:offs[b + 1]],
            dq[offs_q[b]:offs_q[b + 1]], cfg))
    used = int(rows.sum() + qw.sum()) + B * FU.bcls_words(L, NB)
    return out, np.stack([rows, qw]), used


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

    got, rows2, used_words = _roundtrip_batch(pic[None], cfg)
    np.testing.assert_array_equal(got[0], pic)
    # static content: everything beyond the k head lines is zero-residual
    assert used_words * 2 < 0.10 * pic.nbytes


@pytest.mark.parametrize('system', ['NTSC', 'PAL'])
def test_codec_roundtrip_moderate_noise(system):
    """Per-line varying content with moderate noise round-trips exactly
    and beats the nibble-granular round-3 rate (a +-40-count residual
    needs ~8 bits; nibble classes paid 12)."""
    cfg = DecoderConfig(system=system, freq_mhz=40.0)
    L, W, Wp, W4, k = FU.pic_codec_params(cfg)
    rng = np.random.default_rng(5)
    base = 0x4000 + rng.integers(-40, 40, (L, W))
    base[:, :60] = 0x0400
    pic = (base & 0xFFFF).astype(np.uint16).reshape(-1)
    got, rows2, used_words = _roundtrip_batch(pic[None], cfg)
    np.testing.assert_array_equal(got[0], pic)
    assert used_words * 2 < 0.62 * pic.nbytes


def test_codec_white_noise_stays_lossless():
    """Full-range random content: the adaptive codec has no overflow
    path — every block just ships all 16 planes (~1.02x raw with the
    table) and the round trip stays exact."""
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    L, W, Wp, W4, k = FU.pic_codec_params(cfg)
    rng = np.random.default_rng(6)
    pic = rng.integers(0, 65536, L * W).astype(np.uint16)
    got, rows2, used_words = _roundtrip_batch(pic[None], cfg)
    np.testing.assert_array_equal(got[0], pic)
    # near-capacity: ~all blocks ship ~16 planes (an occasional block
    # squeezes a word via the rice escape), total <= ~1.03x raw
    assert rows2[0, 0] > 0.99 * FU.CODEC_NPLANES * L * (Wp // FU.CODEC_BW)
    assert used_words * 2 < 1.04 * pic.nbytes


def test_codec_batch_mixed_content():
    """A batch mixing clean, noisy, and white-noise fields: each field's
    region of the shared dense buffers decodes exactly, and the counts
    reflect each field's own content."""
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    L, W, Wp, W4, k = FU.pic_codec_params(cfg)
    rng = np.random.default_rng(7)
    clean = np.tile(np.full(W, 0x3C00, np.uint16), L)
    noisy = ((0x3C00 + rng.integers(-300, 300, L * W)) & 0xFFFF
             ).astype(np.uint16)
    wild = rng.integers(0, 65536, L * W).astype(np.uint16)
    pics = np.stack([clean, noisy, wild, clean])
    got, rows2, used = _roundtrip_batch(pics, cfg)
    for b in range(4):
        np.testing.assert_array_equal(got[b], pics[b])
    tot = rows2.sum(axis=0)
    assert tot[0] == tot[3] < tot[1] < tot[2]
    assert rows2[0, 2] > 0.99 * FU.CODEC_NPLANES * L * (Wp // FU.CODEC_BW)


def test_codec_per_block_adaptivity():
    """Blocks with small residuals ship few planes even when other
    lines in the same field are wild (the round-2 fixed-12-bit codec
    charged every line the worst line's rate)."""
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    L, W, Wp, W4, k = FU.pic_codec_params(cfg)
    rng = np.random.default_rng(8)
    pic = np.tile(np.full(W, 0x2000, np.uint16), L).reshape(L, W)
    pic[100:110] = rng.integers(0, 65536, (10, W)).astype(np.uint16)
    flat = pic.reshape(-1)
    got, rows2, used = _roundtrip_batch(flat[None], cfg)
    np.testing.assert_array_equal(got[0], flat)
    # ~12 wild/altered lines at 16 planes + everything else near-free:
    # the wild region must not drag the whole field up
    assert rows2[0, 0] < FU.CODEC_NPLANES * 30 * (Wp // FU.CODEC_BW)


def test_codec_rice_escape_wins_on_outlier_blocks():
    """A block whose max residual is an outlier (one 12-bit spike over
    tiny noise) must pick the Rice escape and ship far fewer words than
    the 12 planes the max would demand — and still decode exactly."""
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    L, W, Wp, W4, k = FU.pic_codec_params(cfg)
    rng = np.random.default_rng(9)
    base = 0x3000 + rng.integers(-3, 4, (L, W))     # ~3-bit residuals
    base[::7, ::31] += 3000                          # sparse 12-bit spikes
    pic = (base & 0xFFFF).astype(np.uint16).reshape(-1)
    got, rows2, used = _roundtrip_batch(pic[None], cfg)
    np.testing.assert_array_equal(got[0], pic)
    assert rows2[1, 0] > 0                           # rice streams in use
    # nibble-granular planes would pay >= 8 bits on every spike block;
    # rice keeps the field near its ~4-5 bit/sample entropy
    assert used * 2 < 0.45 * pic.nbytes


def test_rgb_image_codec_roundtrip():
    """encode_image_planes/decode_image_planes on planar RGB48-like
    content (k=1, the comb output codec in comb/batch.py): exact round
    trip and a real compression win on smooth content."""
    rng = np.random.default_rng(9)
    rows0, W = 480, 744
    Wp = -(-W // FU.CODEC_BW) * FU.CODEC_BW
    NB = Wp // FU.CODEC_BW
    yy, xx = np.meshgrid(np.arange(rows0), np.arange(W), indexing='ij')
    img = np.stack([
        (20000 + 40 * yy + 20 * xx) % 60000,
        (10000 + 30 * yy) % 60000,
        (5000 + 25 * xx) % 60000,
    ]).reshape(3 * rows0, W).astype(np.uint16)
    img = (img + rng.integers(0, 7, img.shape)).astype(np.uint16)
    pad = np.pad(img.astype(np.int32), ((0, 0), (0, Wp - W)), mode='edge')

    planes, tab, qstream, qwords = FU.encode_image_planes(
        jnp.asarray(pad), 1)
    dense, rows = FU.compact_planes(
        planes[None], tab[None], FU.codec_cap_words(3 * rows0 * NB))
    rows = int(np.asarray(rows)[0])
    qw = int(np.asarray(qwords))
    got = FU.decode_image_planes(np.asarray(tab),
                                 np.asarray(dense)[:rows],
                                 np.asarray(qstream)[:qw],
                                 (3 * rows0, Wp), 1)
    np.testing.assert_array_equal(got[:, :W], img)
    # smooth gradients + tiny noise: ~5-6 bits/sample (the %60000 wrap
    # rows cost a little more)
    assert (rows + qw) * 2 < 0.45 * img.nbytes


def test_rgb_codec_hpass_roundtrip_and_rate():
    """hpass=True (the 2D gradient predictor the RGB48 stream uses,
    comb/batch._rgb_encode): exact round trip through BOTH decoders,
    and a real win over v-only when the vertical residual is
    horizontally smooth (the comb's bandlimited chroma leakage — the
    full_chain_noflow blocker, VERDICT r4 #1)."""
    import jax
    from scipy.ndimage import uniform_filter1d
    from ld_decode_tpu.tbc import native_codec as NC
    rng = np.random.default_rng(13)
    R, W = 360, 736
    # horizontally-smooth per-line noise over a vertical gradient:
    # models the comb RGB residual structure measured in
    # scripts/probe_codec_rate.py
    noise = uniform_filter1d(
        rng.normal(0, 60, (R, W)), 9, axis=1).astype(np.int64)
    img = ((8000 + 37 * np.arange(R)[:, None] + noise) & 0xFFFF
           ).astype(np.uint16)
    used = {}
    for hp in (False, True):
        planes, tab, qs, qw = jax.jit(
            FU.encode_image_planes, static_argnums=(1, 2))(
                jnp.asarray(img.astype(np.int32)), 1, hp)
        dense, rows = FU.compact_planes(
            planes[None], tab[None], FU.codec_cap_words(R * (W // 16)))
        nrows = int(np.asarray(rows)[0])
        nqw = int(np.asarray(qw))
        got = FU.decode_image_planes(
            np.asarray(tab), np.asarray(dense)[:nrows],
            np.asarray(qs)[:nqw], (R, W), 1, hpass=hp)
        np.testing.assert_array_equal(got, img)
        if NC.available():
            gn, shipped = NC.decode_image(
                np.asarray(tab).reshape(-1), np.asarray(dense)[:nrows],
                np.asarray(qs)[:nqw], (R, W), 1, hpass=hp)
            assert shipped == nrows
            np.testing.assert_array_equal(gn, img)
        used[hp] = nrows + nqw
    assert used[True] < 0.8 * used[False]


def test_bit_transpose_and_popcount_primitives():
    """The butterfly bit-transpose must equal the definitional 16-pass
    plane extraction, and _popcount16 the definitional bit count (these
    carry the whole codec: a silent bit-order regression would corrupt
    every shipped field)."""
    import jax.numpy as jnp2
    rng = np.random.default_rng(11)
    zb = rng.integers(0, 65536, (7, 3, 16)).astype(np.int32)
    pt = np.asarray(FU._bit_transpose16(jnp2.asarray(zb)))
    for p in range(16):
        expect = (((zb >> p) & 1) << np.arange(16)).sum(axis=-1)
        np.testing.assert_array_equal(pt[..., p], expect)
    pc = np.asarray(FU._popcount16(jnp2.asarray(pt)))
    expect_pc = np.vectorize(lambda v: bin(int(v)).count('1'))(pt)
    np.testing.assert_array_equal(pc, expect_pc)


def test_block_rank_matches_host_replay():
    """Device _block_rank (MXU chunked prefix + one-hot own-bin count)
    must produce the EXACT rank/gt of the host replay for any N --
    the decoder rebuilds the dense layout from _block_rank_np alone."""
    import jax
    rng = np.random.default_rng(12)
    for N in (1, 127, 128, 129, 300, 14991):
        nw = rng.integers(0, 17, N).astype(np.int32)
        r, g = jax.jit(FU._block_rank)(jnp.asarray(nw))
        rn, gn = FU._block_rank_np(nw)
        np.testing.assert_array_equal(np.asarray(r), rn)
        np.testing.assert_array_equal(np.asarray(g), gn)
        # rank is a permutation: every dense slot used exactly once
        assert np.array_equal(np.sort(np.asarray(r)), np.arange(N))


def test_native_codec_decoder_matches_numpy():
    """The C decoder (native/codec_decode.cpp) must reproduce the numpy
    decode bit-for-bit (including the packed-table wire format and the
    shipped-word consistency count) — it carries every picture and RGB
    frame on the consumer path when the toolchain is present."""
    import jax
    from ld_decode_tpu.tbc import native_codec as NC
    if not NC.available():
        pytest.skip('no native toolchain')
    rng = np.random.default_rng(21)
    R, W = 263, 912
    base = 0x3000 + rng.integers(-40, 40, (R, W))
    base[::9, ::17] += 2800                       # rice-escape spikes
    base[40:45] = rng.integers(0, 65536, (5, W))  # full-entropy band
    img = (base & 0xFFFF).astype(np.uint16)
    for k in (1, 2, 4):
        planes, tab, qs, qw = jax.jit(
            FU.encode_image_planes, static_argnums=1)(
                jnp.asarray(img.astype(np.int32)), k)
        dense, rows = FU.compact_planes(
            planes[None], tab[None], FU.codec_cap_words(R * (W // 16)))
        nrows = int(np.asarray(rows)[0])
        nqw = int(np.asarray(qw))
        wtab = np.asarray(FU.pack_tab(tab))
        tab_n = NC.unpack_tab(wtab, R * (W // 16))
        np.testing.assert_array_equal(
            tab_n.reshape(R, W // 16), np.asarray(tab))
        got, shipped = NC.decode_image(
            tab_n, np.asarray(dense)[:nrows], np.asarray(qs)[:nqw],
            (R, W), k)
        assert shipped == nrows
        np.testing.assert_array_equal(got, img)
    # short-buffer flag, not garbage, on truncated input
    _, shipped = NC.decode_image(tab_n, np.asarray(dense)[:nrows // 2],
                                 np.asarray(qs)[:nqw], (R, W), 4)
    assert shipped == -1


def test_codec_cap_rounds_to_compaction_unit():
    """Full-entropy content on a block count that is NOT a multiple of
    the 32-word compaction unit: an unrounded capacity (the round-4
    RGB-path bug, N = 3*525*47 % 32 != 0) silently truncated the
    trailing units.  The rounded cap must hold every plane's padded
    prefix and round-trip exactly."""
    import jax
    rng = np.random.default_rng(31)
    R, W = 75, 48                                  # N = 225 blocks, %32=1
    N = R * (W // FU.CODEC_BW)
    assert N % FU._CODEC_UNIT != 0
    img = rng.integers(0, 65536, (R, W)).astype(np.uint16)
    planes, tab, qs, qw = jax.jit(
        FU.encode_image_planes, static_argnums=1)(
            jnp.asarray(img.astype(np.int32)), 2)
    cap = FU.codec_cap_words(N)
    dense, rows = FU.compact_planes(planes[None], tab[None], cap)
    nrows = int(np.asarray(rows)[0])
    assert nrows <= cap
    # white noise ships ~all 16 planes: the unrounded cap (16*N) would
    # truncate here
    assert nrows > 16 * N - 16 * FU._CODEC_UNIT
    got = FU.decode_image_planes(
        np.asarray(tab), np.asarray(dense)[:nrows],
        np.asarray(qs)[:int(np.asarray(qw))], (R, W), 2)
    np.testing.assert_array_equal(got, img)
