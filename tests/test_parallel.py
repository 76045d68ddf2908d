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


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_sharded_comb3d_matches_single():
    """3D comb with +-1-frame ppermute halos == per-frame single-device
    comb for every frame whose neighbors are real (non-wrapped)."""
    from ld_decode_tpu.comb.comb_ntsc import CombConfig, comb_frame, IN_Y, IN_X

    cfg = CombConfig(dim=3, opticalflow=False)
    nframes = 16
    rng = np.random.default_rng(4)
    # smooth-ish synthetic frames with a moving feature
    base = rng.integers(12000, 40000, (IN_Y, IN_X)).astype(np.uint16)
    frames = np.stack([base] * nframes).astype(np.int32)
    for k in range(nframes):
        frames[k, 100:200, 100 + 8 * k:200 + 8 * k] += 4000
    frames = frames.astype(np.uint16)

    # per-frame burst levels that VARY strongly: the reference burst-AGC
    # EMA (comb-ntsc.cxx:563-564) carries across frames, so a per-frame
    # reseed would visibly diverge here — the sharded path must replay
    # the exact chain instead
    frames[:, :, 1] = np.uint16((6 + 10 * (np.arange(nframes)[:, None]
                                           % 4)) * 358.4)

    step, fmesh = M.build_sharded_comb3d(cfg, M.make_mesh(8), nframes)
    fj = jax.device_put(jnp.asarray(frames),
                        NamedSharding(fmesh, P('f')))
    got = np.asarray(step(fj))

    # reference: sequential streaming comb carrying the AGC EMA
    ab = jnp.float32(-1.0)
    for k in range(nframes):
        prv = frames[k - 1] if k else frames[-1]
        nxt = frames[k + 1] if k + 1 < nframes else frames[0]
        rgb, ab, _extras = comb_frame(jnp.asarray(frames[k]),
                                      jnp.asarray(nxt), jnp.asarray(prv),
                                      ab, cfg)
        np.testing.assert_array_equal(got[k], np.asarray(rgb))


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_sharded_pipeline_matches_single():
    """The FULL flagship pipeline (fused.field_pipeline_batch: demod ->
    vsync/linelocs -> refinement -> resample -> codec -> audio -> VBI)
    dp-sharded over the 8-device mesh must reproduce the single-device
    batch bit-for-bit: same per-field bundle rows, same chained
    next-start/next-audio-offset scalars."""
    from ld_decode_tpu.models import encode as E
    from ld_decode_tpu.tbc import fused as FU

    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    samples = E.encode_frames(cfg, 4, E.EncodeSpec(pattern='bars',
                                                   cav_start_frame=900))
    bank = F.make_demod_bank(cfg, np.complex64)
    nblocks = 26
    n_audio1 = nblocks * bank.a_stage1_keep if bank.has_audio else 0
    batch = 8
    field_pitch = int(cfg.linelen * (cfg.sys.frame_lines // 2))
    capture = jnp.asarray(samples.astype(np.uint16))
    start0 = jnp.int32(33046)
    off0 = jnp.float32(0.001)
    mtf = jnp.float32(1.0)
    vlen = jnp.int32(capture.shape[0])

    chunks, nso, noo, pic, dense1, dq1, rows1 = FU.field_pipeline_batch(
        capture, start0, off0, mtf, bank, cfg, nblocks, n_audio1,
        batch, field_pitch, valid_len=vlen)
    ref = np.concatenate([np.asarray(c) for c in chunks]).reshape(batch, -1)

    step, fmesh = M.build_pipeline_batch_sharded(
        cfg, bank, M.make_mesh(8), nblocks, n_audio1, batch, field_pitch)
    bundle, nso_s, noo_s, pic_s, dense_s, dq_s, rows_s = step(
        capture, start0, off0, mtf, vlen)
    got = np.asarray(bundle)

    assert got.shape == ref.shape
    spec = FU.pipeline_bundle_spec(cfg)
    for r in range(batch):
        g, rf = spec.unpack(got[r]), spec.unpack(ref[r])
        for name, *_ in spec.offsets:
            if name == 'audio':
                # vmap-width-dependent XLA vectorization flips a handful
                # of round() boundaries: allow +-1 LSB on <0.1% of ticks
                d = g[name].astype(np.int64) - rf[name].astype(np.int64)
                assert np.abs(d).max() <= 1 and (d != 0).sum() <= 16, name
            else:
                np.testing.assert_array_equal(g[name], rf[name], err_msg=name)
    assert int(nso_s) == int(nso)
    np.testing.assert_allclose(float(noo_s), float(noo), rtol=0, atol=0)
    np.testing.assert_array_equal(
        np.asarray(pic_s).reshape(batch, -1), np.asarray(pic))

    # adaptive picture codec: per-shard compaction must decode to the
    # same pictures as the single-device whole-batch compaction
    np.testing.assert_array_equal(np.asarray(rows_s), np.asarray(rows1))
    rows_np = np.asarray(rows1).astype(np.int64)
    L_c, _, Wp_c, W4, _ = FU.pic_codec_params(cfg)
    NB_c = Wp_c // FU.CODEC_BW
    lb = batch // 8
    cap_l = FU.codec_cap_rows(cfg, lb)
    qcap_l = FU.codec_qcap_words(L_c, NB_c) * lb
    d_s, d_1 = np.asarray(dense_s), np.asarray(dense1)
    dq_sn, dq_1 = np.asarray(dq_s), np.asarray(dq1)
    off1 = np.concatenate([[0], np.cumsum(rows_np[0])])
    offq1 = np.concatenate([[0], np.cumsum(rows_np[1])])
    for b in range(batch):
        sh, li = b // lb, b % lb
        o_sh = sh * cap_l + int(rows_np[0, sh * lb:sh * lb + li].sum())
        oq_sh = sh * qcap_l + int(rows_np[1, sh * lb:sh * lb + li].sum())
        tab = FU.unpack_tab(spec.unpack(got[b])['pic_tab'], L_c, NB_c)
        p_sh = FU.decode_picture_planes(
            tab, d_s[o_sh:o_sh + rows_np[0, b]],
            dq_sn[oq_sh:oq_sh + rows_np[1, b]], cfg)
        p_1 = FU.decode_picture_planes(
            tab, d_1[off1[b]:off1[b + 1]], dq_1[offq1[b]:offq1[b + 1]],
            cfg)
        np.testing.assert_array_equal(p_sh, p_1)
        np.testing.assert_array_equal(p_sh, np.asarray(pic[b]))


def test_nn_comb_train_dp_mesh():
    """The NN-comb training step runs data-parallel over the mesh's dp
    axis and matches the unsharded run exactly (same keys, same init)."""
    from ld_decode_tpu.models import nn_comb as NC

    mesh = M.make_mesh(8)
    key = jax.random.PRNGKey(5)
    p_mesh, loss_mesh = NC.train_nn_comb(key=key, steps=3, batch=4, h=16,
                                         w=64, features=(8, 8), mesh=mesh)
    p_one, loss_one = NC.train_nn_comb(key=key, steps=3, batch=4, h=16,
                                       w=64, features=(8, 8), mesh=None)
    assert np.isfinite(loss_mesh)
    np.testing.assert_allclose(loss_mesh, loss_one, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_mesh),
                    jax.tree_util.tree_leaves(p_one)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
