"""Neural chroma separator (attic/combg2-4nn.cxx capability, TPU-native).

The reference NN comb had no automated validation at all (trained by eye
against reference discs).  Here: the chroma/carrier convention is pinned
against the comb's own stencil + demod tail, and the trained model must
beat the 1D stencil's luma leakage on held-out synthetic scenes.
"""

import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp

from ld_decode_tpu.comb import comb_ntsc as CN
from ld_decode_tpu.models import nn_comb as NC


def test_convention_against_stencil():
    """The generator's (composite, clp, Y, I, Q) identity must agree with
    the comb's own machinery: the oracle clp plane pushed through
    split_iq + adjust_y recovers luma exactly and chroma to the
    sample-and-hold floor, and split1d approximates the clp target."""
    H, W = CN.IN_Y, CN.IN_X
    inp, clp_t, y_t, i_t, q_t = NC.synth_batch(jax.random.PRNGKey(1),
                                               1, H, W)
    raw = (inp[0, :, :, 0] + 1.0) * 32768.0
    invert_col = inp[0, :, 0, 1] > 0          # carrier_i at x=0 == flip

    cfg = CN.CombConfig(dim=2, colorlpf=False, nr_y=0.0, nr_c=0.0)
    z = jnp.zeros_like(raw)
    inner = CN._row_mask(4, 524) & CN._col_mask(18, 840)
    ones = jnp.where(inner, 1.0, 0.0)
    clp = jnp.where(inner, clp_t[0], 0.0)
    y, i, q = CN.split_iq(raw, (z, clp, z), (z, ones, z), invert_col, cfg)
    y, i, q = CN.adjust_y(y, i, q, invert_col, cfg)

    sh = lambda a: np.pad(np.asarray(a), ((0, 0), (0, 2)))[:, 2:]
    c = (slice(60, 480), slice(60, 780))
    assert np.abs(np.asarray(y) - sh(y_t[0]))[c].max() < 1e-2
    # hold-demod floor: i/q are piecewise-constant over 2-sample cells
    di = np.abs(np.asarray(i) - sh(i_t[0]))[c]
    assert di.mean() < 0.1 * np.abs(np.asarray(i_t)).mean()

    # split1d's chroma estimate approximates the target (up to its own
    # luma leakage), proving clp's sign/scale matches the stencil path
    # (a sign/scale error would give ~2x the chroma scale; the residual
    # here is the stencil's own luma leakage on the sharp-edged scenes)
    d0 = np.abs(np.asarray(CN.split1d(raw)) - np.asarray(clp_t[0]))[c]
    assert d0.mean() < 0.3 * np.abs(np.asarray(clp_t)).mean()


@pytest.fixture(scope='module')
def trained():
    # small-but-sufficient training run: the test env splits the CPU into
    # 8 virtual devices (conftest), so each jit step runs on 1/8 cores
    params, loss = NC.train_nn_comb(steps=100, batch=4, h=48, w=160,
                                    lr=4e-3)
    return params, loss


def test_train_separates_chroma(trained):
    params, loss = trained
    assert loss < 80.0, loss                      # IRE^2

    inp, clp_t, *_ = NC.synth_batch(jax.random.PRNGKey(42), 2, 96, 384)
    pred = NC.NNComb().apply(params, inp)
    c = (slice(None), slice(12, -12), slice(24, -24))
    err_nn = np.abs(np.asarray(pred - clp_t))[c] / NC.IRESCALE
    assert err_nn.mean() < 7.0, err_nn.mean()

    # must beat the bare 1D stencil's luma leakage on the same scenes
    # ((raw[x-2]+raw[x+2])/2 - raw, the split1d core without frame masks);
    # measured ~0.78 at these settings, 0.9 allows platform variation
    raws = np.asarray((inp[..., 0] + 1.0) * 32768.0)
    rp = np.pad(raws, ((0, 0), (0, 0), (2, 2)))
    stencil = (rp[..., 4:] + rp[..., :-4]) / 2 - raws
    err_1d = np.abs(stencil - np.asarray(clp_t))[c] / NC.IRESCALE
    assert err_nn.mean() < 0.9 * err_1d.mean(), (err_nn.mean(),
                                                 err_1d.mean())


def test_comb_frame_nn_rgb(trained):
    """Full-frame RGB through comb_frame_nn vs ground truth on a synthetic
    scene with proper .tbc line-0 words."""
    params, _ = trained
    H, W = CN.IN_Y, CN.IN_X
    inp, clp_t, y_t, i_t, q_t = NC.synth_batch(jax.random.PRNGKey(9),
                                               1, H, W)
    raw = np.array((inp[0, :, :, 0] + 1.0) * 32768.0)
    flip = np.asarray(inp[0, :, 0, 1]) > 0
    raw[:, 0] = np.where(flip, 16384.0, 32768.0)
    raw[:, 1] = 10.0 * CN.IRESCALE        # burst level 10 -> AGC gain 1.0
    raw_u16 = np.clip(raw, 0, 65535).astype(np.uint16)

    cfg = CN.CombConfig(dim=2, nr_y=0.0, nr_c=0.0, wide=True)
    rgb, _ = NC.comb_frame_nn(jnp.asarray(raw_u16), params,
                              jnp.float32(-1.0), cfg)
    rgb = np.asarray(rgb).astype(np.float64)

    # expected RGB from ground-truth YIQ, mirroring to_rgb exactly
    # (-40 IRE u16 base, the reference's i/q name swap, brightness scale)
    first = cfg.firstline
    rows = slice(first, first + cfg.linesout)
    sh = lambda a: np.pad(np.asarray(a), ((0, 0), (0, 2)))[:, 2:]
    y_ire = -40.0 + (sh(y_t[0])[rows] - CN.IREBASE) / CN.IRESCALE
    qq = sh(i_t[0])[rows] / CN.IRESCALE
    ii = sh(q_t[0])[rows] / CN.IRESCALE
    y2 = (y_ire - cfg.black_ire) * (100.0 / (100.0 - cfg.black_ire))
    r = y2 + 0.956 * ii + 0.621 * qq
    g = y2 - 0.272 * ii - 0.647 * qq
    b = y2 - 1.106 * ii + 1.703 * qq
    exp = np.clip(np.stack([r, g, b], -1) * (cfg.brightness * 256 / 100),
                  0, 65535)

    # percent of full scale.  Floor: even the ORACLE chroma plane through
    # the comb tail sits at median 1.3% / p95 8.6% vs this analytic
    # expectation (2-sample hold demod + chroma IIR group delay); the
    # briefly-trained net lands at ~2.6% / ~13%.
    d = np.abs(rgb - exp)[:, 100:800] / 655.36
    assert np.median(d) < 4.0, np.median(d)
    assert np.percentile(d, 95) < 16.0, np.percentile(d, 95)


def test_training_writer_and_file_training(tmp_path):
    """The -t training path (reference comb-ntsc.cxx:1057-1061): real
    .tbc frames -> (inputs, clp-target) pairs supervised by the 3D comb,
    then train_nn_comb(data=...) consumes the file."""
    H, W = CN.IN_Y, CN.IN_X
    _, clp_t, y_t, i_t, q_t = NC.synth_batch(jax.random.PRNGKey(2), 1, H, W)
    y_t, i_t, q_t = (np.asarray(a[0]) for a in (y_t, i_t, q_t))
    flip0 = np.asarray(clp_t[0, :, 0]) * 0  # placeholder, set below

    # static scene, chroma phase alternating frame-to-frame like real
    # NTSC .tbc output (the condition Split3D separates exactly)
    rng = np.random.default_rng(3)
    flip0 = np.where(rng.integers(0, 2, H).astype(bool), 1.0, -1.0)
    frames = []
    flips = []
    for k in range(4):
        fl = flip0 * (1 if k % 2 == 0 else -1)
        ci, cq = (np.asarray(c) for c in NC._carriers(H, W, jnp.asarray(fl)))
        raw = y_t - (i_t * ci - q_t * cq)
        raw[:, 0] = np.where(fl > 0, 16384.0, 32768.0)
        frames.append(np.clip(raw, 0, 65535).astype(np.uint16))
        flips.append(fl)
    frames = np.stack(frames)

    out = tmp_path / 't.npz'
    n = NC.write_training_file(frames, str(out))
    assert n == 2
    d = np.load(out)
    assert d['inputs'].shape == (2, H, W, 3)
    assert d['clp'].shape == (2, H, W)

    # the written target approximates the true chroma plane of frame 1
    ci1, cq1 = (np.asarray(c) for c in
                NC._carriers(H, W, jnp.asarray(flips[1])))
    want = 2.0 * (i_t * ci1 - q_t * cq1)
    c = (slice(60, 480), slice(60, 780))
    err = np.abs(d['clp'][0] - want)[c]
    assert err.mean() < 0.25 * np.abs(want)[c].mean(), err.mean()

    params, loss = NC.train_nn_comb(steps=20, batch=4, h=48, w=160,
                                    data=(d['inputs'], d['clp']))
    assert np.isfinite(loss)
