"""Native JAX Farneback optical flow vs the OpenCV implementation the
reference uses (comb-ntsc.cxx:600-662)."""

import numpy as np
import pytest

from ld_decode_tpu.comb.optflow import calc_optical_flow_farneback
from ld_decode_tpu.comb.comb_ntsc import farneback_combk2, IN_Y, IN_X

cv2 = pytest.importorskip('cv2')


def _textured(h, w, margin=20, seed=0):
    """Smooth random texture big enough to crop shifted views from."""
    rng = np.random.default_rng(seed)
    base = rng.normal(0, 1, (h + 2 * margin, w + 2 * margin))
    k = cv2.getGaussianKernel(21, 4.0)
    base = cv2.sepFilter2D(base, -1, k, k)
    base = (base - base.min()) / (base.max() - base.min())
    return base * 50000 + 5000


@pytest.mark.parametrize('shift', [(0, 3), (2, 0), (1, -2), (0, 0)])
def test_flow_matches_cv2_on_translation(shift):
    H, W = 252, 840
    m = 20
    base = _textured(H, W, m)
    dy, dx = shift
    a = base[m:m + H, m:m + W].astype(np.uint16)
    b = base[m + dy:m + dy + H, m + dx:m + dx + W].astype(np.uint16)

    ref = cv2.calcOpticalFlowFarneback(a, b, None, 0.5, 4, 60, 3, 7, 1.5, 0)
    ours = np.asarray(calc_optical_flow_farneback(a, b))

    c = (slice(30, -30), slice(30, -30))
    # recover the true translation
    assert abs(ours[c][..., 0].mean() - (-dx)) < 0.05
    assert abs(ours[c][..., 1].mean() - (-dy)) < 0.05
    # and agree with cv2 pointwise
    d = np.abs(ours[c] - ref[c])
    assert np.percentile(d, 99) < 0.1, np.percentile(d, 99)


def test_flow_initial_flow_path():
    """OPTFLOW_USE_INITIAL_FLOW parity (the comb passes the previous
    frame's flow as the warm start from the 3rd frame on)."""
    H, W = 120, 200
    m = 16
    base = _textured(H, W, m, seed=3)
    a = base[m:m + H, m:m + W].astype(np.uint16)
    b = base[m + 1:m + 1 + H, m + 2:m + 2 + W].astype(np.uint16)

    init = np.zeros((H, W, 2), np.float32)
    init[..., 0] = -2.0
    init[..., 1] = -1.0
    ref = cv2.calcOpticalFlowFarneback(
        a, b, init.copy(), 0.5, 4, 32, 3, 7, 1.5,
        cv2.OPTFLOW_USE_INITIAL_FLOW)
    ours = np.asarray(calc_optical_flow_farneback(
        a, b, init, 0.5, 4, 32, 3, 7, 1.5, use_initial_flow=True))
    c = (slice(20, -20), slice(20, -20))
    d = np.abs(ours[c] - ref[c])
    assert np.percentile(d, 99) < 0.15, np.percentile(d, 99)


def test_combk2_native_matches_cv2_engine():
    """The comb's per-pixel 3D confidence map: native engine vs cv2 engine
    across a 3-frame sequence (exercises both the cold and the
    initial-flow warm paths)."""
    m = 8
    rng = np.random.default_rng(7)
    seq = []
    for t in range(3):
        base = _textured(IN_Y, IN_X, m, seed=11)
        y = base[m + t:m + t + IN_Y, m + 2 * t:m + 2 * t + IN_X].copy()
        y += rng.normal(0, 120, y.shape)          # sensor noise
        seq.append(np.clip(y, 0, 65535))

    outs = {}
    for engine in ('native', 'cv2'):
        prev, flows, cnt = {}, {}, 0
        maps = []
        for y in seq:
            maps.append(farneback_combk2(y, prev, flows, cnt,
                                         p_3dcore=0.0, p_3drange=0.5,
                                         engine=engine))
            cnt += 1
        outs[engine] = maps

    for got, ref in zip(outs['native'][1:], outs['cv2'][1:]):
        # confidence maps in [0,1]; the motion gate only cares about
        # coarse agreement, but we hold a much tighter bound
        d = np.abs(got - ref)
        assert d.mean() < 0.01, d.mean()
        assert np.percentile(d, 99.5) < 0.2, np.percentile(d, 99.5)
