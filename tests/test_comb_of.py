"""Optical-flow 3D comb vs the compiled reference (default -d 3 mode)."""

import numpy as np
import pytest

from ld_decode_tpu.comb.comb_ntsc import NTSCComb, CombConfig
from tests.test_comb import _build_oracle, _run_oracle, tbc_frames  # noqa


cv2 = pytest.importorskip('cv2')


@pytest.mark.skipif(not _build_oracle(), reason='cannot build comb oracle')
def test_comb3d_opticalflow_parity(tbc_frames):
    frames = list(tbc_frames)
    while len(frames) < 4:
        frames.append(tbc_frames[-1])
    ref_frames = _run_oracle(frames, dim=3)      # default: optical flow

    ours = NTSCComb(CombConfig(dim=3, opticalflow=True))
    got = []
    for f in frames:
        out = ours.process(f)
        if out is not None:
            got.append(out)
    assert len(got) == len(ref_frames)
    # different OpenCV versions compute slightly different flows, and the
    # reference feeds uninitialized stack rows to Farneback at the bottom
    # of its field buffers (comb-ntsc.cxx:609-625 reads cbuf past row 524),
    # so compare the well-defined upper region only
    for out, ref in zip(got, ref_frames):
        d = np.abs(out[:380].astype(np.int64) - ref[:380].astype(np.int64))
        assert np.percentile(d, 99) <= 96, (d.max(), np.percentile(d, 99))
        assert np.median(d) <= 8, np.median(d)
