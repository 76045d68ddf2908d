"""Batched comb driver (comb/batch.py) vs the streaming NTSCComb:
the windowed lax.scan restructuring must reproduce the frame-at-a-time
protocol — same emissions, same RGB, same AGC/flow chaining — including
across window boundaries (the flow/AGC/pending carries)."""

import numpy as np
import pytest

from ld_decode_tpu.comb.batch import NTSCCombBatch
from ld_decode_tpu.comb.comb_ntsc import NTSCComb, CombConfig
from tests.test_comb import tbc_frames  # noqa


def _close(g, w, lsb=1):
    """The scanned graph fuses differently from the per-frame one, so
    f32 rounding at the u16 quantize boundary wiggles ~0.1% of pixels
    by one code."""
    d = np.abs(g.astype(np.int64) - w.astype(np.int64))
    assert d.max() <= lsb, (d.max(), (d > 0).mean())


def _stream(frames, cfg):
    comb = NTSCComb(cfg)
    out = []
    for f in frames:
        rgb = comb.process(f)
        if rgb is not None:
            out.append(np.asarray(rgb))
    return out


def _frames6(tbc_frames):
    frames = list(tbc_frames)
    rng = np.random.default_rng(7)
    while len(frames) < 6:
        # vary repeats so the flow/AGC chains see real frame-to-frame
        # differences
        base = frames[len(frames) % len(tbc_frames)].copy()
        base = base.reshape(525, 910)
        noise = rng.integers(-200, 200, base.shape)
        pic = base.astype(np.int64)
        pic[40:, :] = np.clip(pic[40:, :] + noise[40:, :], 0, 65535)
        frames.append(pic.astype(np.uint16).reshape(-1))
    return frames


@pytest.mark.parametrize('dim', [1, 2])
def test_batch_matches_stream_simple(tbc_frames, dim):
    cfg = CombConfig(dim=dim)
    frames = _frames6(tbc_frames)[:4]
    want = _stream(frames, cfg)
    got = NTSCCombBatch(cfg).process_many(np.stack(frames))
    assert len(got) == len(want) == 4
    for g, w in zip(got, want):
        _close(g, w)


def test_batch_matches_stream_3d_noof(tbc_frames):
    cfg = CombConfig(dim=3, opticalflow=False)
    frames = _frames6(tbc_frames)
    want = _stream(frames, cfg)
    comb = NTSCCombBatch(cfg)
    got = comb.process_many(np.stack(frames[:4]))
    got += comb.process_many(np.stack(frames[4:]))   # carry across windows
    assert len(got) == len(want) == 4
    for g, w in zip(got, want):
        _close(g, w)


def test_batch_matches_stream_3d_of(tbc_frames):
    cfg = CombConfig(dim=3, opticalflow=True)
    frames = _frames6(tbc_frames)
    want = _stream(frames, cfg)
    comb = NTSCCombBatch(cfg)
    got = comb.process_many(np.stack(frames[:4]))
    got += comb.process_many(np.stack(frames[4:]))   # flow carry crosses
    # 6 inputs -> 4 emissions (f0 dropped, f5 pending at stream end)
    assert len(got) == len(want) == 4
    for g, w in zip(got, want):
        d = np.abs(g.astype(np.int64) - w.astype(np.int64))
        # identical math modulo f32 reassociation inside the scan
        assert np.percentile(d, 99.9) <= 2, (d.max(), np.percentile(d, 99.9))
        assert d.max() <= 16, d.max()


def test_batch_words_for_pulldown(tbc_frames):
    """collect() returns each emission's line-0 words (the pulldown
    assembler's key input)."""
    cfg = CombConfig(dim=2)
    frames = _frames6(tbc_frames)[:3]
    comb = NTSCCombBatch(cfg)
    rgbs, words = comb.collect(comb.feed(np.stack(frames)))
    assert len(rgbs) == len(words) == 3
    for f, w in zip(frames, words):
        assert np.array_equal(w, f.reshape(525, 910)[0, :16])


def test_batch_out8(tbc_frames):
    """out8 (comb -8 on device) ships the top byte only."""
    cfg = CombConfig(dim=2)
    frames = _frames6(tbc_frames)[:3]
    want = _stream(frames, cfg)
    got = NTSCCombBatch(cfg, out8=True).process_many(np.stack(frames))
    assert len(got) == 3
    for g, w in zip(got, want):
        assert g.dtype == np.uint8
        d = np.abs(g.astype(np.int64) - (w >> 8).astype(np.int64))
        assert d.max() <= 1, d.max()


def test_pal_batch_matches_stream():
    """PALCombBatch vs the streaming PALComb: same emissions (frame 0
    2D, 3D thereafter, flush 2D) across window boundaries."""
    from ld_decode_tpu.comb.batch import PALCombBatch
    from ld_decode_tpu.comb.comb_pal import PALComb, CombPALConfig, PAL_X
    from tests.test_comb_pal import pal_frames3 as make_pal  # fixture fn

    frames = make_pal.__wrapped__()
    for dim in (2, 3):
        cfg = CombPALConfig(dim=dim)
        s = PALComb(cfg)
        want = [r for r in (s.process(f) for f in frames) if r is not None]
        tail = s.flush()
        if tail is not None:
            want.append(tail)
        b = PALCombBatch(cfg)
        got = b.process_many(np.stack(frames[:2]))
        got += b.process_many(np.stack(frames[2:]))
        ftail = b.flush()
        if ftail is not None:
            got.append(ftail)
        assert len(got) == len(want) == 3
        for g, w in zip(got, want):
            assert g.shape == (576, PAL_X, 3)
            _close(g, w)
