"""3:2 pulldown frame reassembly parity vs the compiled reference comb -p.

The reference's PostProcess (comb-ntsc.cxx:894-938) turns the 29.97 fps
video-frame stream back into 23.976 fps film frames using the white-flag /
CAV picture-number field parity in each frame's line-0 flag word.  We
hand-author a 3:2 cadence over real decoded TBC frames and require our
PulldownAssembler to emit the same frames as the reference binary.
"""

import numpy as np
import pytest

from ld_decode_tpu.comb.comb_ntsc import (
    NTSCComb, CombConfig, PulldownAssembler, IN_X, IN_Y,
    FRAME_INFO_CAV_EVEN, FRAME_INFO_CAV_ODD,
    FRAME_INFO_WHITE_EVEN, FRAME_INFO_WHITE_ODD)
from ld_decode_tpu.models import encode as E
from ld_decode_tpu.ops import filters as F
from ld_decode_tpu.tbc import framer as FR
from ld_decode_tpu.utils.params import DecoderConfig

from tests.test_comb import _build_oracle, _run_oracle


@pytest.fixture(scope='module')
def tbc_frames():
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    samples = E.encode_frames(cfg, 4, E.EncodeSpec(pattern='bars',
                                                   cav_start_frame=900))
    bank = F.make_demod_bank(cfg, np.complex64)
    fr = FR.Framer(cfg, bank, capture=samples)
    frames = []
    s = 33046
    for i in range(2):
        rv = fr.readframe(None, s, i == 0)
        if rv[0] is None:
            break
        frames.append(np.asarray(rv[0], np.uint16))
        s = rv[2]
    assert len(frames) == 2
    return frames


def _with_flags(frame, flags, code):
    """Copy a TBC frame with line-0 words 12-15 set to (flags, framecode)."""
    f = frame.reshape(IN_Y, IN_X).copy()
    f[0, 12] = (flags >> 16) & 0xFFFF
    f[0, 13] = flags & 0xFFFF
    f[0, 14] = (code >> 16) & 0xFFFF
    f[0, 15] = code & 0xFFFF
    return f


def _cadence(tbc_frames, kind='white'):
    """A 6-frame 3:2 cadence: EVEN, ODD, EVEN, <none>, ODD, EVEN."""
    even = FRAME_INFO_WHITE_EVEN if kind == 'white' else FRAME_INFO_CAV_EVEN
    odd = FRAME_INFO_WHITE_ODD if kind == 'white' else FRAME_INFO_CAV_ODD
    pat = [even, odd, even, 0, odd, even]
    return [_with_flags(tbc_frames[i % 2], fl, 1001 + i)
            for i, fl in enumerate(pat)]


def _run_ours(seq, dim=2):
    comb = NTSCComb(CombConfig(dim=dim, opticalflow=False))
    pd = PulldownAssembler()
    emits = []
    for f in seq:
        rgb = comb.process(f)
        if rgb is None:
            continue
        emits.extend(pd.process(rgb, comb.last_frame_words))
    return emits


@pytest.mark.skipif(not _build_oracle(), reason='cannot build comb oracle')
@pytest.mark.parametrize('kind', ['white', 'cav'])
def test_pulldown_parity(tbc_frames, kind):
    seq = _cadence(tbc_frames, kind)
    ref = _run_oracle(seq, dim=2, extra=('-p',))
    ours = _run_ours(seq, dim=2)
    # 6 video frames -> 5 film frames: full, merged+full, (drop), merged+full
    assert len(ref) == len(ours) == 5
    for (got, _code), want in zip(ours, ref):
        assert got.shape == want.shape
        d = np.abs(got.astype(np.int64) - want.astype(np.int64))
        assert np.percentile(d, 99) <= 8, (d.max(), np.percentile(d, 99))
        assert np.median(d) <= 2


@pytest.mark.skipif(not _build_oracle(), reason='cannot build comb oracle')
def test_pulldown_parity_3d(tbc_frames):
    """Same cadence through the 3D K-map comb (reference comb -F -d 3 -p) —
    the dim-3 one-frame lag between input and output must not desync the
    flag words the assembler reads."""
    seq = _cadence(tbc_frames, 'white')
    # pad so the reference's 2-frame 3D warmup still covers the cadence
    seq = seq + [_with_flags(tbc_frames[0], 0, 2000)] * 2
    ref = _run_oracle(seq, dim=3, extra=('-p', '-F'))
    ours = _run_ours(seq, dim=3)
    assert len(ref) == len(ours) and len(ours) >= 3
    for (got, _code), want in zip(ours, ref):
        d = np.abs(got.astype(np.int64) - want.astype(np.int64))
        assert np.percentile(d, 99) <= 8, (d.max(), np.percentile(d, 99))


def test_pulldown_state_machine(tbc_frames):
    """Framecodes and emission structure, no oracle needed."""
    seq = _cadence(tbc_frames, 'white')
    ours = _run_ours(seq, dim=2)
    codes = [c for _, c in ours]
    # full(1001), merged(1002)+full(1003), drop(1004), merged(1005)+full(1006)
    assert codes == [1001, 1002, 1003, 1005, 1006]
    # white flag outranks CAV flag (comb-ntsc.cxx:915-919)
    pd = PulldownAssembler()
    f = _with_flags(tbc_frames[0], FRAME_INFO_CAV_ODD | FRAME_INFO_WHITE_EVEN,
                    7)
    rgb = np.zeros((480, 744, 3), np.uint16)
    emits = pd.process(rgb, f[0, :16])
    assert len(emits) == 1 and emits[0][1] == 7   # EVEN wins -> full emit
