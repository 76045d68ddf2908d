"""Comb debug surfaces (-D / -k / -l) parity vs the compiled reference.

-D is SURVEY §4's built-in quantitative comparator: per-line and total
MSE/ME between the 2D and 3D chroma estimates (comb-ntsc.cxx:440-482).
-k renders the active K-map as grayscale (575-579); -l dumps and blacks
out one line (581-591).
"""

import re

import numpy as np
import pytest

from ld_decode_tpu.comb.comb_ntsc import NTSCComb, CombConfig, IN_X, IN_Y
from ld_decode_tpu.models import encode as E
from ld_decode_tpu.ops import filters as F
from ld_decode_tpu.tbc import framer as FR
from ld_decode_tpu.utils.params import DecoderConfig

from tests.test_comb import _build_oracle, ORACLE_BIN


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
        assert rv[0] is not None
        frames.append(np.asarray(rv[0], np.uint16))
        s = rv[2]
    # 4-frame sequence with distinct frames so 2D != 3D
    return [frames[0], frames[1], frames[0], frames[1]]


def _run_oracle_raw(frames, extra):
    import subprocess
    data = b''.join(f.tobytes() for f in frames)
    p = subprocess.run([ORACLE_BIN, *extra], input=data, capture_output=True)
    return p.stdout, p.stderr.decode('utf-8', 'replace')


@pytest.mark.skipif(not _build_oracle(), reason='cannot build comb oracle')
def test_debug2d_totals_parity(tbc_frames):
    """Our -D totals must match the reference's full-frame SplitIQ(1)
    reports.  The binary prints one partial TOTAL per input (SplitIQ(0),
    clp2 still zero) and, from the 3rd input on, the full TOTAL for the
    previous frame (SplitIQ(1)) — the full ones are every 2nd line from
    the 4th."""
    _, err = _run_oracle_raw(tbc_frames, ('-D',))
    totals = [(float(m.group(1)), float(m.group(2))) for m in
              re.finditer(r'TOTAL MSE ([0-9.eE+-]+) ME ([0-9.eE+-]+)', err)]
    # inputs 0..3 -> [f0p, f1p, f2p, f1full, f3p, f2full]
    assert len(totals) == 6, totals
    ref_full = [totals[3], totals[5]]

    ours = NTSCComb(CombConfig(dim=3, debug2d=True))
    got = []
    for f in tbc_frames:
        out = ours.process(f)
        if out is not None:
            got.append((ours.last_debug2d['mse'], ours.last_debug2d['me']))
    assert len(got) == 2
    for (mse, me), (rmse, rme) in zip(got, ref_full):
        assert mse == pytest.approx(rmse, rel=5e-3), (mse, rmse)
        assert me == pytest.approx(rme, rel=5e-3), (me, rme)


@pytest.mark.skipif(not _build_oracle(), reason='cannot build comb oracle')
def test_debug2d_lines_parity(tbc_frames):
    """Spot-check per-line MSE/ME against the reference dump."""
    _, err = _run_oracle_raw(tbc_frames, ('-D',))
    # collect per-line reports per SplitIQ call, split on TOTAL markers
    blocks = re.split(r'TOTAL MSE [^\n]*\n', err)
    # block 3 (0-based) holds the lines of the first full SplitIQ(1)
    lines = dict()
    for m in re.finditer(r'^(\d+) ([0-9.eE+-]+) ME ([0-9.eE+-]+)$',
                         blocks[3], re.M):
        lines[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert len(lines) >= 400

    ours = NTSCComb(CombConfig(dim=3, debug2d=True))
    out = None
    for f in tbc_frames[:3]:
        out = ours.process(f)
    assert out is not None
    d = ours.last_debug2d
    for li in (60, 120, 250, 400, 500):
        rmse, rme = lines[li]
        assert d['mse_line'][li] == pytest.approx(rmse, rel=5e-3)
        assert d['me_line'][li] == pytest.approx(rme, rel=5e-3)


@pytest.mark.skipif(not _build_oracle(), reason='cannot build comb oracle')
def test_showk_parity(tbc_frames):
    """-k K-map render parity (no-flow path, deterministic K-map)."""
    out, _ = _run_oracle_raw(tbc_frames, ('-d', '3', '-F', '-k'))
    per = 744 * 480 * 3
    ref = np.frombuffer(out, np.uint16)
    nref = len(ref) // per
    refs = [ref[i * per:(i + 1) * per].reshape(480, 744, 3)
            for i in range(nref)]

    ours = NTSCComb(CombConfig(dim=3, opticalflow=False, showk=True))
    got = [o for o in (ours.process(f) for f in tbc_frames) if o is not None]
    assert len(got) == len(refs) == 2
    for o, r in zip(got, refs):
        d = np.abs(o.astype(np.int64) - r.astype(np.int64))
        assert np.percentile(d, 99) <= 8, (d.max(), np.percentile(d, 99))


def test_debugline(tbc_frames):
    """-l blacks out the chosen output line and exposes its YIQ."""
    ours = NTSCComb(CombConfig(dim=2, debugline=100))
    out = ours.process(tbc_frames[0])
    row = 100 + 25 - 38          # debugline + 25 - firstline
    assert out[row].max() == 0
    assert out[row - 1].max() > 0 and out[row + 1].max() > 0
    dbg = ours.last_debugline
    assert set(dbg) == {'y', 'i', 'q'}
    assert dbg['y'].shape == (IN_X,) and dbg['y'].max() > 0
