"""NTSC comb parity vs the compiled reference comb-ntsc binary."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from ld_decode_tpu.comb.comb_ntsc import NTSCComb, CombConfig, IN_X, IN_Y
from ld_decode_tpu.models import encode as E
from ld_decode_tpu.ops import filters as F
from ld_decode_tpu.tbc import framer as FR
from ld_decode_tpu.utils.params import DecoderConfig

ORACLE_BIN = '/tmp/comb-oracle'


def _build_oracle():
    if os.path.exists(ORACLE_BIN):
        return True
    try:
        flags = subprocess.run(['pkg-config', '--cflags', '--libs', 'opencv4'],
                               capture_output=True, text=True, check=True
                               ).stdout.split()
        subprocess.run(['g++', '-O2', '-o', ORACLE_BIN,
                        '/root/reference/comb-ntsc.cxx', '-I/root/reference']
                       + flags, check=True, capture_output=True)
        return True
    except Exception:
        return False


@pytest.fixture(scope='module')
def tbc_frames():
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    samples = E.encode_frames(cfg, 3, E.EncodeSpec(pattern='bars',
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
    assert frames
    return frames


def _run_oracle(frames, dim=2, extra=()):
    data = b''.join(f.tobytes() for f in frames)
    p = subprocess.run([ORACLE_BIN, '-d', str(dim), *extra], input=data,
                       capture_output=True)
    out = np.frombuffer(p.stdout, np.uint16)
    per = 744 * 480 * 3
    n = len(out) // per
    return [out[i * per:(i + 1) * per].reshape(480, 744, 3)
            for i in range(n)]


@pytest.mark.skipif(not _build_oracle(), reason='cannot build comb oracle')
def test_comb2d_parity(tbc_frames):
    ref_frames = _run_oracle(tbc_frames, dim=2)
    assert len(ref_frames) == len(tbc_frames)

    ours = NTSCComb(CombConfig(dim=2))
    for tbc, ref in zip(tbc_frames, ref_frames):
        out = ours.process(tbc)
        assert out.shape == ref.shape
        d = np.abs(out.astype(np.int64) - ref.astype(np.int64))
        # float32 vs double across the stencil chain
        assert np.percentile(d, 99) <= 8, (d.max(), np.percentile(d, 99))
        assert np.median(d) <= 2


@pytest.mark.skipif(not _build_oracle(), reason='cannot build comb oracle')
def test_comb1d_parity(tbc_frames):
    ref = _run_oracle(tbc_frames[:1], dim=1)[0]
    ours = NTSCComb(CombConfig(dim=1))
    out = ours.process(tbc_frames[0])
    d = np.abs(out.astype(np.int64) - ref.astype(np.int64))
    assert np.percentile(d, 99) <= 8, (d.max(), np.percentile(d, 99))


@pytest.mark.skipif(not _build_oracle(), reason='cannot build comb oracle')
def test_comb3d_parity(tbc_frames):
    """3D comb, no-opticalflow K-map path (reference comb -F -d 3)."""
    frames = list(tbc_frames)
    while len(frames) < 4:
        frames.append(tbc_frames[-1])
    ref_frames = _run_oracle(frames, dim=3, extra=('-F',))
    ours = NTSCComb(CombConfig(dim=3, opticalflow=False))
    got = []
    for f in frames:
        out = ours.process(f)
        if out is not None:
            got.append(out)
    assert len(got) == len(ref_frames)
    for out, ref in zip(got, ref_frames):
        d = np.abs(out.astype(np.int64) - ref.astype(np.int64))
        assert np.percentile(d, 99) <= 8, (d.max(), np.percentile(d, 99))


def test_comb_bw_frame(tbc_frames):
    """B&W mode: output is gray (R=G=B) wherever luma is in range."""
    ours = NTSCComb(CombConfig(dim=2, bw=True))
    out = ours.process(tbc_frames[0]).astype(np.int64)
    interior = out[60:400, 100:600]
    assert np.abs(interior[..., 0] - interior[..., 1]).max() <= 1
    assert np.abs(interior[..., 1] - interior[..., 2]).max() <= 1
