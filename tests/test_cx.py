"""CX expander parity vs the compiled reference cx-expander binary."""

import os
import subprocess

import numpy as np
import pytest

from ld_decode_tpu.audio.cx import CXExpander

ORACLE_BIN = '/tmp/cx-oracle'


def _build_oracle():
    if os.path.exists(ORACLE_BIN):
        return True
    try:
        subprocess.run(['g++', '-O2', '-o', ORACLE_BIN,
                        '/root/reference/cx-expander.cxx',
                        '-I/root/reference'], check=True, capture_output=True)
        return True
    except Exception:
        return False


def _test_signal(n=16384):
    t = np.arange(n) / 48000.0
    env = 0.2 + 0.8 * (np.sin(2 * np.pi * 2.0 * t) > 0)   # gated loudness
    left = 12000.0 * env * np.sin(2 * np.pi * 997 * t)
    right = 9000.0 * env * np.sin(2 * np.pi * 1501 * t)
    pcm = np.empty(n * 2, np.uint16)
    pcm[0::2] = np.clip(left + 32768, 0, 65535).astype(np.uint16)
    pcm[1::2] = np.clip(right + 32768, 0, 65535).astype(np.uint16)
    return pcm


@pytest.mark.skipif(not _build_oracle(), reason='cannot build cx oracle')
def test_cx_parity():
    pcm = _test_signal()
    # the reference consumes whole 1024-sample blocks only
    n_blocks = len(pcm) // 2048
    pcm = pcm[:n_blocks * 2048]
    p = subprocess.run([ORACLE_BIN], input=pcm.tobytes(),
                       capture_output=True)
    ref = np.frombuffer(p.stdout, np.uint16)

    ours = CXExpander().process(pcm)
    n = min(len(ref), len(ours))
    assert n == len(pcm)
    d = np.abs(ours[:n].astype(np.int64) - ref[:n].astype(np.int64))
    assert np.percentile(d, 99.9) <= 2, (d.max(), np.percentile(d, 99.9))
    assert d.max() <= 16, d.max()


def test_cx_streaming_matches_oneshot():
    pcm = _test_signal()
    one = CXExpander().process(pcm)
    st = CXExpander()
    parts = [st.process(pcm[i:i + 2048]) for i in range(0, len(pcm), 2048)]
    two = np.concatenate(parts)
    np.testing.assert_array_equal(one, two)
