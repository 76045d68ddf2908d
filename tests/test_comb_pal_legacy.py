"""PAL comb parity vs the compiled reference attic2/comb-pal.cxx binary.

The attic PAL comb consumes the legacy 1052x610 TBC geometry, so we
synthesize PAL frames on that grid directly: a 45°/line subcarrier phase
walk (making ±4-line chroma antiphase, the comb's design assumption), a
±45° swinging burst in the measurement window, and colorbars with known
(U, V).  The oracle must decode sensible hues (proving the synth is
plausible PAL) and our LegacyPALComb must match it pixel-for-pixel.
"""

import os
import subprocess

import numpy as np
import pytest

from ld_decode_tpu.comb.comb_pal_legacy import (
    LegacyPALComb, LegacyPALConfig, L_X, L_Y, IRESCALE, CROP_X0)

ORACLE_BIN = '/tmp/comb-pal-oracle'


def _build_oracle():
    if os.path.exists(ORACLE_BIN):
        return True
    try:
        flags = subprocess.run(['pkg-config', '--cflags', '--libs', 'opencv4'],
                               capture_output=True, text=True, check=True
                               ).stdout.split()
        subprocess.run(['g++', '-O2', '-o', ORACLE_BIN,
                        '/root/reference/attic2/comb-pal.cxx',
                        '-I/root/reference'] + flags,
                       check=True, capture_output=True)
        return True
    except Exception:
        return False


def _ire_to_u16(ire):
    return np.clip((ire + 43.122874) * IRESCALE, 1, 65535)


# colorbars: (y_ire, u_ire, v_ire)
BARS = [(80, 0, 0), (50, 15, 0), (50, 0, 15), (50, -12, 8),
        (45, 0, 0), (50, 10, -12), (20, 0, 0)]


def synth_frame(seed=0, motion_rows=None):
    """One 1052x610 legacy PAL rawbuffer with swinging burst + colorbars."""
    rng = np.random.default_rng(seed)
    h = np.arange(L_X, dtype=np.float64)[None, :]
    l = np.arange(L_Y, dtype=np.float64)[:, None]
    omega = np.pi / 2
    phi = np.radians(45.0) * l                      # ±4 lines antiphase
    li = np.arange(L_Y)[:, None]
    s = np.where((li % 4 == 1) | (li % 4 == 2), 1.0, -1.0)   # V-switch

    theta = omega * h + phi
    # swinging burst, cols 16..60: (-U + sV)/sqrt(2), 20 IRE p-p
    A_b = 10.0 * IRESCALE
    burst = (A_b / np.sqrt(2)) * (-np.cos(theta) + s * np.sin(theta))
    bmask = (h >= 16) & (h < 60)

    # colorbars over cols 70..1040
    y_ire = np.zeros((L_Y, L_X))
    u_ire = np.zeros((L_Y, L_X))
    v_ire = np.zeros((L_Y, L_X))
    a0, a1 = 70, 1040
    bw = (a1 - a0) / len(BARS)
    for k, (yy, uu, vv) in enumerate(BARS):
        m = (h >= a0 + k * bw) & (h < a0 + (k + 1) * bw)
        y_ire += np.where(m, yy, 0.0)
        u_ire += np.where(m, uu, 0.0)
        v_ire += np.where(m, vv, 0.0)
    if motion_rows is not None:
        r0, r1 = motion_rows
        rm = (li >= r0) & (li < r1)
        y_ire = np.where(rm, y_ire + 15.0, y_ire)

    chroma = IRESCALE * (u_ire * np.cos(theta) + s * v_ire * np.sin(theta))
    sig = _ire_to_u16(y_ire) + np.where(bmask, burst, 0.0) + chroma
    sig += rng.normal(0, 6.0, sig.shape)            # ~1/60 IRE dither
    frame = np.clip(sig, 1, 65535).astype(np.uint16)
    frame[:24] = 0
    frame[:, :4] = 1000                             # col 0 != 16384
    return frame


def _run_oracle(frames, dim=2, extra=()):
    data = b''.join(f.tobytes() for f in frames)
    p = subprocess.run([ORACLE_BIN, '-d', str(dim), *extra], input=data,
                       capture_output=True)
    out = np.frombuffer(p.stdout, np.uint16)
    per = (L_X - 78) * 576 * 3
    n = len(out) // per
    return [out[i * per:(i + 1) * per].reshape(576, L_X - 78, 3)
            for i in range(n)]


@pytest.fixture(scope='module')
def frames():
    return [synth_frame(seed=i) for i in range(2)]


def _close(ours, ref, cols=960):
    d = np.abs(ours[:, :cols].astype(np.int64) - ref[:, :cols].astype(np.int64))
    assert np.percentile(d, 99) <= 8, (d.max(), np.percentile(d, 99))
    assert np.median(d) <= 2, np.median(d)


@pytest.mark.skipif(not _build_oracle(), reason='cannot build PAL comb oracle')
def test_legacy_pal_2d_parity(frames):
    ref = _run_oracle(frames, dim=2)
    assert len(ref) == 2
    comb = LegacyPALComb(LegacyPALConfig(dim=2))
    for f, want in zip(frames, ref):
        _close(comb.process(f), want)


@pytest.mark.skipif(not _build_oracle(), reason='cannot build PAL comb oracle')
def test_legacy_pal_1d_parity(frames):
    ref = _run_oracle(frames[:1], dim=1)
    comb = LegacyPALComb(LegacyPALConfig(dim=1))
    _close(comb.process(frames[0]), ref[0])


@pytest.mark.skipif(not _build_oracle(), reason='cannot build PAL comb oracle')
def test_legacy_pal_3d_parity(frames):
    """dim=3 in the attic comb degrades to 2D on the one-frame-old slot
    (Split3D is #if 0'd, attic2/comb-pal.cxx:342); first output is the
    all-zero primer frame."""
    ref = _run_oracle(frames, dim=3)
    assert len(ref) == 2
    comb = LegacyPALComb(LegacyPALConfig(dim=3))
    outs = [comb.process(f) for f in frames]
    assert outs[0].max() == 0 and ref[0].max() == 0   # primer frame black
    _close(outs[1], ref[1])


@pytest.mark.skipif(not _build_oracle(), reason='cannot build PAL comb oracle')
def test_oracle_hues_and_hanover(frames):
    """The synthetic frame is plausible PAL: the ORACLE itself must decode
    the expected hues with no Hanover bars — which proves parity against
    it is meaningful, not garbage-in-garbage-out."""
    ref = _run_oracle(frames[:1], dim=2)[0].astype(np.float64)
    rows = ref[40:500]
    a0 = 70 - CROP_X0                     # bar origin in cropped coords
    bw = (1040 - 70) / len(BARS)
    means = []
    for k in range(len(BARS)):
        x0 = int(a0 + k * bw + bw * 0.3)
        x1 = int(a0 + k * bw + bw * 0.7)
        means.append(rows[:, x0:x1].mean(axis=(0, 1)))
    # gray bars monotonic + neutral
    assert means[0].mean() > means[4].mean() > means[6].mean()
    # bar 1 (+U): blue >> red; bar 2 (+V): red >> blue
    assert means[1][2] - means[1][0] > 0.2 * means[1].mean(), means[1]
    assert means[2][0] - means[2][2] > 0.15 * means[2].mean(), means[2]
    # Hanover check inside bar 2: per-row red-minus-blue keeps one sign
    band = ref[100:160, int(a0 + 2 * bw + 20):int(a0 + 3 * bw - 20)]
    rb = (band[..., 0] - band[..., 2]).mean(axis=1)
    assert (np.sign(rb[0::2].mean()) == np.sign(rb[1::2].mean()))
    assert abs(rb[0::2].mean() - rb[1::2].mean()) < 0.4 * abs(rb.mean())
