"""PAL comb on synthetic colorbars: known U/V per bar -> expected hues."""

import numpy as np
import pytest

from ld_decode_tpu.comb.comb_pal import PALComb, CombPALConfig, PAL_X
from ld_decode_tpu.models import encode as E
from ld_decode_tpu.ops import filters as F
from ld_decode_tpu.tbc import framer as FR
from ld_decode_tpu.utils.params import DecoderConfig

START = 2560 * 14


@pytest.fixture(scope='module')
def pal_frame():
    cfg = DecoderConfig(system='PAL', freq_mhz=40.0)
    samples = E.encode_frames(cfg, 3, E.EncodeSpec(pattern='palbars',
                                                   cav_start_frame=900))
    bank = F.make_demod_bank(cfg, np.complex64)
    fr = FR.Framer(cfg, bank, capture=samples)
    rv = fr.readframe(None, START, True)
    assert rv[0] is not None
    return np.asarray(rv[0], np.uint16)


def _bar_means(rgb):
    """Mean RGB of each of the 7 bars over a stable row band."""
    rows = rgb[80:400].astype(np.float64)
    w = rows.shape[1]
    # active region of the line: skip hsync-adjacent columns
    a0, a1 = 90, w - 40
    bw = (a1 - a0) / 7
    out = []
    for k in range(7):
        x0 = int(a0 + k * bw + bw * 0.25)
        x1 = int(a0 + k * bw + bw * 0.75)
        out.append(rows[:, x0:x1].mean(axis=(0, 1)))
    return out


def test_pal_comb_hues(pal_frame):
    comb = PALComb(CombPALConfig(dim=2))
    rgb = comb.process(pal_frame)
    assert rgb.shape == (576, PAL_X, 3)
    bars = _bar_means(rgb)

    # bar 0: gray 80 IRE; bar 4: gray 45 IRE -> monotonic, near-neutral
    assert bars[0].mean() > bars[4].mean() > bars[6].mean()
    for k in (0, 4, 6):
        r, g, b = bars[k]
        assert abs(r - b) < 0.12 * bars[k].mean(), (k, bars[k])

    # bar 1: +U only -> blue >> red;  bar 2: +V only -> red >> blue
    r1, g1, b1 = bars[1]
    assert b1 - r1 > 0.2 * bars[1].mean(), bars[1]
    r2, g2, b2 = bars[2]
    assert r2 - b2 > 0.15 * bars[2].mean(), bars[2]

    # bar 5: +U,-V -> blue > red again
    r5, g5, b5 = bars[5]
    assert b5 > r5, bars[5]


def test_pal_comb_line_stability(pal_frame):
    """The per-line burst rotation must remove PAL's line-to-line phase
    walk: bar hue must not alternate row to row (no 'Hanover bars')."""
    comb = PALComb(CombPALConfig(dim=2))
    rgb = comb.process(pal_frame).astype(np.float64)
    band = rgb[100:160, 300:340]          # inside bar 1 (+U)
    rb = band[..., 2] - band[..., 0]      # blue minus red per pixel
    per_row = rb.mean(axis=1)
    even, odd = per_row[0::2].mean(), per_row[1::2].mean()
    assert np.sign(even) == np.sign(odd)
    assert abs(even - odd) < 0.4 * abs(per_row.mean()), (even, odd)
