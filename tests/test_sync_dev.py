"""Device-side vsync/lineloc logic vs the host implementations.

The host path (tbc/field.py determine_vsyncs / compute_linelocs) is
oracle-tested against the reference; here the fixed-shape device port is
pinned against the host over real synthetic-decode peak lists and
corrupted variants.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ld_decode_tpu.utils.params import DecoderConfig
from ld_decode_tpu.models import encode as E
from ld_decode_tpu.ops import filters as F
from ld_decode_tpu.tbc.field import FieldDecoder
from ld_decode_tpu.tbc import sync_dev as SD
from ld_decode_tpu.tbc.sync import MAX_PEAKS


def _field_peaks(cfg, dec, samples, start):
    import jax.numpy as jnp
    cap = jnp.asarray(samples.astype(np.float32))
    out = dec.analyze_resident(cap, start, 1.0)
    assert out is not None
    _v, _a, peaks, vals = out
    return peaks.astype(np.int64), vals.astype(np.float64)


def _pad(peaks, vals):
    p = np.full(MAX_PEAKS, -1, np.int32)
    v = np.zeros(MAX_PEAKS, np.float32)
    p[:len(peaks)] = peaks
    v[:len(vals)] = vals
    return jnp.asarray(p), jnp.asarray(v), len(peaks)


def _compare(cfg, dec, peaks, vals):
    hv = dec.determine_vsyncs(peaks, vals)
    pj, vj, nv = _pad(peaks, vals)
    dv = SD.determine_vsyncs_dev(pj, vj, jnp.int32(nv), cfg.linelen,
                                 cfg.system == 'PAL')
    count = int(dv.count)
    assert count == len(hv) or (len(hv) < 2 and count == len(hv)), \
        (count, len(hv))
    for k in range(min(count, len(hv))):
        assert int(dv.idx[k]) == hv[k][0], (k, int(dv.idx[k]), hv[k])
        if len(hv) >= 2:     # repair pass ran on host
            assert int(dv.line0[k]) == hv[k][1], (k, int(dv.line0[k]), hv[k])
            assert bool(dv.istop[k]) == bool(hv[k][2]), k

    if len(hv) < 2 or len(peaks) < hv[1][1] + 4:
        return 0

    istop = bool(hv[0][2])
    lc = dec.field_lines + (1 if istop else 0)
    ll_h, bad_h = dec.compute_linelocs(peaks, vals, hv, lc)

    from ld_decode_tpu.tbc.fused import max_nlines
    R = max_nlines(cfg)
    dl = SD.compute_linelocs_dev(pj, vj, jnp.int32(nv), dv.med, dv.tol,
                                 dv.line0[0], dv.line0[1], jnp.int32(lc),
                                 cfg.linelen, R)
    assert bool(dl.ok)
    got = np.asarray(dl.lli, np.float64) + np.asarray(dl.llf, np.float64)
    n = len(ll_h)
    err = np.abs(got[:n] - ll_h)
    assert err.max() < 1e-3, (err.max(), err.argmax())
    assert (np.asarray(dl.bad[:n]) == bad_h).all(), \
        np.nonzero(np.asarray(dl.bad[:n]) != bad_h)
    return 1


@pytest.mark.parametrize('system', ['NTSC', 'PAL'])
def test_parity_clean(system):
    cfg = DecoderConfig(system=system, freq_mhz=40.0)
    samples = E.encode_frames(cfg, 3, E.EncodeSpec(pattern='ramp',
                                                   cav_start_frame=1))
    bank = F.make_demod_bank(cfg, dtype=np.complex64)
    dec = FieldDecoder(cfg, bank)
    pitch = int(round(cfg.freq_hz / cfg.sys.fps / 2))
    from ld_decode_tpu.tbc.framer import Framer
    fr = Framer(cfg, bank, capture=samples, batch=4)
    _f0, rs0, _ = fr.readfield(None, 33046)
    checked = 0
    for start in (rs0, rs0 + pitch, rs0 + 2 * pitch):
        peaks, vals = _field_peaks(cfg, dec, samples, start)
        checked += _compare(cfg, dec, peaks, vals)
    assert checked >= 2


def test_parity_corrupted():
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    samples = E.encode_frames(cfg, 3, E.EncodeSpec(pattern='ramp',
                                                   cav_start_frame=1))
    bank = F.make_demod_bank(cfg, dtype=np.complex64)
    dec = FieldDecoder(cfg, bank)
    pitch = int(round(cfg.freq_hz / cfg.sys.fps / 2))
    from ld_decode_tpu.tbc.framer import Framer
    fr = Framer(cfg, bank, capture=samples, batch=4)
    _f0, rs0, _ = fr.readfield(None, 33046)
    rng = np.random.default_rng(3)
    peaks, vals = _field_peaks(cfg, dec, samples, rs0 + pitch)

    ran = 0
    for trial in range(8):
        p = peaks.copy()
        v = vals.copy()
        # random peak deletions (dropouts), level noise, spurious peaks
        keep = rng.uniform(size=len(p)) > 0.03
        keep[:30] = True
        p, v = p[keep], v[keep]
        v = v + rng.normal(0, 0.01, len(v))
        ran += _compare(cfg, dec, p, v.clip(0, 1.2))
    assert ran >= 5
