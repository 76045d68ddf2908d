"""Device-resident chain mode (fetch_picture=False): the .tbc picture
never leaves HBM — the frame weave runs on device
(framer._weave_device_jit) and the comb reads the woven frames
directly.  Pinned here: the device path's frames are bit-identical to
the host path's, including the half-line tail, the line-0 metadata
words, and the comb RGB produced from them."""

import numpy as np
import pytest

from ld_decode_tpu.utils.params import DecoderConfig
from ld_decode_tpu.models import encode as E
from ld_decode_tpu.ops import filters as F
from ld_decode_tpu.tbc import framer as FR


@pytest.fixture(scope='module')
def frames_pair():
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    samples = E.encode_frames(cfg, 6, E.EncodeSpec(pattern='ramp',
                                                   cav_start_frame=900))
    bank = F.make_demod_bank(cfg, np.complex64)
    fr_host = FR.Framer(cfg, bank, capture=samples, batch=6)
    fr_dev = FR.Framer(cfg, bank, capture=samples, batch=6,
                       fetch_picture=False)
    host, dev = [], []
    s1 = s2 = 33046
    for i in range(3):
        rv1 = fr_host.readframe(None, s1, i == 0)
        rv2 = fr_dev.readframe(None, s2, i == 0)
        assert rv1[0] is not None and rv2[0] is not None
        host.append((np.asarray(rv1[0]), rv1[1]))
        dev.append((np.asarray(rv2[0]), rv2[1]))
        s1, s2 = rv1[2], rv2[2]
    return host, dev


def test_device_weave_matches_host(frames_pair):
    host, dev = frames_pair
    for (fh, _), (fd, _) in zip(host, dev):
        np.testing.assert_array_equal(fh, fd)


def test_device_chain_audio_matches(frames_pair):
    host, dev = frames_pair
    for (_, ah), (_, ad) in zip(host, dev):
        if ah is None:
            assert ad is None
        else:
            np.testing.assert_array_equal(np.asarray(ah), np.asarray(ad))


def test_device_chain_white_flag():
    """CAV white-flagged content: the device-chain path (no host
    picture) must still set FRAME_INFO_WHITE_ODD/EVEN — the flag is
    computed on device (fused.pipeline_finish meta word 7) and must
    agree bit-for-bit with the host slicer's metadata words."""
    from ld_decode_tpu.vbi.metadata import (FRAME_INFO_WHITE_EVEN,
                                            FRAME_INFO_WHITE_ODD)
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    samples = E.encode_frames(cfg, 5, E.EncodeSpec(pattern='ramp',
                                                   white_flag=True))
    bank = F.make_demod_bank(cfg, np.complex64)
    fr_host = FR.Framer(cfg, bank, capture=samples, batch=5)
    fr_dev = FR.Framer(cfg, bank, capture=samples, batch=5,
                       fetch_picture=False)
    s1 = s2 = 33046
    seen_white = False
    for i in range(2):
        rv1 = fr_host.readframe(None, s1, i == 0)
        rv2 = fr_dev.readframe(None, s2, i == 0)
        assert rv1[0] is not None and rv2[0] is not None
        wh = int(np.asarray(rv1[0])[13])
        wd = int(np.asarray(rv2[0])[13])
        assert wh == wd
        if wh & (FRAME_INFO_WHITE_ODD | FRAME_INFO_WHITE_EVEN):
            seen_white = True
        s1, s2 = rv1[2], rv2[2]
    assert seen_white, 'white-flag pattern produced no white-flag bits'


def test_comb_accepts_device_frames(frames_pair):
    """comb.feed on device frames produces the same RGB as on np
    frames (no host round trip on the way in)."""
    import jax.numpy as jnp
    from ld_decode_tpu.comb.batch import NTSCCombBatch
    from ld_decode_tpu.comb.comb_ntsc import CombConfig
    host, _ = frames_pair
    frames = np.stack([f.reshape(525, 910) for f, _ in host])
    c1 = NTSCCombBatch(CombConfig(dim=3, opticalflow=False))
    c2 = NTSCCombBatch(CombConfig(dim=3, opticalflow=False))
    r1 = c1.process_many(frames)
    r2 = c2.process_many(jnp.asarray(frames))
    assert len(r1) == len(r2) > 0
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(a, b)
