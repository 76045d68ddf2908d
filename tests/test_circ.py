"""CIRC (C1/C2 Reed-Solomon) round-trip and correction tests."""

import numpy as np
import pytest

from ld_decode_tpu.audio import circ as C


def _pcm_frames(nf, seed=0):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32767, (nf * 6, 2)).astype(np.int16)
    return C.samples_to_audio(samples), samples


# interleave flush: stage-2 max delay 108 + stage-1/3 margins
FLUSH = 120


def _roundtrip(frames_tx, nf):
    dec = C.circ_decode(frames_tx)
    return dec


def test_rs_encode_valid_codewords():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, (50, 24)).astype(np.int32)
    cw = C.rs_encode(data, 28, C.C2_PPOS)
    for i in range(50):
        S = [C._poly_eval(cw[i][::-1], C.GF_EXP[k]) for k in range(4)]
        assert not any(S)


def test_rs_correct_two_errors():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, (1, 28)).astype(np.int32)
    cw = C.rs_encode(data, 32, C.C1_PPOS)[0]
    bad = cw.copy()
    bad[3] ^= 0x5a
    bad[17] ^= 0x21
    out, n = C.rs_decode_word(bad, [], 2)
    assert out is not None and n == 2
    assert (out == cw).all()


def test_rs_reject_three_errors():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, (1, 28)).astype(np.int32)
    cw = C.rs_encode(data, 32, C.C1_PPOS)[0]
    bad = cw.copy()
    for p, v in ((1, 7), (9, 99), (20, 180)):
        bad[p] ^= v
    out, _ = C.rs_decode_word(bad, [], 2)
    assert out is None      # flagged uncorrectable, not miscorrected


def test_rs_four_erasures():
    rng = np.random.default_rng(4)
    data = rng.integers(0, 256, (1, 24)).astype(np.int32)
    cw = C.rs_encode(data, 28, C.C2_PPOS)[0]
    bad = cw.copy()
    ers = [2, 11, 19, 26]
    for p in ers:
        bad[p] ^= rng.integers(1, 256)
    out, n = C.rs_decode_word(bad, ers, 2)
    assert out is not None and (out == cw).all()


def test_circ_clean_roundtrip():
    nf = 300
    audio, samples = _pcm_frames(nf)
    tx = C.circ_encode(audio)
    dec = C.circ_decode(tx)
    got = dec['audio']
    # interleave pipeline fill/flush trims both ends
    lo, hi = FLUSH, nf - FLUSH
    assert (got[lo:hi] == audio[lo:hi]).all()
    assert dec['c1_ok'][lo:hi].all()
    assert dec['c2_ok'][lo:hi].all()
    back = C.audio_to_samples(got[lo:hi])
    assert (back == samples[lo * 6:hi * 6]).all()


def test_circ_corrects_random_byte_errors():
    nf = 600
    audio, _ = _pcm_frames(nf, seed=5)
    tx = C.circ_encode(audio).astype(np.int32)
    rng = np.random.default_rng(6)
    # sparse random symbol errors (~1 per 4 channel frames, C1's regime)
    nerr = nf // 4
    fi = rng.integers(FLUSH, nf - FLUSH, nerr)
    bi = rng.integers(0, 32, nerr)
    tx[fi, bi] ^= rng.integers(1, 256, nerr)
    dec = C.circ_decode(tx.astype(np.uint8))
    lo, hi = FLUSH, nf - FLUSH
    assert (dec['audio'][lo:hi] == audio[lo:hi]).all()
    assert dec['c1_corrected'].sum() > 0


def test_circ_burst_error_via_erasures():
    """A burst destroying several consecutive channel frames: C1 flags
    them, the cross-interleave spreads them to <=1 erasure per C2 word...
    up to the CIRC design limit of ~16 consecutive frames."""
    nf = 400
    audio, _ = _pcm_frames(nf, seed=7)
    tx = C.circ_encode(audio).astype(np.int32)
    rng = np.random.default_rng(8)
    burst0 = 200
    tx[burst0:burst0 + 12] = rng.integers(0, 256, (12, 32))
    dec = C.circ_decode(tx.astype(np.uint8))
    lo, hi = FLUSH, nf - FLUSH
    assert (dec['audio'][lo:hi] == audio[lo:hi]).all()


def test_circ_c1_erasures_beat_errors():
    """Known-bad symbol positions (EFM demod failures) passed as C1
    erasures: 3-4 flagged symbols per frame fully correct (2e+f<=4),
    where the same damage as unknown errors (>2) would not."""
    nf = 300
    audio, _ = _pcm_frames(nf, seed=11)
    tx = C.circ_encode(audio).astype(np.int32)
    rng = np.random.default_rng(12)
    bad = np.zeros_like(tx, bool)
    lo, hi = FLUSH, nf - FLUSH
    hit = rng.choice(np.arange(lo, hi), 40, replace=False)
    for fi in hit:
        cols = rng.choice(32, 3, replace=False)     # 3 bad symbols/frame
        tx[fi, cols] ^= rng.integers(1, 256, 3)
        bad[fi, cols] = True

    # without the erasure hints, 3 unknown errors exceed C1's t=2
    dec_plain = C.circ_decode(tx.astype(np.uint8))
    assert not dec_plain['c1_ok'][hit].all()

    # with them, every frame corrects and the audio round-trips exactly
    dec = C.circ_decode(tx.astype(np.uint8), bad_mask=bad)
    assert (dec['audio'][lo:hi] == audio[lo:hi]).all()
