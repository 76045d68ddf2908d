"""Q-subcode (IEC 60908) round trips, standalone and through the full
EFM digital-audio chain.

The reference's EFM prototype cites Q-subcode decoding as future work
(attic2/cd-decoder.py:14-17) and never implements it; these tests pin
our completed implementation against itself (encoder round trip) and a
hand-checked CRC vector.
"""

import numpy as np

from ld_decode_tpu.audio import efm as E
from ld_decode_tpu.audio import subcode as SC


def test_crc16_q_known_vector():
    # CRC-16/CCITT (init 0) of the ASCII bytes '123456789' is 0x31C3
    bits = np.unpackbits(np.frombuffer(b'123456789', np.uint8))
    assert SC.crc16_q(bits) == 0x31C3


def test_q_packet_roundtrip_position():
    q = SC.encode_q_position(tno=7, index=1, rel_frames=75 * 63 + 12,
                             abs_frames=75 * (60 * 4 + 2) + 30, control=0x1)
    dec = SC.decode_q(q)
    assert dec is not None
    assert dec['adr'] == SC.ADR_POSITION
    assert dec['tno'] == 7 and dec['index'] == 1
    assert (dec['min'], dec['sec'], dec['frame']) == (1, 3, 12)
    assert (dec['amin'], dec['asec'], dec['aframe']) == (4, 2, 30)
    assert dec['pre_emphasis'] and not dec['copy_permitted']
    # flip any bit -> CRC rejects
    bad = q.copy()
    bad[3] ^= 0x10
    assert SC.decode_q(bad) is None


def test_q_packet_leadout_and_catalogue():
    q = SC.encode_q_position(tno=SC.LEADOUT_TNO, index=1,
                             rel_frames=0, abs_frames=75 * 60 * 50)
    dec = SC.decode_q(q)
    assert dec['leadout'] and dec['tno'] == SC.LEADOUT_TNO

    digits = '5012345678900'
    nib = [int(c) for c in digits] + [0]
    data = np.array([(nib[2 * k] << 4) | nib[2 * k + 1] for k in range(7)]
                    + [0, 0], np.uint8)
    dec2 = SC.decode_q(SC.encode_q(0, SC.ADR_CATALOGUE, data))
    assert dec2['catalogue'] == digits


def test_section_split_and_decode():
    rng = np.random.default_rng(3)
    qs = [SC.encode_q_position(1, 1, i * 98 // 75, 100 + i)
          for i in range(5)]
    syms = []
    for q in qs:
        syms += SC.subcode_symbols_for_section(q)
    # prepend garbage (non-sync symbols) to test anchoring
    controls = np.array([4, 0, 9] + syms, np.int64)
    decs = SC.decode_subcode(controls)
    assert len(decs) == 5
    for i, d in enumerate(decs):
        assert d['aframe'] == SC._bcd(SC._to_bcd((100 + i) % 75))
        assert d['section_start'] == 3 + i * SC.SECTION_FRAMES


def test_subcode_through_full_efm_chain():
    """PCM + Q subcode -> EFM RF -> decode_digital_audio recovers
    CRC-valid Q packets with the right track/time fields."""
    rng = np.random.default_rng(11)
    # enough F3 frames for ~3 subcode sections after sync settling
    nf = 98 * 4 + 40
    pcm = rng.integers(-20000, 20000, (nf * 6, 2)).astype(np.int16)
    qs = [SC.encode_q_position(tno=2, index=1, rel_frames=10 + i,
                               abs_frames=1000 + i, control=0)
          for i in range(6)]
    syms = []
    for q in qs:
        syms += SC.subcode_symbols_for_section(q)
    rate = 28.8e6
    wave = E.encode_digital_audio(pcm, rate, controls=np.array(syms))

    dec = E.decode_digital_audio(wave, rate)
    got = dec['q']
    assert len(got) >= 2, f'only {len(got)} Q packets survived'
    for d in got:
        assert d['adr'] == SC.ADR_POSITION
        assert d['tno'] == 2 and d['index'] == 1
        # abs time walks one frame per section from 1000+
        assert 1000 <= d['aframe'] + d['asec'] * 75 + d['amin'] * 75 * 60 < 1010
