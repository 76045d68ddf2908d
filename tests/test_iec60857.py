"""IEC 60857 VBI interpretation (reference interpretvbi.cpp semantics)."""

from ld_decode_tpu.vbi.iec60857 import interpret_iec60857


def test_cav_picture_number():
    v = interpret_iec60857(0, 0xF80123, 0xF80123)
    assert v.disc_type == 'cav'
    assert v.picture_number == 0x80123 & 0x0FFFFF
    assert not v.lead_in and not v.lead_out


def test_lead_in_and_user_code():
    v = interpret_iec60857(0x80D123, 0x88FFFF, 0)
    assert v.lead_in
    assert v.user_code == '0123'


def test_lead_out():
    v = interpret_iec60857(0, 0x80EEEE, 0)
    assert v.lead_out and not v.lead_in


def test_clv_timecode():
    v = interpret_iec60857(0, 0xF2DD35, 0)
    assert v.disc_type == 'clv'
    assert v.clv_hours == 2
    assert v.clv_minutes == 0x35


def test_clv_picture_number():
    v = interpret_iec60857(0x82E345, 0xF0DD00, 0)
    assert v.disc_type == 'clv'
    assert v.clv_seconds == 2 * 16 + 3
    assert v.clv_picture_number == 0x45


def test_chapter_number():
    v = interpret_iec60857(0, 0, 0x8A5DDD)
    assert v.chapter_number == 0xA5


def test_picture_stop_code():
    v = interpret_iec60857(0x82CFFF, 0xF80001, 0)
    assert v.disc_type == 'cav'
    assert v.picture_stop_code


def test_status_code_cx_and_sound():
    # 0x8DC000 | x3=0 x4=0 x5=0 -> CX on, stereo, 12-inch, first side
    v = interpret_iec60857(0x8DC000, 0xF80001, 0)
    assert v.status['cx'] is True
    assert v.status['sound_mode'] == 'stereo'
    assert v.status['twelve_inch'] and v.status['first_side']
    # 0x8BA000 family: CX off
    v2 = interpret_iec60857(0x8BA000, 0xF80001, 0)
    assert v2.status['cx'] is False
