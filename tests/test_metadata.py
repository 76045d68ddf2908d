"""Frame line-0 metadata words (.tbc spec) and white-flag detection."""

import numpy as np
import pytest

from ld_decode_tpu.ops import filters as F
from ld_decode_tpu.models import encode as E
from ld_decode_tpu.tbc import framer as FR
from ld_decode_tpu.utils.params import DecoderConfig
from ld_decode_tpu.vbi import metadata as M


@pytest.fixture(scope='module')
def decoded():
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    samples = E.encode_frames(cfg, 3, E.EncodeSpec(pattern='ramp',
                                                   cav_start_frame=900,
                                                   white_flag=True))
    bank = F.make_demod_bank(cfg, np.complex64)
    fr = FR.Framer(cfg, bank, capture=samples)
    rv = fr.readframe(None, 33046, True)
    return cfg, fr, rv


def test_frame_number_words(decoded):
    cfg, fr, rv = decoded
    combined = rv[0]
    framenr = (int(combined[14]) << 16) | int(combined[15])
    assert framenr == fr.vbi['framenr'] == 901


def test_flags_word(decoded):
    cfg, fr, rv = decoded
    flags = (int(rv[0][12]) << 16) | int(rv[0][13])
    assert not (flags & M.FRAME_INFO_CLV)
    assert flags & (M.FRAME_INFO_CAV_ODD | M.FRAME_INFO_CAV_EVEN)
    # white flag encoded on field line 11 of both fields
    assert flags & (M.FRAME_INFO_WHITE_ODD | M.FRAME_INFO_WHITE_EVEN)


def test_vbi_code_words(decoded):
    cfg, fr, rv = decoded
    code0 = (int(rv[0][0]) << 16) | int(rv[0][1])
    # CAV picture number code F8xxxx for frame 901
    assert code0 == 0xF80901
