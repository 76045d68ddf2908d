"""One-command device-resident chain CLI (ldchain_tpu.py): RF capture
-> RGB + CX-expanded audio in ONE process with no intermediate .tbc
file, with output byte-identical to the two-step
`lddecode_tpu.py` -> `ldexport_tpu.py` path (reference encode-ntsc:1-5
equivalence; the round-4 verdict's 'productize the bench-only chain'
item)."""

import shutil
import sys

import numpy as np
import pytest

from ld_decode_tpu.io import loaders as L
from ld_decode_tpu.models import encode as E
from ld_decode_tpu.utils.params import DecoderConfig

sys.path.insert(0, '/root/repo')


def test_chain_cli_matches_two_step_ntsc(tmp_path, monkeypatch):
    """NTSC -F (K-map 3D) chain: RGB48 stream and expanded audio must
    equal the two-step path bit for bit (same comb emission protocol,
    same CX chunk-invariant state chain)."""
    monkeypatch.setattr(shutil, 'which', lambda *_: None)  # raw sinks
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    samples = E.encode_frames(cfg, 5, E.EncodeSpec(pattern='ramp',
                                                   cav_start_frame=900))
    lds = tmp_path / 'cap.lds'
    lds.write_bytes(L.pack_data_4_40(samples).tobytes())

    import lddecode_tpu
    import ldexport_tpu
    import ldchain_tpu
    rc = lddecode_tpu.main([str(lds), str(tmp_path / 'dec'), '-n',
                            '--batch', '6'])
    assert rc == 0
    rc = ldexport_tpu.main([str(tmp_path / 'dec.tbc'),
                            str(tmp_path / 'two'), '-F',
                            '--comb-batch', '4',
                            '-a', str(tmp_path / 'dec.pcm')])
    assert rc == 0
    rc = ldchain_tpu.main([str(lds), str(tmp_path / 'one'), '-F',
                           '--comb-batch', '4', '--depth', '1',
                           '--batch', '6', '--efm'])
    assert rc == 0
    # --efm on a capture with no EFM carrier: files written, no crash
    assert (tmp_path / 'one.efm.pcm').exists()
    assert (tmp_path / 'one.subcode.log').read_text().startswith('# frames=')

    rgb_two = np.fromfile(tmp_path / 'two.rgb', np.uint16)
    rgb_one = np.fromfile(tmp_path / 'one.rgb', np.uint16)
    assert rgb_two.size > 0 and rgb_two.size % (480 * 744 * 3) == 0
    np.testing.assert_array_equal(rgb_one, rgb_two)

    a_two = np.fromfile(tmp_path / 'two.audio.pcm', '<i2')
    a_one = np.fromfile(tmp_path / 'one.audio.pcm', '<i2')
    assert a_two.size > 3000
    np.testing.assert_array_equal(a_one, a_two)


def test_chain_cli_matches_two_step_pal(tmp_path, monkeypatch):
    """PAL chain (dim-2 comb): device-resident PAL frames through
    PALCombBatch must reproduce the two-step stream."""
    monkeypatch.setattr(shutil, 'which', lambda *_: None)
    cfg = DecoderConfig(system='PAL', freq_mhz=40.0)
    samples = E.encode_frames(cfg, 4, E.EncodeSpec(pattern='palbars',
                                                   cav_start_frame=900))
    lds = tmp_path / 'cap.lds'
    lds.write_bytes(L.pack_data_4_40(samples).tobytes())

    import lddecode_tpu
    import ldexport_tpu
    import ldchain_tpu
    rc = lddecode_tpu.main([str(lds), str(tmp_path / 'dec'), '-p',
                            '--batch', '5'])
    assert rc == 0
    rc = ldexport_tpu.main([str(tmp_path / 'dec.tbc'),
                            str(tmp_path / 'two'), '--pal', '-d', '2',
                            '--comb-batch', '3'])
    assert rc == 0
    rc = ldchain_tpu.main([str(lds), str(tmp_path / 'one'), '--pal',
                           '-d', '2', '--comb-batch', '3',
                           '--depth', '1', '--batch', '5', '--no-audio'])
    assert rc == 0

    rgb_two = np.fromfile(tmp_path / 'two.rgb', np.uint16)
    rgb_one = np.fromfile(tmp_path / 'one.rgb', np.uint16)
    assert rgb_two.size > 0 and rgb_two.size % (576 * 1135 * 3) == 0
    np.testing.assert_array_equal(rgb_one, rgb_two)
