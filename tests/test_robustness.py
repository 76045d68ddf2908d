"""Failure-path coverage: rot/dropout corruption, resync, seek, CLI."""

import os
import subprocess
import sys

import numpy as np
import pytest

from ld_decode_tpu.ops import filters as F
from ld_decode_tpu.models import encode as E
from ld_decode_tpu.io import loaders as L
from ld_decode_tpu.tbc import framer as FR
from ld_decode_tpu.utils.params import DecoderConfig


@pytest.fixture(scope='module')
def cfg():
    return DecoderConfig(system='NTSC', freq_mhz=40.0)


def test_dropout_rot_recovery(cfg):
    """Burst noise (disc rot) inside picture lines: the decoder must keep
    field structure and repair the affected linelocs (reference repair
    semantics, lddecode_core.py:707-713, 765-767)."""
    samples = E.encode_frames(cfg, 6, E.EncodeSpec(pattern='flat50',
                                                   cav_start_frame=900))
    rng = np.random.default_rng(0)
    corrupted = np.array(samples)
    # 12 rot events of ~8 µs in the second frame
    base = 1500000
    for _ in range(12):
        p = base + int(rng.integers(0, 1200000))
        corrupted[p:p + 320] = rng.integers(0, 1024, 320)

    bank = F.make_demod_bank(cfg, np.complex64)
    fr = FR.Framer(cfg, bank, capture=corrupted)
    rv1 = fr.readframe(None, 33046, True)
    assert rv1[0] is not None
    rv2 = fr.readframe(None, rv1[2], False)
    assert rv2[0] is not None
    # structure survives: both fields valid with sane linecounts
    for f in rv2[3]:
        assert f.valid and f.linecount in (262, 263)
        d = np.diff(f.linelocs[12:-12])
        assert np.abs(d - cfg.linelen).max() < cfg.freq_mhz * 2


def test_garbage_then_signal_resync(cfg):
    """Noise lead-ins: a small one must be ridden through; a window-filling
    one triggers the reference's second-scale resync jumps, which on a
    short capture cleanly EOF (no exception) — the same contract as the
    reference policy (lddecode_core.py:1208-1217)."""
    samples = E.encode_frames(cfg, 3, E.EncodeSpec(pattern='flat50',
                                                   cav_start_frame=900))
    rng = np.random.default_rng(1)
    bank = F.make_demod_bank(cfg, np.complex64)

    lead = rng.integers(400, 600, 60_000).astype(np.uint16)
    fr = FR.Framer(cfg, bank, capture=np.concatenate([lead, samples]))
    rv = fr.readframe(None, 33046, True)
    assert rv[0] is not None
    assert fr.vbi['framenr'] is not None

    big = rng.integers(400, 600, 2_000_000).astype(np.uint16)
    fr2 = FR.Framer(cfg, bank, capture=np.concatenate([big, samples]))
    rv2 = fr2.readframe(None, 33046, True)   # may EOF; must not raise
    assert rv2[0] is None or fr2.vbi['framenr'] is not None


def test_findframe_seek(cfg):
    samples = E.encode_frames(cfg, 8, E.EncodeSpec(pattern='flat50',
                                                   cav_start_frame=900))
    bank = F.make_demod_bank(cfg, np.complex64)
    fr = FR.Framer(cfg, bank, capture=samples)
    pos = FR.findframe(None, fr, 903, 33046)
    assert pos is not None
    rv = fr.readframe(None, pos, False)
    assert abs(fr.vbi['framenr'] - 903) <= 1


def test_cli_decode_lds(cfg, tmp_path):
    """lddecode_tpu.py end to end on a real .lds file."""
    samples = E.encode_frames(cfg, 3, E.EncodeSpec(pattern='flat50',
                                                   cav_start_frame=900))
    lds = tmp_path / 'cap.lds'
    lds.write_bytes(L.pack_data_4_40(samples).tobytes())

    sys.path.insert(0, '/root/repo')
    import lddecode_tpu
    rc = lddecode_tpu.main([str(lds), str(tmp_path / 'out'), '-l', '1'])
    assert rc == 0
    tbc = np.fromfile(tmp_path / 'out.tbc', np.uint16)
    assert len(tbc) == 910 * 525
    pcm = np.fromfile(tmp_path / 'out.pcm', '<i2')
    assert len(pcm) > 3000
    # frame number encoded in line-0 metadata word 7
    assert ((int(tbc[14]) << 16) | int(tbc[15])) in (900, 901, 902)


def test_despackle_conceals_rot(cfg):
    from ld_decode_tpu.tbc.despackle import despackle
    rng = np.random.default_rng(5)
    pic = np.full((525, 910), 20000, np.uint16)
    # on the .tbc scale u16 65535 is only ~136 IRE, so (like real rot,
    # which clips to 0 at the 16-bit scale) only the low side triggers
    pic[100, 200:204] = 5                # rot dropouts (<-20 IRE)
    pic[300, 400] = 10
    out = despackle(pic).reshape(525, 910)
    assert abs(int(out[100, 201]) - 20000) < 4
    assert abs(int(out[300, 400]) - 20000) < 4
    # untouched elsewhere
    assert out[250, 500] == 20000
    # below line 22 never repaired
    pic2 = np.full((525, 910), 20000, np.uint16)
    pic2[10, 200] = 5
    out2 = despackle(pic2).reshape(525, 910)
    assert out2[10, 200] == 5


def test_despackle_rot_level(cfg):
    """-r rot level knob (reference app/tbc/main.cpp:165-168): widens or
    narrows the despackle detection window around 0..100 IRE."""
    from ld_decode_tpu.tbc.despackle import despackle
    pic = np.full((525, 910), 20000, np.uint16)
    pic[100, 200] = 5                    # ~-42.8 IRE on the .tbc scale
    # default window (-20..140): a hit
    out = despackle(pic, rot_level=40.0).reshape(525, 910)
    assert abs(int(out[100, 200]) - 20000) < 4
    # widened tolerance (-50..200): not rot any more
    out2 = despackle(pic, rot_level=100.0).reshape(525, 910)
    assert out2[100, 200] == 5


def test_flip_fields_weave(cfg):
    """-f field flip (reference app/tbc/main.cpp:152-154): swaps which
    field lands on even vs odd output rows."""
    from types import SimpleNamespace
    bank = F.make_demod_bank(cfg, np.complex64)
    W = cfg.sys.outlinelen
    half = 262
    fa = SimpleNamespace(dspicture=np.full(half * W, 111, np.uint16),
                         linecount=half)
    fb = SimpleNamespace(dspicture=np.full(half * W, 222, np.uint16),
                         linecount=half)
    fr = FR.Framer(cfg, bank)
    rows = fr.formatoutput([fa, fb]).reshape(-1, W)
    assert rows[0, 0] == 111 and rows[1, 0] == 222
    fr_flip = FR.Framer(cfg, bank, flip_fields=True)
    rows_f = fr_flip.formatoutput([fa, fb]).reshape(-1, W)
    assert rows_f[0, 0] == 222 and rows_f[1, 0] == 111


def test_bff_pairing(cfg):
    """-m magnetic video mode (reference app/tbc/main.cpp:148-150):
    frames pair bottom-field-first instead of sys.topfirst."""
    samples = E.encode_frames(cfg, 4, E.EncodeSpec(pattern='flat50',
                                                   cav_start_frame=900))
    bank = F.make_demod_bank(cfg, np.complex64)
    for bff in (False, True):
        # batched mode so FieldResult.readsample records decode order
        fr = FR.Framer(cfg, bank, capture=samples, batch=4, bff=bff)
        rv = fr.readframe(None, 33046, True)
        assert rv[0] is not None
        top, bot = rv[3]
        assert top.istop and not bot.istop
        # NTSC is top-first: normally the bottom field is decoded after
        # the top; in magnetic mode the pair starts on the bottom field
        if bff:
            assert bot.readsample < top.readsample
        else:
            assert top.readsample < bot.readsample


def test_cli_freeze_frame(cfg, tmp_path):
    """-z freeze-frame (reference app/tbc/main.cpp:160-162): one decoded
    frame repeats for the requested length."""
    samples = E.encode_frames(cfg, 3, E.EncodeSpec(pattern='flat50',
                                                   cav_start_frame=900))
    lds = tmp_path / 'cap.lds'
    lds.write_bytes(L.pack_data_4_40(samples).tobytes())

    sys.path.insert(0, '/root/repo')
    import lddecode_tpu
    rc = lddecode_tpu.main([str(lds), str(tmp_path / 'out'),
                            '-l', '3', '-z'])
    assert rc == 0
    tbc = np.fromfile(tmp_path / 'out.tbc', np.uint16)
    assert len(tbc) == 3 * 910 * 525
    frames = tbc.reshape(3, -1)
    assert np.array_equal(frames[0], frames[1])
    assert np.array_equal(frames[0], frames[2])


def test_cli_audio_only(cfg, tmp_path):
    """-A/--audio-only (reference app/tbc -s, main.cpp:157-158,
    tbcpal.cpp:402): the decode runs but no video file is written."""
    samples = E.encode_frames(cfg, 3, E.EncodeSpec(pattern='flat50',
                                                   cav_start_frame=900))
    lds = tmp_path / 'cap.lds'
    lds.write_bytes(L.pack_data_4_40(samples).tobytes())

    sys.path.insert(0, '/root/repo')
    import lddecode_tpu
    rc = lddecode_tpu.main([str(lds), str(tmp_path / 'out'),
                            '-l', '1', '-A'])
    assert rc == 0
    assert not os.path.exists(tmp_path / 'out.tbc')
    pcm = np.fromfile(tmp_path / 'out.pcm', '<i2')
    assert len(pcm) > 3000


def test_cxadc_rate_field_decode():
    """End-to-end field decode at the cxADC 28.8 MSa/s capture rate
    (reference lddecode.py:55 '.r30'/8-bit path, tbc.cpp:166-169)."""
    import jax.numpy as jnp
    from ld_decode_tpu.utils.params import DecoderConfig
    from ld_decode_tpu.models import encode as E
    from ld_decode_tpu.ops import filters as F
    from ld_decode_tpu.tbc.framer import Framer

    c = DecoderConfig(system='NTSC', freq_mhz=28.8)
    samples = E.encode_frames(c, 3, E.EncodeSpec(pattern='flat50',
                                                 cav_start_frame=7))
    bank = F.make_demod_bank(c, dtype=np.complex64)
    fr = Framer(c, bank, capture=samples, batch=4, nblocks=50)
    f0, rs0, _ = fr.readfield(None, 20000)
    assert f0 is not None and f0.valid
    frame, audio, nxt, fields = fr.readframe(None, rs0, True)
    assert frame is not None
    assert fields[0].linecount in (c.sys.frame_lines // 2,
                                   c.sys.frame_lines // 2 + 1)
    # flat-50 pattern: active picture sits at the 50-IRE output level
    W = c.sys.outlinelen
    pic = frame.reshape(-1, W)
    mid = pic[60:200, W // 4:W // 2].astype(np.float64)
    out_scale = float(0xc800 - 0x0400) / (100 - c.sys.vsync_ire)
    ire = (mid - 1024) / out_scale + c.sys.vsync_ire
    assert abs(np.median(ire) - 50.0) < 1.5, np.median(ire)


def test_cli_ldview_preview(cfg, tmp_path):
    """ldview_tpu.py (reference attic2/ldview): seek + one-frame PNG."""
    samples = E.encode_frames(cfg, 6, E.EncodeSpec(pattern='bars',
                                                   cav_start_frame=900))
    lds = tmp_path / 'cap.lds'
    lds.write_bytes(L.pack_data_4_40(samples).tobytes())

    sys.path.insert(0, '/root/repo')
    import ldview_tpu
    out = tmp_path / 'preview.png'
    rc = ldview_tpu.main([str(lds), '902', str(out), '-d', '2'])
    assert rc == 0
    from PIL import Image
    img = np.asarray(Image.open(out))
    assert img.shape == (480, 744, 3)
    assert img.max() > 100          # colorbars are bright


def test_findframe_early_hit(cfg):
    """A probe that already lands on the target (or within CLV tolerance)
    must return a position AT the frame, not 10 s past it."""
    samples = E.encode_frames(cfg, 8, E.EncodeSpec(pattern='flat50',
                                                   cav_start_frame=900))
    bank = F.make_demod_bank(cfg, np.complex64)
    fr = FR.Framer(cfg, bank, capture=samples)
    pos = FR.findframe(None, fr, 901, 33046)   # first probe reads ~900/901
    assert pos is not None
    assert pos < len(samples)                  # not stranded past EOF
    rv = fr.readframe(None, pos, False)
    assert rv[0] is not None
    assert abs(fr.vbi['framenr'] - 901) <= 1


def test_vhs_profile_rejected_by_tbc(cfg):
    """The VHS profile is demod-only; the TBC refuses it loudly instead
    of silently taking PAL branches."""
    from ld_decode_tpu.tape.vhs import vhs_config, make_vhs_bank
    vcfg = vhs_config()
    bank = F.make_demod_bank(vcfg, np.complex64)
    with pytest.raises(ValueError, match='demod-only'):
        FR.Framer(vcfg, bank, capture=np.zeros(10_000_000, np.uint16))


def test_cli_ldexport_rgb(cfg, tmp_path):
    """ldexport_tpu.py (reference encode-ntsc): .tbc+.pcm -> RGB48 + CX
    audio (raw-file branch; no ffmpeg in this image)."""
    samples = E.encode_frames(cfg, 3, E.EncodeSpec(pattern='bars',
                                                   cav_start_frame=900))
    lds = tmp_path / 'cap.lds'
    lds.write_bytes(L.pack_data_4_40(samples).tobytes())

    sys.path.insert(0, '/root/repo')
    import lddecode_tpu
    import ldexport_tpu
    rc = lddecode_tpu.main([str(lds), str(tmp_path / 'dec'), '-l', '2'])
    assert rc == 0
    rc = ldexport_tpu.main([str(tmp_path / 'dec.tbc'),
                            str(tmp_path / 'mov'), '-d', '2',
                            '-a', str(tmp_path / 'dec.pcm')])
    assert rc == 0
    rgb = np.fromfile(tmp_path / 'mov.rgb', '<u2')
    frame_px = 480 * 744 * 3
    assert rgb.size % frame_px == 0 and rgb.size >= frame_px
    assert rgb.max() > 10000            # colorbars are bright
    pcm = np.fromfile(tmp_path / 'mov.audio.pcm', '<i2')
    assert pcm.size > 3000

    # --comb-batch: the windowed device driver must write the same
    # stream as the frame-at-a-time one (1-LSB f32 fusion tolerance)
    rc = ldexport_tpu.main([str(tmp_path / 'dec.tbc'),
                            str(tmp_path / 'movb'), '-d', '2',
                            '--comb-batch', '2'])
    assert rc == 0
    rgb_b = np.fromfile(tmp_path / 'movb.rgb', '<u2')
    assert rgb_b.size == rgb.size
    assert np.abs(rgb_b.astype(np.int64) - rgb.astype(np.int64)).max() <= 1

    # comb tunable flags (reference comb-ntsc getopt set): -8 8-bit
    # output, -v full field height, -L chroma LPF off, -I black IRE,
    # -f per-frame image files
    rc = ldexport_tpu.main([str(tmp_path / 'dec.tbc'),
                            str(tmp_path / 'mov8'), '-d', '2', '-8',
                            '-v', '-L', '-I', '0', '-n', '2',
                            '--write-images'])
    assert rc == 0
    frame8_px = 525 * 744 * 3            # full height, 8-bit
    rgb8 = np.fromfile(tmp_path / 'mov8_0.rgb', np.uint8)
    assert rgb8.size == frame8_px
    assert rgb8.max() > 100


def test_cli_cut_mode(cfg, tmp_path):
    """lddecode_tpu.py -c (reference lddecode.py:65-81): re-encode a
    frame range to .r16, which must itself decode to those frames."""
    samples = E.encode_frames(cfg, 6, E.EncodeSpec(pattern='flat50',
                                                   cav_start_frame=900))
    lds = tmp_path / 'cap.lds'
    lds.write_bytes(L.pack_data_4_40(samples).tobytes())

    sys.path.insert(0, '/root/repo')
    import lddecode_tpu
    rc = lddecode_tpu.main([str(lds), str(tmp_path / 'cut'),
                            '-S', '902', '-E', '904', '-c'])
    assert rc == 0
    r16 = np.fromfile(tmp_path / 'cut.r16', '<i2')
    spf = int(cfg.freq_hz / cfg.sys.fps)
    assert spf < r16.size < 4 * spf           # ~2 frames + margin

    # the cut decodes on its own and lands on the requested range
    rc = lddecode_tpu.main([str(tmp_path / 'cut.r16'),
                            str(tmp_path / 'out'), '-l', '1'])
    assert rc == 0
    tbc = np.fromfile(tmp_path / 'out.tbc', np.uint16)
    assert len(tbc) == 910 * 525
    framenr = (int(tbc[14]) << 16) | int(tbc[15])
    assert 901 <= framenr <= 904, framenr


def test_cli_ldexport_training_mode(tmp_path):
    """ldexport -t (reference comb -t): forces dim 3 + per-frame images
    and writes the <out>.train.npz training pairs."""
    from ld_decode_tpu.comb import comb_ntsc as CN
    from ld_decode_tpu.models import nn_comb as NC
    import jax

    H, W = CN.IN_Y, CN.IN_X
    inp, *_ = NC.synth_batch(jax.random.PRNGKey(4), 4, H, W)
    frames = np.clip((np.asarray(inp[..., 0]) + 1.0) * 32768.0,
                     0, 65535).astype(np.uint16)
    flips = np.asarray(inp[:, :, 0, 1]) > 0
    frames[..., 0] = np.where(flips, 16384, 32768)
    tbc = tmp_path / 'cap.tbc'
    tbc.write_bytes(frames.tobytes())

    sys.path.insert(0, '/root/repo')
    import ldexport_tpu
    rc = ldexport_tpu.main([str(tbc), str(tmp_path / 'mov'), '-t', '-F'])
    assert rc == 0
    d = np.load(tmp_path / 'mov.train.npz')
    assert d['inputs'].shape == (2, H, W, 3)
    # training mode writes per-frame images (reference f_writeimages)
    assert (tmp_path / 'mov_0.rgb').exists()
