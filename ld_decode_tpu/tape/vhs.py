"""VHS/S-VHS tape FM video decode (reference attic/vhs/vhs-decoder.py).

The reference's VHS experiment is a parameterized FM decoder: video
bandpass 0.5-10 MHz, Hilbert demod, 4.4 MHz LPF + tape deemphasis, and
the u16 output scale minire -60 / maxire 140 at 655.34 counts per 100
IRE (vhs-decoder.py:263-268, 456).  It has no TBC and no chroma path —
tape color-under recovery never reached the reference tree.  This module
reproduces that capability through the standard batched demod bank
(`DecoderConfig(system='VHS')` selects the tape carrier map and filter
set in utils/params.py), so the whole hot path is the same overlap-save
rfft pipeline the LaserDisc profiles use, plus the analog audio chain.

Tape notes: VHS has no MTF (a LaserDisc pickup phenomenon), so decodes
always run mtf_level=0; head-switch transients show up as brief FM
dropouts and land in the same despackle/rot machinery as disc rot.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ld_decode_tpu.ops import demod as D
from ld_decode_tpu.ops.filters import DemodBank, make_demod_bank
from ld_decode_tpu.utils.params import DecoderConfig

# u16 output scale (reference attic/vhs/vhs-decoder.py:263-268)
MIN_IRE = -60.0
MAX_IRE = 140.0
OUT_SCALE = 65534.0 / (MAX_IRE - MIN_IRE)


def vhs_config(freq_mhz: float = (315.0 / 88.0) * 8.0,
               **kw) -> DecoderConfig:
    """Tape decode configuration.  The default rate is the attic
    experiment's 8*fsc capture (vhs-decoder.py:15)."""
    return DecoderConfig(system='VHS', freq_mhz=freq_mhz, **kw)


def make_vhs_bank(cfg: DecoderConfig, dtype=np.complex64) -> DemodBank:
    assert cfg.system == 'VHS', cfg.system
    return make_demod_bank(cfg, dtype=dtype)


def luma_to_u16(cfg: DecoderConfig, demod_hz: jnp.ndarray) -> jnp.ndarray:
    """Demodulated Hz -> the attic's uint16 luma scale
    (vhs-decoder.py:263-268: minn = ire0 + hz_ire*minire, 327.67/IRE)."""
    ire = (demod_hz - cfg.sys.ire0) / cfg.sys.hz_ire
    out = (ire - MIN_IRE) * OUT_SCALE
    return jnp.clip(jnp.round(out), 0, 65535).astype(jnp.uint16)


def decode_vhs(samples: jnp.ndarray, bank: DemodBank, cfg: DecoderConfig,
               nblocks: int) -> Tuple[Dict[str, jnp.ndarray],
                                      Dict[str, jnp.ndarray]]:
    """Demodulate a tape RF stream: returns (video, audio) dicts.

    video: 'luma' (uint16, attic scale), 'demod' (Hz), 'demod_sync'
    (sync-detector channel: find_sync_peaks locks onto tape line pitch,
    tests/test_vhs.py — but the full NTSC/PAL TBC does not accept the
    VHS profile; a tape TBC would need its own field-parity/scale
    branches).  audio: instantaneous carrier Hz per channel at the
    stage-1 decimated rate (empty dict when audio is disabled).
    """
    assert cfg.system == 'VHS', cfg.system
    video, audio = D.demod_stream(samples, bank, cfg, nblocks,
                                  jnp.float32(0.0))   # tape: no MTF
    video = dict(video)
    video['luma'] = luma_to_u16(cfg, video['demod'])
    return video, dict(audio) if audio else {}
