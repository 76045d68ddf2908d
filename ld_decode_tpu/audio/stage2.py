"""Second-stage audio filtering + decimation (device side).

Mirrors the reference's whole-field stage-2 pass
(reference lddecode_core.py:332-371 `audio_phase2` / `runfilter_audio_phase2`):
16384-sample FFT blocks over the stage-1 audio stream, frequency-domain
slice to 1/4 rate, 21 kHz LPF, overlap-assembled with a 64-sample head skip.
The block layout (including the reference's quirky final block at
`end - blocklen - 1`) is replicated exactly so outputs align sample-for-sample.

Input spectra are real, so the fdslice2 gather of [first 2048, last 2048]
bins of the full FFT is exactly the one-sided 0..2048 bins of the decimated
signal — a single rfft slice.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ld_decode_tpu.ops.demod import cx
from ld_decode_tpu.ops.filters import DemodBank


def _block_starts(n: int, blocklen: int, askip: int, fdiv2: int):
    sjump = blocklen - askip * fdiv2
    starts = [0]
    starts += list(range(sjump, n - sjump, sjump))
    starts.append(n - blocklen - 1)
    return starts, sjump


@functools.partial(jax.jit, static_argnames=('n', 'blocklen'))
def audio_stage2(left: jnp.ndarray, right: jnp.ndarray, bank: DemodBank,
                 n: int, blocklen: int = 16384
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stage-2 filter both channels; input length n (static), output n//fdiv2."""
    fdiv2 = bank.a_fdiv2
    askip = 64
    starts, sjump = _block_starts(n, blocklen, askip, fdiv2)
    outlen_blk = blocklen // fdiv2
    n_out = n // fdiv2

    starts_arr = jnp.asarray(starts, dtype=jnp.int32)
    idx = starts_arr[:, None] + jnp.arange(blocklen)[None, :]
    lpf = cx(bank.a_lpf2_os)
    nbins = blocklen // (fdiv2 * 2) + 1     # one-sided bins of decimated rate

    def run(chan):
        blocks = chan[idx]
        spec = jnp.fft.rfft(blocks)[:, :nbins] * lpf[:nbins]
        out = jnp.fft.irfft(spec, outlen_blk) / fdiv2
        parts = [out[0]]
        for bi in range(1, len(starts) - 1):
            parts.append(out[bi, askip:])
        head = jnp.concatenate(parts)[:n_out]
        head = jnp.pad(head, (0, max(0, n_out - head.shape[0])))
        tail = out[-1, askip:]
        return jnp.concatenate([head[:n_out - tail.shape[0]], tail])

    return run(left), run(right)
