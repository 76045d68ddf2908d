"""CX noise-reduction expander (reference cx-expander.cxx).

Per-sample chain on 48 kHz stereo:
  * 500 Hz 4-pole butter HPF per channel feeds the envelope detector
    (filters a500_48k / a40h_48k from reference filtermaker.py:233-246)
  * dual-speed rectified envelope followers (cx-expander.cxx:53-60):
      fast' = fast*.9998;        if m > fast': fast' = min(m, fast' + m*.040)
      slow' = slow*.999985;      if m > slow': slow' = min(m, slow' + m*.0020)
  * gain 1 + val/(factor*m14db) with val = max(fast, slow) - factor*m14db,
    m14db = -14 dB, factor 6500 (cx-expander.cxx:62-75)
  * 40 Hz DC-block, x0.4 headroom (cx-expander.cxx:77-84)

The LTI filters are vectorized (scipy on host for file-level processing;
the envelope followers are the one true nonlinear recurrence in the
system).  Short inputs (a frame of audio) run a host loop — a device
dispatch costs ~30-400 ms through the axon tunnel; file-level inputs run
the BLOCK-PARALLEL device evaluation (`envelope_followers_blocked`):
O(warm+core) sequential depth instead of O(n), exact via a monotone
two-sided bound certificate, with the O(n) `lax.scan` kept as the
fallback for the (pathological) uncertified case.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import scipy.signal as sps

import jax
import jax.numpy as jnp

M14DB = 0.199526231496888
FACTOR = 6500.0


def _filters():
    b5, a5 = sps.butter(4, 500.0 / 24000.0, btype='highpass')
    b40, a40 = sps.butter(4, 40.0 / 24000.0, btype='highpass')
    return (np.asarray(b5), np.asarray(a5)), (np.asarray(b40), np.asarray(a40))


F500, F40 = _filters()


def envelope_followers(maxenv: np.ndarray, fast0: float = 0.0,
                       slow0: float = 0.0):
    """The dual-speed envelope recurrences.

    Short inputs (a frame's worth of audio, ~1600 samples) run as a host
    loop: a device dispatch costs ~30-400 ms through the axon tunnel,
    which made per-frame CX the silent bottleneck of the full decode
    chain.  Long inputs (file-level processing) run the block-parallel
    device path, falling back to the O(n) scan only when its exactness
    certificate fails (see envelope_followers_blocked below)."""
    if len(maxenv) < 32768:
        fast, slow = float(fast0), float(slow0)
        out_f = np.empty(len(maxenv))
        out_s = np.empty(len(maxenv))
        for i, m in enumerate(np.asarray(maxenv, np.float64)):
            fast *= .9998
            if m > fast:
                fast = min(m, fast + m * .040)
            slow *= .999985
            if m > slow:
                slow = min(m, slow + m * .0020)
            out_f[i] = fast
            out_s[i] = slow
        return out_f, out_s

    fast, slow, ok = envelope_followers_blocked(maxenv, fast0, slow0)
    if not ok:
        return _envelope_scan(maxenv, fast0, slow0)
    return fast, slow


def _env_step(carry, m):
    fast, slow = carry
    fast = fast * .9998
    fast = jnp.where(m > fast, jnp.minimum(m, fast + m * .040), fast)
    slow = slow * .999985
    slow = jnp.where(m > slow, jnp.minimum(m, slow + m * .0020), slow)
    return (fast, slow), (fast, slow)


def _envelope_scan(maxenv: np.ndarray, fast0: float, slow0: float):
    """O(n)-depth sequential device scan (the exact reference recurrence,
    cx-expander.cxx:53-60); the fallback when the blocked certificate
    fails."""
    (_, _), (fast, slow) = jax.lax.scan(
        _env_step, (jnp.float32(fast0), jnp.float32(slow0)),
        jnp.asarray(maxenv, jnp.float32))
    return np.asarray(fast), np.asarray(slow)


# ---------------------------------------------------------------------------
# block-parallel envelopes: O(warm+core) depth instead of O(n)
#
# The followers are monotone in their state: running a block from a state
# BELOW the true entry state lower-bounds every subsequent value, from a
# state above upper-bounds it.  Each block therefore scans from both
# bounds (lo = 0, up = the global envelope ceiling) across a `warm`
# sample overlap; wherever the two runs agree on the gain-relevant
# quantity val = relu(max(fast, slow) − FACTOR·M14DB), the true value is
# pinned between them and the block result is exact to that tolerance —
# no matter what the real carry was.  Decay contracts the bounds at
# 0.9998/0.999985 per sample and any attack clamp (state pulled to the
# input) collapses them instantly, so real programme material converges
# in far fewer than `warm` samples; a genuinely unconverged block (an
# envelope decaying at exactly the slow-follower rate for seconds) is
# detected and the caller falls back to the sequential scan.

CX_BLOCK_CORE = 131072            # emitted samples per block (2.7 s)
CX_BLOCK_WARM = 262144            # overlap: 65536·0.999985^262144 < pivot
_ENV_CEIL = 65536.0               # >= any |500 Hz HPF| of int16 audio


@functools.partial(jax.jit, static_argnames=('core', 'warm', 'nb'))
def _blocked_envelopes(menv, fast0, slow0, core: int, warm: int, nb: int):
    n = menv.shape[0]
    padded = jnp.pad(menv.astype(jnp.float32), (warm, nb * core - n))

    def block(k):
        win = jax.lax.dynamic_slice(padded, (k * core,), (warm + core,))
        gpos = k * core + jnp.arange(warm + core) - warm
        valid = gpos >= 0             # head padding: no-op steps
        # any block whose warm window reaches back to sample 0 sees the
        # ENTIRE history from the known initial state -> its bounds can
        # both start there and the block is exact by construction (not
        # just block 0: block 1's warm region is truncated by the file
        # start, and seeding it from (0, ceiling) would leave its bounds
        # apart after only warm/2 decay steps)
        first = (k * core - warm) <= 0
        lo0 = (jnp.where(first, fast0, 0.0), jnp.where(first, slow0, 0.0))
        up0 = (jnp.where(first, fast0, _ENV_CEIL),
               jnp.where(first, slow0, _ENV_CEIL))

        def step(carry, x):
            m, v = x
            (flo, slo), (fup, sup) = carry
            nlo, _ = _env_step((flo, slo), m)
            nup, _ = _env_step((fup, sup), m)
            pick = lambda new, old: jnp.where(v, new, old)
            lo = (pick(nlo[0], flo), pick(nlo[1], slo))
            up = (pick(nup[0], fup), pick(nup[1], sup))
            return (lo, up), (lo[0], lo[1], up[0], up[1])

        carry, _ = jax.lax.scan(step, (lo0, up0),
                                (win[:warm], valid[:warm]), unroll=8)
        _, out = jax.lax.scan(step, carry, (win[warm:], valid[warm:]),
                              unroll=8)
        return out

    flo, slo, fup, sup = jax.vmap(block)(jnp.arange(nb))
    flo, slo, fup, sup = (a.reshape(-1)[:n] for a in (flo, slo, fup, sup))
    pivot = jnp.float32(FACTOR * M14DB)
    dval = (jnp.maximum(jnp.maximum(fup, sup) - pivot, 0.0)
            - jnp.maximum(jnp.maximum(flo, slo) - pivot, 0.0))
    # end-state gap: once the bounds meet they stay met (the recurrence
    # is deterministic), so a tiny final gap certifies the LAST state as
    # exact — required when the caller carries it into a next chunk
    end_gap = jnp.maximum(jnp.abs(fup[-1] - flo[-1]),
                          jnp.abs(sup[-1] - slo[-1]))
    return flo, slo, jnp.max(dval), end_gap


def envelope_followers_blocked(maxenv: np.ndarray, fast0: float = 0.0,
                               slow0: float = 0.0, core: int = CX_BLOCK_CORE,
                               warm: int = CX_BLOCK_WARM,
                               tol: float = 0.05):
    """Block-parallel envelope followers.  Returns (fast, slow,
    converged); converged=False means the bound certificate exceeded
    `tol` on the gain input somewhere (or the final carry state is not
    pinned) and the caller must use `_envelope_scan` instead."""
    # the non-first blocks seed their upper bound at _ENV_CEIL, which is
    # only a valid bound if the entry state is <= the ceiling — a wild
    # caller-supplied state above it could keep the true state over the
    # bound past the warm window, passing the certificate on a wrong
    # result (in-tree callers always satisfy this; assert it)
    assert fast0 <= _ENV_CEIL and slow0 <= _ENV_CEIL, (fast0, slow0)
    menv = jnp.asarray(maxenv, jnp.float32)
    n = int(menv.shape[0])
    nb = -(-n // core)
    fast, slow, dval, end_gap = _blocked_envelopes(
        menv, jnp.float32(fast0), jnp.float32(slow0), core, warm, nb)
    # converged = every output's gain input certified AND the final
    # state exact (a streaming caller carries it into its next chunk as
    # truth; real audio clamps the bounds together long before the end,
    # a quiet tail falls back to the exact scan instead)
    ok = bool(dval <= tol) and bool(end_gap <= 1e-3)
    return np.asarray(fast), np.asarray(slow), ok


class CXExpander:
    """Streaming CX expansion with carried filter/envelope state
    (bit-stream compatible with `cx <in.pcm >out.pcm`)."""

    def __init__(self):
        self.zi500_l = sps.lfilter_zi(*F500) * 0.0
        self.zi500_r = self.zi500_l.copy()
        self.zi40_l = sps.lfilter_zi(*F40) * 0.0
        self.zi40_r = self.zi40_l.copy()
        self.fast = 0.0
        self.slow = 0.0

    def process(self, pcm: np.ndarray) -> np.ndarray:
        """pcm: interleaved uint16 (offset-32768) or int16 stereo samples.
        Returns expanded interleaved uint16 like the reference tool."""
        pcm = np.asarray(pcm)
        if pcm.dtype == np.int16:
            left = pcm[0::2].astype(np.float64)
            right = pcm[1::2].astype(np.float64)
        else:
            left = pcm[0::2].astype(np.float64) - 32768.0
            right = pcm[1::2].astype(np.float64) - 32768.0

        fl, self.zi500_l = sps.lfilter(*F500, left, zi=self.zi500_l)
        frr, self.zi500_r = sps.lfilter(*F500, right, zi=self.zi500_r)
        menv = np.maximum(np.abs(fl), np.abs(frr))

        fast, slow = envelope_followers(menv, self.fast, self.slow)
        if len(fast):
            self.fast = float(fast[-1])
            self.slow = float(slow[-1])

        val = np.maximum(fast, slow) - (FACTOR * M14DB)
        val = np.maximum(val, 0.0)
        gain = M14DB * (1.0 + val / (FACTOR * M14DB))

        ol = left * gain
        orr = right * gain
        ol, self.zi40_l = sps.lfilter(*F40, ol, zi=self.zi40_l)
        orr, self.zi40_r = sps.lfilter(*F40, orr, zi=self.zi40_r)
        ol *= .4
        orr *= .4

        out = np.empty(len(ol) * 2, np.float64)
        out[0::2] = ol
        out[1::2] = orr
        return np.clip(out + 32768.0, 0, 65535).astype(np.uint16)
