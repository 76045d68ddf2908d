"""Neural chroma separator (the attic NN-comb capability, TPU-native).

The reference prototyped a FANN MLP that replaces the hand-crafted 2D
comb's chroma estimate: a 3x9 window of raw composite samples in, the
per-pixel chroma plane out (attic/combg2-4nn.cxx:245-283 `Split2D_NN`,
attic/nntrain.py).  It trained offline against reference-disc decodes
and ran per pixel on the CPU.

This is the TPU-native successor:

* the model is a small dilated CNN in flax — the (lines +-2, samples +-8)
  receptive field of the reference MLP, but applied to the whole frame as
  three conv layers that XLA tiles onto the MXU (bf16-friendly);
* inputs are the scaled composite plus the two subcarrier basis channels
  (the 4fsc I/Q carriers with the per-line phase flag folded in), so the
  net sees the demodulation grid instead of having to learn it;
* training is self-supervised on synthetic composites from a generator
  with dense ground-truth YIQ (the reference needed hand-built .train
  files from real discs); the jitted optax train step data-parallelizes
  over a device mesh like any other model here;
* inference integrates exactly where the reference's did: the predicted
  chroma plane feeds the standard differentiable comb tail
  (split_iq -> adjust_y -> NR -> RGB) from comb/comb_ntsc.py.

Chroma/carrier convention (derived from split_iq, comb-ntsc.cxx:414-483):
the comb tail recovers i/q from the chroma-plane estimate `clp` via
cavg = clp/2 sign-flipped on non-inverted lines, si = +-cavg at even
phases, sq = -+cavg at odd phases.  A composite with chroma
C = flip(y) * (I*ci - Q*cq), ci = [1,0,-1,0], cq = [0,1,0,-1] therefore
demodulates to (I, Q) when clp = 2*flip*C; the generator and the
training target use exactly this identity.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import flax.linen as nn
except ImportError:                                    # pragma: no cover
    nn = None

from ld_decode_tpu.comb import comb_ntsc as CN

IRESCALE = CN.IRESCALE
IREBASE = CN.IREBASE


def _carriers(h: int, w: int, flip: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                          jnp.ndarray]:
    """4fsc I/Q sampling bases with the per-line phase sign folded in.
    flip: (h,) float32 +-1 (+1 on lines whose .tbc flag is 16384)."""
    ph = jnp.arange(w) % 4
    ci = jnp.where(ph == 0, 1.0, jnp.where(ph == 2, -1.0, 0.0))
    cq = jnp.where(ph == 1, 1.0, jnp.where(ph == 3, -1.0, 0.0))
    return flip[:, None] * ci[None, :], flip[:, None] * cq[None, :]


if nn is not None:
    class NNComb(nn.Module):
        """Dilated CNN chroma estimator.

        Input (B, H, W, 3): [composite scaled to ~[-1,1], carrier_i,
        carrier_q].  Output (B, H, W): the chroma plane `clp` in raw u16
        units, ready for split_iq.  Line dilation 2 = the comb's
        same-field +-2 frame-line neighbors."""
        features: Tuple[int, ...] = (24, 24)

        @nn.compact
        def __call__(self, x):
            h = x
            for f in self.features:
                h = nn.Conv(f, (3, 9), kernel_dilation=(2, 1),
                            padding='SAME')(h)
                h = nn.gelu(h)
            out = nn.Conv(1, (3, 3), padding='SAME')(h)
            return out[..., 0] * (30.0 * IRESCALE)


    def model_inputs(raw: jnp.ndarray, flip: jnp.ndarray) -> jnp.ndarray:
        """(H, W) raw composite + (H,) +-1 line flags -> (H, W, 3)."""
        ci, cq = _carriers(raw.shape[0], raw.shape[1], flip)
        comp = raw.astype(jnp.float32) / 32768.0 - 1.0
        return jnp.stack([comp, ci, cq], axis=-1)


# ---------------------------------------------------------------------------
# synthetic training data: dense ground-truth (Y, I, Q) -> composite

def _smooth_field(key, shape, cutoff_px: float):
    """Random band-limited field: noise box-blurred twice along the last
    two axes (cumsum differences — no conv needed)."""
    x = jax.random.normal(key, shape)
    k = max(int(cutoff_px), 1)

    def box(a, axis):
        c = jnp.cumsum(jnp.pad(a, [(k, 0) if i == axis else (0, 0)
                                   for i in range(a.ndim)]), axis=axis)
        return (jax.lax.slice_in_dim(c, k, k + a.shape[axis], axis=axis)
                - jax.lax.slice_in_dim(c, 0, a.shape[axis], axis=axis)) / k

    for axis in (x.ndim - 2, x.ndim - 1):
        x = box(box(x, axis), axis)
    return x * (k ** 0.9)          # keep variance roughly scale-free


def synth_batch(key, batch: int, h: int, w: int):
    """Random smooth YIQ scenes + hard edges, composed per the comb's
    demodulation convention.  Returns (inputs (B,h,w,3), clp_target,
    y_true, i_true, q_true) in raw u16 units."""
    keys = jax.random.split(key, 8)
    # u16-IRE convention of the .tbc comb input: 0 IRE sits 40 IRE above
    # IREBASE (to_rgb: ire = -40 + (u16 - IREBASE)/IRESCALE), so luma in
    # 45..100 here spans video levels ~5..60 IRE
    Y = 45 + 40 * jax.nn.sigmoid(
        _smooth_field(keys[0], (batch, h, w), 13) * 3)
    # sharp luma detail (where 1D combs leak into chroma): quantized
    # blob fields give flat regions separated by hard edges
    Y = Y + 14 * (jnp.floor(_smooth_field(keys[5], (batch, h, w), 7)
                            * 2.5) % 2)
    I = 28 * _smooth_field(keys[1], (batch, h, w), 17)
    Q = 28 * _smooth_field(keys[2], (batch, h, w), 17)
    # hard chroma edges (color bars look): quantize a ramp
    step = jnp.floor(_smooth_field(keys[3], (batch, h, w), 29) * 4) * 9
    I = I + step
    Q = Q - step
    flip = jnp.where(jax.random.bernoulli(keys[4], 0.5, (batch, h)),
                     1.0, -1.0)

    def compose(yv, iv, qv, fl):
        # flipped-basis carriers; fl_D = fl * (I*ci - Q*cq).  The comb's
        # conventions (split1d stencil -2C, split_iq cavg flip, adjust_y's
        # x+2 re-modulation) are all consistent with composite chroma
        # C = -fl_D and chroma-plane target clp = 2*fl_D = -2C — verified
        # by tests/test_nn_comb.py::test_convention_against_stencil.
        ci, cq = _carriers(h, w, fl)
        fl_D = iv * ci - qv * cq
        raw = (yv - fl_D) * IRESCALE + IREBASE
        clp = 2.0 * fl_D * IRESCALE
        inp = jnp.stack([raw / 32768.0 - 1.0, ci, cq], axis=-1)
        return inp, clp, yv * IRESCALE + IREBASE, iv * IRESCALE, \
            qv * IRESCALE

    return jax.vmap(compose)(Y, I, Q, flip)


# ---------------------------------------------------------------------------
# real-capture training data (the reference comb-ntsc -t training mode,
# comb-ntsc.cxx:1057-1061: force dim 3 + write per-frame images for the
# attic nntrain.py pipeline).  Here the 3D comb's own chroma separation
# of a real .tbc capture becomes the supervision target directly: the
# NN's chroma-plane convention clp = 2*(I*ci - Q*cq) (carriers with the
# per-line flip folded in) is reconstructed from the comb's decoded
# (i, q) planes.

def training_pairs_from_frames(frames_u16: np.ndarray,
                               cfg: CN.CombConfig = None):
    """(N, 525, 910) u16 .tbc frames -> (inputs (N-2, H, W, 3), clp
    targets (N-2, H, W)) supervised by the no-flow 3D comb (interior
    frames only: the 3D stencil needs both temporal neighbors)."""
    if cfg is None:
        cfg = CN.CombConfig(dim=3, opticalflow=False)
    frames = np.asarray(frames_u16).reshape(-1, CN.IN_Y, CN.IN_X)
    if frames.shape[0] < 3:
        raise ValueError('need >= 3 frames for 3D-comb supervision')
    # windows of 8 interior frames per jitted call + one fetch each:
    # per-frame dispatch from a host loop costs 30-400 ms through the
    # remote-TPU tunnel (CLAUDE.md), ~50x the compute
    dev = jnp.asarray(frames)
    inputs, targets = [], []
    W = 8
    for e0 in range(1, frames.shape[0] - 1, W):
        e1 = min(e0 + W, frames.shape[0] - 1)
        inp, clp = _training_pairs_win(dev[e0:e1], dev[e0 - 1:e1 - 1],
                                       dev[e0 + 1:e1 + 1], cfg)
        inputs.append(np.asarray(inp))
        targets.append(np.asarray(clp))
    return np.concatenate(inputs), np.concatenate(targets)


@functools.partial(jax.jit, static_argnames=('cfg',))
def _training_pairs_win(cur, prv, nxt, cfg: CN.CombConfig):
    return jax.vmap(lambda c, p, n: _training_pair(c, p, n, cfg))(
        cur, prv, nxt)


def _training_pair(raw_u16, prev_u16, next_u16, cfg: CN.CombConfig):
    raw = raw_u16.astype(jnp.float32)
    invert_col = raw_u16[:, 0] == 16384
    if cfg.phase_invert:
        invert_col = ~invert_col
    flip = jnp.where(invert_col, 1.0, -1.0)

    clp0 = CN.split1d(raw)
    clp2, combk2 = CN.split3d(raw, prev_u16.astype(jnp.float32),
                              next_u16.astype(jnp.float32), cfg)
    clp1, combk1, combk0 = CN.split2d(clp0, combk2, cfg.adaptive2d)
    mask36 = CN._row_mask(36, CN.IN_Y) & CN._col_mask(4, 840)
    k1row = CN._row_mask(2, 524)
    combk1 = jnp.where(mask36 & k1row, 1.0 - combk2, combk1)
    combk0 = jnp.where(mask36, 1.0 - combk2 - combk1, combk0)
    y, i, q = CN.split_iq(raw, (clp2, clp1, clp0),
                          (combk2, combk1, combk0), invert_col, cfg)
    ci, cq = _carriers(raw.shape[0], raw.shape[1], flip)
    clp_t = 2.0 * (i * ci - q * cq)
    return model_inputs(raw_u16, flip), clp_t


def write_training_file(frames_u16: np.ndarray, path: str,
                        cfg: CN.CombConfig = None) -> int:
    """Write a .npz of (inputs, clp) training pairs from real .tbc
    frames; returns the number of pairs written."""
    inputs, clp = training_pairs_from_frames(frames_u16, cfg)
    np.savez_compressed(path, inputs=inputs.astype(np.float32),
                        clp=clp.astype(np.float32))
    return inputs.shape[0]


def _file_batch(key, data, batch: int, h: int, w: int):
    """Random (h, w) crops from a loaded training file."""
    inputs, clp = data
    n, H, W = clp.shape
    kf, ky, kx = jax.random.split(key, 3)
    fi = jax.random.randint(kf, (batch,), 0, n)
    yi = jax.random.randint(ky, (batch,), 0, H - h)
    xi = jax.random.randint(kx, (batch,), 0, W - w)

    def crop(f, y0, x0):
        i3 = jax.lax.dynamic_slice(inputs[f], (y0, x0, 0), (h, w, 3))
        c = jax.lax.dynamic_slice(clp[f], (y0, x0), (h, w))
        return i3, c

    return jax.vmap(crop)(fi, yi, xi)


# ---------------------------------------------------------------------------
# training

def train_nn_comb(key=None, steps: int = 250, batch: int = 8,
                  h: int = 64, w: int = 256, lr: float = 3e-3,
                  features: Tuple[int, ...] = (24, 24), mesh=None,
                  data=None):
    """Train the chroma separator; returns (params, final_loss).

    By default trains self-supervised on synthetic scenes; pass
    `data=(inputs, clp)` (float32 arrays, e.g. from a
    write_training_file .npz) to train on real-capture pairs instead —
    the reference's -t training path (comb-ntsc.cxx:1057-1061).  With
    `mesh`, the train step runs data-parallel over its 'dp' axis
    (gradients psum via NamedSharding constraints)."""
    import optax
    if nn is None:                                     # pragma: no cover
        raise RuntimeError('flax is unavailable')
    key = jax.random.PRNGKey(0) if key is None else key
    model = NNComb(features=features)
    k0, key = jax.random.split(key)
    params = model.init(k0, jnp.zeros((1, h, w, 3)))
    tx = optax.adam(lr)
    opt = tx.init(params)

    def loss_fn(p, inp, clp_t):
        pred = model.apply(p, inp)
        return jnp.mean((pred - clp_t) ** 2) / (IRESCALE ** 2)

    if data is not None:
        # device_put once and thread through the jit as ARGUMENTS — a
        # closure capture would bake the whole dataset into the
        # executable as a compile-time constant (duplicated, re-staged
        # per call, and replicated rather than sharded under a mesh)
        data = (jax.device_put(jnp.asarray(data[0], jnp.float32)),
                jax.device_put(jnp.asarray(data[1], jnp.float32)))

    def step_fn(p, o, k, d):
        if d is not None:
            inp, clp_t = _file_batch(k, d, batch, h, w)
        else:
            inp, clp_t, *_ = synth_batch(k, batch, h, w)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(mesh, P('dp'))
            inp = jax.lax.with_sharding_constraint(inp, sh)
            clp_t = jax.lax.with_sharding_constraint(clp_t, sh)
        loss, g = jax.value_and_grad(loss_fn)(p, inp, clp_t)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    jstep = jax.jit(step_fn)
    loss = None
    for i in range(steps):
        key, k = jax.random.split(key)
        params, opt, loss = jstep(params, opt, k, data)
    return params, float(loss)


# ---------------------------------------------------------------------------
# inference: full comb with the NN chroma plane

@functools.partial(jax.jit, static_argnames=('cfg', 'features'))
def comb_frame_nn(raw_u16, params, aburstlev, cfg: CN.CombConfig,
                  features: Tuple[int, ...] = (24, 24)):
    """Frame -> RGB48 with the NN chroma estimate in place of the 2D
    stencil (the reference's `-N` path, attic/combg2-4nn.cxx:1136-1141);
    everything downstream is the standard comb tail."""
    raw = raw_u16.astype(jnp.float32)
    invert_col = raw_u16[:, 0] == 16384
    if cfg.phase_invert:
        invert_col = ~invert_col
    flip = jnp.where(invert_col, 1.0, -1.0)

    model = NNComb(features=features)
    clp = model.apply(params, model_inputs(raw, flip)[None])[0]
    inner = CN._row_mask(4, 524) & CN._col_mask(18, 840)
    clp = jnp.where(inner, clp, 0.0)

    z = jnp.zeros_like(raw)
    ones = jnp.where(inner, 1.0, 0.0)
    y, i, q = CN.split_iq(raw, (z, clp, z), (z, ones, z), invert_col, cfg)
    y, i, q = CN.adjust_y(y, i, q, invert_col, cfg)
    if cfg.colorlpf:
        i, q = CN.filter_iq(i, q, cfg)
    y = CN.do_ynr(y, cfg)
    i, q = CN.do_cnr(i, q, cfg)
    return CN.to_rgb(y, i, q, raw, aburstlev, cfg)
