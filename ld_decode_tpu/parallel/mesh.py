"""Multi-chip sharding of the decode pipeline.

Shard axes (SURVEY §2.4 mapping):
  * 'dp' — field/frame data parallelism (fields are independent modulo tiny
    carries: audio offset, MTF level — exchanged host-side per frame).
  * 'sp' — intra-field sample/block parallelism: the overlap-save block axis
    of the demodulator.  Each shard holds a contiguous run of block bodies;
    the 1056-sample overlap tail of a shard's last block is the head of the
    next shard — exchanged with a single `ppermute` over ICI (the reference's
    overlap-save margins, lddecode_core.py:385-410, become halo exchanges).

The sharded step below is the multi-chip "training step" equivalent: batched
demod with halo exchange, plus an all-gather of the sync channel along 'sp'
so each field's TBC peak scan sees the whole field.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ld_decode_tpu.ops import demod as D
from ld_decode_tpu.ops.filters import DemodBank
from ld_decode_tpu.tbc import sync as S
from ld_decode_tpu.utils.params import DecoderConfig


def _shard_map(f, mesh, in_specs, out_specs):
    sm = jax.shard_map if hasattr(jax, 'shard_map') else None
    if sm is None:
        from jax.experimental.shard_map import shard_map as sm
    # all-gathered outputs are replicated along 'sp' but the replication
    # checker can't prove it; disable the check (check_vma new / check_rep old)
    for kw in ({'check_vma': False}, {'check_rep': False}, {}):
        try:
            return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      **kw)
        except TypeError:
            continue
    raise RuntimeError('shard_map signature mismatch')


def make_mesh(n_devices: int, dp: int = None) -> Mesh:
    devs = jax.devices()[:n_devices]
    if dp is None:
        dp = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    sp = n_devices // dp
    return Mesh(np.array(devs).reshape(dp, sp), ('dp', 'sp'))


def build_sharded_demod(cfg: DecoderConfig, bank: DemodBank, mesh: Mesh,
                        nblocks: int, nfields: int):
    """Jitted multi-chip demod step.

    Input: (nfields, nblocks*block_keep) float32 block bodies
           sharded (dp, sp).
    Output: demod tap (same sharding), per-field sync peak indices
            (dp-sharded, sp-replicated).
    """
    keep = cfg.block_keep
    overlap = cfg.blocklen - keep
    n_sp = mesh.shape['sp']
    n_dp = mesh.shape['dp']
    assert nblocks % n_sp == 0 and nfields % n_dp == 0
    nb_l = nblocks // n_sp
    window = max(int(cfg.linelen * 0.4), 2)

    def local_step(body, mtf_level):
        # body: (F_l, nb_l*keep) local contiguous block bodies
        F_l = body.shape[0]
        heads = body[:, :overlap]
        # halo: my head goes to the previous sp-shard (its last block's tail)
        perm = [(i, (i - 1) % n_sp) for i in range(n_sp)]
        nxt = jax.lax.ppermute(heads, 'sp', perm)
        ext = jnp.concatenate([body, nxt], axis=1)

        body3 = body.reshape(F_l, nb_l, keep)
        shifted = ext[:, keep:]
        pad = nb_l * keep - shifted.shape[1]
        shifted = jnp.pad(shifted, ((0, 0), (0, max(pad, 0))))
        tails = shifted[:, :nb_l * keep].reshape(F_l, nb_l, keep)[:, :, :overlap]
        blocks = jnp.concatenate([body3, tails], axis=2)

        R_os = jnp.fft.rfft(blocks.reshape(F_l * nb_l, -1))
        taps = D.demod_video_rfft(R_os, bank, cfg, mtf_level)
        out = {k: v[:, cfg.blockcut:cfg.blockcut + keep]
                .reshape(F_l, nb_l * keep) for k, v in taps.items()}

        # whole-field sync channel on every sp shard, peaks computed
        # locally.  The gather runs transposed: a tiled axis-1 all_gather
        # makes XLA's cross-process (Gloo/DCN) layout assignment feed a
        # non-dim0-major buffer into the upstream irfft, which the CPU
        # backend rejects (fft_thunk RET_CHECK IsMonotonicWithDim0Major);
        # gathering along axis 0 of the transpose compiles everywhere and
        # is identical after the transpose back.
        sync_full = jax.lax.all_gather(out['demod_sync'].T, 'sp', axis=0,
                                       tiled=True).T
        peaks = []
        for f in range(F_l):
            idx, val = S.find_sync_peaks(sync_full[f], window)
            peaks.append((idx, val))
        pidx = jnp.stack([p[0] for p in peaks])
        pval = jnp.stack([p[1] for p in peaks])
        return out['demod'], pidx, pval

    fn = _shard_map(
        local_step, mesh,
        in_specs=(P('dp', 'sp'), P()),
        out_specs=(P('dp', 'sp'), P('dp', None), P('dp', None)))
    return jax.jit(fn)


def build_sharded_comb3d(comb_cfg, mesh: Mesh, nframes: int):
    """Jitted multi-chip 3D comb: frames sharded over 'dp', the +-1-frame
    temporal references exchanged as single-frame `ppermute` halos over ICI
    (SURVEY §2.4 axis 3: the 3-frame ring of comb-ntsc.cxx:163-177,841-845
    becomes a neighbor exchange).

    Input:  (nframes, 525, 910) uint16 .tbc frames, sharded P('dp',).
    Output: (nframes, linesout, W, 3) uint16 RGB, same sharding.

    The halo is circular, so the globally-first/last frames see wrapped
    neighbors (they are warmup frames in the reference too).  The burst
    AGC seeds per frame (aburstlev=-1) instead of carrying the reference's
    cross-frame EMA — a documented deviation that keeps frames
    embarrassingly parallel; the EMA adapts within one frame anyway.
    """
    from ld_decode_tpu.comb.comb_ntsc import comb_frame

    n_dp = mesh.shape['dp'] * mesh.shape['sp']
    assert nframes % n_dp == 0

    # flatten the mesh to one frame axis for this stage
    devs = np.asarray(mesh.devices).reshape(-1)
    fmesh = Mesh(devs, ('f',))

    def local_step(frames):
        # frames: (F_l, 525, 910) local consecutive frames
        nf = jax.lax.psum(1, 'f')
        fwd = [(i, (i + 1) % nf) for i in range(nf)]
        bwd = [(i, (i - 1) % nf) for i in range(nf)]
        # previous shard's last frame / next shard's first frame
        prev_halo = jax.lax.ppermute(frames[-1], 'f', fwd)
        next_halo = jax.lax.ppermute(frames[0], 'f', bwd)
        prevs = jnp.concatenate([prev_halo[None], frames[:-1]], axis=0)
        nexts = jnp.concatenate([frames[1:], next_halo[None]], axis=0)

        def one(cur, prv, nxt):
            # Split3D(f=1): p3line = newer frame, n3line = older frame
            rgb, _lev = comb_frame(cur, nxt, prv, jnp.float32(-1.0),
                                   comb_cfg)
            return rgb
        return jax.vmap(one)(frames, prevs, nexts)

    fn = _shard_map(local_step, fmesh,
                    in_specs=(P('f'),), out_specs=P('f'))
    return jax.jit(fn), fmesh
