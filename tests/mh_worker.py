"""Worker process for test_multihost.py — NOT a pytest module.

Runs one of two cooperating processes (4 virtual CPU devices each) joined
by jax.distributed into an 8-device global mesh, executes the sharded
demod step of parallel/mesh.py with dp=1/sp=8 — so the overlap-save halo
`ppermute` between global devices 3 and 4 crosses the PROCESS boundary
(the DCN analog; SURVEY §2.4 axis 5) — and checks the addressable shards
against a locally-computed single-device reference.

Usage: mh_worker.py <process_id> <num_processes> <coordinator_port>
"""

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=4')

import jax

jax.config.update('jax_platforms', 'cpu')   # beat any sitecustomize override


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(coordinator_address=f'127.0.0.1:{port}',
                               num_processes=nproc, process_id=pid)
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ld_decode_tpu.utils.params import DecoderConfig
    from ld_decode_tpu.ops import filters as F
    from ld_decode_tpu.parallel import mesh as M

    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0, blocklen=2048,
                        blockcut=128, blockcut_end=32)
    bank = F.make_demod_bank(cfg, dtype=np.complex64)

    n_sp = 4 * nproc
    mesh = M.make_mesh(n_sp, dp=1)          # sp spans both processes
    nblocks, nfields = n_sp, 1
    step = M.build_sharded_demod(cfg, bank, mesh, nblocks, nfields)

    rng = np.random.default_rng(7)
    body = rng.integers(0, 1024, (nfields, nblocks * cfg.block_keep)
                        ).astype(np.float32)

    sharding = NamedSharding(mesh, P('dp', 'sp'))
    gbody = jax.make_array_from_callback(
        body.shape, sharding, lambda idx: jnp.asarray(body[idx]))

    demod, pidx, pval = step(gbody, jnp.float32(1.0))
    jax.block_until_ready(demod)

    # reference: the same step on a single local device (sp=1 wraps the
    # halo onto itself — identical circular overlap-save semantics)
    lmesh = Mesh(np.array(jax.local_devices()[:1]).reshape(1, 1),
                 ('dp', 'sp'))
    lstep = M.build_sharded_demod(cfg, bank, lmesh, nblocks, nfields)
    edemod, epidx, epval = lstep(jnp.asarray(body), jnp.float32(1.0))

    edemod = np.asarray(edemod)
    for shard in demod.addressable_shards:
        got = np.asarray(shard.data)
        want = edemod[shard.index]
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-2)

    for g, e in ((pidx, epidx), (pval, epval)):
        for shard in g.addressable_shards:
            np.testing.assert_allclose(np.asarray(shard.data),
                                       np.asarray(e)[shard.index],
                                       rtol=0, atol=1e-4)

    # direct cross-boundary ppermute sanity: rank r sends r -> r+1 ring
    from ld_decode_tpu.parallel.mesh import _shard_map
    ring = jax.jit(_shard_map(
        lambda x: jax.lax.ppermute(
            x, 'sp', [(i, (i + 1) % n_sp) for i in range(n_sp)]),
        mesh, in_specs=P(None, 'sp'), out_specs=P(None, 'sp')))
    vec = np.arange(n_sp, dtype=np.float32).reshape(1, n_sp)
    gvec = jax.make_array_from_callback(
        vec.shape, NamedSharding(mesh, P(None, 'sp')),
        lambda idx: jnp.asarray(vec[idx]))
    rolled = ring(gvec)
    for shard in rolled.addressable_shards:
        j = shard.index[1].start
        assert int(np.asarray(shard.data)[0, 0]) == (j - 1) % n_sp, \
            (j, np.asarray(shard.data))

    if os.environ.get('MH_SCALE') == '1':
        _scale_probe(pid, nproc)

    print(f'MH_WORKER_OK pid={pid}', flush=True)


def _scale_probe(pid, nproc):
    """Cross-process scaling evidence: the SAME 8-field batch through the
    dp-sharded flagship pipeline spanning both processes (Gloo/TCP — the
    DCN analog) vs a single local device.  t_sharded/t_single isolates
    what the cross-process collectives and carry replay cost on top of
    partitioning (cores are shared, so absolute fields/s is not the
    point — the overhead ratio trend is)."""
    import time
    import numpy as np
    import jax.numpy as jnp

    from ld_decode_tpu.utils.params import DecoderConfig
    from ld_decode_tpu.ops import filters as F, demod as D
    from ld_decode_tpu.parallel import mesh as M
    from ld_decode_tpu.tbc import fused as FU

    fcfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    fbank = F.make_demod_bank(fcfg, dtype=np.complex64)
    fnblocks = 8
    n_audio1 = fnblocks * fbank.a_stage1_keep
    batch = 4 * nproc
    pitch = fcfg.linelen * (fcfg.sys.frame_lines // 2)
    cap_len = pitch * batch + D.stream_len(fcfg, fnblocks) + 4096
    rng = np.random.default_rng(0)
    capture = jnp.asarray(rng.integers(20000, 45000, cap_len)
                          .astype(np.uint16))
    args = (capture, jnp.int32(fcfg.blockcut), jnp.float32(0.0),
            jnp.float32(1.0), jnp.int32(cap_len))

    def timeit(fn):
        jax.block_until_ready(fn(*args)[0])
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    pstep, _ = M.build_pipeline_batch_sharded(
        fcfg, fbank, M.make_mesh(4 * nproc, dp=4 * nproc), fnblocks,
        n_audio1, batch, pitch)
    tn = timeit(pstep)

    single = lambda c, s, o, m, v: FU.field_pipeline_batch(
        c, s, o, m, fbank, fcfg, fnblocks, n_audio1, batch, pitch,
        pallas=False, valid_len=v)
    t1 = timeit(single)
    print(f'MH_SCALE pid={pid} batch={batch} single={batch / t1:.2f} '
          f'fields/s cross-process-sharded={batch / tn:.2f} fields/s '
          f'overhead={tn / t1:.3f}', flush=True)


if __name__ == '__main__':
    main()
