"""Picture-codec rate harness (CPU; no tunnel needed).

Round-3 lesson (docs/PERF.md): codec rates MUST be measured on REAL
DECODED fields — the ~100 high-residual samples/line clustered at the
sync-edge/burst/blanking columns are invisible in synthetic pictures
and poisoned the per-line design to 0.998x raw.  This harness

  1. `collect`: decodes frames from the cached bench captures on the
     CPU backend and stores the per-field u16 pictures
     (~/.cache/ldd_tpu_fields_{tag}.npy), and
  2. `rate`: evaluates codec variants in pure numpy on those fields,
     reporting xraw incl. every side-channel (class table, column
     profile) so variants are compared on total shipped bytes.

Variants measured for round 4 (VERDICT.md next-round #1):
  nib16      round-3 shipped codec: per-16-sample-block NIBBLE classes
  bit16      bit-granular classes (16 one-bit planes; class = bits of
             the block's max zigzag residual) — 4x finer rate steps
  bit16+col  bit16 after subtracting a per-field per-column median
             residual profile (shipped once per field)
"""
import os
import sys

import numpy as np

BW = 16


def collect(keys=('clean', 'noisy'), nframes=6):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    from ld_decode_tpu.utils.params import DecoderConfig
    from ld_decode_tpu.ops import filters as F
    from ld_decode_tpu.tbc import framer as FR

    for key in keys:
        system, _, _, tag = bench._CAPTURES[key]
        out = os.path.expanduser(f'~/.cache/ldd_tpu_fields_{tag}.npy')
        if os.path.exists(out):
            print(f'# {key}: cached {out}')
            continue
        cfg = DecoderConfig(system=system, freq_mhz=40.0)
        bank = F.make_demod_bank(cfg, dtype=np.complex64)
        samples = bench.capture_for(key, {})
        fr = FR.Framer(cfg, bank, capture=samples, batch=8, nblocks=52
                       if system == 'NTSC' else 56)
        start = 33046 if system == 'NTSC' else 2560 * 14
        W = cfg.sys.outlinelen
        fields = []
        f, rs, s = fr.readfield(None, start)
        while f is not None and len(fields) < 2 * nframes:
            fields.append(np.asarray(f.dspicture[:f.linecount * W]
                                     ).reshape(-1, W).copy())
            f, rs, s = fr.readfield(None, s)
        L = min(x.shape[0] for x in fields)
        stack = np.stack([x[:L] for x in fields])
        np.save(out, stack)
        print(f'# {key}: saved {stack.shape} -> {out}')


# ---------------------------------------------------------------------------
# numpy codec variants.  All operate on one (L, W) u16 field and return
# total shipped BITS (planes + class table + side channels).


def _residual(x, k, colprof=False):
    """vertical lag-k delta -> (optional per-column median subtract) ->
    horizontal lag-1 delta -> mod-2^16 zigzag.  Returns (z, extra_bits).
    """
    x = x.astype(np.int64)
    r = np.concatenate([x[:k], x[k:] - x[:-k]], axis=0)
    extra = 0
    if colprof:
        med = np.median(r[k:], axis=0).astype(np.int64)
        r = r - med
        extra = 16 * med.shape[0]          # ship profile as i16/column
    d = np.concatenate([r[:, :1], r[:, 1:] - r[:, :-1]], axis=1)
    ds = ((d + 0x8000) & 0xFFFF) - 0x8000
    z = ((ds << 1) ^ (ds >> 15)) & 0xFFFF
    return z, extra


def _pad(x, bw):
    W = x.shape[1]
    Wp = -(-W // bw) * bw
    return np.pad(x, ((0, 0), (0, Wp - W)), mode='edge')


def rate_nibble(x, k, bw=BW, colprof=False):
    """Round-3 shipped codec: per-block nibble classes (0/4/8/12/16
    bits/sample) + 4-bit class table."""
    z, extra = _residual(_pad(x, bw), k, colprof)
    zb = z.reshape(z.shape[0], -1, bw)
    mx = zb.max(axis=2)
    nib = ((mx > 0).astype(np.int64) + (mx >= 16) + (mx >= 256)
           + (mx >= 4096))
    bits = int(nib.sum()) * 4 * bw + nib.size * 4 + extra
    return bits


def rate_bits(x, k, bw=BW, colprof=False, table_bits=5):
    """Bit-granular classes: block ships ceil(log2(max+1)) one-bit
    planes; class table 5 bits/block (packed 3/word in the real codec).
    """
    z, extra = _residual(_pad(x, bw), k, colprof)
    zb = z.reshape(z.shape[0], -1, bw)
    mx = zb.max(axis=2)
    nb = np.zeros_like(mx)
    for t in range(16):
        nb += mx >= (1 << t)
    bits = int(nb.sum()) * bw + nb.size * table_bits + extra
    return bits


def rate_entropy(x, k, colprof=False):
    """Order-0 entropy of the zigzag residuals (lower bound for any
    per-sample entropy coder on this transform) — context only."""
    z, extra = _residual(x, k, colprof)
    v, c = np.unique(z, return_counts=True)
    p = c / c.sum()
    return float(-(p * np.log2(p)).sum()) * z.size + extra


def rate(tags=None):
    files = {
        'clean': 'ldd_tpu_fields_ntsc40_ramp_132_v1.npy',
        'noisy': 'ldd_tpu_fields_ntsc40_ramp_noisy02_104_v1.npy',
        'pal': 'ldd_tpu_fields_pal40_bars_96_v1.npy',
    }
    for key, fn in files.items():
        if tags and key not in tags:
            continue
        path = os.path.expanduser(f'~/.cache/{fn}')
        if not os.path.exists(path):
            continue
        stack = np.load(path)
        k = 2 if 'ntsc' in fn else 4
        raw = stack[0].size * 16
        rows = {}
        for name, fn_ in [
            ('nib16', lambda f: rate_nibble(f, k)),
            ('bit16', lambda f: rate_bits(f, k)),
            ('bit16+col', lambda f: rate_bits(f, k, colprof=True)),
            ('bit8', lambda f: rate_bits(f, k, bw=8, table_bits=5)),
            ('bit32', lambda f: rate_bits(f, k, bw=32, table_bits=5)),
            ('entropy', lambda f: rate_entropy(f, k)),
        ]:
            rows[name] = np.mean([fn_(f) / raw for f in stack])
        print(f'{key}: ' + '  '.join(f'{n}={v:.3f}x'
                                     for n, v in rows.items()))


def rate_v4():
    """Rate + exactness of the SHIPPED codec (fused.encode_image_planes
    v4: bit-granular planes + rice escape) on the stored real fields."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ld_decode_tpu.tbc import fused as FU
    files = {
        'clean': ('ldd_tpu_fields_ntsc40_ramp_132_v1.npy', 2),
        'noisy': ('ldd_tpu_fields_ntsc40_ramp_noisy02_104_v1.npy', 2),
        'pal': ('ldd_tpu_fields_pal40_bars_96_v1.npy', 4),
    }
    for key, (fn, k) in files.items():
        path = os.path.expanduser(f'~/.cache/{fn}')
        if not os.path.exists(path):
            continue
        st = np.load(path)
        rates = []
        for f in st:
            Wp = -(-f.shape[1] // BW) * BW
            fp = np.pad(f.astype(np.int32), ((0, 0), (0, Wp - f.shape[1])),
                        mode='edge')
            planes, tab, qs, qw = FU.encode_image_planes(jnp.asarray(fp), k)
            dense, rows = FU.compact_planes(
                planes[None], tab[None],
                FU.CODEC_NPLANES * fp.shape[0] * (Wp // BW))
            rows = int(np.asarray(rows)[0])
            qwn = int(np.asarray(qw))
            got = FU.decode_image_planes(
                np.asarray(tab), np.asarray(dense)[:rows],
                np.asarray(qs)[:qwn], fp.shape, k)
            assert np.array_equal(got, (fp & 0xFFFF).astype(np.uint16)), key
            tabw = FU.tab_words(tab.size)
            rates.append((rows + qwn + tabw) * 16 / (f.size * 16))
        print(f'{key}: shipped v4 = {np.mean(rates):.3f}x raw '
              f'(exact on {len(st)} real fields)')


def collect_rgb(nframes=8):
    """Real comb RGB48 output for the -F (noflow) chain: decode the
    cached clean capture on CPU, run the K-map 3D comb, store the RGB
    frames (~/.cache/ldd_tpu_rgb_noflow_v1.npy).  This is the stream
    whose 0.527x-raw codec rate capped full_chain_noflow below real
    time in BENCH_r04 — rate levers must be measured on it, not on
    synthetic pictures (round-3 lesson)."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    from ld_decode_tpu.utils.params import DecoderConfig
    from ld_decode_tpu.ops import filters as F
    from ld_decode_tpu.tbc import framer as FR
    from ld_decode_tpu.comb.comb_ntsc import NTSCComb, CombConfig

    out = os.path.expanduser('~/.cache/ldd_tpu_rgb_noflow_v1.npy')
    if os.path.exists(out):
        print(f'# rgb: cached {out}')
        return
    cfg = DecoderConfig(system='NTSC', freq_mhz=40.0)
    bank = F.make_demod_bank(cfg, dtype=np.complex64)
    samples = bench.capture_for('clean', {})
    fr = FR.Framer(cfg, bank, capture=samples, batch=8, nblocks=52)
    comb = NTSCComb(CombConfig(dim=3, opticalflow=False))
    rgbs = []
    f, rs, s = fr.readfield(None, 33046)
    rv = fr.readframe(None, s, True)
    while rv[0] is not None and len(rgbs) < nframes:
        rgb = comb.process(rv[0].reshape(525, 910))
        if rgb is not None:
            rgbs.append(np.asarray(rgb))
        rv = fr.readframe(None, rv[2], False)
    stack = np.stack(rgbs)
    np.save(out, stack)
    print(f'# rgb: saved {stack.shape} -> {out}')


def _shipped_rate(img, k, hpass=False):
    """Exact shipped fraction of one int image through the real codec
    (encode + compact + tab words), vs 16 bits/sample raw."""
    import jax.numpy as jnp
    from ld_decode_tpu.tbc import fused as FU
    R, W = img.shape
    Wp = -(-W // BW) * BW
    fp = np.pad(img.astype(np.int32), ((0, 0), (0, Wp - W)), mode='edge')
    planes, tab, qs, qw = FU.encode_image_planes(jnp.asarray(fp), k, hpass)
    dense, rows = FU.compact_planes(
        planes[None], tab[None], FU.codec_cap_words(R * (Wp // BW)))
    rows = int(np.asarray(rows)[0])
    qwn = int(np.asarray(qw))
    tabw = FU.tab_words(tab.size)
    return (rows + qwn + tabw) * 16 / (img.size * 16)


def rate_rgb():
    """Codec rate of the comb RGB48 stream: shipped planar layout vs
    the reversible color transform [G, R-G, B-G] (mod-2^16 — exact
    integer inverse, so RGB output is bit-identical; the difference
    planes carry only the bandlimited chroma, so the luma entropy that
    all three channels share is paid once instead of three times).
    Run `collect_rgb` first."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.expanduser('~/.cache/ldd_tpu_rgb_noflow_v1.npy')
    st = np.load(path)                       # (N, rows, W, 3) u16
    nrows = st.shape[1]
    for name, tr in [
        ('plain', lambda f: np.moveaxis(f, 2, 0).astype(np.int32)),
        ('rct', lambda f: np.stack([
            f[..., 1].astype(np.int32),
            (f[..., 0].astype(np.int32) - f[..., 1]) & 0xFFFF,
            (f[..., 2].astype(np.int32) - f[..., 1]) & 0xFFFF])),
    ]:
        for kname, k, hp in [('v1', 1, False), ('2d', 1, True),
                             ('h', 3 * nrows, False)]:
            for tag, prep in [('rgb48', lambda f: f),
                              ('rgb8', lambda f: f >> 8)]:
                rates = [
                    _shipped_rate(tr(prep(f)).reshape(-1, f.shape[1]),
                                  k, hp)
                    for f in st]
                r = float(np.mean(rates))
                print(f'{tag} {name} {kname}: {r:.3f}x raw '
                      f'({r * st[0].size * 2 / 1e6:.2f} MB/frame)')


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'rate'
    if which == 'collect':
        collect(tuple(sys.argv[2:]) or ('clean', 'noisy'))
    elif which == 'collect_rgb':
        collect_rgb()
    elif which == 'rate_rgb':
        rate_rgb()
    elif which == 'v4':
        rate_v4()
    else:
        rate(sys.argv[2:] or None)
