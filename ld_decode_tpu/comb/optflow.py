"""TPU-native Farnebäck dense optical flow (JAX).

The reference's default 3D comb mode gates temporal chroma with
Farnebäck optical flow on each field's NR'd luma via OpenCV
(comb-ntsc.cxx:600-662, `calcOpticalFlowFarneback(pic, prev, 0.5, 4,
60, 3, 7, 1.5)`).  Our initial build kept that call on the host (cv2),
which makes the default comb mode a sequential host-side dependency —
exactly the kind of bottleneck a TPU-native framework can't keep.  This
module reimplements the algorithm (Farnebäck, "Two-Frame Motion
Estimation Based on Polynomial Expansion", SCIA 2003) as pure JAX ops:

* polynomial expansion = two separable correlations (g, x·g, x²·g) and a
  per-pixel linear map through the precomputed inverse metric G⁻¹ — all
  static-shape convs that XLA fuses and tiles;
* per-iteration displacement update = bilinear warp gather of the
  expansion field + 5-plane box blur (winsize) + a closed-form 2×2
  solve per pixel;
* pyramid levels via jax.image.resize (half-pixel linear, the same
  convention as OpenCV's INTER_LINEAR).

Numerics follow OpenCV's `FarnebackPolyExp` / `FarnebackUpdateMatrices`
(modules/video/src/optflowgf.cpp) so the flow fields — and therefore the
comb's motion-confidence maps — agree closely with the cv2 baseline the
parity tests pin (exact equality is not defined: cv2's own output varies
across versions/builds).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# polynomial expansion

def _poly_exp_kernels(n: int, sigma: float):
    """Gaussian base kernels and the inverse-metric elements ig11/ig03/
    ig33/ig55 (OpenCV FarnebackPrepareGaussian)."""
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    g /= g.sum()
    xg = x * g
    xxg = x * x * g

    # metric G for basis (1, x, y, x^2, y^2, xy) under w(x,y)=g(x)g(y)
    s2 = float((g * x * x).sum())          # E[x^2]
    s4 = float((g * x ** 4).sum())         # E[x^4]
    G = np.zeros((6, 6))
    G[0, 0] = 1.0
    G[1, 1] = G[2, 2] = s2
    G[3, 3] = G[4, 4] = s4
    G[5, 5] = s2 * s2
    G[0, 3] = G[0, 4] = G[3, 0] = G[4, 0] = s2
    G[3, 4] = G[4, 3] = s2 * s2
    Ginv = np.linalg.inv(G)
    return (g, xg, xxg, float(Ginv[1, 1]), float(Ginv[0, 3]),
            float(Ginv[3, 3]), float(Ginv[5, 5]))


def _sep_correlate(img: jnp.ndarray, kern: np.ndarray, axis: int
                   ) -> jnp.ndarray:
    """1-D correlation along `axis` with replicate padding (the border
    handling OpenCV's row buffers implement)."""
    n = (len(kern) - 1) // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (n, n)
    x = jnp.pad(img, pad, mode='edge')
    k = jnp.asarray(kern, img.dtype)
    # stack shifted views: tiny n (<=3 for poly_n=7), unrolled adds
    out = jnp.zeros_like(img)
    for i in range(len(kern)):
        sl = [slice(None), slice(None)]
        sl[axis] = slice(i, i + img.shape[axis])
        out = out + k[i] * x[tuple(sl)]
    return out


def poly_expansion(img: jnp.ndarray, n: int, sigma: float) -> jnp.ndarray:
    """Quadratic expansion coefficients per pixel.

    Returns (H, W, 5) float32: [vy, vx, vxx, vyy, vxy] in OpenCV's R
    layout (drow[x*5+0..4])."""
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_kernels(n, sigma)
    f = img.astype(jnp.float32)

    # vertical pass: correlate columns with g, xg, xxg
    t0 = _sep_correlate(f, g, 0)
    t1 = _sep_correlate(f, xg, 0)
    t2 = _sep_correlate(f, xxg, 0)

    # horizontal pass
    b1 = _sep_correlate(t0, g, 1)
    b2 = _sep_correlate(t0, xg, 1)
    b4 = _sep_correlate(t0, xxg, 1)
    b3 = _sep_correlate(t1, g, 1)
    b5 = _sep_correlate(t1, xg, 1)
    b6 = _sep_correlate(t2, g, 1)

    by = b3 * ig11                    # linear y coefficient
    bx = b2 * ig11                    # linear x coefficient
    ayy = b1 * ig03 + b6 * ig33       # y^2 (vertical xxg path)
    axx = b1 * ig03 + b4 * ig33       # x^2 (horizontal xxg path)
    axy = b5 * ig55
    return jnp.stack([by, bx, ayy, axx, axy], axis=-1)


# ---------------------------------------------------------------------------
# displacement update

_BORDER = 5


def _border_scale(h: int, w: int) -> np.ndarray:
    """OpenCV down-weights the outer BORDER=5 pixels of the matrix field
    (FarnebackUpdateMatrices border[] ramp)."""
    ramp = np.array([0.14, 0.14, 0.4472, 0.4472, 0.4472, 1.0])
    iy = np.minimum(np.minimum(np.arange(h), h - 1 - np.arange(h)), _BORDER)
    ix = np.minimum(np.minimum(np.arange(w), w - 1 - np.arange(w)), _BORDER)
    return (ramp[iy][:, None] * ramp[ix][None, :]).astype(np.float32)


def _quad_expand(R: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (H*W, 4*C) with the 4 bilinear-corner shifts
    precomputed: row p = [R[y,x], R[y,min(x+1,W-1)], R[min(y+1,H-1),x],
    R[min(y+1),min(x+1)]] — exactly the clamp semantics of the corner
    reads below.  Built once per pyramid level and shared by all
    warp iterations."""
    h, w, c = R.shape
    Rx = jnp.concatenate([R[:, 1:], R[:, -1:]], axis=1)
    Ry = jnp.concatenate([R[1:], R[-1:]], axis=0)
    Rxy = jnp.concatenate([Ry[:, 1:], Ry[:, -1:]], axis=1)
    return jnp.concatenate([R, Rx, Ry, Rxy], axis=-1).reshape(h * w, 4 * c)


def _bilinear_gather_quad(Rq: jnp.ndarray, h: int, w: int, c: int,
                          fx: jnp.ndarray, fy: jnp.ndarray) -> jnp.ndarray:
    """Sample the quad-expanded field at float coords, clamped to the
    frame.

    All four corner reads come from ONE flat `take` of 4*C-wide rows:
    TPU gather cost scales with the INDEX COUNT, not the row width
    (measured: 212k takes cost ~1.8-2.2 ms whether rows are 5 or 40
    wide), so folding the corners into the row quarters the index work
    — 4.2 ms -> 2.0 ms per warp at 252x840, bit-identical output
    (scripts/probe_warp.py).  A 2x2-slice lax.gather is 60x worse, and
    2-D advanced indexing ~27% worse than the linearized take.  This is
    the hot op of the Farneback flow — one warp per iteration per
    level, on two fields."""
    fx = jnp.clip(fx, 0.0, w - 1.001)
    fy = jnp.clip(fy, 0.0, h - 1.001)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    ax = (fx - x0)[..., None]
    ay = (fy - y0)[..., None]
    q = jnp.take(Rq, (y0 * w + x0).reshape(-1), axis=0).reshape(
        h, w, 4, c)
    return (q[..., 0, :] * (1 - ay) * (1 - ax) + q[..., 1, :] * (1 - ay) * ax
            + q[..., 2, :] * ay * (1 - ax) + q[..., 3, :] * ay * ax)


def _bilinear_gather(R: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray
                     ) -> jnp.ndarray:
    """Sample (H, W, C) field at float coords, clamped to the frame
    (single-shot form; the iteration loop uses the quad-expanded path
    above)."""
    h, w, c = R.shape
    return _bilinear_gather_quad(_quad_expand(R), h, w, c, fx, fy)


def _update_matrices(R0: jnp.ndarray, R1q: jnp.ndarray, flow: jnp.ndarray,
                     bscale: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel normal-equation entries [g11, g12, g22, h1, h2]
    (OpenCV FarnebackUpdateMatrices).  R1q is the quad-expanded
    (H*W, 20) second field (`_quad_expand(R1)`)."""
    h, w = R0.shape[:2]
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    dx = flow[..., 0]
    dy = flow[..., 1]
    fx = xx + dx
    fy = yy + dy
    x1 = jnp.floor(fx)
    y1 = jnp.floor(fy)
    inside = ((x1 >= 0) & (x1 < w - 1) & (y1 >= 0) & (y1 < h - 1))
    r1 = _bilinear_gather_quad(R1q, h, w, 5, fx, fy)

    # averaged quadratic terms (cv2's r4/r5/r6): outside the warp range
    # the sampled side is dropped and the cross term halved
    r4 = jnp.where(inside, (R0[..., 2] + r1[..., 2]) * 0.5, R0[..., 2])
    r5 = jnp.where(inside, (R0[..., 3] + r1[..., 3]) * 0.5, R0[..., 3])
    r6 = jnp.where(inside, (R0[..., 4] + r1[..., 4]) * 0.25,
                   R0[..., 4] * 0.5)
    z = jnp.zeros_like(r4)
    r2 = (R0[..., 0] - jnp.where(inside, r1[..., 0], z)) * 0.5  # Δb_y
    r3 = (R0[..., 1] - jnp.where(inside, r1[..., 1], z)) * 0.5  # Δb_x
    r2 = r2 + r4 * dy + r6 * dx
    r3 = r3 + r6 * dy + r5 * dx

    r2 = r2 * bscale
    r3 = r3 * bscale
    r4 = r4 * bscale
    r5 = r5 * bscale
    r6 = r6 * bscale

    g11 = r4 * r4 + r6 * r6
    g12 = (r4 + r5) * r6
    g22 = r5 * r5 + r6 * r6
    h1 = r4 * r2 + r6 * r3
    h2 = r6 * r2 + r5 * r3
    return jnp.stack([g11, g12, g22, h1, h2], axis=-1)


def _box_blur(M: jnp.ndarray, winsize: int) -> jnp.ndarray:
    """Normalized box filter over (H, W, C) via two cumsum passes
    (OpenCV FarnebackUpdateFlow_Blur's running box sums)."""
    m = winsize // 2

    def blur_axis(x, axis):
        n = x.shape[axis]
        pad = [(0, 0)] * x.ndim
        pad[axis] = (m + 1, m)
        xp = jnp.pad(x, pad, mode='edge')
        c = jnp.cumsum(xp, axis=axis)
        hi = jax.lax.slice_in_dim(c, m + m + 1, m + m + 1 + n, axis=axis)
        lo = jax.lax.slice_in_dim(c, 0, n, axis=axis)
        return hi - lo

    out = blur_axis(blur_axis(M.astype(jnp.float32), 0), 1)
    return out * (1.0 / (winsize * winsize))


def _solve_flow(Mb: jnp.ndarray) -> jnp.ndarray:
    g11, g12, g22, h1, h2 = (Mb[..., i] for i in range(5))
    det = g11 * g22 - g12 * g12
    det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    fx = (g11 * h2 - g12 * h1) / det
    fy = (g22 * h1 - g12 * h2) / det
    return jnp.stack([fx, fy], axis=-1)


# ---------------------------------------------------------------------------
# pyramid driver

def _gauss_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    ksz = max(int(round(sigma * 5)) | 1, 3)
    n = ksz // 2
    x = np.arange(-n, n + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2 * sigma * sigma))
    k /= k.sum()
    return _sep_correlate(_sep_correlate(img, k, 0), k, 1)


@functools.partial(jax.jit, static_argnames=(
    'pyr_scale', 'levels', 'winsize', 'iterations', 'poly_n', 'poly_sigma',
    'use_init'))
def _farneback_jit(img0, img1, flow0, pyr_scale, levels, winsize,
                   iterations, poly_n, poly_sigma, use_init):
    h, w = img0.shape
    f0 = img0.astype(jnp.float32)
    f1 = img1.astype(jnp.float32)

    flow = None
    for k in range(levels, -1, -1):
        scale = float(pyr_scale) ** k
        hk = int(round(h * scale))
        wk = int(round(w * scale))

        if flow is None:
            if use_init:
                flow = jax.image.resize(flow0, (hk, wk, 2), 'linear') * scale
            else:
                flow = jnp.zeros((hk, wk, 2), jnp.float32)
        else:
            flow = jax.image.resize(flow, (hk, wk, 2), 'linear') \
                * (1.0 / float(pyr_scale))

        if k == 0:
            i0, i1 = f0, f1
        else:
            sigma = (1.0 / scale - 1.0) * 0.5
            i0 = jax.image.resize(_gauss_blur(f0, sigma), (hk, wk), 'linear')
            i1 = jax.image.resize(_gauss_blur(f1, sigma), (hk, wk), 'linear')

        R0 = poly_expansion(i0, poly_n, poly_sigma)
        R1q = _quad_expand(poly_expansion(i1, poly_n, poly_sigma))
        bscale = jnp.asarray(_border_scale(hk, wk))

        M = _update_matrices(R0, R1q, flow, bscale)
        for it in range(iterations):
            flow = _solve_flow(_box_blur(M, winsize))
            if it < iterations - 1:
                M = _update_matrices(R0, R1q, flow, bscale)
    return flow


def calc_optical_flow_farneback(
        prev_img: np.ndarray, next_img: np.ndarray,
        flow: Optional[np.ndarray] = None, pyr_scale: float = 0.5,
        levels: int = 4, winsize: int = 60, iterations: int = 3,
        poly_n: int = 7, poly_sigma: float = 1.5,
        use_initial_flow: bool = False) -> jnp.ndarray:
    """Drop-in equivalent of cv2.calcOpticalFlowFarneback (returns the
    (H, W, 2) float32 displacement of prev->next in x,y order)."""
    h, w = prev_img.shape
    # OpenCV caps the pyramid so every level keeps both dims >= 32 px
    # (calcOpticalFlowFarneback min_size); without the cap the coarse
    # levels of the comb's 252-row field images degenerate into
    # mostly-border box blurs and seed the finer levels differently
    k, scale = 0, 1.0
    while k < levels:
        scale *= pyr_scale
        if h * scale < 32 or w * scale < 32:
            break
        k += 1
    levels = k
    if flow is None or not use_initial_flow:
        flow0 = jnp.zeros((h, w, 2), jnp.float32)
        use_init = False
    else:
        flow0 = jnp.asarray(flow, jnp.float32)
        use_init = True
    return _farneback_jit(jnp.asarray(prev_img), jnp.asarray(next_img),
                          flow0, float(pyr_scale), int(levels), int(winsize),
                          int(iterations), int(poly_n), float(poly_sigma),
                          use_init)
