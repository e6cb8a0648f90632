"""Dense optical flow — Farnebäck polynomial-expansion flow on TPU.

Reference parity: the ``OpticalFlow`` op wraps
``cv::FarnebackOpticalFlow::create(3, 0.5, false, 15, 3, 5, 1.2, 0)`` on
grayscale frame pairs with stencil {0,1}, emitting H×W×2 float32
(optical_flow_kernel_cpu.cpp:16,27-43; GPU variant
optical_flow_kernel_gpu.cpp).

TPU-native design: a from-scratch JAX implementation of Farnebäck's
algorithm (Farnebäck, "Two-frame motion estimation based on polynomial
expansion", SCIA 2003), structured like the OpenCV estimator so parameters
line up:

  * coarse-to-fine image pyramid (``levels`` extra octaves, scale
    ``pyr_scale``): each level Gaussian-smooths the full-res image with
    sigma = (1/scale - 1)/2 and resizes bilinearly;
  * per level: quadratic polynomial expansion per pixel (separable
    Gaussian-weighted least squares, window 2·poly_n+1, sigma poly_sigma)
    giving linear terms (bx, by) and quadratic terms (axx, ayy, axy);
  * ``iters`` fixed-point iterations: warp frame-1 coefficients by the
    current flow, form the 2×2 normal equations (G, h) per pixel, box-blur
    them over win_size², solve for the flow increment.

Everything is batched over the pair axis and expressed as separable
convolutions + bilinear gathers, so XLA maps it onto the VPU/MXU with
static shapes; the per-level loop is a Python loop over a fixed pyramid
(compile-time unrolled). Accuracy is validated against OpenCV's output in
tests (median |Δ| well under 0.1 px on natural-motion sequences).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..registry import register_op
from ..utils.framechunk import FrameChunk
from .imgproc import _rgb2gray_u8


# ------------------------------------------------------------ small helpers

def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _sepconv(img: jnp.ndarray, kx: np.ndarray, ky: np.ndarray,
             mode: str = "reflect") -> jnp.ndarray:
    """Separable 2D correlation on [T, H, W] with border handling.

    mode='reflect' == cv2 BORDER_REFLECT_101 (GaussianBlur default);
    mode='edge'    == cv2 BORDER_REPLICATE (polynomial expansion).
    """
    ry, rx = len(ky) // 2, len(kx) // 2
    x = jnp.pad(img, ((0, 0), (ry, ry), (rx, rx)), mode=mode)
    # horizontal then vertical, as running weighted sums
    kxj = jnp.asarray(kx)
    kyj = jnp.asarray(ky)
    h = sum(x[:, :, i : i + img.shape[2]] * kxj[i] for i in range(len(kx)))
    v = sum(h[:, i : i + img.shape[1], :] * kyj[i] for i in range(len(ky)))
    return v


def _resize_bilinear(img: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jax.image.resize(img, img.shape[:-2] + (h, w), method="linear",
                            antialias=False)


def _bilinear_sample(img: jnp.ndarray, fy: jnp.ndarray, fx: jnp.ndarray
                     ) -> jnp.ndarray:
    """img: [T, H, W, C]; fy/fx: [T, H, W] float coords -> [T, H, W, C].
    Coordinates clamped to the valid range (border replicate).

    TPU note: gathers dominate the whole Farnebäck pipeline (measured
    ~22 ms per warp at 8×432×240×5 — everything else is sub-ms). Packing
    the four interpolation corners as channels (edge-clamped shifted
    copies) and issuing ONE gather instead of four runs 2.6× faster
    (8.5 ms, bit-identical output): the shifted copies are cheap
    vectorized slices, and the single gather amortizes the per-index
    addressing that XLA's TPU gather pays per operand.
    """
    t, h, w, c = img.shape
    fy = jnp.clip(fy, 0.0, h - 1.0)
    fx = jnp.clip(fx, 0.0, w - 1.0)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x0 = jnp.floor(fx).astype(jnp.int32)
    wy = (fy - y0)[..., None]
    wx = (fx - x0)[..., None]

    # corners packed as channels: [img, img_right, img_down, img_downright]
    # with edge clamping == the y1/x1 = min(+1, max) of the 4-gather form
    right = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
    down = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    dr = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
    packed = jnp.concatenate([img, right, down, dr], axis=-1)

    flat = packed.reshape(t, h * w, 4 * c)
    idx = (y0 * w + x0).reshape(t, -1, 1)
    g = jnp.take_along_axis(flat, idx, axis=1).reshape(t, h, w, 4, c)
    v00, v01, v10, v11 = (g[..., 0, :], g[..., 1, :],
                          g[..., 2, :], g[..., 3, :])
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _shift_warp(img: jnp.ndarray, fy: jnp.ndarray, fx: jnp.ndarray,
                warp_px: int) -> jnp.ndarray:
    """Bounded-displacement bilinear warp as select-over-shifts (the
    integer-shift warp decomposition, ROADMAP r2 #10).

    The TPU pays ~10 cycles per random-access gather index, which made the
    single-gather warp 79 ms per 8×480p chunk — 83% of total Farnebäck
    time. This formulation replaces the gather with 2·(2R+1) *stencil*
    passes: per axis, the warped value is a select-weighted sum over
    edge-padded shifted copies of the image (cheap vectorized slices that
    XLA fuses into one multi-tap pass over memory). Measured 3.1 ms at
    R=8 / 6.8 ms at R=16 for the same chunk — 13-29× on the warp, 11× on
    end-to-end Farnebäck (28 → 319 fps @480p), with the cv2-parity
    goldens' error unchanged to 3 decimal places.

    Two deliberate approximations vs the exact gather (both validated
    against the goldens and a 10-px-shift recovery test):
      * displacements are clamped to ±R pixels (R = ``warp_px``, capped by
        the image size); for |flow| > R the sample comes from the clamped
        offset — the same graceful-degradation class as the exact path's
        border-coordinate clamp, and the fixed-point iterations absorb it
        unless motion genuinely exceeds R at the finest level;
      * the two passes factor per-axis, evaluating the y-lerp at the
        sampled column's weights; exact when the flow is locally constant
        over the x-shift distance, which the 15×15 box-blurred flow field
        of this estimator is. Pass ``warp_px=0`` to the op for the exact
        single-gather path.
    """
    t, h, w, c = img.shape
    ry = min(warp_px, h - 1)
    rx = min(warp_px, w - 1)
    fy = jnp.clip(fy, 0.0, h - 1.0)
    fx = jnp.clip(fx, 0.0, w - 1.0)
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    wy = fy - y0
    wx = fx - x0
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    dy = jnp.clip(y0 - yy, -ry, ry - 1).astype(jnp.int32)
    dx = jnp.clip(x0 - xx, -rx, rx - 1).astype(jnp.int32)

    pad = jnp.pad(img, ((0, 0), (ry, ry), (0, 0), (0, 0)), mode="edge")
    a = jnp.zeros_like(img)
    for d in range(-ry, ry + 1):
        wgt = jnp.where(dy == d, 1 - wy, 0.0) + \
            jnp.where(dy == d - 1, wy, 0.0)
        a = a + wgt[..., None] * jax.lax.slice_in_dim(pad, ry + d,
                                                      ry + d + h, axis=1)
    pad_a = jnp.pad(a, ((0, 0), (0, 0), (rx, rx), (0, 0)), mode="edge")
    b = jnp.zeros_like(img)
    for d in range(-rx, rx + 1):
        wgt = jnp.where(dx == d, 1 - wx, 0.0) + \
            jnp.where(dx == d - 1, wx, 0.0)
        b = b + wgt[..., None] * jax.lax.slice_in_dim(pad_a, rx + d,
                                                      rx + d + w, axis=2)
    return b


# ------------------------------------------------- polynomial expansion

@functools.lru_cache(maxsize=8)
def _poly_setup(poly_n: int, poly_sigma: float):
    """Basis kernels g, x·g, x²·g and the folded inverse-Gram coefficients
    (the ig11/ig03/ig33/ig55 constants of Farnebäck's scheme), computed
    numerically from the 6×6 Gram matrix of {1, x, y, x², y², xy} under the
    separable Gaussian weight."""
    n = poly_n
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(x * x) / (2.0 * poly_sigma * poly_sigma))
    g /= g.sum()
    xg = x * g
    xxg = x * x * g
    m2 = float((x * x * g).sum())
    m4 = float((x ** 4 * g).sum())
    # Gram matrix for basis [1, x, y, x², y², xy], separable weight w(x)w(y)
    G = np.zeros((6, 6))
    G[0, 0] = 1.0
    G[1, 1] = G[2, 2] = m2
    G[3, 3] = G[4, 4] = m4
    G[5, 5] = m2 * m2
    G[0, 3] = G[0, 4] = G[3, 0] = G[4, 0] = m2
    G[3, 4] = G[4, 3] = m2 * m2
    invG = np.linalg.inv(G)
    ig11 = invG[1, 1]
    ig03 = invG[0, 3]
    ig33 = invG[3, 3]
    ig55 = invG[5, 5]
    return (g.astype(np.float32), xg.astype(np.float32),
            xxg.astype(np.float32), float(ig11), float(ig03), float(ig33),
            float(ig55))


def _poly_exp(img: jnp.ndarray, poly_n: int, poly_sigma: float) -> jnp.ndarray:
    """img: [T, H, W] f32 -> R: [T, H, W, 5] = (bx, by, axx, ayy, axy')."""
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_setup(poly_n, poly_sigma)
    r = poly_n
    pad = lambda a: jnp.pad(a, ((0, 0), (r, r), (r, r)), mode="edge")
    x = pad(img)
    H, W = img.shape[1], img.shape[2]
    gj, xgj, xxgj = jnp.asarray(g), jnp.asarray(xg), jnp.asarray(xxg)
    n = len(g)

    def corr_x(a, k):
        return sum(a[:, :, i : i + W] * k[i] for i in range(n))

    def corr_y(a, k):
        return sum(a[:, i : i + H, :] * k[i] for i in range(n))

    # horizontal pass over x (rows stay padded in y)
    row0 = corr_x(x, gj)      # g·I
    row1 = corr_x(x, xgj)     # xg·I
    row2 = corr_x(x, xxgj)    # x²g·I
    # vertical pass
    b1 = corr_y(row0, gj)     # g⊗g
    b2 = corr_y(row0, xgj)    # y-linear
    b3 = corr_y(row1, gj)     # x-linear
    b4 = corr_y(row2, gj)     # x-quadratic
    b5 = corr_y(row0, xxgj)   # y-quadratic
    b6 = corr_y(row1, xgj)    # cross

    bx = b3 * ig11
    by = b2 * ig11
    axx = b1 * ig03 + b4 * ig33
    ayy = b1 * ig03 + b5 * ig33
    axy = b6 * ig55
    return jnp.stack([bx, by, axx, ayy, axy], axis=-1)


# --------------------------------------------------- flow update machinery

def _update_matrices(r0: jnp.ndarray, r1: jnp.ndarray, flow: jnp.ndarray,
                     warp_px: int = 16) -> jnp.ndarray:
    """Per-pixel normal equations M = [G00, G01, G11, h0, h1] from the two
    polynomial expansions and the current flow estimate. ``warp_px`` > 0
    warps via the fast select-over-shifts path (see _shift_warp); 0 uses
    the exact single-gather warp."""
    t, h, w, _ = r0.shape
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    fy = yy + flow[..., 1]
    fx = xx + flow[..., 0]
    if warp_px > 0:
        r1w = _shift_warp(r1, fy, fx, warp_px)
    else:
        r1w = _bilinear_sample(r1, fy, fx)

    a11 = (r0[..., 2] + r1w[..., 2]) * 0.5
    a22 = (r0[..., 3] + r1w[..., 3]) * 0.5
    a12 = (r0[..., 4] + r1w[..., 4]) * 0.25
    dbx = -(r1w[..., 0] - r0[..., 0]) * 0.5 + a11 * flow[..., 0] \
        + a12 * flow[..., 1]
    dby = -(r1w[..., 1] - r0[..., 1]) * 0.5 + a12 * flow[..., 0] \
        + a22 * flow[..., 1]

    g00 = a11 * a11 + a12 * a12
    g01 = a12 * (a11 + a22)
    g11 = a22 * a22 + a12 * a12
    h0 = a11 * dbx + a12 * dby
    h1 = a12 * dbx + a22 * dby
    m = jnp.stack([g00, g01, g11, h0, h1], axis=-1)

    # Damp the per-pixel equations in a 5-px border band (polynomial
    # expansions there see replicated pixels and are unreliable; without
    # damping they dominate the box-blurred normal equations at coarse
    # pyramid levels and the flow diverges — Farnebäck's estimator applies
    # the same border down-weighting).
    BORDER = 5.0
    ay = jnp.arange(h, dtype=jnp.float32)
    ax = jnp.arange(w, dtype=jnp.float32)
    sy = jnp.clip((jnp.minimum(ay, h - 1 - ay) + 0.5) / BORDER, 0.0, 1.0)
    sx = jnp.clip((jnp.minimum(ax, w - 1 - ax) + 0.5) / BORDER, 0.0, 1.0)
    return m * (sy[None, :, None] * sx[None, None, :])[..., None]


def _box_blur(m: jnp.ndarray, win: int) -> jnp.ndarray:
    """[T, H, W, C] mean filter over win×win, border replicate."""
    r_lo = win // 2
    r_hi = win - r_lo - 1
    x = jnp.pad(m, ((0, 0), (r_lo, r_hi), (r_lo, r_hi), (0, 0)), mode="edge")

    def box1(a, axis, size, out_len):
        cs = jnp.cumsum(a, axis=axis)
        zero = jnp.zeros_like(jax.lax.slice_in_dim(cs, 0, 1, axis=axis))
        cs = jnp.concatenate([zero, cs], axis=axis)
        hi = jax.lax.slice_in_dim(cs, size, size + out_len, axis=axis)
        lo = jax.lax.slice_in_dim(cs, 0, out_len, axis=axis)
        return hi - lo

    s = box1(box1(x, 1, win, m.shape[1]), 2, win, m.shape[2])
    return s / float(win * win)


def _solve_flow(m: jnp.ndarray) -> jnp.ndarray:
    g00, g01, g11, h0, h1 = (m[..., i] for i in range(5))
    det = g00 * g11 - g01 * g01
    idet = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
    fx = (g11 * h0 - g01 * h1) * idet
    fy = (g00 * h1 - g01 * h0) * idet
    return jnp.stack([fx, fy], axis=-1)


# --------------------------------------------------------------- main entry

def farneback_pairs(
    gray0: jnp.ndarray,
    gray1: jnp.ndarray,
    levels: int = 3,
    pyr_scale: float = 0.5,
    win_size: int = 15,
    iters: int = 3,
    poly_n: int = 5,
    poly_sigma: float = 1.2,
    warp_px: int = 16,
) -> jnp.ndarray:
    """gray0/gray1: [T, H, W] float32 in [0,255] -> flow [T, H, W, 2].
    ``warp_px``: displacement bound of the fast shift-warp (0 = exact
    gather warp; see _shift_warp)."""
    t, H, W = gray0.shape
    # pyramid sizes, coarsest first (k = levels .. 0)
    sizes = []
    for k in range(levels, -1, -1):
        scale = pyr_scale ** k
        sizes.append((max(2, int(round(H * scale))),
                      max(2, int(round(W * scale))), scale))

    flow = None
    for (h, w, scale) in sizes:
        if scale < 1.0:
            sigma = (1.0 / scale - 1.0) * 0.5
            ksize = max(3, int(round(sigma * 5)) | 1)
            gk = _gaussian_kernel1d(sigma, ksize // 2)
            i0 = _resize_bilinear(_sepconv(gray0, gk, gk), h, w)
            i1 = _resize_bilinear(_sepconv(gray1, gk, gk), h, w)
        else:
            i0, i1 = gray0, gray1

        if flow is None:
            flow = jnp.zeros((t, h, w, 2), jnp.float32)
        else:
            flow = _resize_bilinear(
                flow.transpose(0, 3, 1, 2), h, w
            ).transpose(0, 2, 3, 1) * (1.0 / pyr_scale)

        r0 = _poly_exp(i0, poly_n, poly_sigma)
        r1 = _poly_exp(i1, poly_n, poly_sigma)
        for _ in range(iters):
            m = _update_matrices(r0, r1, flow, warp_px)
            m = _box_blur(m, win_size)
            flow = _solve_flow(m)
    return flow


@register_op("OpticalFlow", kind="device", stencil=(0, 1), outputs=("flow",),
             compact_sink="out_dtype")
def optical_flow(ctx, frames, levels: int = 3, pyr_scale: float = 0.5,
                 win_size: int = 15, iters: int = 3, poly_n: int = 5,
                 poly_sigma: float = 1.2, warp_px: int = 16,
                 out_dtype: str = "float32"):
    """frames: FrameChunk/[T+1, H, W, 3] u8 (1-frame forward halo) ->
    [T, H, W, 2] flow between consecutive frames. ``warp_px`` bounds
    the fast shift-warp's displacement (0 = exact gather warp).

    ``out_dtype="float16"`` emits half-precision flow: 4× fewer device→host
    readback bytes for store-the-flow-field pipelines (the reference's
    tests/test_all.py:162-177 pattern, which moves 2.4 MB/frame at 480p in
    f32). Flow magnitudes are O(frame size) pixels, so f16's ~3 significant
    digits cost <0.1 px — the ``flow`` serde upcasts to f32 on load, keeping
    the reference's H×W×2 float32 load contract (types.py 'flow')."""
    if isinstance(frames, FrameChunk):
        x = frames.hwc_f32().astype(jnp.uint8)
    else:
        x = jnp.asarray(frames)
    gray = _rgb2gray_u8(x)[..., 0].astype(jnp.float32)  # [T+1, H, W]
    flow = farneback_pairs(
        gray[:-1], gray[1:], levels=levels, pyr_scale=pyr_scale,
        win_size=win_size, iters=iters, poly_n=poly_n, poly_sigma=poly_sigma,
        warp_px=warp_px,
    )
    if out_dtype == "float16":
        flow = flow.astype(jnp.float16)
    elif out_dtype != "float32":
        raise ValueError(f"out_dtype must be float32|float16, got {out_dtype}")
    return flow
