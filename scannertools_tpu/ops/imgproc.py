"""Image-processing ops: Resize, Blur, ConvertColor, FrameDifference,
Montage, Brightness/Contrast/Sharpness, FlowHistogram, vis ops.

Reference parity:
  Resize          resize_kernel.cpp:22-106 (width/height/min/preserve_aspect,
                  INTER_LINEAR default)
  Blur            blur_kernel_cpu.cpp:51-80 (naive box filter, integer mean,
                  interior-only; the reference leaves borders uninitialized —
                  we copy the input there instead)
  ConvertColor    convert_color_kernel.cpp:10-210 (cv::cvtColor string map;
                  the common conversions are implemented on device with
                  cv2-exact fixed-point; exotic codes fall back to host cv2)
  FrameDifference frame_difference_kernel_cpu.cpp:232-287 (dead code in the
                  reference build — registered here fixed, as |cur - prev|)
  Montage         montage_kernel_cpu.cpp:9-115 (stateful accumulator grid)
  Brightness/Contrast/Sharpness/ConvertToHSV/SharpnessBBox
                  old/imgproc.py:11-54 (YUV mean / Y-channel RMS contrast /
                  Laplacian variance)
  FlowHistogram   old/cpp_ops/flow_histogram_kernel_cpu.cpp:12-67
                  (64-bin magnitude [0,64) + angle [0,360) histograms)
  DrawFlow/DrawBboxes  vis.py:8-24

TPU-native notes: device ops take FrameChunk/NHWC arrays, compute in f32 on
the VPU inside the fused chunk program, and emit u8 frames. Blur uses a
separable cumulative-sum box filter (O(1) per pixel vs the reference's
O(k²) loop). Color conversions use cv2's exact fixed-point arithmetic so
tests can assert bit-equality.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..registry import register_op
from ..utils.framechunk import FrameChunk


def _as_u8_hwc(frames):
    if isinstance(frames, FrameChunk):
        return frames.hwc_f32()  # device path: convert in flat layout
    x = jnp.asarray(frames)
    return x.astype(jnp.float32) if x.dtype == jnp.uint8 else x


# --------------------------------------------------------------------- Resize

def resize_shape(h: int, w: int, width: int = 0, height: int = 0,
                 preserve_aspect: bool = False, min: bool = False):
    """Target (th, tw) per the reference arg semantics
    (resize_kernel.cpp:44-61)."""
    tw, th = int(width), int(height)
    if preserve_aspect:
        if tw == 0:
            tw = w * th // h
        else:
            th = h * tw // w
    if min and w <= tw and h <= th:
        tw, th = w, h
    return th, tw


@register_op("Resize", kind="device", outputs=("frame",))
def resize(ctx, frame, width: int = 0, height: int = 0,
           preserve_aspect: bool = False, min: bool = False,
           interpolation: str = "INTER_LINEAR"):
    x = _as_u8_hwc(frame)
    t, h, w, c = x.shape
    th, tw = resize_shape(h, w, width, height, preserve_aspect, min)
    method = {"INTER_LINEAR": "linear", "INTER_NEAREST": "nearest",
              "INTER_CUBIC": "cubic", "INTER_AREA": "linear"}.get(
                  interpolation, "linear")
    out = jax.image.resize(x, (t, th, tw, c), method=method, antialias=False)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


# ----------------------------------------------------------------------- Blur

def _box1d(a, axis, lo, hi):
    """Windowed sums via padded cumulative sums: output[i] = sum over
    a[i .. i+lo+hi] (length n-(lo+hi)). Sums of u8 pixels stay exact in
    f32 while any cumsum value < 2^24 (h, k*w < ~65k)."""
    n = a.shape[axis]
    cs = jnp.cumsum(a, axis=axis)
    zero = jnp.zeros_like(jax.lax.slice_in_dim(cs, 0, 1, axis=axis))
    cs = jnp.concatenate([zero, cs], axis=axis)  # cs[i] = sum a[:i]
    upper = jax.lax.slice_in_dim(cs, lo + hi + 1, n + 1, axis=axis)
    lower = jax.lax.slice_in_dim(cs, 0, n - lo - hi, axis=axis)
    return upper - lower


def _box1d_same(a, axis, lo, hi):
    """SAME-padded window sums: output[i] = sum a[i-lo .. i+hi], zeros
    outside — row-count preserving (the spatially-sharded formulation)."""
    pads = [(0, 0)] * a.ndim
    pads[axis] = (lo, hi)
    return _box1d(jnp.pad(a, pads), axis, lo, hi)


def _blur_sp_halo(params: dict):
    k = int(params.get("kernel_size", 3))
    return max(k // 2, k - k // 2 - 1)


@register_op("Blur", kind="device", outputs=("frame",),
             sp_halo=_blur_sp_halo)
def blur(ctx, frame, kernel_size: int = 3, sigma: float = 0.0):
    """Box blur, integer mean over a kernel_size² window, interior pixels
    only (blur_kernel_cpu.cpp:62-79: value / k² in integer arithmetic).
    Implemented as a separable prefix-sum filter: O(1)/pixel on the VPU.

    Under ``PerfParams(spatial_shards=N)`` the frame's row axis is sharded
    over the reserved 'sp' mesh devices with a one-hop ICI halo exchange
    (parallel/spatial.spatial_apply_traced) — for frames too large for one
    chip — and the result is bit-identical to the unsharded path (all
    window sums are exact u8 integer sums in f32).
    """
    x = _as_u8_hwc(frame)  # f32
    k = int(kernel_size)
    left = k // 2
    right = k - k // 2 - 1
    t, h, w, c = x.shape

    halo = max(left, right)
    mesh = ctx.sp_mesh(h, halo) if hasattr(ctx, "sp_mesh") else None
    if mesh is not None and halo > 0:
        from ..parallel.spatial import spatial_apply_traced

        col = jnp.arange(w)
        in_col = (col >= left) & (col < w - right)

        def body(padded, gidx):
            # padded [t, local+2*halo, w, c]; gidx = global row index of
            # each padded row (<0 / >=h outside the image)
            inside = ((gidx >= 0) & (gidx < h)).astype(padded.dtype)
            xm = padded * inside[None, :, None, None]
            sums = _box1d_same(_box1d_same(xm, 1, left, right),
                               2, left, right)
            mean = jnp.floor(sums / (k * k))
            in_row = (gidx >= left) & (gidx < h - right)
            m = in_row[None, :, None, None] & in_col[None, None, :, None]
            # interior pixels get the mean; borders keep original pixels
            return jnp.where(m, mean, xm).astype(jnp.uint8)

        return spatial_apply_traced(body, x, halo, mesh)

    sums = _box1d(_box1d(x, 1, left, right), 2, left, right)
    mean = jnp.floor(sums / (k * k))  # integer division like the reference
    out = x.astype(jnp.uint8)
    interior = mean.astype(jnp.uint8)
    # paste interior over a copy of the input (reference leaves borders
    # uninitialized; we keep them as the original pixels)
    out = jax.lax.dynamic_update_slice(out, interior, (0, left, left, 0))
    return out


# --------------------------------------------------------------- ConvertColor

def _rgb2gray_u8(x):
    """cv2 fixed-point BT.601: (R*4899 + G*9617 + B*1868 + 8192) >> 14."""
    xi = x.astype(jnp.int32)
    y = (xi[..., 0] * 4899 + xi[..., 1] * 9617 + xi[..., 2] * 1868 + 8192) >> 14
    return y.astype(jnp.uint8)[..., None]


def _rgb2yuv_u8(x):
    """cv2 RGB2YUV u8 (fixed-point, ITU-R BT.601 with delta 128)."""
    xi = x.astype(jnp.float32)
    r, g, b = xi[..., 0], xi[..., 1], xi[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = 0.492 * (b - y) + 128.0
    v = 0.877 * (r - y) + 128.0
    out = jnp.stack([y, u, v], axis=-1)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def _rgb2hsv_u8(x):
    """cv2 RGB2HSV for u8: H in [0,180), S,V in [0,255]."""
    xf = x.astype(jnp.float32)
    r, g, b = xf[..., 0], xf[..., 1], xf[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    s = jnp.where(v > 0, 255.0 * diff / jnp.maximum(v, 1e-9), 0.0)
    safe = jnp.maximum(diff, 1e-9)
    h = jnp.where(
        v == r, 60.0 * (g - b) / safe,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe,
                  240.0 + 60.0 * (r - g) / safe),
    )
    h = jnp.where(diff == 0, 0.0, h)
    h = jnp.where(h < 0, h + 360.0, h) / 2.0  # [0,180)
    out = jnp.stack([h, s, v], axis=-1)
    out = jnp.clip(jnp.round(out), 0, 255)
    # u8 hue wraps at 180 (cv2 stores H/2 in [0,180))
    out = out.at[..., 0].set(out[..., 0] % 180)
    return out.astype(jnp.uint8)


_DEVICE_CONVERSIONS = {
    "COLOR_RGB2GRAY": _rgb2gray_u8,
    "COLOR_BGR2GRAY": lambda x: _rgb2gray_u8(x[..., ::-1]),
    "COLOR_RGB2BGR": lambda x: x[..., ::-1].astype(jnp.uint8),
    "COLOR_BGR2RGB": lambda x: x[..., ::-1].astype(jnp.uint8),
    "COLOR_RGB2HSV": _rgb2hsv_u8,
    "COLOR_BGR2HSV": lambda x: _rgb2hsv_u8(x[..., ::-1]),
    "COLOR_RGB2YUV": _rgb2yuv_u8,
    "COLOR_GRAY2RGB": lambda x: jnp.repeat(x.astype(jnp.uint8), 3, axis=-1),
}


@register_op("ConvertColor", kind="device", outputs=("frame",),
             sp_halo=lambda p: 0)
def convert_color(ctx, frame, conversion: str = "COLOR_RGB2GRAY"):
    """Per-pixel, so row-pointwise: under ``PerfParams(spatial_shards=N)``
    the rows shard over the reserved 'sp' mesh (halo 0, bit-identical —
    parallel/spatial.spatial_apply_pointwise)."""
    x = _as_u8_hwc(frame)
    if conversion not in _DEVICE_CONVERSIONS:
        raise ValueError(
            f"ConvertColor: {conversion} has no device implementation; "
            "use ConvertColorHost for exotic cv2 codes"
        )
    fn = _DEVICE_CONVERSIONS[conversion]
    mesh = ctx.sp_mesh(x.shape[1]) if hasattr(ctx, "sp_mesh") else None
    if mesh is not None:
        from ..parallel.spatial import spatial_apply_pointwise

        return spatial_apply_pointwise(fn, x, mesh)
    return fn(x)


@register_op("ConvertColorHost", kind="host", outputs=("frame",))
def convert_color_host(ctx, frames, conversion: str = "COLOR_RGB2GRAY"):
    """Full ~200-code coverage via host cv2 (convert_color_kernel.cpp map)."""
    import cv2

    code = getattr(cv2, conversion.replace("COLOR_", "COLOR_", 1))
    out = []
    n = len(frames) if isinstance(frames, list) else frames.shape[0]
    for i in range(n):
        r = cv2.cvtColor(np.asarray(frames[i]), code)
        out.append(r if r.ndim == 3 else r[..., None])
    return out


@register_op("ConvertToHSV", kind="device", outputs=("frame",),
             sp_halo=lambda p: 0)
def convert_to_hsv(ctx, frame):
    """old/imgproc.py:40 — cv2.cvtColor(frame, COLOR_RGB2HSV)."""
    x = _as_u8_hwc(frame)
    mesh = ctx.sp_mesh(x.shape[1]) if hasattr(ctx, "sp_mesh") else None
    if mesh is not None:
        from ..parallel.spatial import spatial_apply_pointwise

        return spatial_apply_pointwise(_rgb2hsv_u8, x, mesh)
    return _rgb2hsv_u8(x)


# ------------------------------------------------------------ FrameDifference

@register_op("FrameDifference", kind="device", stencil=(-1, 0),
             outputs=("frame",), sp_halo=lambda p: 0)
def frame_difference(ctx, frames):
    """|frame[i] - frame[i-1]| per pixel (fixed version of the reference's
    dead frame_difference_kernel_cpu.cpp). First frame diffs against itself
    (stream-edge clamp) -> zeros. The temporal stencil is row-pointwise in
    H, so rows shard over the 'sp' mesh under spatial_shards (halo 0)."""
    x = _as_u8_hwc(frames)  # [T+1, H, W, C] with 1-frame leading halo
    diff = lambda a: jnp.abs(a[1:] - a[:-1]).astype(jnp.uint8)
    mesh = ctx.sp_mesh(x.shape[1]) if hasattr(ctx, "sp_mesh") else None
    if mesh is not None:
        from ..parallel.spatial import spatial_apply_pointwise

        return spatial_apply_pointwise(diff, x, mesh)
    return diff(x)


# ------------------------------------------------- Brightness/Contrast/Sharp

@register_op("Brightness", kind="device", outputs=("array_f32",))
def brightness(ctx, frame):
    """Mean Y of RGB2YUV (old/imgproc.py:11-16)."""
    x = _as_u8_hwc(frame)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    return jnp.round(y).clip(0, 255).astype(jnp.uint8).astype(jnp.float32) \
        .mean(axis=(1, 2), keepdims=False)[:, None]


@register_op("Contrast", kind="device", outputs=("array_f32",))
def contrast(ctx, frame):
    """RMS deviation of the Y channel (old/imgproc.py:19-30)."""
    x = _as_u8_hwc(frame)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = jnp.round(0.299 * r + 0.587 * g + 0.114 * b).clip(0, 255)
    mean = y.mean(axis=(1, 2), keepdims=True)
    rms = jnp.sqrt(((y - mean) ** 2).mean(axis=(1, 2)))
    return rms[:, None]


def _laplacian_var(x):
    """cv2.Laplacian(ksize=1) variance with REFLECT_101 borders, per frame
    over all channels (old/imgproc.py:33-36)."""
    # kernel [[0,1,0],[1,-4,1],[0,1,0]] separably: lap = up+down+left+right-4x
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    lap = (pad[:, :-2, 1:-1] + pad[:, 2:, 1:-1] + pad[:, 1:-1, :-2]
           + pad[:, 1:-1, 2:] - 4.0 * x)
    mean = lap.mean(axis=(1, 2, 3), keepdims=True)
    return ((lap - mean) ** 2).mean(axis=(1, 2, 3))


@register_op("Sharpness", kind="device", outputs=("array_f32",))
def sharpness(ctx, frame):
    return _laplacian_var(_as_u8_hwc(frame))[:, None]


@register_op("SharpnessBBox", kind="host", outputs=("object",))
def sharpness_bbox(ctx, frames, bboxes):
    """Laplacian variance per 200x200-resized bbox crop
    (old/imgproc.py:44-54). bboxes are absolute-pixel BoundingBoxes here."""
    import cv2

    out = []
    for i in range(len(bboxes)):
        frame = np.asarray(frames[i])
        results = []
        for bbox in bboxes[i]:
            img = frame[int(bbox.y1):int(bbox.y2), int(bbox.x1):int(bbox.x2)]
            if img.size == 0:
                results.append(0.0)
                continue
            img = cv2.resize(img, (200, 200))
            results.append(float(cv2.Laplacian(img, cv2.CV_64F).var()))
        out.append(results)
    return out


# ------------------------------------------------------------- FlowHistogram

@register_op("FlowHistogram", kind="device", outputs=("array_i32",))
def flow_histogram(ctx, flow, bins: int = 64):
    """[T,H,W,2] flow -> [T,2,64] int32: magnitude histogram over [0,64) and
    angle (degrees) over [0,360); out-of-range values are excluded, matching
    cv::calcHist (flow_histogram_kernel_cpu.cpp:30-55)."""
    f = jnp.asarray(flow)
    mag = jnp.sqrt(f[..., 0] ** 2 + f[..., 1] ** 2)
    ang = jnp.degrees(jnp.arctan2(f[..., 1], f[..., 0]))
    ang = jnp.where(ang < 0, ang + 360.0, ang)

    def hist(vals, lo, hi):
        idx = jnp.floor((vals - lo) * (bins / (hi - lo))).astype(jnp.int32)
        idx = jnp.where((vals >= lo) & (vals < hi), idx, bins)  # dead bucket
        onehot = idx[..., None] == jnp.arange(bins, dtype=jnp.int32)
        return jnp.sum(onehot, axis=(1, 2), dtype=jnp.int32)

    return jnp.stack([hist(mag, 0.0, 64.0), hist(ang, 0.0, 360.0)], axis=1)


# -------------------------------------------------------------------- Montage

def _montage_init(ctx):
    return {"seen": 0, "buffer": None}


@register_op("Montage", kind="stateful", outputs=("frame",),
             init_state=_montage_init)
def montage(ctx, state, frames, num_frames: int = 0, target_width: int = 100,
            frames_per_row: int = 8):
    """Tile num_frames into a grid; emit the montage on the final frame and
    1x1 dummies otherwise (montage_kernel_cpu.cpp:60-88: real frame only when
    frames_seen == num_frames)."""
    import cv2

    frames = np.asarray(frames)
    t, h, w, _ = frames.shape
    target_height = h * target_width // w
    rows = -(-num_frames // frames_per_row)
    if state["buffer"] is None:
        state["buffer"] = np.zeros(
            (rows * target_height, frames_per_row * target_width, 3), np.uint8
        )
    out = []
    for i in range(t):
        img = cv2.resize(frames[i], (target_width, target_height))
        x = state["seen"] % frames_per_row
        y = state["seen"] // frames_per_row
        state["buffer"][y * target_height:(y + 1) * target_height,
                        x * target_width:(x + 1) * target_width] = img
        state["seen"] += 1
        if state["seen"] == num_frames:
            out.append(state["buffer"].copy())
        else:
            out.append(np.zeros((1, 1, 3), np.uint8))
    return state, out


# ------------------------------------------------------------------- Vis ops

@register_op("DrawFlow", kind="host", outputs=("frame",))
def draw_flow(ctx, frame, flow):
    """Mean-|flow| grayscale panel hstacked with the frame (vis.py:8-12)."""
    out = []
    for i in range(len(frame)):
        f = np.asarray(frame[i])
        fl = np.asarray(flow[i])
        flow_vis = np.repeat(
            np.expand_dims(np.average(fl, axis=2), 2), 3, axis=2
        )
        mx = np.max(flow_vis)
        if mx <= 0:
            panel = np.zeros_like(f)
        else:
            panel = (np.clip(flow_vis / mx, None, 1.0) * 255).astype(np.uint8)
        out.append(np.hstack((f, panel)))
    return out


@register_op("DrawBboxes", kind="host", outputs=("frame",))
def draw_bboxes(ctx, frame, bboxes):
    """Rectangles scaled by frame dims (vis.py:15-24; bboxes normalized)."""
    import cv2

    out = []
    for i in range(len(bboxes)):
        f = np.ascontiguousarray(np.asarray(frame[i]))
        h, w = f.shape[:2]
        for bbox in bboxes[i]:
            cv2.rectangle(
                f,
                (int(bbox.x1 * w), int(bbox.y1 * h)),
                (int(bbox.x2 * w), int(bbox.y2 * h)),
                (255, 0, 0),
            )
        out.append(f)
    return out
