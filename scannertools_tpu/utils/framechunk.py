"""FrameChunk — the device-layout convention for decoded frame chunks.

TPU layout rule discovered empirically (see docs/PERF_NOTES.md): a uint8
array shaped [T, H, W, 3] tiles catastrophically on TPU (trailing dim 3 →
padded lanes; any reshape triggers a ~1000× relayout shuffle). Decoded frames
therefore travel as the *raw byte stream* of each frame, viewed as
``[T, rows, 128] uint8`` with ``rows = ceil(payload / 128)`` — exactly the
contiguous decode buffer, so the host-side view is free (np.reshape).

Two storage formats (``fmt``):

* ``"rgb"`` — interleaved RGB24 (payload = H*W*3 bytes/frame). The classic
  path: the host decoder already paid an swscale YUV→RGB conversion.
* ``"i420"`` — planar YUV 4:2:0 straight off the video codec (payload =
  H*W*3/2 bytes/frame): Y plane, then U, then V. Half the host→HBM bytes
  of RGB24 and **zero host colorspace math** — ``hwc_f32()`` does the
  BT.601/709 YUV→RGB conversion on-device, where XLA fuses it into the
  consumer (reference bar: the engine's decode workers feed kernels without
  a host colorspace detour, SURVEY §1 L0).

Ops choose their representation:
  * byte-stream ops (histogram) consume ``.flat`` directly when
    ``fmt == "rgb"`` — one clean HBM pass at full bandwidth;
  * spatial ops (resize/flow/NN) call ``.hwc_f32()`` — the u8→f32 convert
    (and, for i420, the YUV→RGB matrix) happens in the well-tiled flat
    layout, then the f32 reshape to NHWC is cheap.

Registered as a JAX pytree (shape metadata static), so FrameChunks pass
straight through jit boundaries and fused op segments.
"""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

LANES = 128

# YUV->RGB matrix coefficients: (y_scale, y_off, r_v, g_u, g_v, b_u) for
# R = ys*(Y-yo) + rv*(V-128); G = ys*(Y-yo) - gu*(U-128) - gv*(V-128);
# B = ys*(Y-yo) + bu*(U-128). Keyed by (bt709, full_range). Limited range
# uses the standard 16..235 excursion (what untagged mp4s carry).
_YUV_COEFS = {
    (False, False): (1.1643836, 16.0, 1.5960268, 0.3917623, 0.8129676,
                     2.0172321),
    (False, True): (1.0, 0.0, 1.402, 0.344136, 0.714136, 1.772),
    (True, False): (1.1643836, 16.0, 1.7927411, 0.2132486, 0.5329093,
                    2.1124018),
    (True, True): (1.0, 0.0, 1.5748, 0.1873243, 0.4681243, 1.8556),
}


def yuv420_to_rgb(y, u, v, full_range: bool, bt709: bool, xp=jnp):
    """Planar YUV (Y: [..., H, W]; U/V: [..., H/2, W/2]) -> RGB f32
    [..., H, W, 3] in 0..255, floored to integers — swscale's fixed-point
    unscaled converter truncates, so floor tracks the u8 values an RGB24
    decode would have produced (measured: 0.39 mean / 2 max abs diff vs
    1.02 mean with round; nearest-neighbor chroma upsample vs swscale's
    interpolating filter accounts for the residual — tolerance-tested in
    tests/test_yuv_ingest.py). Works for numpy (host sinks) and jax.numpy
    (fused device segments) via ``xp``."""
    ys, yo, rv, gu, gv, bu = _YUV_COEFS[(bool(bt709), bool(full_range))]
    yy = (y - yo) * ys
    d = u - 128.0
    e = v - 128.0
    # nearest-neighbor 2x chroma upsample
    d = xp.repeat(xp.repeat(d, 2, axis=-2), 2, axis=-1)
    e = xp.repeat(xp.repeat(e, 2, axis=-2), 2, axis=-1)
    r = yy + rv * e
    g = yy - gu * d - gv * e
    b = yy + bu * d
    rgb = xp.stack([r, g, b], axis=-1)
    return xp.clip(xp.floor(rgb), 0.0, 255.0)


@jax.tree_util.register_pytree_node_class
class FrameChunk:
    """flat: [T, rows, 128] uint8 (np.ndarray on host, jnp on device)."""

    def __init__(self, flat, h: int, w: int, c: int = 3, fmt: str = "rgb",
                 full_range: bool = False, bt709: bool = False):
        self.flat = flat
        self.h = int(h)
        self.w = int(w)
        self.c = int(c)
        self.fmt = fmt
        self.full_range = bool(full_range)
        self.bt709 = bool(bt709)

    # -- pytree protocol --
    def tree_flatten(self):
        return (self.flat,), (self.h, self.w, self.c, self.fmt,
                              self.full_range, self.bt709)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    # -- metadata --
    @property
    def n_frames(self) -> int:
        return self.flat.shape[0]

    @property
    def npix(self) -> int:
        return self.h * self.w * self.c

    @property
    def payload(self) -> int:
        """Meaningful bytes per frame in ``flat`` (before lane padding)."""
        if self.fmt == "i420":
            return self.h * self.w * 3 // 2
        return self.h * self.w * self.c

    @property
    def shape_hwc(self) -> Tuple[int, int, int]:
        return (self.h, self.w, self.c)

    def __repr__(self):
        return (f"FrameChunk(T={self.flat.shape[0]}, {self.h}x{self.w}x"
                f"{self.c}, {self.fmt}, {type(self.flat).__name__})")

    # -- construction --
    @staticmethod
    def _from_payload(flat2d, h: int, w: int, c: int, fmt: str,
                      full_range: bool = False,
                      bt709: bool = False) -> "FrameChunk":
        t, p = flat2d.shape
        rem = (-p) % LANES
        if rem:
            flat2d = np.pad(flat2d, ((0, 0), (0, rem)))
        return FrameChunk(flat2d.reshape(t, (p + rem) // LANES, LANES),
                          h, w, c, fmt, full_range, bt709)

    @staticmethod
    def from_hwc(frames: np.ndarray) -> "FrameChunk":
        """Wrap a host [T, H, W, C] uint8 buffer (zero-copy when the byte
        count is lane-aligned; otherwise one host pad copy)."""
        t, h, w, c = frames.shape
        flat = np.ascontiguousarray(frames).reshape(t, h * w * c)
        return FrameChunk._from_payload(flat, h, w, c, "rgb")

    @staticmethod
    def from_i420(planes: np.ndarray, h: int, w: int,
                  full_range: bool = False,
                  bt709: bool = False) -> "FrameChunk":
        """Wrap a host [T, H*W*3//2] uint8 packed-I420 buffer (the native
        decoder's read_frames_i420 output)."""
        t = planes.shape[0]
        flat = np.ascontiguousarray(planes).reshape(t, h * w * 3 // 2)
        return FrameChunk._from_payload(flat, h, w, 3, "i420",
                                        full_range, bt709)

    # -- representations --
    def _planes_f32(self, xp):
        """i420 flat bytes -> (y, u, v) f32 planes. Conversion to f32
        happens in the well-tiled flat layout; the plane reshapes are f32
        (cheap relayout)."""
        t = self.flat.shape[0]
        h, w = self.h, self.w
        ysz = h * w
        csz = (h // 2) * (w // 2)
        if xp is np:
            x = self.flat.reshape(t, -1).astype(np.float32)
        else:
            x = xp.asarray(self.flat).astype(xp.float32).reshape(t, -1)
        y = x[:, :ysz].reshape(t, h, w)
        u = x[:, ysz:ysz + csz].reshape(t, h // 2, w // 2)
        v = x[:, ysz + csz:ysz + 2 * csz].reshape(t, h // 2, w // 2)
        return y, u, v

    def hwc_u8(self):
        """[T, H, W, C] uint8 (host: free view for rgb, one numpy convert
        for i420; device: relayout — prefer hwc_f32 for device math)."""
        t = self.flat.shape[0]
        if self.fmt == "i420":
            if isinstance(self.flat, np.ndarray):
                y, u, v = self._planes_f32(np)
                return yuv420_to_rgb(y, u, v, self.full_range, self.bt709,
                                     xp=np).astype(np.uint8)
            return self.hwc_f32().astype(jnp.uint8)
        return self.flat.reshape(t, -1)[:, : self.npix].reshape(
            t, self.h, self.w, self.c
        )

    def hwc_f32(self):
        """[T, H, W, C] float32 on device: convert in flat layout first.
        For i420 chunks this is where the fused YUV->RGB runs."""
        t = self.flat.shape[0]
        if self.fmt == "i420":
            xp = np if isinstance(self.flat, np.ndarray) else jnp
            y, u, v = self._planes_f32(xp)
            return yuv420_to_rgb(y, u, v, self.full_range, self.bt709, xp=xp)
        x = jnp.asarray(self.flat).astype(jnp.float32)
        return x.reshape(t, -1)[:, : self.npix].reshape(
            t, self.h, self.w, self.c
        )

    def rgb(self) -> "FrameChunk":
        """An equivalent chunk whose flat bytes are RGB24 — identity for
        rgb chunks; host-side conversion for host i420 chunks (device i420
        chunks should use hwc_f32 directly instead of re-flattening u8)."""
        if self.fmt == "rgb":
            return self
        if not isinstance(self.flat, np.ndarray):
            raise ValueError(
                "rgb() on a device i420 chunk would relayout u8 on-device; "
                "use hwc_f32() (fused conversion) instead")
        return FrameChunk.from_hwc(self.hwc_u8())

    def device(self) -> "FrameChunk":
        return FrameChunk(jnp.asarray(self.flat), self.h, self.w, self.c,
                          self.fmt, self.full_range, self.bt709)

    def host(self) -> "FrameChunk":
        if isinstance(self.flat, np.ndarray):
            return self
        return FrameChunk(np.asarray(jax.device_get(self.flat)),
                          self.h, self.w, self.c, self.fmt,
                          self.full_range, self.bt709)

    # -- row ops used by the executor --
    def slice_rows(self, start: int, length: int) -> "FrameChunk":
        return FrameChunk(self.flat[start : start + length],
                          self.h, self.w, self.c, self.fmt,
                          self.full_range, self.bt709)

    def __len__(self) -> int:
        return self.flat.shape[0]


def is_frame_chunk(x) -> bool:
    return isinstance(x, FrameChunk)


def as_hwc_f32(frames: Union[FrameChunk, jnp.ndarray]) -> jnp.ndarray:
    """Device ops' helper: accept FrameChunk or a plain NHWC array."""
    if isinstance(frames, FrameChunk):
        return frames.hwc_f32()
    x = jnp.asarray(frames)
    return x.astype(jnp.float32) if x.dtype != jnp.float32 else x
