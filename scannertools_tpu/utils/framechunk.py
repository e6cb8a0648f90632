"""FrameChunk — the device-layout convention for decoded frame chunks.

TPU layout rule discovered empirically (see docs/PERF_NOTES.md): a uint8
array shaped [T, H, W, 3] tiles catastrophically on TPU (trailing dim 3 →
padded lanes; any reshape triggers a ~1000× relayout shuffle). Decoded frames
therefore travel as the *raw byte stream* of each frame, viewed as
``[T, rows, 128] uint8`` with ``rows = ceil(H*W*3 / 128)`` — exactly the
contiguous decode buffer, so the host-side view is free (np.reshape).

Ops choose their representation:
  * byte-stream ops (histogram) consume ``.flat`` directly — one clean HBM
    pass at full bandwidth;
  * spatial ops (resize/flow/NN) call ``.hwc_f32()`` — the u8→f32 convert
    happens in the well-tiled flat layout, then the f32 reshape to NHWC is
    cheap (f32 relayouts run near memory bandwidth).

Registered as a JAX pytree (shape metadata static), so FrameChunks pass
straight through jit boundaries and fused op segments.
"""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

LANES = 128


@jax.tree_util.register_pytree_node_class
class FrameChunk:
    """flat: [T, rows, 128] uint8 (np.ndarray on host, jnp on device)."""

    def __init__(self, flat, h: int, w: int, c: int = 3):
        self.flat = flat
        self.h = int(h)
        self.w = int(w)
        self.c = int(c)

    # -- pytree protocol --
    def tree_flatten(self):
        return (self.flat,), (self.h, self.w, self.c)

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
    def shape_hwc(self) -> Tuple[int, int, int]:
        return (self.h, self.w, self.c)

    def __repr__(self):
        return (f"FrameChunk(T={self.flat.shape[0]}, {self.h}x{self.w}x"
                f"{self.c}, {type(self.flat).__name__})")

    # -- construction --
    @staticmethod
    def from_hwc(frames: np.ndarray) -> "FrameChunk":
        """Wrap a host [T, H, W, C] uint8 buffer (zero-copy when the byte
        count is lane-aligned; otherwise one host pad copy)."""
        t, h, w, c = frames.shape
        p = h * w * c
        flat = np.ascontiguousarray(frames).reshape(t, p)
        rem = (-p) % LANES
        if rem:
            flat = np.pad(flat, ((0, 0), (0, rem)))
        return FrameChunk(flat.reshape(t, (p + rem) // LANES, LANES), h, w, c)

    # -- representations --
    def hwc_u8(self):
        """[T, H, W, C] uint8 (host: free view; device: relayout — prefer
        hwc_f32 for device math)."""
        t = self.flat.shape[0]
        if isinstance(self.flat, np.ndarray):
            return self.flat.reshape(t, -1)[:, : self.npix].reshape(
                t, self.h, self.w, self.c
            )
        return self.flat.reshape(t, -1)[:, : self.npix].reshape(
            t, self.h, self.w, self.c
        )

    def hwc_f32(self):
        """[T, H, W, C] float32 on device: convert in flat layout first."""
        t = self.flat.shape[0]
        x = jnp.asarray(self.flat).astype(jnp.float32)
        return x.reshape(t, -1)[:, : self.npix].reshape(
            t, self.h, self.w, self.c
        )

    def device(self) -> "FrameChunk":
        return FrameChunk(jnp.asarray(self.flat), self.h, self.w, self.c)

    def host(self) -> "FrameChunk":
        if isinstance(self.flat, np.ndarray):
            return self
        return FrameChunk(np.asarray(jax.device_get(self.flat)),
                          self.h, self.w, self.c)

    # -- row ops used by the executor --
    def slice_rows(self, start: int, length: int) -> "FrameChunk":
        return FrameChunk(self.flat[start : start + length],
                          self.h, self.w, self.c)

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
