"""FaceNet embedding network — Inception-ResNet-V1 → 128-d, TPU-native.

Reference parity: ``EmbedFaces`` (face_embedding.py:10-89) restores the TF1
FaceNet checkpoint ``20170512-110547`` (Inception-ResNet-V1, 128-d
embeddings, Szegedy et al. 2016 architecture), crops each bbox from the
frame, resizes to 160×160, applies ``facenet.prewhiten`` and L2-normalizes
the embedding. This is the same network expressed in flax (NHWC, bf16
matmuls on the MXU); pretrained weights load through models/weights.py
(e.g. from a facenet-pytorch state_dict).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

EMBEDDING_SIZE = 128  # face_embedding.py:12


class ConvBN(nn.Module):
    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: str = "VALID"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.995, name="bn")(x)
        return nn.relu(x)


class Block35(nn.Module):
    """Inception-ResNet-A, input/output 256ch, residual scale 0.17."""
    scale: float = 0.17

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(32, (1, 1), name="b0")(x)
        b1 = ConvBN(32, (1, 1), name="b1_0")(x)
        b1 = ConvBN(32, (3, 3), padding="SAME", name="b1_1")(b1)
        b2 = ConvBN(32, (1, 1), name="b2_0")(x)
        b2 = ConvBN(32, (3, 3), padding="SAME", name="b2_1")(b2)
        b2 = ConvBN(32, (3, 3), padding="SAME", name="b2_2")(b2)
        up = jnp.concatenate([b0, b1, b2], axis=-1)
        up = nn.Conv(256, (1, 1), name="up")(up)  # linear
        return nn.relu(x + self.scale * up)


class Block17(nn.Module):
    """Inception-ResNet-B, 896ch, scale 0.10."""
    scale: float = 0.10

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(128, (1, 1), name="b0")(x)
        b1 = ConvBN(128, (1, 1), name="b1_0")(x)
        b1 = ConvBN(128, (1, 7), padding="SAME", name="b1_1")(b1)
        b1 = ConvBN(128, (7, 1), padding="SAME", name="b1_2")(b1)
        up = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(896, (1, 1), name="up")(up)
        return nn.relu(x + self.scale * up)


class Block8(nn.Module):
    """Inception-ResNet-C, 1792ch, scale 0.20; final block has no relu."""
    scale: float = 0.20
    activate: bool = True

    @nn.compact
    def __call__(self, x):
        b0 = ConvBN(192, (1, 1), name="b0")(x)
        b1 = ConvBN(192, (1, 1), name="b1_0")(x)
        b1 = ConvBN(192, (1, 3), padding="SAME", name="b1_1")(b1)
        b1 = ConvBN(192, (3, 1), padding="SAME", name="b1_2")(b1)
        up = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(1792, (1, 1), name="up")(up)
        out = x + self.scale * up
        return nn.relu(out) if self.activate else out


class InceptionResnetV1(nn.Module):
    embedding_size: int = EMBEDDING_SIZE

    @nn.compact
    def __call__(self, x):  # [B, 160, 160, 3] prewhitened
        x = ConvBN(32, (3, 3), (2, 2), name="conv1")(x)
        x = ConvBN(32, (3, 3), name="conv2")(x)
        x = ConvBN(64, (3, 3), padding="SAME", name="conv3")(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = ConvBN(80, (1, 1), name="conv4")(x)
        x = ConvBN(192, (3, 3), name="conv5")(x)
        x = ConvBN(256, (3, 3), (2, 2), name="conv6")(x)
        for i in range(5):
            x = Block35(name=f"block35_{i}")(x)
        # reduction A -> 896
        ra0 = ConvBN(384, (3, 3), (2, 2), name="ra0")(x)
        ra1 = ConvBN(192, (1, 1), name="ra1_0")(x)
        ra1 = ConvBN(192, (3, 3), padding="SAME", name="ra1_1")(ra1)
        ra1 = ConvBN(256, (3, 3), (2, 2), name="ra1_2")(ra1)
        ra2 = nn.max_pool(x, (3, 3), (2, 2))
        x = jnp.concatenate([ra0, ra1, ra2], axis=-1)
        for i in range(10):
            x = Block17(name=f"block17_{i}")(x)
        # reduction B -> 1792
        rb0 = ConvBN(256, (1, 1), name="rb0_0")(x)
        rb0 = ConvBN(384, (3, 3), (2, 2), name="rb0_1")(rb0)
        rb1 = ConvBN(256, (1, 1), name="rb1_0")(x)
        rb1 = ConvBN(256, (3, 3), (2, 2), name="rb1_1")(rb1)
        rb2 = ConvBN(256, (1, 1), name="rb2_0")(x)
        rb2 = ConvBN(256, (3, 3), padding="SAME", name="rb2_1")(rb2)
        rb2 = ConvBN(256, (3, 3), (2, 2), name="rb2_2")(rb2)
        rb3 = nn.max_pool(x, (3, 3), (2, 2))
        x = jnp.concatenate([rb0, rb1, rb2, rb3], axis=-1)
        for i in range(5):
            x = Block8(name=f"block8_{i}")(x)
        x = Block8(activate=False, name="block8_final")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(self.embedding_size, use_bias=False, name="bottleneck")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.995, use_scale=False, use_bias=True,
                         name="bottleneck_bn")(x)
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-10)


def init_params(rng: jax.Array) -> Dict[str, Any]:
    vars_ = InceptionResnetV1().init(rng, jnp.zeros((1, 160, 160, 3)))
    return vars_


def prewhiten(x: jnp.ndarray) -> jnp.ndarray:
    """facenet.prewhiten: per-image (x - mean)/max(std, 1/sqrt(numel))
    (face_embedding.py:71)."""
    axes = tuple(range(1, x.ndim))
    mean = x.mean(axis=axes, keepdims=True)
    std = x.std(axis=axes, keepdims=True)
    n = 1.0
    for d in x.shape[1:]:
        n *= d
    std_adj = jnp.maximum(std, 1.0 / jnp.sqrt(n))
    return (x - mean) / std_adj


def embed(variables, crops_f32: jnp.ndarray) -> jnp.ndarray:
    """crops: [K, 160, 160, 3] raw [0,255] -> [K, 128] L2-normalized."""
    return InceptionResnetV1().apply(variables, prewhiten(crops_f32))
