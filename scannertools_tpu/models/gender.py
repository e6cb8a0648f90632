"""Gender classifier — Levi–Hassner CNN (the rude-carnie model).

Reference parity: ``DetectGender`` (gender_detection.py:10-29) crops each
bbox and calls rude-carnie's ``get_gender_batch``, whose network is the
Levi & Hassner (CVPR-W 2015) age/gender architecture: 227×227 input,
3 conv blocks (96/7×7/s4, 256/5×5, 384/3×3 with max-pool + LRN), two
512-d fully-connected layers, 2-way softmax over ('M', 'F').
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

LABELS = ("M", "F")
INPUT_SIZE = 227


def _lrn(x, radius=2, alpha=2e-5 * 5, beta=0.75, bias=1.0):
    """Local response normalization over channels (AlexNet-style)."""
    sq = x * x
    pads = [(0, 0)] * (x.ndim - 1) + [(radius, radius)]
    padded = jnp.pad(sq, pads)
    n = 2 * radius + 1
    s = sum(padded[..., i : i + x.shape[-1]] for i in range(n))
    return x / (bias + alpha / n * s) ** beta


class LeviHassner(nn.Module):
    n_classes: int = 2

    @nn.compact
    def __call__(self, x):  # [B, 227, 227, 3] raw [0,255]
        x = x - 127.0
        x = nn.Conv(96, (7, 7), (4, 4), padding="VALID", name="conv1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = _lrn(x)
        x = nn.Conv(256, (5, 5), padding="SAME", name="conv2")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = _lrn(x)
        x = nn.Conv(384, (3, 3), padding="SAME", name="conv3")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(512, name="fc1")(x))
        x = nn.relu(nn.Dense(512, name="fc2")(x))
        return nn.Dense(self.n_classes, name="fc3")(x)


def init_params(rng: jax.Array) -> Dict[str, Any]:
    return LeviHassner().init(rng, jnp.zeros((1, INPUT_SIZE, INPUT_SIZE, 3)))


def classify(variables, crops_f32: jnp.ndarray) -> jnp.ndarray:
    """crops: [K, 227, 227, 3] -> [K] int32 (0='M', 1='F')."""
    logits = LeviHassner().apply(variables, crops_f32)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
