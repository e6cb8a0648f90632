"""SSD-MobileNetV1 object detector — TPU-native.

Reference parity: ``DetectObjects`` (object_detection.py:13-75) runs the TF
frozen graph ``ssd_mobilenet_v1_coco_2017_11_17`` and emits exactly 100
boxes per frame as (x1=box[1], y1=box[0], x2=box[3], y2=box[2], score,
label) with normalized coords. This module implements the same network
(MobileNetV1 backbone + 6 SSD heads, Liu et al. 2016 / Howard et al. 2017)
in flax, with anchor generation and box decoding per the TF Object
Detection API conventions (scale 0.2→0.95, ratios {1, 2, ½, 3, ⅓},
reduced 3-anchor lowest layer, box codes scaled by 10/10/5/5).

TPU-native postprocess: top-K prefilter then one static class-offset NMS
(boxes shifted per class so cross-class pairs never overlap) → fixed 100
outputs, instead of TF's dynamic per-class NMS loop.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import iou_matrix

NUM_CLASSES = 90  # COCO labels 1..90
NUM_OUT = 100     # object_detection.py:47 reads fixed 100 boxes
INPUT_SIZE = 300
PREFILTER = 512


class ConvBNReLU6(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, self.strides, padding="SAME",
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, name="bn")(x)
        return jnp.minimum(nn.relu(x), 6.0)


class DepthwiseSeparable(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), self.strides, padding="SAME",
                    feature_group_count=c, use_bias=False, name="dw")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="dw_bn")(x)
        x = jnp.minimum(nn.relu(x), 6.0)
        x = nn.Conv(self.features, (1, 1), use_bias=False, name="pw")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="pw_bn")(x)
        return jnp.minimum(nn.relu(x), 6.0)


_MOBILENET = [  # (features, stride)
    (64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
    (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (1024, 2), (1024, 1),
]


class SSDMobileNetV1(nn.Module):
    num_classes: int = NUM_CLASSES

    @nn.compact
    def __call__(self, x):  # [B, 300, 300, 3] in [-1, 1]
        feats: List[jnp.ndarray] = []
        x = ConvBNReLU6(32, strides=(2, 2), name="conv0")(x)
        for i, (f, s) in enumerate(_MOBILENET):
            x = DepthwiseSeparable(f, (s, s), name=f"ds{i + 1}")(x)
            if i == 10:          # conv11 -> 19x19x512
                feats.append(x)
        feats.append(x)          # conv13 -> 10x10x1024
        # extra feature layers
        for j, (mid, out) in enumerate([(256, 512), (128, 256),
                                        (128, 256), (64, 128)]):
            x = ConvBNReLU6(mid, (1, 1), name=f"extra{j}_a")(x)
            x = ConvBNReLU6(out, (3, 3), (2, 2), name=f"extra{j}_b")(x)
            feats.append(x)

        n_anchors = [3, 6, 6, 6, 6, 6]
        locs, clss = [], []
        for k, (f, na) in enumerate(zip(feats, n_anchors)):
            # 1x1 predictor convs: ssd_mobilenet_v1_coco.config uses
            # convolutional_box_predictor { kernel_size: 1 } — required for
            # the reference checkpoint's BoxPredictor_* weights to drop in
            loc = nn.Conv(na * 4, (1, 1), name=f"loc{k}")(f)
            cls = nn.Conv(na * (self.num_classes + 1), (1, 1),
                          name=f"cls{k}")(f)
            b = f.shape[0]
            locs.append(loc.reshape(b, -1, 4))
            clss.append(cls.reshape(b, -1, self.num_classes + 1))
        return jnp.concatenate(locs, axis=1), jnp.concatenate(clss, axis=1)


@functools.lru_cache(maxsize=4)
def anchor_boxes(input_size: int = INPUT_SIZE) -> np.ndarray:
    """[N, 4] (cy, cx, h, w) normalized anchors, TF ssd_anchor_generator
    semantics: 6 layers, scales linear 0.2..0.95, ratios {1,2,.5,3,1/3} +
    interpolated sqrt(s_k s_{k+1}) for ratio 1; lowest layer reduced to
    3 anchors with scales (0.1, 0.2, 0.2) and ratios (1, 2, 0.5)."""
    grids = [19, 10, 5, 3, 2, 1]
    m = len(grids)
    scales = [0.2 + (0.95 - 0.2) * k / (m - 1) for k in range(m)] + [1.0]
    out = []
    for k, g in enumerate(grids):
        s = scales[k]
        if k == 0:
            specs = [(0.1, 1.0), (s, 2.0), (s, 0.5)]
        else:
            specs = [(s, 1.0), (s, 2.0), (s, 0.5), (s, 3.0), (s, 1.0 / 3.0),
                     (math.sqrt(s * scales[k + 1]), 1.0)]
        for y in range(g):
            for x in range(g):
                cy = (y + 0.5) / g
                cx = (x + 0.5) / g
                for scale, ratio in specs:
                    r = math.sqrt(ratio)
                    out.append((cy, cx, scale / r, scale * r))
    return np.array(out, np.float32)


def decode_boxes(loc: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """TF box coder: (ty,tx,th,tw) scaled by (10,10,5,5) -> xyxy normalized."""
    ty, tx, th, tw = loc[..., 0], loc[..., 1], loc[..., 2], loc[..., 3]
    acy, acx, ah, aw = (anchors[:, 0], anchors[:, 1], anchors[:, 2],
                        anchors[:, 3])
    cy = ty / 10.0 * ah + acy
    cx = tx / 10.0 * aw + acx
    h = jnp.exp(th / 5.0) * ah
    w = jnp.exp(tw / 5.0) * aw
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     axis=-1)


def postprocess(loc: jnp.ndarray, cls_logits: jnp.ndarray,
                iou_thresh: float = 0.6):
    """One frame: loc [N,4], cls [N, C+1] -> (boxes [100,4] xyxy normalized,
    scores [100], classes [100] int32 1..90)."""
    return _postprocess_explicit(*_prefilter(loc, cls_logits, iou_thresh))


def _postprocess_explicit(b, s, l, iou_thresh):
    """NMS on class-shifted boxes, carrying (box,label) through the sort."""
    shifted = b + l[:, None].astype(jnp.float32) * 4.0
    k = b.shape[0]
    order = jnp.argsort(-s)
    bs, ss, ls, sh = b[order], s[order], l[order], shifted[order]
    from .common import iou_matrix

    overlap = iou_matrix(sh, sh)
    valid = ss > 0.0

    def step(kept, i):
        sup = jnp.any(kept & (overlap[:, i] > iou_thresh) &
                      (jnp.arange(k) < i))
        keep_i = valid[i] & ~sup
        return kept.at[i].set(keep_i), keep_i

    _, keep = jax.lax.scan(step, jnp.zeros(k, bool), jnp.arange(k))
    rank = jnp.cumsum(keep) - 1
    dest = jnp.where(keep, rank, k)
    out_b = jnp.zeros((k + 1, 4)).at[dest].set(bs)[:NUM_OUT]
    out_s = jnp.zeros((k + 1,)).at[dest].set(ss)[:NUM_OUT]
    out_l = jnp.zeros((k + 1,), jnp.int32).at[dest].set(ls)[:NUM_OUT]
    return out_b, out_s, out_l


def detect(variables, frames_f32: jnp.ndarray):
    """frames: [T, H, W, 3] raw [0,255] -> (boxes [T,100,4] xyxy normalized,
    scores [T,100], classes [T,100])."""
    x = jax.image.resize(frames_f32,
                         (frames_f32.shape[0], INPUT_SIZE, INPUT_SIZE, 3),
                         "linear", antialias=False)
    x = x * (2.0 / 255.0) - 1.0
    loc, cls_logits = SSDMobileNetV1().apply(variables, x)
    return jax.vmap(lambda lo, cl: _postprocess_explicit(
        *_prefilter(lo, cl)))(loc, cls_logits)


def _prefilter(loc, cls_logits, iou_thresh: float = 0.6):
    anchors = jnp.asarray(anchor_boxes())
    boxes = decode_boxes(loc, anchors)
    probs = jax.nn.sigmoid(cls_logits[:, 1:])
    best = jnp.max(probs, axis=1)
    label = jnp.argmax(probs, axis=1).astype(jnp.int32) + 1
    top, idx = jax.lax.top_k(best, PREFILTER)
    return boxes[idx], top, label[idx], iou_thresh


def init_params(rng: jax.Array) -> Dict[str, Any]:
    return SSDMobileNetV1().init(
        rng, jnp.zeros((1, INPUT_SIZE, INPUT_SIZE, 3))
    )
