"""Faster R-CNN (VGG16 backbone) — TPU-native.

Reference parity: the ``FasterRCNN`` Caffe op (faster_rcnn_kernel.cpp:6-33)
runs a py-faster-rcnn VGG16 network (81 COCO classes — the decode kernel
hardcodes CLASSES 81, faster_rcnn_output_kernel_cpu.cpp:11) with an
``im_info`` blob of (height, width, scale=1) and emits three blobs per
frame: ``cls_prob`` [R,81], ``rois`` [R,5] (batch, x1, y1, x2, y2 in input
pixels), ``fc7`` [R,4096]. This module implements the same topology in
flax — VGG16 conv1_1..conv5_3 → RPN (rpn_conv/3x3, rpn_cls_score,
rpn_bbox_pred) → proposal decode → RoI pooling → fc6/fc7 → cls_score
softmax — with caffe-compatible layer names (see
porting_maps.faster_rcnn_mapping).

TPU-native deltas from the caffe graph (SURVEY §7 hard part #2 — dynamic
box counts fight XLA static shapes):

  * The proposal layer is static-shape: top-``PRE_NMS`` anchors by fg
    score, fixed-iteration NMS (common.nms), exactly ``NUM_ROIS`` outputs
    padded with invalid rows. Padded rows emit cls_prob = one-hot
    background, so the decode op (score over classes 1.. > 0.7) can never
    select them — variable counts materialize only at the host sink.
  * RoI feature extraction is bilinear crop-and-resize (RoIAlign) over the
    conv5_3 map instead of caffe's quantized max RoIPool — a deliberate,
    documented deviation (RoIAlign is strictly more accurate and is a
    gather, which the TPU likes; Mask R-CNN made the same replacement).
  * ``bbox_pred`` exists in the parameter tree (so checkpoints port
    totally) but is unused: the reference decode consumes raw rois, not
    refined boxes (faster_rcnn_output_kernel_cpu.cpp:44-47).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import crop_and_resize, nms

NUM_CLASSES = 81          # COCO 80 + background
NUM_ROIS = 300            # py-faster-rcnn TEST.RPN_POST_NMS_TOP_N
PRE_NMS = 2048            # static pre-NMS pool (TEST default 6000). 2048
                          # retains 100% of the 6000-pool's top-300
                          # post-NMS proposals under a trained-like score
                          # distribution (1024 lost 14% — see
                          # tests/test_faster_rcnn.py::test_pre_nms_pool_recall)
RPN_NMS_THRESH = 0.7      # TEST.RPN_NMS_THRESH
MIN_SIZE = 16.0           # TEST.RPN_MIN_SIZE
STRIDE = 16               # VGG16 conv5_3 stride
ANCHOR_SCALES = (8.0, 16.0, 32.0)
ANCHOR_RATIOS = (0.5, 1.0, 2.0)
POOL = 7                  # RoI pool output 7x7


def anchors_for(h: int, w: int) -> np.ndarray:
    """[h*w*9, 4] anchors (x1,y1,x2,y2), py-faster-rcnn generation: base
    16x16 box reshaped per ratio (round-per-ratio), scaled per scale,
    shifted by STRIDE per cell."""
    base = 16.0
    ws, hs = [], []
    size = base * base
    for r in ANCHOR_RATIOS:
        w_r = np.round(np.sqrt(size / r))
        h_r = np.round(w_r * r)
        for s in ANCHOR_SCALES:
            ws.append(w_r * s)
            hs.append(h_r * s)
    ws = np.asarray(ws)
    hs = np.asarray(hs)
    cx = (base - 1) / 2.0
    cy = (base - 1) / 2.0
    base_anchors = np.stack(
        [cx - (ws - 1) / 2, cy - (hs - 1) / 2,
         cx + (ws - 1) / 2, cy + (hs - 1) / 2], axis=1)  # [9,4]
    sx = np.arange(w) * STRIDE
    sy = np.arange(h) * STRIDE
    shift = np.stack(np.meshgrid(sx, sy), axis=-1).reshape(-1, 2)  # [h*w,2]
    shift = np.concatenate([shift, shift], axis=1)  # x1 y1 x2 y2
    return (shift[:, None, :] + base_anchors[None, :, :]).reshape(-1, 4)


def decode_deltas(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Standard R-CNN box transform inverse (bbox_transform_inv)."""
    aw = anchors[:, 2] - anchors[:, 0] + 1.0
    ah = anchors[:, 3] - anchors[:, 1] + 1.0
    acx = anchors[:, 0] + 0.5 * aw
    acy = anchors[:, 1] + 0.5 * ah
    dx, dy, dw, dh = deltas[:, 0], deltas[:, 1], deltas[:, 2], deltas[:, 3]
    cx = dx * aw + acx
    cy = dy * ah + acy
    w = jnp.exp(dw) * aw
    h = jnp.exp(dh) * ah
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h,
                      cx + 0.5 * w - 1.0, cy + 0.5 * h - 1.0], axis=1)


def propose_boxes(anchors, fg, deltas, H, W, pre_nms, num_rois):
    """Static-shape RPN proposal layer for ONE frame: decode, clip,
    min-size filter, top-``pre_nms`` pool, fixed-iteration NMS to exactly
    ``num_rois`` outputs. Returns (boxes [num_rois,4], valid [num_rois]).

    py-faster-rcnn TEST config semantics (faster_rcnn_kernel.cpp:6-25);
    the recall of the truncated pre-NMS pool vs the reference's 6000 is
    guarded by tests/test_faster_rcnn.py::test_pre_nms_pool_recall.
    """
    boxes = decode_deltas(anchors, deltas)
    boxes = jnp.stack([
        jnp.clip(boxes[:, 0], 0, W - 1),
        jnp.clip(boxes[:, 1], 0, H - 1),
        jnp.clip(boxes[:, 2], 0, W - 1),
        jnp.clip(boxes[:, 3], 0, H - 1)], axis=1)
    bw = boxes[:, 2] - boxes[:, 0] + 1
    bh = boxes[:, 3] - boxes[:, 1] + 1
    score = jnp.where((bw >= MIN_SIZE) & (bh >= MIN_SIZE), fg, -1.0)
    k = min(pre_nms, score.shape[0])
    top, idx = jax.lax.top_k(score, k)
    cand = boxes[idx]
    kb, ks, valid = nms(cand, top, RPN_NMS_THRESH, num_rois,
                        score_thresh=0.0)
    return kb, valid


class VGG16(nn.Module):
    """conv1_1..conv5_3 (pool after blocks 1-4; conv5 keeps stride 16)."""

    @nn.compact
    def __call__(self, x):
        cfg = [(2, 64, "conv1"), (2, 128, "conv2"), (3, 256, "conv3"),
               (3, 512, "conv4"), (3, 512, "conv5")]
        for bi, (reps, feats, name) in enumerate(cfg):
            for i in range(reps):
                x = nn.Conv(feats, (3, 3), padding="SAME",
                            name=f"{name}_{i + 1}")(x)
                x = nn.relu(x)
            if bi < 4:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class FasterRCNN(nn.Module):
    num_classes: int = NUM_CLASSES
    num_rois: int = NUM_ROIS
    pre_nms: int = PRE_NMS

    @nn.compact
    def __call__(self, x):
        """x: [N, H, W, 3] float32 (BGR, caffe mean-subtracted upstream by
        NNInput). Returns (cls_prob [N,R,81], rois [N,R,5], fc7 [N,R,4096]).
        """
        n, H, W, _ = x.shape
        feat = VGG16(name="vgg")(x)  # [N, H/16, W/16, 512]
        fh, fw = feat.shape[1], feat.shape[2]

        rpn = nn.relu(nn.Conv(512, (3, 3), padding="SAME",
                              name="rpn_conv")(feat))
        # 2 softmax logits per anchor (bg, fg) and 4 deltas per anchor
        cls_logit = nn.Conv(2 * 9, (1, 1), name="rpn_cls_score")(rpn)
        bbox_delta = nn.Conv(4 * 9, (1, 1), name="rpn_bbox_pred")(rpn)

        anchors = jnp.asarray(anchors_for(fh, fw), jnp.float32)

        # caffe's rpn_cls_prob reshapes to (2, 9*h*w) and softmaxes over
        # the 2; channel layout per cell is [9 bg, 9 fg] after the NCHW->
        # NHWC port, i.e. fg score = softmax over (logit[a], logit[9+a])
        cls_logit = cls_logit.reshape(n, fh * fw, 2, 9)
        fg = jax.nn.softmax(cls_logit, axis=2)[:, :, 1, :].reshape(n, -1)
        deltas = bbox_delta.reshape(n, fh * fw, 9, 4).reshape(n, -1, 4)

        boxes, valid = jax.vmap(
            lambda fg_n, d_n: propose_boxes(anchors, fg_n, d_n, H, W,
                                            self.pre_nms, self.num_rois)
        )(fg, deltas)  # [N,R,4], [N,R]

        # RoIAlign over conv5_3. crop_and_resize takes pixel coords in the
        # given image — here the stride-16 feature map, so divide the input-
        # pixel rois by STRIDE (same convention as maskrcnn.py's props/4.0).
        pooled = jax.vmap(
            lambda f, b: crop_and_resize(f, b, (POOL, POOL))
        )(feat, boxes / STRIDE)  # [N, R, 7, 7, 512]

        flat = pooled.reshape(n, pooled.shape[1], -1)
        h6 = nn.relu(nn.Dense(4096, name="fc6")(flat))
        fc7 = nn.relu(nn.Dense(4096, name="fc7")(h6))
        logits = nn.Dense(self.num_classes, name="cls_score")(fc7)
        # bbox_pred: in the tree for checkpoint totality; decode ignores it
        _ = nn.Dense(4 * self.num_classes, name="bbox_pred")(fc7)
        cls_prob = jax.nn.softmax(logits, axis=-1)

        # padded/suppressed rows -> one-hot background (decode skips them)
        bg = jnp.zeros_like(cls_prob).at[..., 0].set(1.0)
        cls_prob = jnp.where(valid[..., None], cls_prob, bg)
        boxes = jnp.where(valid[..., None], boxes, 0.0)
        rois = jnp.concatenate(
            [jnp.zeros(boxes.shape[:-1] + (1,), boxes.dtype), boxes],
            axis=-1)  # [N,R,5] with batch index 0 (per-frame jobs)
        fc7 = jnp.where(valid[..., None], fc7, 0.0)
        return cls_prob, rois, fc7


def init_params(rng, input_size: Tuple[int, int] = (224, 224)):
    h, w = input_size
    return FasterRCNN().init(rng, jnp.zeros((1, h, w, 3), jnp.float32))


def apply(variables, x):
    return FasterRCNN().apply(variables, x)
