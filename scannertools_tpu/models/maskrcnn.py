"""Mask R-CNN — two-stage detector with mask head, TPU-native.

Reference parity: ``MaskRCNNDetectObjects`` (maskrcnn_detection.py:27-462)
wraps a maskrcnn-benchmark checkpoint (X-101-32x8d-FPN by default,
maskrcnn_detection.py:340-360): transform (aspect-preserving min-side-800
resize with max-side cap 1333, BGR255, mean-subtract, zero-pad to the
stride canvas — see ``preprocess``), forward, confidence filter 0.5, mask
paste with ×4 downscale for storage. This module implements the
architecture (He et al. 2017: backbone+FPN, RPN, RoIAlign, box/mask heads)
in flax with static shapes per stream geometry, **checkpoint-compatibly**:

  * backbone: real ResNet/ResNeXt bottleneck stages — R-50 = (3,4,6,3),
    X-101-32x8d = (3,4,23,3) with 32 groups × width 8 — frozen BatchNorm
    (maskrcnn-benchmark FrozenBatchNorm2d semantics: running stats applied,
    never updated), caffe2-style stride-in-1x1; FPN P2..P6 (256 ch,
    LastLevelMaxPool);
  * RPN: shared 3×3 head over all levels, 3 aspect anchors/cell; proposals
    follow the benchmark's FPN TEST regime — per-level top-1000 + NMS 0.7,
    then the best 1000 across levels (all static-shape lax.scan NMS);
  * RoIAlign: the canonical per-level heuristic
    ``floor(4 + log2(sqrt(wh)/224))`` over P2..P5 — crops computed from
    every level and one-hot-selected per RoI (static shapes,
    ``roi_align_multilevel``);
  * heads: 2-fc box head (81-way cls + class box deltas), 4-conv + deconv
    mask head producing 28×28 per-class masks.

Every torch parameter of the maskrcnn-benchmark state_dict maps onto this
tree via ``porting_maps.maskrcnn_mapping`` (totality-tested).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import crop_and_resize, nms

NUM_CLASSES = 81   # COCO + background
MIN_SIZE = 800     # aspect-preserving min-side (maskrcnn_detection.py:27-30)
MAX_SIZE = 1333    # maskrcnn-benchmark cap on the max side
PAD_MULT = 32      # canvas padded to the backbone's stride multiple
_INIT_SIZE = 64    # dummy spatial size for param init (params are
                   # spatial-size-independent: convs + fixed-size RoI heads)
# maskrcnn-benchmark TEST regime (e2e_mask_rcnn_X_101_32x8d_FPN_1x.yaml /
# defaults.py): RPN.FPN_PRE_NMS_TOP_N_TEST per level, POST_NMS_TOP_N_TEST
# proposals total, TEST.DETECTIONS_PER_IMG finals, SCORE_THRESH 0.05.
PRE_NMS = 1000     # RPN top-k per FPN level before per-level NMS
POST_NMS = 1000    # proposals kept per image (across levels)
MAX_DET = 100      # final detections per image
SCORE_THRESH = 0.05
MASK_RES = 28
# canonical FPN level heuristic (Lin et al. FPN eq. 1; maskrcnn-benchmark
# poolers.LevelMapper): floor(4 + log2(sqrt(wh)/224 + 1e-6)), clamped to
# P2..P5
_CANONICAL_SCALE = 224.0
_CANONICAL_LEVEL = 4.0
_LVL_EPS = 1e-6
PIXEL_MEAN = (102.9801, 115.9465, 122.7717)  # BGR255 (reference transform)

ARCHS = {
    # name -> (blocks, groups, width_per_group)
    "R-50-FPN": ((3, 4, 6, 3), 1, 64),
    "R-101-FPN": ((3, 4, 23, 3), 1, 64),
    "X-101-32x8d-FPN": ((3, 4, 23, 3), 32, 8),
}


def _frozen_bn(name: str):
    """maskrcnn-benchmark FrozenBatchNorm2d: (x - mean) * rsqrt(var) * w + b
    with running stats as constants (no eps, resnet.py FrozenBatchNorm2d)."""
    return nn.BatchNorm(use_running_average=True, epsilon=0.0,
                        momentum=0.0, name=name)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(grouped) -> 1x1(x4-ish) with frozen BN; stride lives in
    the 1x1 (caffe2 STRIDE_IN_1X1, the layout of the reference weights)."""

    mid: int
    out: int
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        s = (self.stride, self.stride)
        y = nn.Conv(self.mid, (1, 1), s, use_bias=False, name="conv1")(x)
        y = nn.relu(_frozen_bn("bn1")(y))
        y = nn.Conv(self.mid, (3, 3), padding="SAME",
                    feature_group_count=self.groups, use_bias=False,
                    name="conv2")(y)
        y = nn.relu(_frozen_bn("bn2")(y))
        y = nn.Conv(self.out, (1, 1), use_bias=False, name="conv3")(y)
        y = _frozen_bn("bn3")(y)
        if residual.shape[-1] != self.out or self.stride != 1:
            residual = nn.Conv(self.out, (1, 1), s, use_bias=False,
                               name="downsample_conv")(x)
            residual = _frozen_bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class BackboneFPN(nn.Module):
    """ResNet/ResNeXt C2..C5 + FPN P2..P6 (256 channels)."""

    blocks: Tuple[int, ...] = (3, 4, 6, 3)
    groups: int = 1
    width_per_group: int = 64

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="stem_conv")(x)
        x = nn.relu(_frozen_bn("stem_bn")(x))
        x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
        cs = []
        for si, nb in enumerate(self.blocks):
            mid = self.groups * self.width_per_group * (2 ** si)
            out = 256 * (2 ** si)
            for bi in range(nb):
                stride = 2 if (bi == 0 and si > 0) else 1
                x = Bottleneck(mid, out, stride, self.groups,
                               name=f"layer{si + 1}b{bi}")(x)
            cs.append(x)
        # FPN top-down (names match backbone.fpn.fpn_inner/fpn_layer 1..4)
        ps: List = [None] * 4
        lat = [nn.Conv(256, (1, 1), name=f"fpn_inner{i + 1}")(c)
               for i, c in enumerate(cs)]
        ps[3] = lat[3]
        for i in (2, 1, 0):
            up = jax.image.resize(ps[i + 1], lat[i].shape, "nearest")
            ps[i] = lat[i] + up
        ps = [nn.Conv(256, (3, 3), padding="SAME", name=f"fpn_layer{i + 1}")(p)
              for i, p in enumerate(ps)]
        p6 = nn.max_pool(ps[3], (1, 1), (2, 2))  # LastLevelMaxPool
        return ps + [p6]  # P2..P6, strides 4,8,16,32,64


class RPNHead(nn.Module):
    n_anchors: int = 3

    @nn.compact
    def __call__(self, feat):
        t = nn.relu(nn.Conv(256, (3, 3), padding="SAME", name="conv")(feat))
        logits = nn.Conv(self.n_anchors, (1, 1), name="cls_logits")(t)
        deltas = nn.Conv(self.n_anchors * 4, (1, 1), name="bbox_pred")(t)
        return logits, deltas


class BoxHead(nn.Module):
    @nn.compact
    def __call__(self, roi_feats):  # [R, 7, 7, 256]
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(1024, name="fc6")(x))
        x = nn.relu(nn.Dense(1024, name="fc7")(x))
        cls = nn.Dense(NUM_CLASSES, name="cls_score")(x)
        deltas = nn.Dense(NUM_CLASSES * 4, name="bbox_pred")(x)
        return cls, deltas


class MaskHead(nn.Module):
    @nn.compact
    def __call__(self, roi_feats):  # [R, 14, 14, 256]
        x = roi_feats
        for i in range(4):
            x = nn.relu(nn.Conv(256, (3, 3), padding="SAME",
                                name=f"mask_fcn{i + 1}")(x))
        x = nn.relu(nn.ConvTranspose(256, (2, 2), (2, 2),
                                     name="conv5_mask")(x))
        return nn.Conv(NUM_CLASSES, (1, 1),
                       name="mask_fcn_logits")(x)  # [R,28,28,81]


class MaskRCNN(nn.Module):
    blocks: Tuple[int, ...] = (3, 4, 6, 3)
    groups: int = 1
    width_per_group: int = 64

    @nn.compact
    def __call__(self, images):  # [B, S, S, 3] mean-subtracted BGR255
        fpn = BackboneFPN(self.blocks, self.groups, self.width_per_group,
                          name="backbone")(images)
        rpn = RPNHead(name="rpn")
        rpn_out = [rpn(f) for f in fpn]
        return fpn, rpn_out

    # heads are separate submodules applied by the driver (so RoIAlign sits
    # between flax applications without dynamic-shape tracing issues)


def _anchors_for(level_hw: Tuple[int, int], stride: int) -> np.ndarray:
    """[H*W*3, 4] xyxy anchors: 1 scale (8*stride), ratios 0.5/1/2."""
    h, w = level_hw
    size = 8.0 * stride
    out = []
    for y in range(h):
        for x in range(w):
            cx, cy = (x + 0.5) * stride, (y + 0.5) * stride
            for r in (0.5, 1.0, 2.0):
                aw, ah = size * np.sqrt(r), size / np.sqrt(r)
                out.append((cx - aw / 2, cy - ah / 2,
                            cx + aw / 2, cy + ah / 2))
    return np.asarray(out, np.float32)


def fpn_level_for(boxes: jnp.ndarray) -> jnp.ndarray:
    """Canonical FPN RoI level (maskrcnn-benchmark poolers.LevelMapper):
    ``floor(4 + log2(sqrt(wh)/224 + 1e-6))`` clamped to [2, 5], returned as
    an index 0..3 into the P2..P5 stack."""
    w = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0)
    h = jnp.maximum(boxes[:, 3] - boxes[:, 1], 0.0)
    s = jnp.sqrt(w * h)
    lvl = jnp.floor(_CANONICAL_LEVEL
                    + jnp.log2(s / _CANONICAL_SCALE + _LVL_EPS))
    return jnp.clip(lvl, 2.0, 5.0).astype(jnp.int32) - 2


def roi_align_multilevel(fpn_maps, boxes: jnp.ndarray, out_hw):
    """Per-level RoIAlign with the canonical heuristic, static shapes:
    crops are computed from *every* level P2..P5 (strides 4/8/16/32) and
    the assigned level's crop is selected per RoI via a one-hot mask —
    XLA-friendly (no data-dependent bucketing), 4x the gather work of a
    dynamic pooler but the gathers are a small cost next to the box head.

    fpn_maps: list of 4+ per-image [H_l, W_l, C] maps (P2..P5 used);
    boxes: [K, 4] canvas px. Returns [K, oh, ow, C]."""
    lvl = fpn_level_for(boxes)
    out = None
    for li, stride in enumerate((4, 8, 16, 32)):
        crop = crop_and_resize(fpn_maps[li], boxes / float(stride), out_hw)
        sel = (lvl == li).astype(crop.dtype)[:, None, None, None]
        out = sel * crop if out is None else out + sel * crop
    return out


def select_detections(refined, scores, labels, diag, max_det: int,
                      iou_thresh: float = 0.5,
                      score_thresh: float = SCORE_THRESH):
    """Final-detection selection: per-class NMS (via the class-offset
    trick — boxes shifted by label*diag can never cross classes) then
    score-ordered truncation to ``max_det`` (TEST.DETECTIONS_PER_IMG).
    Static shapes: returns (boxes [max_det,4], scores, labels) padded with
    zeros; suppressed/subthreshold rows never appear."""
    shifted = refined + labels[:, None].astype(jnp.float32) * diag
    k = refined.shape[0]
    order = jnp.argsort(-scores)
    rb, rs, rl = refined[order], scores[order], labels[order]
    from .common import iou_matrix

    ov = iou_matrix(shifted[order], shifted[order])
    valid = rs > score_thresh

    def step(kept, i):
        sup = jnp.any(kept & (ov[:, i] > iou_thresh) & (jnp.arange(k) < i))
        ki = valid[i] & ~sup
        return kept.at[i].set(ki), ki

    _, keep = jax.lax.scan(step, jnp.zeros(k, bool), jnp.arange(k))
    rank = jnp.cumsum(keep) - 1
    dest = jnp.where(keep, rank, k)
    kk = max(k + 1, max_det)  # tiny canvases can have k < max_det
    fb = jnp.zeros((kk, 4)).at[dest].set(rb)[:max_det]
    fs = jnp.zeros((kk,)).at[dest].set(rs)[:max_det]
    fl = jnp.zeros((kk,), jnp.int32).at[dest].set(rl)[:max_det]
    return fb, fs, fl


def _apply_deltas(boxes, deltas):
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + w / 2
    cy = boxes[:, 1] + h / 2
    ncx = cx + deltas[:, 0] * w
    ncy = cy + deltas[:, 1] * h
    nw = w * jnp.exp(jnp.clip(deltas[:, 2], -4, 4))
    nh = h * jnp.exp(jnp.clip(deltas[:, 3], -4, 4))
    return jnp.stack([ncx - nw / 2, ncy - nh / 2,
                      ncx + nw / 2, ncy + nh / 2], axis=1)


class MaskRCNNModel:
    """Parameter container + jittable inference driver."""

    def __init__(self, rng: jax.Array, arch: str = "R-50-FPN",
                 pre_nms: int = PRE_NMS, post_nms: int = POST_NMS,
                 max_det: int = MAX_DET):
        blocks, groups, wpg = ARCHS[arch]
        self.arch = arch
        self.pre_nms = int(pre_nms)
        self.post_nms = int(post_nms)
        self.max_det = int(max_det)
        dummy = jnp.zeros((1, _INIT_SIZE, _INIT_SIZE, 3))
        self.trunk = MaskRCNN(blocks, groups, wpg)
        tv = self.trunk.init(rng, dummy)
        self.box_head = BoxHead()
        self.mask_head = MaskHead()
        k1, k2 = jax.random.split(rng)
        bv = self.box_head.init(k1, jnp.zeros((1, 7, 7, 256)))
        mv = self.mask_head.init(k2, jnp.zeros((1, 14, 14, 256)))
        self.variables = {"trunk": tv, "box": bv, "mask": mv}
        self._strides = [4, 8, 16, 32, 64]

    def infer(self, variables, images):
        """images: [B, H, W, 3] BGR255 mean-subtracted (letterboxed canvas,
        see ``preprocess``) -> (boxes [B,MAX_DET,4] in canvas px, scores,
        labels, masks [B,MAX_DET,28,28]). Anchor grids are derived from the
        canvas shape at trace time (one compile per stream geometry, like
        every chunk program)."""
        _, H, W, _ = images.shape
        fpn, rpn_out = self.trunk.apply(variables["trunk"], images)
        anchors_per_level = [
            jnp.asarray(_anchors_for((f.shape[1], f.shape[2]), st))
            for f, st in zip(fpn, self._strides)
        ]
        clip_hi = jnp.asarray([W, H, W, H], jnp.float32)
        diag = 2.0 * max(W, H)  # per-class NMS offset stride

        def per_image(b):
            # --- proposals: per-FPN-level top-k + per-level NMS, then the
            # best post_nms across levels (maskrcnn-benchmark
            # rpn/inference.py FPN TEST regime: FPN_PRE_NMS_TOP_N per
            # level -> NMS 0.7 -> concat -> top POST_NMS_TOP_N by score).
            # Caps clamp to each level's anchor count on small canvases.
            lvl_boxes, lvl_scores = [], []
            for (logits, deltas), anchors in zip(rpn_out, anchors_per_level):
                s = jax.nn.sigmoid(logits[b].reshape(-1))
                k_l = min(self.pre_nms, s.shape[0])
                top, idx = jax.lax.top_k(s, k_l)
                d = deltas[b].reshape(-1, 4)[idx]
                bx = jnp.clip(_apply_deltas(anchors[idx], d), 0, clip_hi)
                keep_l = min(self.post_nms, k_l)
                pb, ps, _ = nms(bx, top, 0.7, keep_l)
                lvl_boxes.append(pb)
                lvl_scores.append(ps)
            scores = jnp.concatenate(lvl_scores)
            boxes = jnp.concatenate(lvl_boxes)
            n_prop = min(self.post_nms, scores.shape[0])
            pscores, idx = jax.lax.top_k(scores, n_prop)
            props = boxes[idx]

            # --- RoIAlign with the canonical per-level heuristic over
            # P2..P5 (roi_align_multilevel)
            feats = [fpn[li][b] for li in range(4)]
            roi7 = roi_align_multilevel(feats, props, (7, 7))
            cls, bdeltas = self.box_head.apply(variables["box"], roi7)
            probs = jax.nn.softmax(cls, axis=-1)
            best = jnp.max(probs[:, 1:], axis=1)
            label = jnp.argmax(probs[:, 1:], axis=1).astype(jnp.int32) + 1
            sel = jnp.take_along_axis(
                bdeltas.reshape(-1, NUM_CLASSES, 4),
                label[:, None, None].repeat(4, -1), axis=1)[:, 0]
            refined = jnp.clip(_apply_deltas(props, sel), 0, clip_hi)
            fb, fs, fl = select_detections(refined, best, label, diag,
                                           self.max_det)

            # --- masks for the finals (same level heuristic)
            roi14 = roi_align_multilevel(feats, fb, (14, 14))
            mlogits = self.mask_head.apply(variables["mask"], roi14)
            m = jax.nn.sigmoid(jnp.take_along_axis(
                mlogits, fl[:, None, None, None].repeat(MASK_RES, 1)
                .repeat(MASK_RES, 2), axis=-1)[..., 0])
            return fb, fs, fl, m

        return jax.vmap(per_image)(jnp.arange(images.shape[0]))


def init_shapes(arch: str = "X-101-32x8d-FPN"):
    """Shape-only variables tree (jax.eval_shape — no compute), for porting
    map totality checks on the big architectures."""
    blocks, groups, wpg = ARCHS[arch]
    s = _INIT_SIZE
    trunk = MaskRCNN(blocks, groups, wpg)
    rng = jax.random.PRNGKey(0)
    tv = jax.eval_shape(trunk.init, rng, jnp.zeros((1, s, s, 3)))
    bv = jax.eval_shape(BoxHead().init, rng, jnp.zeros((1, 7, 7, 256)))
    mv = jax.eval_shape(MaskHead().init, rng, jnp.zeros((1, 14, 14, 256)))
    return {"trunk": tv, "box": bv, "mask": mv}


def letterbox_geometry(h: int, w: int, min_size: int = MIN_SIZE,
                       max_size: int = MAX_SIZE):
    """The reference transform's sizing math (maskrcnn_detection.py:27-30 /
    maskrcnn-benchmark Resize.get_size): scale the MIN side to ``min_size``
    unless that pushes the max side past ``max_size``. All static ints per
    (h, w) — the canvas rounds the target up to the backbone stride.
    Returns (scale, (target_h, target_w), (canvas_h, canvas_w))."""
    s = min_size / min(h, w)
    if s * max(h, w) > max_size:
        s = max_size / max(h, w)
    th, tw = int(round(h * s)), int(round(w * s))
    ch = -(-th // PAD_MULT) * PAD_MULT
    cw = -(-tw // PAD_MULT) * PAD_MULT
    return s, (th, tw), (ch, cw)


def preprocess(frames_f32_rgb: jnp.ndarray, min_size: int = MIN_SIZE,
               max_size: int = MAX_SIZE):
    """RGB [0,255] -> aspect-preserving letterboxed BGR255 mean-subtracted
    canvas (maskrcnn_detection.py:27-30 semantics: min-side-``min_size``
    resize, max-side cap, zero-pad to the stride-multiple canvas — the
    benchmark's to_image_list padding). Returns (images [T,CH,CW,3], scale);
    content occupies the top-left (th, tw) region."""
    t, h, w, _ = frames_f32_rgb.shape
    s, (th, tw), (ch, cw) = letterbox_geometry(int(h), int(w),
                                               min_size, max_size)
    x = jax.image.resize(frames_f32_rgb, (t, th, tw, 3), "linear",
                         antialias=False)
    x = x[..., ::-1]  # RGB -> BGR
    x = x - jnp.asarray(PIXEL_MEAN)
    x = jnp.pad(x, ((0, 0), (0, ch - th), (0, cw - tw), (0, 0)))
    return x, s
