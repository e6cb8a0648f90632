"""MTCNN face detector (P-Net / R-Net / O-Net cascade) — TPU-native.

Reference parity: ``MTCNNDetectFaces`` (face_detection.py:8-68) drives the
facenet repo's TF1 ``align.detect_face.bulk_detect_face`` with
thresholds [0.45, 0.6, 0.7], pyramid factor 0.709, window ratio 0.2, then
applies margins (v=0.2582651..., h=0.3449094...) and normalizes boxes by
frame size. The network architecture and cascade are from Zhang et al.,
"Joint Face Detection and Alignment using Multi-task Cascaded Convolutional
Networks" (2016).

TPU-native design (SURVEY §7 hard part #2 — the dynamic cascade vs XLA
static shapes): every stage works on fixed-size padded box arrays with
validity masks. Per pyramid scale the P-Net probability grid yields its
top-K cells (lax.top_k); scales concatenate into one padded array; NMS is
the static lax.scan version (models/common.py); R/O-Net stages crop a fixed
number of patches with crop_and_resize and mask out invalid rows. The whole
cascade jits once per (frame-shape, batch) and is vmapped over frames.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import crop_and_resize, nms, topk_boxes

# cascade capacities (padded sizes)
MAX_CELLS_PER_SCALE = 128
MAX_STAGE1 = 256
MAX_STAGE2 = 96
MAX_FACES = 32

THRESHOLDS = (0.45, 0.6, 0.7)  # face_detection.py:29
FACTOR = 0.709
WINDOW_RATIO = 0.2
VMARGIN = 0.2582651235637604
HMARGIN = 0.3449094129917718


class _PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (x.shape[-1],))
        return jnp.where(x > 0, x, alpha * x)


class PNet(nn.Module):
    """Fully-convolutional proposal net: stride 2, cell size 12."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(10, (3, 3), padding="VALID", name="conv1")(x)
        x = _PReLU(name="prelu1")(x)
        x = nn.max_pool(x, (2, 2), (2, 2), padding="SAME")
        x = nn.Conv(16, (3, 3), padding="VALID", name="conv2")(x)
        x = _PReLU(name="prelu2")(x)
        x = nn.Conv(32, (3, 3), padding="VALID", name="conv3")(x)
        x = _PReLU(name="prelu3")(x)
        prob = nn.softmax(nn.Conv(2, (1, 1), name="conv4_1")(x), axis=-1)
        reg = nn.Conv(4, (1, 1), name="conv4_2")(x)
        return prob[..., 1], reg


class RNet(nn.Module):
    @nn.compact
    def __call__(self, x):  # [K, 24, 24, 3]
        x = nn.Conv(28, (3, 3), padding="VALID", name="conv1")(x)
        x = _PReLU(name="prelu1")(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")
        x = nn.Conv(48, (3, 3), padding="VALID", name="conv2")(x)
        x = _PReLU(name="prelu2")(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding="VALID")
        x = nn.Conv(64, (2, 2), padding="VALID", name="conv3")(x)
        x = _PReLU(name="prelu3")(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(128, name="fc1")(x)
        x = _PReLU(name="prelu4")(x)
        prob = nn.softmax(nn.Dense(2, name="fc2_1")(x), axis=-1)
        reg = nn.Dense(4, name="fc2_2")(x)
        return prob[:, 1], reg


class ONet(nn.Module):
    @nn.compact
    def __call__(self, x):  # [K, 48, 48, 3]
        x = nn.Conv(32, (3, 3), padding="VALID", name="conv1")(x)
        x = _PReLU(name="prelu1")(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")
        x = nn.Conv(64, (3, 3), padding="VALID", name="conv2")(x)
        x = _PReLU(name="prelu2")(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding="VALID")
        x = nn.Conv(64, (3, 3), padding="VALID", name="conv3")(x)
        x = _PReLU(name="prelu3")(x)
        x = nn.max_pool(x, (2, 2), (2, 2), padding="SAME")
        x = nn.Conv(128, (2, 2), padding="VALID", name="conv4")(x)
        x = _PReLU(name="prelu4")(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(256, name="fc1")(x)
        x = _PReLU(name="prelu5")(x)
        prob = nn.softmax(nn.Dense(2, name="fc2_1")(x), axis=-1)
        reg = nn.Dense(4, name="fc2_2")(x)
        lmk = nn.Dense(10, name="fc2_3")(x)
        return prob[:, 1], reg, lmk


def init_params(rng: jax.Array, deterministic_seed: bool = True) -> Dict[str, Any]:
    """Random-init parameter pytrees (weight porting fills in pretrained
    values — see models/weights.py)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "pnet": PNet().init(k1, jnp.zeros((1, 12, 12, 3)))["params"],
        "rnet": RNet().init(k2, jnp.zeros((1, 24, 24, 3)))["params"],
        "onet": ONet().init(k3, jnp.zeros((1, 48, 48, 3)))["params"],
    }


def pyramid_scales(h: int, w: int, window_ratio: float = WINDOW_RATIO,
                   factor: float = FACTOR) -> List[float]:
    minsize = max(12.0, window_ratio * min(h, w))
    m = 12.0 / minsize
    minl = min(h, w) * m
    scales = []
    while minl >= 12.0:
        scales.append(m * factor ** len(scales))
        minl *= factor
    return scales


def _normalize(img_f32: jnp.ndarray) -> jnp.ndarray:
    return (img_f32 - 127.5) * 0.0078125


def _square(boxes: jnp.ndarray) -> jnp.ndarray:
    """Expand to squares around the center (the cascade's 'rerec')."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    side = jnp.maximum(w, h)
    cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    return jnp.stack([cx - side / 2, cy - side / 2,
                      cx + side / 2, cy + side / 2], axis=1)


def _calibrate(boxes: jnp.ndarray, reg: jnp.ndarray) -> jnp.ndarray:
    """Apply bbox regression offsets (fractions of box size)."""
    w = (boxes[:, 2] - boxes[:, 0])[:, None]
    h = (boxes[:, 3] - boxes[:, 1])[:, None]
    return boxes + reg * jnp.concatenate([w, h, w, h], axis=1)


def pyramid_layout(h: int, w: int) -> List[Tuple[float, int, int, int]]:
    """Static canvas layout for the fused pyramid: per level
    (scale, hs, ws, y_offset). Offsets stay EVEN so every level's P-Net
    cell grid (stride 2) aligns with the canvas grid, and levels are
    separated by >= one full 12-px receptive field of zeros so no window
    that we read spans two levels."""
    layout = []
    oy = 0
    for s in pyramid_scales(h, w):
        hs, ws = int(np.ceil(h * s)), int(np.ceil(w * s))
        layout.append((s, hs, ws, oy))
        oy += hs + (12 if hs % 2 == 0 else 13)
    return layout


def _stage1_fused(params, x: jnp.ndarray, H: int, W: int, t1: float):
    """P-Net over ALL pyramid levels in ONE dispatch (ROADMAP #4): levels
    are pasted into a single tall canvas and the fully-convolutional net
    runs once — one large well-utilized conv instead of ~10 tiny ones.
    Per-level cells are then sliced back off the shared grid (only cells
    whose 12-px window lies fully inside their level, so values match the
    per-level forward bit-for-bit; the per-level edge cells that SAME-pool
    padding would fabricate are dropped)."""
    layout = pyramid_layout(H, W)
    if not layout:
        return None
    Hc = layout[-1][3] + layout[-1][1]
    Wc = max(ws for _, _, ws, _ in layout)
    canvas = jnp.zeros((Hc, Wc, 3), x.dtype)
    for s, hs, ws, oy in layout:
        xi = jax.image.resize(x, (hs, ws, 3), "linear", antialias=False)
        canvas = jax.lax.dynamic_update_slice(canvas, xi, (oy, 0, 0))
    prob, reg = PNet().apply({"params": params["pnet"]}, canvas[None])
    prob, reg = prob[0], reg[0]  # [GH, GW], [GH, GW, 4]

    all_boxes, all_scores = [], []
    for s, hs, ws, oy in layout:
        g0 = oy // 2
        gh = (hs - 12) // 2 + 1
        gw = (ws - 12) // 2 + 1
        if gh <= 0 or gw <= 0:
            continue
        sub_p = prob[g0:g0 + gh, :gw]
        sub_r = reg[g0:g0 + gh, :gw]
        flat_p = sub_p.reshape(-1)
        k = min(MAX_CELLS_PER_SCALE, flat_p.shape[0])
        top_p, idx = jax.lax.top_k(flat_p, k)
        gy = (idx // gw).astype(jnp.float32)
        gx = (idx % gw).astype(jnp.float32)
        # cell -> box in original coords (stride 2, cell 12)
        b = jnp.stack([(gx * 2 + 1) / s, (gy * 2 + 1) / s,
                       (gx * 2 + 12) / s, (gy * 2 + 12) / s], axis=1)
        b = _calibrate(b, sub_r.reshape(-1, 4)[idx])
        score = jnp.where(top_p > t1, top_p, 0.0)
        bs, ss, vs = nms(b, score, 0.5, k)  # per-scale NMS 0.5
        all_boxes.append(bs)
        all_scores.append(jnp.where(vs, ss, 0.0))
    if not all_boxes:
        return None
    return jnp.concatenate(all_boxes), jnp.concatenate(all_scores)


def detect_single(params, img_f32: jnp.ndarray,
                  thresholds: Tuple[float, float, float] = THRESHOLDS):
    """img_f32: [H, W, 3] in [0,255] -> (boxes [MAX_FACES,4] pixel xyxy,
    scores [MAX_FACES], valid [MAX_FACES])."""
    H, W, _ = img_f32.shape
    x = _normalize(img_f32)
    t1, t2, t3 = thresholds

    # ---- stage 1: P-Net, all pyramid levels in one fused dispatch ------
    stage1 = _stage1_fused(params, x, H, W, t1)
    if stage1 is None:
        z = jnp.zeros((MAX_FACES, 4))
        return z, jnp.zeros(MAX_FACES), jnp.zeros(MAX_FACES, bool)
    all_boxes, all_scores = stage1

    boxes, scores = all_boxes, all_scores
    boxes, scores = topk_boxes(boxes, scores, MAX_STAGE1)
    scores = jnp.where(jnp.isfinite(scores), scores, 0.0)
    boxes, scores, valid = nms(boxes, scores, 0.7, MAX_STAGE1)  # cross-scale
    boxes = _square(boxes)

    # ---- stage 2: R-Net -------------------------------------------------
    boxes2, scores2 = topk_boxes(boxes, jnp.where(valid, scores, 0.0),
                                 MAX_STAGE2)
    scores2 = jnp.where(jnp.isfinite(scores2), scores2, 0.0)
    crops = crop_and_resize(x, boxes2, (24, 24))
    p2, r2 = RNet().apply({"params": params["rnet"]}, crops)
    s2 = jnp.where((p2 > t2) & (scores2 > 0), p2, 0.0)
    boxes2 = _calibrate(boxes2, r2)
    boxes2, s2, valid2 = nms(boxes2, s2, 0.7, MAX_STAGE2)
    boxes2 = _square(boxes2)

    # ---- stage 3: O-Net -------------------------------------------------
    boxes3, scores3 = topk_boxes(boxes2, jnp.where(valid2, s2, 0.0),
                                 MAX_FACES * 2)
    scores3 = jnp.where(jnp.isfinite(scores3), scores3, 0.0)
    crops3 = crop_and_resize(x, boxes3, (48, 48))
    p3, r3, _lmk = ONet().apply({"params": params["onet"]}, crops3)
    s3 = jnp.where((p3 > t3) & (scores3 > 0), p3, 0.0)
    boxes3 = _calibrate(boxes3, r3)
    boxes3, s3, valid3 = nms(boxes3, s3, 0.7, MAX_FACES, mode="min")
    return boxes3, s3, valid3


def detect_batch(params, frames_f32: jnp.ndarray,
                 thresholds: Tuple[float, float, float] = THRESHOLDS):
    """frames: [T, H, W, 3] f32 -> (boxes [T,MAX_FACES,4], scores, valid)."""
    return jax.vmap(
        lambda f: detect_single(params, f, thresholds))(frames_f32)


def margins_normalize_device(boxes: jnp.ndarray, scores: jnp.ndarray,
                             valid: jnp.ndarray, h: int, w: int):
    """Device twin of ``apply_margins_and_normalize`` (face_detection.py:
    50-64): margin expansion with int-truncated pixel margins (trunc ≡
    python int()), clamp to the frame, normalize by frame dims, and fold the
    score>=0.1 filter into the validity mask. boxes: [K,4] pixel xyxy ->
    (nboxes [K,4] normalized, scores [K], valid [K])."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    vmargin = jnp.trunc((x2 - x1) * VMARGIN)  # reference uses det[2]-det[0]
    hmargin = jnp.trunc((y2 - y1) * HMARGIN)  # and det[3]-det[1]
    nb = jnp.stack([
        jnp.maximum(x1 - hmargin / 2, 0) / w,
        jnp.maximum(y1 - vmargin / 2, 0) / h,
        jnp.minimum(x2 + hmargin / 2, w) / w,
        jnp.minimum(y2 + vmargin / 2, h) / h,
    ], axis=1)
    ok = valid & (scores >= 0.1)
    return (jnp.where(ok[:, None], nb, 0.0),
            jnp.where(ok, scores, 0.0), ok)


def apply_margins_and_normalize(boxes: np.ndarray, scores: np.ndarray,
                                valid: np.ndarray, h: int, w: int):
    """Host post-processing matching face_detection.py:50-64: margin
    expansion (int-truncated pixel margins), clamp, normalize, score>=0.1."""
    out = []
    for b, s, v in zip(boxes, scores, valid):
        if not v or s < 0.1:
            continue
        x1, y1, x2, y2 = float(b[0]), float(b[1]), float(b[2]), float(b[3])
        vmargin_pix = int((x2 - x1) * VMARGIN)  # reference uses det[2]-det[0]
        hmargin_pix = int((y2 - y1) * HMARGIN)  # and det[3]-det[1]
        out.append((
            max(x1 - hmargin_pix / 2, 0) / w,
            max(y1 - vmargin_pix / 2, 0) / h,
            min(x2 + hmargin_pix / 2, w) / w,
            min(y2 + vmargin_pix / 2, h) / h,
            float(s),
        ))
    return out
