"""Object detection op: SSD-MobileNetV1, 100 boxes per frame.

Reference parity: ``DetectObjects`` (object_detection.py:13-75) — the TF
frozen graph emits 100 (box, score, class) rows per frame; boxes are
normalized with (x1=box[1], y1=box[0], x2=box[3], y2=box[2]). Here the
whole network + decode + NMS runs as one jitted TPU program per chunk
(models/ssd.py); the host just wraps rows into BoundingBox protos.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .. import protobufs
from ..models import ssd as ssd_lib
from ..models import weights as weights_lib
from ..registry import register_op
from .faces import _get_params, _to_f32_frames, _MODEL_CACHE


@register_op("MaskRCNNDetectObjects", kind="host", outputs=("object",))
def maskrcnn_detect_objects(ctx, frame, weights_path: Optional[str] = None,
                            confidence_threshold: float = 0.5,
                            mask_downscale: int = 4,
                            arch: str = "R-50-FPN"):
    """Mask R-CNN detection + instance masks (maskrcnn_detection.py:27-330:
    confidence filter 0.5, masks stored downscaled ×4). Output per frame:
    list of dicts {bbox: BoundingBox (normalized), mask: [h/4scale, w/4scale]
    f32} — masks are pasted into (frame/mask_downscale)-sized canvases.
    ``arch``: any models.maskrcnn.ARCHS key; the reference checkpoint is
    "X-101-32x8d-FPN" (maskrcnn_detection.py:340) — pass that with a
    weights_path ported via porting_maps.port_maskrcnn."""
    import cv2

    from ..models import maskrcnn as mr

    key = ("maskrcnn_model", weights_path, arch)
    if key not in _MODEL_CACHE:
        model = mr.MaskRCNNModel(jax.random.PRNGKey(0), arch=arch)
        if weights_path:
            model.variables = weights_lib.load_params(weights_path)
        _MODEL_CACHE[key] = model
        _MODEL_CACHE[key + ("fn",)] = jax.jit(
            lambda v, x: model.infer(v, mr.preprocess(x))
        )
    model = _MODEL_CACHE[key]
    fn = _MODEL_CACHE[key + ("fn",)]

    frames = _to_f32_frames(frame)
    t, h, w, _ = frames.shape
    boxes, scores, labels, masks = fn(model.variables, jnp.asarray(frames))
    boxes = np.asarray(boxes) / mr.INPUT_SIZE  # -> normalized
    scores = np.asarray(scores)
    labels = np.asarray(labels)
    masks = np.asarray(masks)

    mh, mw = h // mask_downscale, w // mask_downscale
    out = []
    for i in range(t):
        dets = []
        for k in range(mr.MAX_DET):
            if scores[i, k] < confidence_threshold:
                continue
            bb = protobufs.BoundingBox(
                x1=float(boxes[i, k, 0]), y1=float(boxes[i, k, 1]),
                x2=float(boxes[i, k, 2]), y2=float(boxes[i, k, 3]),
                score=float(scores[i, k]), label=int(labels[i, k]))
            # paste the 28x28 mask into the downscaled frame canvas
            canvas = np.zeros((mh, mw), np.float32)
            x1 = int(bb.x1 * mw)
            y1 = int(bb.y1 * mh)
            x2 = max(int(bb.x2 * mw), x1 + 1)
            y2 = max(int(bb.y2 * mh), y1 + 1)
            m = cv2.resize(masks[i, k], (x2 - x1, y2 - y1))
            canvas[y1:y2, x1:x2] = m
            dets.append({"bbox": bb, "mask": canvas})
        out.append(dets)
    return out


@register_op("DetectObjects", kind="host", outputs=("bboxes",))
def detect_objects(ctx, frame, weights_path: Optional[str] = None):
    variables = _get_params("ssd", weights_path, ssd_lib.init_params)
    frames = _to_f32_frames(frame)
    if "ssd_fn" not in _MODEL_CACHE:
        _MODEL_CACHE["ssd_fn"] = jax.jit(ssd_lib.detect)
    boxes, scores, classes = _MODEL_CACHE["ssd_fn"](variables,
                                                    jnp.asarray(frames))
    boxes = np.asarray(boxes)
    scores = np.asarray(scores)
    classes = np.asarray(classes)

    out: List[List[protobufs.BoundingBox]] = []
    for i in range(frames.shape[0]):
        out.append([
            protobufs.BoundingBox(
                x1=float(boxes[i, k, 0]), y1=float(boxes[i, k, 1]),
                x2=float(boxes[i, k, 2]), y2=float(boxes[i, k, 3]),
                score=float(scores[i, k]), label=int(classes[i, k]),
            )
            for k in range(ssd_lib.NUM_OUT)
        ])
    return out
