"""Object detection op: SSD-MobileNetV1, 100 boxes per frame.

Reference parity: ``DetectObjects`` (object_detection.py:13-75) — the TF
frozen graph emits 100 (box, score, class) rows per frame; boxes are
normalized with (x1=box[1], y1=box[0], x2=box[3], y2=box[2]). Here the
whole network + decode + NMS runs as one jitted TPU program per chunk
(models/ssd.py); the host just wraps rows into BoundingBox protos.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .. import protobufs
from ..models import ssd as ssd_lib
from ..models import weights as weights_lib
from ..registry import register_op
from ..utils.framechunk import FrameChunk
from .faces import _get_params, _to_f32_frames, _MODEL_CACHE


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
