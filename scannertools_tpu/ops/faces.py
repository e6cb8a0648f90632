"""Face ops: MTCNNDetectFaces, EmbedFaces, DetectGender.

Reference parity: face_detection.py:8-68 (MTCNN cascade + margins +
normalized BoundingBox output), face_embedding.py:10-89 (crop → 160×160 →
prewhiten → FaceNet → 128-d; zero vector for degenerate crops),
gender_detection.py:10-29 (crop → rude-carnie gender labels).

Structure: host ops that drive jitted device programs — the cascade/
backbone math runs on TPU over the whole chunk; per-frame variable-length
box lists are assembled on the host. Model parameters come from
``weights_path`` (npz via models/weights.py) or deterministic random init
(no-egress environment; see models/weights.py docstring).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .. import protobufs
from ..models import facenet as facenet_lib
from ..models import gender as gender_lib
from ..models import mtcnn as mtcnn_lib
from ..models import weights as weights_lib
from ..registry import register_op
from ..utils.framechunk import FrameChunk

_MODEL_CACHE: Dict[Any, Any] = {}


def _get_params(model: str, weights_path: Optional[str], init_fn):
    key = (model, weights_path)
    if key not in _MODEL_CACHE:
        if weights_path:
            _MODEL_CACHE[key] = weights_lib.load_params(weights_path)
        else:
            _MODEL_CACHE[key] = init_fn(jax.random.PRNGKey(0))
    return _MODEL_CACHE[key]


def _to_f32_frames(frames) -> np.ndarray:
    if isinstance(frames, FrameChunk):
        return frames.host().hwc_u8().astype(np.float32)
    return np.asarray(frames).astype(np.float32)


@register_op("MTCNNDetectFaces", kind="host", outputs=("bboxes",))
def mtcnn_detect_faces(ctx, frame, weights_path: Optional[str] = None,
                       thresholds=mtcnn_lib.THRESHOLDS):
    params = _get_params("mtcnn", weights_path, mtcnn_lib.init_params)
    frames = _to_f32_frames(frame)
    t, h, w, _ = frames.shape
    key = ("mtcnn_fn", h, w)
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = jax.jit(mtcnn_lib.detect_batch)
    boxes, scores, valid = _MODEL_CACHE[key](params, jnp.asarray(frames))
    boxes = np.asarray(boxes)
    scores = np.asarray(scores)
    valid = np.asarray(valid)

    out: List[List[protobufs.BoundingBox]] = []
    for i in range(t):
        faces = mtcnn_lib.apply_margins_and_normalize(
            boxes[i], scores[i], valid[i], h, w
        )
        out.append([
            protobufs.BoundingBox(x1=f[0], y1=f[1], x2=f[2], y2=f[3],
                                  score=f[4])
            for f in faces
        ])
    return out


def _crop_resize_host(frame: np.ndarray, bbox, out_size: int) -> Optional[np.ndarray]:
    """Reference crop semantics (face_embedding.py:64-72): int-truncated
    normalized coords, cv2 resize; None for degenerate crops."""
    import cv2

    h, w = frame.shape[:2]
    crop = frame[int(bbox.y1 * h):int(bbox.y2 * h),
                 int(bbox.x1 * w):int(bbox.x2 * w)]
    if crop.shape[0] == 0 or crop.shape[1] == 0:
        return None
    return cv2.resize(crop, (out_size, out_size))


def _pad_batch(crops: List[np.ndarray], size: int, mult: int = 8) -> np.ndarray:
    n = max(mult, -(-len(crops) // mult) * mult)
    out = np.zeros((n, size, size, 3), np.float32)
    for i, c in enumerate(crops):
        out[i] = c
    return out


@register_op("EmbedFaces", kind="host", outputs=("facenet_embeddings",))
def embed_faces(ctx, frame, bboxes, weights_path: Optional[str] = None,
                minibatch: int = 5):
    variables = _get_params("facenet", weights_path, facenet_lib.init_params)
    frames = _to_f32_frames(frame)
    t = frames.shape[0]

    crops, src = [], []
    out_embs: List[List[Optional[np.ndarray]]] = [
        [None] * len(bboxes[i]) for i in range(t)
    ]
    for i in range(t):
        for j, bbox in enumerate(bboxes[i]):
            c = _crop_resize_host(frames[i], bbox, 160)
            if c is None:
                out_embs[i][j] = np.zeros(128, np.float32)  # face_embedding.py:70
            else:
                crops.append(c)
                src.append((i, j))

    if crops:
        if "facenet_fn" not in _MODEL_CACHE:
            _MODEL_CACHE["facenet_fn"] = jax.jit(facenet_lib.embed)
        batch = _pad_batch(crops, 160)
        embs = np.asarray(_MODEL_CACHE["facenet_fn"](variables,
                                                     jnp.asarray(batch)))
        for e, (i, j) in zip(embs, src):
            out_embs[i][j] = e

    return [
        np.stack(l) if l else np.zeros((0, 128), np.float32)
        for l in out_embs
    ]


@register_op("DetectGender", kind="host", outputs=("object",))
def detect_gender(ctx, frame, bboxes, weights_path: Optional[str] = None):
    variables = _get_params("gender", weights_path, gender_lib.init_params)
    frames = _to_f32_frames(frame)
    t = frames.shape[0]

    crops, src = [], []
    out: List[List[str]] = [[None] * len(bboxes[i]) for i in range(t)]
    for i in range(t):
        for j, bbox in enumerate(bboxes[i]):
            c = _crop_resize_host(frames[i], bbox, gender_lib.INPUT_SIZE)
            if c is None:
                out[i][j] = gender_lib.LABELS[0]
            else:
                crops.append(c)
                src.append((i, j))
    if crops:
        if "gender_fn" not in _MODEL_CACHE:
            _MODEL_CACHE["gender_fn"] = jax.jit(gender_lib.classify)
        labels = np.asarray(_MODEL_CACHE["gender_fn"](
            variables, jnp.asarray(_pad_batch(crops, gender_lib.INPUT_SIZE))
        ))
        for lab, (i, j) in zip(labels, src):
            out[i][j] = gender_lib.LABELS[int(lab)]
    return out
