"""Face ops: MTCNNDetectFaces, EmbedFaces, DetectGender.

Reference parity: face_detection.py:8-68 (MTCNN cascade + margins +
normalized BoundingBox output), face_embedding.py:10-89 (crop → 160×160 →
prewhiten → FaceNet → 128-d; zero vector for degenerate crops),
gender_detection.py:10-29 (crop → rude-carnie gender labels).

TPU-native structure: each user-facing op is a *composite* that expands into
a device-kind forward (fixed-shape padded box/embedding arrays; fuses with
adjacent device ops and shards over the mesh like every other device op —
the reference contract that all kernels live inside the engine's placement
regime, caffe_kernel_cpu.cpp:10-13) plus a thin host decode that wraps the
padded arrays into per-frame proto/array lists. Model parameters enter the
jitted segments as real arguments via ``OpDef.aux`` (loaded from
``weights_path`` npz or deterministic random init; models/weights.py).

When ``EmbedFaces``/``DetectGender`` receive their ``bboxes`` from
``MTCNNDetectFaces``, the composite rewires the *device* box arrays straight
from the MTCNN forward — frames and boxes never leave HBM between the
detectors and the crop nets. Any other bbox source goes through the
``BboxesToPadded`` host adapter.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .. import protobufs
from ..graph import NodeOutput, OpNode
from ..models import facenet as facenet_lib
from ..models import gender as gender_lib
from ..models import mtcnn as mtcnn_lib
from ..models import weights as weights_lib
from ..models.common import crop_and_resize
from ..registry import register_composite, register_op
from ..utils.framechunk import FrameChunk, as_hwc_f32

_MODEL_CACHE: Dict[Any, Any] = {}

MAX_FACES = mtcnn_lib.MAX_FACES


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


def _crop_resize_host(frame: np.ndarray, bbox, out_size: int
                      ) -> Optional[np.ndarray]:
    """Reference crop semantics (face_embedding.py:64-72): int-truncated
    normalized coords, cv2 resize; None for degenerate crops. Host helper
    used by the generic CropClassify machinery (ops/legacy_extras.py)."""
    import cv2

    h, w = frame.shape[:2]
    crop = frame[int(bbox.y1 * h):int(bbox.y2 * h),
                 int(bbox.x1 * w):int(bbox.x2 * w)]
    if crop.shape[0] == 0 or crop.shape[1] == 0:
        return None
    return cv2.resize(crop, (out_size, out_size))


def _pad_batch(crops: List[np.ndarray], size: int, mult: int = 8
               ) -> np.ndarray:
    n = max(mult, -(-len(crops) // mult) * mult)
    out = np.zeros((n, size, size, 3), np.float32)
    for i, c in enumerate(crops):
        out[i] = c
    return out


# --------------------------------------------------------------- MTCNN

def _mtcnn_aux(ctx, params):
    return _get_params("mtcnn", params.get("weights_path"),
                       mtcnn_lib.init_params)


@register_op("MTCNNForward", kind="device", aux=_mtcnn_aux,
             outputs=("array_f32", "array_f32", "array_i32"))
def mtcnn_forward(ctx, aux, frame, weights_path: Optional[str] = None,
                  thresholds=mtcnn_lib.THRESHOLDS):
    """Full MTCNN cascade on device: [T,H,W,3] frames -> margin-expanded
    normalized boxes [T,MAX_FACES,4], scores [T,MAX_FACES], valid mask
    (validity already folds the reference's score>=0.1 filter)."""
    x = as_hwc_f32(frame)
    _, h, w, _ = x.shape
    boxes, scores, valid = mtcnn_lib.detect_batch(aux, x, tuple(thresholds))
    return jax.vmap(
        lambda b, s, v: mtcnn_lib.margins_normalize_device(b, s, v, h, w)
    )(boxes, scores, valid)


@register_op("MTCNNDecode", kind="host", outputs=("bboxes",))
def mtcnn_decode(ctx, nboxes, scores, valid):
    """Padded device arrays -> per-frame BoundingBox proto lists
    (face_detection.py:53-64 output contract)."""
    out: List[List[protobufs.BoundingBox]] = []
    for nb, s, v in zip(nboxes, scores, valid):
        out.append([
            protobufs.BoundingBox(x1=float(b[0]), y1=float(b[1]),
                                  x2=float(b[2]), y2=float(b[3]),
                                  score=float(sc))
            for b, sc, vv in zip(nb, s, v) if vv
        ])
    return out


@register_composite("MTCNNDetectFaces")
def _build_mtcnn(inputs, params, device):
    fwd = OpNode("MTCNNForward", dict(inputs), dict(params), device=device)
    return OpNode("MTCNNDecode", {
        "nboxes": NodeOutput(fwd, 0),
        "scores": NodeOutput(fwd, 1),
        "valid": NodeOutput(fwd, 2),
    }, {})


# ------------------------------------------------- bbox adapter (fallback)

@register_op("BboxesToPadded", kind="host",
             outputs=("array_f32", "array_i32"))
def bboxes_to_padded(ctx, bboxes, max_boxes: int = MAX_FACES):
    """Per-frame BoundingBox proto lists -> padded device arrays
    (nboxes [T,K,4], valid [T,K]) for crop-net forwards whose boxes did not
    come from an in-graph detector. Raises (rather than silently dropping
    boxes) when a frame exceeds ``max_boxes`` — pass a bigger cap on the
    consuming op (EmbedFaces/DetectGender ``max_boxes=``)."""
    t = len(bboxes)
    over = max((len(lst) for lst in bboxes), default=0)
    if over > max_boxes:
        raise ValueError(
            f"a frame carries {over} bboxes but the padded crop capacity "
            f"is max_boxes={max_boxes}; raise max_boxes on the op")
    nb = np.zeros((t, max_boxes, 4), np.float32)
    v = np.zeros((t, max_boxes), bool)
    for i, lst in enumerate(bboxes):
        for j, b in enumerate(lst):
            nb[i, j] = (b.x1, b.y1, b.x2, b.y2)
            v[i, j] = True
    return nb, v


def _device_boxes(bb: NodeOutput, max_boxes: int = MAX_FACES):
    """Rewire to the MTCNN forward's device arrays when ``bboxes`` comes from
    MTCNNDetectFaces; otherwise adapt host protos to padded arrays."""
    if isinstance(bb.node, OpNode) and bb.node.name == "MTCNNDecode":
        return bb.node.inputs["nboxes"], bb.node.inputs["valid"]
    conv = OpNode("BboxesToPadded", {"bboxes": bb},
                  {"max_boxes": max_boxes})
    return NodeOutput(conv, 0), NodeOutput(conv, 1)


def _crop_px_boxes(nb: jnp.ndarray, h: int, w: int):
    """Reference crop semantics (face_embedding.py:64-72): int-truncated
    pixel corners; degenerate when the truncated span is empty."""
    x1 = jnp.trunc(nb[:, 0] * w)
    y1 = jnp.trunc(nb[:, 1] * h)
    x2 = jnp.trunc(nb[:, 2] * w)
    y2 = jnp.trunc(nb[:, 3] * h)
    ok = (x2 > x1) & (y2 > y1)
    return jnp.stack([x1, y1, x2, y2], axis=1), ok


# --------------------------------------------------------------- EmbedFaces

def _compact_crops(x, nboxes, valid, size: int, budget_per_frame: int):
    """Cross-frame crop compaction: instead of running T×MAX_FACES padded
    crops through the net (≥16× padded-compute waste at typical ≤2
    faces/frame), select the first B = T·budget valid slots across the
    WHOLE chunk (stable top_k over the validity mask), extract just those
    crops, and return scatter metadata to map net outputs back to
    [T, MAX_FACES] slots. Slots beyond the budget (chunk-average >
    ``budget`` faces/frame) fall back to the degenerate-crop output; pass
    ``faces_budget=MAX_FACES`` for exactness."""
    t, h, w, _ = x.shape
    k = nboxes.shape[1]
    B = min(t * k, max(1, budget_per_frame) * t)

    def frame_px(nb):
        return _crop_px_boxes(nb, h, w)

    px, ok = jax.vmap(frame_px)(nboxes)  # [T,K,4], [T,K]
    want = (valid & ok).reshape(t * k)
    # stable top_k: equal values keep ascending index order -> first B
    # valid slots in frame-major order
    _, sel = jax.lax.top_k(want.astype(jnp.float32), B)
    sel_ok = want[sel]
    fi = sel // k

    px_flat = px.reshape(t * k, 4)[sel]

    def one(f, box):
        return crop_and_resize(x[f], box[None], (size, size))[0]

    crops = jax.vmap(one)(fi, px_flat)  # [B, size, size, 3]
    return crops, sel, sel_ok, valid & ok


def _scatter_rows(vals, sel, sel_ok, t: int, k: int):
    """[B, D] net outputs -> [T, K, D], zeros elsewhere."""
    d = vals.shape[-1]
    flat = jnp.zeros((t * k, d), vals.dtype)
    flat = flat.at[sel].set(jnp.where(sel_ok[:, None], vals, 0))
    return flat.reshape(t, k, d)


def _overflow_rows(sel, sel_ok, want, t: int, k: int):
    """Per-frame count of valid crops NOT selected under the budget — the
    decode stage surfaces these instead of letting budget overflow
    masquerade as the degenerate-crop zero sentinel."""
    emb = jnp.zeros((t * k,), bool).at[sel].set(sel_ok)
    return (want.reshape(t, k).sum(axis=1)
            - emb.reshape(t, k).sum(axis=1)).astype(jnp.int32)


def _facenet_aux(ctx, params):
    return _get_params("facenet", params.get("weights_path"),
                       facenet_lib.init_params)


@register_op("FaceEmbedForward", kind="device", aux=_facenet_aux,
             outputs=("array_f32", "array_i32", "array_i32"))
def face_embed_forward(ctx, aux, frame, nboxes, valid,
                       weights_path: Optional[str] = None,
                       minibatch: int = 5, faces_budget: int = 8):
    """Crop + 160x160 resize + prewhiten + FaceNet on device:
    -> (embs [T,MAX_FACES,128], valid [T,MAX_FACES], overflow [T]).
    Degenerate crops emit the reference's zero vector
    (face_embedding.py:70). ``minibatch`` is accepted for API parity; the
    crop batch is compacted across the chunk to ``faces_budget``·T crops
    (see _compact_crops); ``overflow`` counts valid faces per frame beyond
    that budget (zero-embedded; the decode stage warns)."""
    x = as_hwc_f32(frame)
    t = x.shape[0]
    k = nboxes.shape[1]
    crops, sel, sel_ok, want = _compact_crops(x, nboxes, valid, 160,
                                              faces_budget)
    embs = facenet_lib.embed(aux, crops)  # [B, 128]
    return (_scatter_rows(embs, sel, sel_ok, t, k), valid,
            _overflow_rows(sel, sel_ok, want, t, k))


@register_op("EmbedDecode", kind="host", outputs=("facenet_embeddings",))
def embed_decode(ctx, embs, valid, overflow=None):
    n_over = int(np.sum(overflow)) if overflow is not None else 0
    if n_over:
        import warnings

        warnings.warn(
            f"EmbedFaces: {n_over} valid faces beyond faces_budget got the "
            "zero-vector sentinel; pass faces_budget=<max faces/frame> to "
            "EmbedFaces for exhaustive embedding", stacklevel=2)
    out = []
    for E, V in zip(embs, valid):
        rows = [e for e, v in zip(E, V) if v]
        out.append(np.stack(rows).astype(np.float32) if rows
                   else np.zeros((0, 128), np.float32))
    return out


@register_composite("EmbedFaces")
def _build_embed(inputs, params, device):
    params = dict(params)
    mb = params.pop("max_boxes", MAX_FACES)
    nboxes, valid = _device_boxes(inputs["bboxes"], mb)
    fwd = OpNode("FaceEmbedForward",
                 {"frame": inputs["frame"], "nboxes": nboxes, "valid": valid},
                 params, device=device)
    return OpNode("EmbedDecode", {"embs": NodeOutput(fwd, 0),
                                  "valid": NodeOutput(fwd, 1),
                                  "overflow": NodeOutput(fwd, 2)}, {})


# ------------------------------------------------------------- DetectGender

def _gender_aux(ctx, params):
    return _get_params("gender", params.get("weights_path"),
                       gender_lib.init_params)


@register_op("GenderForward", kind="device", aux=_gender_aux,
             outputs=("array_i32", "array_i32", "array_i32"))
def gender_forward(ctx, aux, frame, nboxes, valid,
                   weights_path: Optional[str] = None,
                   faces_budget: int = 8):
    """Crop + 227x227 resize + Levi–Hassner on device -> (labels
    [T,MAX_FACES] int32, valid, overflow [T]). Degenerate crops label 0
    ('M'), matching the host path's LABELS[0] fallback. Crop batch
    compacted across the chunk (see _compact_crops); ``overflow`` counts
    valid faces beyond the budget (the decode stage warns)."""
    x = as_hwc_f32(frame)
    t = x.shape[0]
    k = nboxes.shape[1]
    crops, sel, sel_ok, want = _compact_crops(x, nboxes, valid,
                                              gender_lib.INPUT_SIZE,
                                              faces_budget)
    labels = gender_lib.classify(aux, crops).astype(jnp.int32)  # [B]
    out = _scatter_rows(labels[:, None], sel, sel_ok, t, k)[..., 0]
    return out, valid, _overflow_rows(sel, sel_ok, want, t, k)


@register_op("GenderDecode", kind="host", outputs=("object",))
def gender_decode(ctx, labels, valid, overflow=None):
    n_over = int(np.sum(overflow)) if overflow is not None else 0
    if n_over:
        import warnings

        warnings.warn(
            f"DetectGender: {n_over} valid faces beyond faces_budget got "
            "label 'M' by budget truncation; pass faces_budget=<max faces/"
            "frame> for exhaustive classification", stacklevel=2)
    return [
        [gender_lib.LABELS[int(l)] for l, v in zip(L, V) if v]
        for L, V in zip(labels, valid)
    ]


@register_composite("DetectGender")
def _build_gender(inputs, params, device):
    params = dict(params)
    mb = params.pop("max_boxes", MAX_FACES)
    nboxes, valid = _device_boxes(inputs["bboxes"], mb)
    fwd = OpNode("GenderForward",
                 {"frame": inputs["frame"], "nboxes": nboxes, "valid": valid},
                 params, device=device)
    return OpNode("GenderDecode", {"labels": NodeOutput(fwd, 0),
                                   "valid": NodeOutput(fwd, 1),
                                   "overflow": NodeOutput(fwd, 2)}, {})
