"""Generic NN ops: model registry + descriptor-driven forward pass.

Reference parity: the generic ``Caffe`` op + ``CaffeInput`` preprocessing
(caffe_kernel.{h,cpp}: loads a net from a NetDescriptor, reshapes the input
blob, runs ForwardPrefilled, emits each output blob as an F32 frame;
caffe_input_kernel.cpp: Halide resize + mean-subtract + channel swap +
optional /255 + planar transpose). TPU-native: models live in a python
registry of (init, apply) pairs (flax), the descriptor selects one by
``model_path`` name, and preprocessing is a fused device op.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..registry import register_op
from ..utils.framechunk import as_hwc_f32
from ..utils.net_descriptor import NetDescriptor
from .faces import _MODEL_CACHE, _get_params

# name -> (init_fn(rng) -> variables, apply_fn(variables, x) -> output(s))
_NN_REGISTRY: Dict[str, Tuple[Callable, Callable]] = {}


def register_model(name: str, init_fn: Callable, apply_fn: Callable) -> None:
    """Register a model for the generic NNForward op (the analog of caffe
    prototxt paths in NetDescriptor.model_path)."""
    _NN_REGISTRY[name] = (init_fn, apply_fn)


def get_model(name: str) -> Tuple[Callable, Callable]:
    if name not in _NN_REGISTRY:
        raise KeyError(
            f"no registered model {name!r}; available: {sorted(_NN_REGISTRY)}"
        )
    return _NN_REGISTRY[name]


def _register_builtins() -> None:
    from ..models import facenet, facenet_detector, faster_rcnn, gender, \
        pose, ssd

    register_model("facenet_inception_resnet_v1", facenet.init_params,
                   facenet.embed)
    register_model("ssd_mobilenet_v1", ssd.init_params, ssd.detect)
    register_model("gender_levi_hassner", gender.init_params,
                   gender.LeviHassner().apply)
    register_model("openpose_body", pose.init_params,
                   pose.OpenPoseBody().apply)
    register_model("facenet_detector", facenet_detector.init_params,
                   facenet_detector.apply)
    register_model("faster_rcnn", faster_rcnn.init_params, faster_rcnn.apply)

    from ..models import streetstyle

    register_model("streetstyle_clothing", streetstyle.init_params_clothing,
                   streetstyle.predict_clothing)
    register_model("streetstyle_hairstyle",
                   streetstyle.init_params_hairstyle,
                   streetstyle.predict_hairstyle)


_register_builtins()


@register_op("NNInput", kind="device", outputs=("array_f32",))
def nn_input(ctx, frame, input_width: int = -1, input_height: int = -1,
             mean_colors=(), normalize: bool = False, transpose: bool = False,
             pad_mod: int = -1):
    """CaffeInput-equivalent preprocessing (caffe_input_transformer_base.h:
    35-99 semantics): resize to descriptor dims, subtract per-channel mean,
    optional /255 normalize, optional planar transpose, pad to %pad_mod."""
    x = as_hwc_f32(frame)
    t, h, w, c = x.shape
    if input_width > 0 and input_height > 0:
        x = jax.image.resize(x, (t, input_height, input_width, c), "linear",
                             antialias=False)
    if normalize:
        x = x / 255.0
    if mean_colors:
        x = x - jnp.asarray(list(mean_colors), x.dtype)
    if pad_mod > 0:
        ph = (-x.shape[1]) % pad_mod
        pw = (-x.shape[2]) % pad_mod
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    if transpose:
        x = x.transpose(0, 3, 1, 2)  # NHWC -> NCHW planar, like Caffe blobs
    return x


def _resolve_descriptor(model: str, descriptor_path: str,
                        weights_path: Optional[str]):
    if descriptor_path:
        desc = NetDescriptor.from_file(descriptor_path)
        model = model or desc.model_path
        weights_path = weights_path or (desc.model_weights_path or None)
    return model, weights_path


def _nn_aux(ctx, params):
    model, weights_path = _resolve_descriptor(
        params.get("model", ""), params.get("descriptor_path", ""),
        params.get("weights_path"))
    init_fn, _ = get_model(model)
    return _get_params(f"nn:{model}", weights_path, init_fn)


@register_op("NNForward", kind="device", aux=_nn_aux,
             outputs=("array_f32",))
def nn_forward(ctx, aux, input, model: str = "", descriptor_path: str = "",
               weights_path: Optional[str] = None):
    """Generic forward pass (the reference's ``Caffe`` op,
    caffe_kernel.cpp:335-431). ``model`` names a registry entry, or
    ``descriptor_path`` points at a NetDescriptor TOML whose model_path is
    the registry name. Device op: the forward fuses into the surrounding
    device segment (weights enter via OpDef.aux). Output: the model's
    (first) output, rows = frames."""
    model, _ = _resolve_descriptor(model, descriptor_path, weights_path)
    _, apply_fn = get_model(model)
    x = jnp.asarray(input)
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    out = apply_fn(aux, x)
    if isinstance(out, (tuple, list)):
        out = out[0]
    return out


def _moe_aux(ctx, params):
    from ..parallel.expert import init_moe_params

    E = int(params.get("n_experts", 8))
    F = int(params.get("d_model", 0))
    H = int(params.get("d_hidden", 256))
    if F <= 0:
        raise ValueError("MoEHead requires d_model (input feature width)")
    return _get_params(f"nn:moe:{E}:{F}:{H}", params.get("weights_path"),
                       lambda rng: init_moe_params(rng, E, F, H))


@register_op("MoEHead", kind="device", aux=_moe_aux,
             outputs=("array_f32",),
             experts=lambda p: int(p.get("n_experts", 8)))
def moe_head(ctx, aux, input, n_experts: int = 8, d_model: int = 0,
             d_hidden: int = 256, capacity_factor: float = 2.0,
             capacity_batch: int = 0,
             weights_path: Optional[str] = None):
    """Routed mixture-of-experts FFN head over per-row feature vectors
    (e.g. FaceNet/streetstyle embeddings from NNForward) — a TPU-native
    addition with no reference analog (the reference's nets are fixed
    per-frame CNNs, SURVEY §2j); rows flatten to [T, d_model].

    Under ``PerfParams(expert_shards=N)`` the expert-stacked weights shard
    one-group-per-chip over the reserved 'expert' mesh axis with a single
    psum combine over ICI (parallel/expert.moe_apply_traced, composed into
    the fused segment so GSPMD partitions it); otherwise — or when
    n_experts doesn't divide the axis — the single-chip reference
    formulation runs, with identical routing/capacity/drop semantics.
    """
    from ..parallel.expert import moe_apply_traced, moe_reference

    x = as_hwc_f32(input)  # FrameChunk or plain array -> f32
    x = x.reshape(x.shape[0], -1)
    if x.shape[1] != int(d_model):
        raise ValueError(
            f"MoEHead d_model={d_model} but input rows flatten to "
            f"{x.shape[1]} features")
    # Capacity from a fixed reference batch (capacity_batch>0) makes the
    # drop behavior independent of work_packet_size / tail-chunk length;
    # default derives it from the per-chunk row count (ADVICE r4 — see
    # PARITY.md "Documented deviations").
    cap = max(1, int(capacity_factor * capacity_batch / n_experts)) \
        if capacity_batch > 0 else 0
    mesh = ctx.ep_mesh(n_experts) if hasattr(ctx, "ep_mesh") else None
    if mesh is not None:
        return moe_apply_traced(aux, x, mesh,
                                capacity_factor=capacity_factor,
                                capacity=cap)
    return moe_reference(aux, x, capacity_factor=capacity_factor,
                         capacity=cap)


def _frcnn_aux(ctx, params):
    init_fn, _ = get_model("faster_rcnn")
    return _get_params("nn:faster_rcnn", params.get("weights_path"), init_fn)


@register_op("FasterRCNN", kind="device", aux=_frcnn_aux,
             outputs=("array_f32", "array_f32", "array_f32"))
def faster_rcnn_forward(ctx, aux, input, weights_path: Optional[str] = None):
    """Faster R-CNN forward (faster_rcnn_kernel.cpp:6-33): input is the
    NNInput-preprocessed frame batch (BGR, caffe mean); emits per frame
    cls_prob [R,81], rois [R,5] (batch, x1, y1, x2, y2 in input pixels —
    im_info scale is 1.0, matching the reference's net_config), fc7
    [R,4096]. Feed FasterRCNNOutput for the 0.7-threshold argmax decode."""
    _, apply_fn = get_model("faster_rcnn")
    x = jnp.asarray(input)
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    return apply_fn(aux, x)
