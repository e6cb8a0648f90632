"""Concrete weight-porting maps: torch checkpoint naming → our flax trees.

Reference parity: the reference downloads exact pretrained artifacts
(FaceNet 20170512-110547, MTCNN's det1-3.npy, SSD frozen graph). This
module provides the deterministic key correspondences so those weights —
via their widely-used torch ports (facenet-pytorch's ``MTCNN`` and
``InceptionResnetV1``) — drop into our models:

    import torch
    from facenet_pytorch import InceptionResnetV1
    sd = InceptionResnetV1(pretrained='vggface2').state_dict()
    variables = port_facenet(facenet.init_params(rng), sd)

The maps are built programmatically from both sides' (identical) layer
orders. No checkpoint can be fetched in this build environment, so tests
assert *structural* totality: every flax parameter is covered exactly once
with shape-compatible converters (weights.port_state_dict validates shapes
at port time and raises on any mismatch).

Caveat: torch flattens conv activations as CHW before dense layers while
flax flattens HWC — dense kernels that consume conv outputs are
re-permuted with ``linear_after_conv``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from . import weights as W


def linear_after_conv(w: np.ndarray, chw: Tuple[int, int, int]) -> np.ndarray:
    """torch dense [O, C*H*W] following a conv (CHW flatten) -> flax kernel
    [H*W*C, O] (HWC flatten)."""
    c, h, wd = chw
    o = np.asarray(w).shape[0]
    k = np.asarray(w).reshape(o, c, h, wd).transpose(2, 3, 1, 0)
    return k.reshape(h * wd * c, o)


# ---------------------------------------------------------------- MTCNN

# facenet-pytorch module names per net; PReLU weights are per-channel.
_PNET = [
    ("conv1", "conv1", "conv"), ("prelu1", "prelu1", "prelu"),
    ("conv2", "conv2", "conv"), ("prelu2", "prelu2", "prelu"),
    ("conv3", "conv3", "conv"), ("prelu3", "prelu3", "prelu"),
    ("conv4_1", "conv4_1", "conv"), ("conv4_2", "conv4_2", "conv"),
]
_RNET = [
    ("conv1", "conv1", "conv"), ("prelu1", "prelu1", "prelu"),
    ("conv2", "conv2", "conv"), ("prelu2", "prelu2", "prelu"),
    ("conv3", "conv3", "conv"), ("prelu3", "prelu3", "prelu"),
    ("fc1", "dense4", "linear_conv:64,3,3"), ("prelu4", "prelu4", "prelu"),
    ("fc2_1", "dense5_1", "linear"), ("fc2_2", "dense5_2", "linear"),
]
_ONET = [
    ("conv1", "conv1", "conv"), ("prelu1", "prelu1", "prelu"),
    ("conv2", "conv2", "conv"), ("prelu2", "prelu2", "prelu"),
    ("conv3", "conv3", "conv"), ("prelu3", "prelu3", "prelu"),
    ("conv4", "conv4", "conv"), ("prelu4", "prelu4", "prelu"),
    ("fc1", "dense5", "linear_conv:128,3,3"), ("prelu5", "prelu5", "prelu"),
    ("fc2_1", "dense6_1", "linear"), ("fc2_2", "dense6_2", "linear"),
    ("fc2_3", "dense6_3", "linear"),
]


def mtcnn_mapping() -> Dict[str, Tuple[str, str]]:
    out: Dict[str, Tuple[str, str]] = {}
    for net, table in (("pnet", _PNET), ("rnet", _RNET), ("onet", _ONET)):
        for flax_name, torch_name, kind in table:
            if kind == "prelu":
                out[f"{net}/{flax_name}/alpha"] = (
                    f"{torch_name}.weight", "raw")
            elif kind.startswith("linear"):
                out[f"{net}/{flax_name}/kernel"] = (
                    f"{torch_name}.weight", kind)
                out[f"{net}/{flax_name}/bias"] = (
                    f"{torch_name}.bias", "raw")
            else:  # conv
                out[f"{net}/{flax_name}/kernel"] = (
                    f"{torch_name}.weight", "conv")
                out[f"{net}/{flax_name}/bias"] = (
                    f"{torch_name}.bias", "raw")
    return out


def port_mtcnn(params: Dict, state_dicts: Dict[str, dict]) -> Dict:
    """params: models.mtcnn.init_params output; state_dicts:
    {'pnet': PNet().state_dict(), 'rnet': ..., 'onet': ...}."""
    merged = {}
    for net, sd in state_dicts.items():
        for k, v in sd.items():
            merged[f"{net}::{k}"] = v
    mapping = {
        path: (f"{path.split('/')[0]}::{tk}", kind)
        for path, (tk, kind) in mtcnn_mapping().items()
    }
    return _port_with_linear_conv(params, merged, mapping)


# --------------------------------------------------------------- FaceNet

def _facenet_convbn(flax_prefix: str, torch_prefix: str, out):
    out[f"{flax_prefix}/conv/kernel"] = (f"{torch_prefix}.conv.weight",
                                         "conv")
    out[f"BN:{flax_prefix}/bn"] = (f"{torch_prefix}.bn", "bn")


def facenet_mapping() -> Dict[str, Tuple[str, str]]:
    """flax path (under params/) -> facenet-pytorch InceptionResnetV1 key.
    BN entries use the pseudo-kind 'bn' expanded by port_facenet into
    scale/bias/mean/var."""
    out: Dict[str, Tuple[str, str]] = {}
    stem = [
        ("conv1", "conv2d_1a"), ("conv2", "conv2d_2a"), ("conv3", "conv2d_2b"),
        ("conv4", "conv2d_3b"), ("conv5", "conv2d_4a"), ("conv6", "conv2d_4b"),
    ]
    for f, t in stem:
        _facenet_convbn(f, t, out)
    for i in range(5):
        t = f"repeat_1.{i}"
        f = f"block35_{i}"
        _facenet_convbn(f"{f}/b0", f"{t}.branch0", out)
        _facenet_convbn(f"{f}/b1_0", f"{t}.branch1.0", out)
        _facenet_convbn(f"{f}/b1_1", f"{t}.branch1.1", out)
        _facenet_convbn(f"{f}/b2_0", f"{t}.branch2.0", out)
        _facenet_convbn(f"{f}/b2_1", f"{t}.branch2.1", out)
        _facenet_convbn(f"{f}/b2_2", f"{t}.branch2.2", out)
        out[f"{f}/up/kernel"] = (f"{t}.conv2d.weight", "conv")
        out[f"{f}/up/bias"] = (f"{t}.conv2d.bias", "raw")
    _facenet_convbn("ra0", "mixed_6a.branch0", out)
    _facenet_convbn("ra1_0", "mixed_6a.branch1.0", out)
    _facenet_convbn("ra1_1", "mixed_6a.branch1.1", out)
    _facenet_convbn("ra1_2", "mixed_6a.branch1.2", out)
    for i in range(10):
        t = f"repeat_2.{i}"
        f = f"block17_{i}"
        _facenet_convbn(f"{f}/b0", f"{t}.branch0", out)
        _facenet_convbn(f"{f}/b1_0", f"{t}.branch1.0", out)
        _facenet_convbn(f"{f}/b1_1", f"{t}.branch1.1", out)
        _facenet_convbn(f"{f}/b1_2", f"{t}.branch1.2", out)
        out[f"{f}/up/kernel"] = (f"{t}.conv2d.weight", "conv")
        out[f"{f}/up/bias"] = (f"{t}.conv2d.bias", "raw")
    _facenet_convbn("rb0_0", "mixed_7a.branch0.0", out)
    _facenet_convbn("rb0_1", "mixed_7a.branch0.1", out)
    _facenet_convbn("rb1_0", "mixed_7a.branch1.0", out)
    _facenet_convbn("rb1_1", "mixed_7a.branch1.1", out)
    _facenet_convbn("rb2_0", "mixed_7a.branch2.0", out)
    _facenet_convbn("rb2_1", "mixed_7a.branch2.1", out)
    _facenet_convbn("rb2_2", "mixed_7a.branch2.2", out)
    for i in range(5):
        t = f"repeat_3.{i}"
        f = f"block8_{i}"
        _facenet_convbn(f"{f}/b0", f"{t}.branch0", out)
        _facenet_convbn(f"{f}/b1_0", f"{t}.branch1.0", out)
        _facenet_convbn(f"{f}/b1_1", f"{t}.branch1.1", out)
        _facenet_convbn(f"{f}/b1_2", f"{t}.branch1.2", out)
        out[f"{f}/up/kernel"] = (f"{t}.conv2d.weight", "conv")
        out[f"{f}/up/bias"] = (f"{t}.conv2d.bias", "raw")
    _facenet_convbn("block8_final/b0", "block8.branch0", out)
    _facenet_convbn("block8_final/b1_0", "block8.branch1.0", out)
    _facenet_convbn("block8_final/b1_1", "block8.branch1.1", out)
    _facenet_convbn("block8_final/b1_2", "block8.branch1.2", out)
    out["block8_final/up/kernel"] = ("block8.conv2d.weight", "conv")
    out["block8_final/up/bias"] = ("block8.conv2d.bias", "raw")
    out["bottleneck/kernel"] = ("last_linear.weight", "linear")
    out["BN:bottleneck_bn"] = ("last_bn", "bn_nofscale")
    return out


def port_facenet(variables: Dict, state_dict: Dict) -> Dict:
    """Expand bn pseudo-entries then drive weights.port_state_dict."""
    mapping: Dict[str, Tuple[str, str]] = {}
    for path, (tk, kind) in facenet_mapping().items():
        if kind == "bn":
            bn = path[3:]
            mapping[f"params/{bn}/scale"] = (f"{tk}.weight", "raw")
            mapping[f"params/{bn}/bias"] = (f"{tk}.bias", "raw")
            mapping[f"batch_stats/{bn}/mean"] = (f"{tk}.running_mean", "raw")
            mapping[f"batch_stats/{bn}/var"] = (f"{tk}.running_var", "raw")
        elif kind == "bn_nofscale":
            bn = path[3:]
            mapping[f"params/{bn}/bias"] = (f"{tk}.bias", "raw")
            mapping[f"batch_stats/{bn}/mean"] = (f"{tk}.running_mean", "raw")
            mapping[f"batch_stats/{bn}/var"] = (f"{tk}.running_var", "raw")
        else:
            mapping[f"params/{path}"] = (tk, kind)
    return W.port_state_dict(variables, state_dict, mapping)


# -------------------------------------------------------------- helpers

def _port_with_linear_conv(params: Dict, state_dict: Dict,
                           mapping: Dict[str, Tuple[str, str]]) -> Dict:
    """port_state_dict variant supporting the 'linear_conv:C,H,W' kind."""
    flat = W._flatten(params)
    for flax_key, (torch_key, kind) in mapping.items():
        t = state_dict[torch_key]
        arr = np.asarray(getattr(t, "numpy", lambda: t)())
        if kind.startswith("linear_conv:"):
            c, h, wd = (int(x) for x in kind.split(":")[1].split(","))
            arr = linear_after_conv(arr, (c, h, wd))
        else:
            arr = W._KIND_FNS[kind](arr)
        if flax_key not in flat:
            raise KeyError(flax_key)
        if arr.shape != flat[flax_key].shape:
            raise ValueError(
                f"{flax_key}: {arr.shape} != {flat[flax_key].shape}")
        flat[flax_key] = arr.astype(flat[flax_key].dtype)
    return W._unflatten(flat)


def coverage_report(variables: Dict, mapping_paths) -> Tuple[set, set]:
    """(unmapped flax params, mapped-but-nonexistent paths) — both should
    be empty for a total mapping."""
    flat = set(W._flatten(variables))
    mapped = set(mapping_paths)
    return flat - mapped, mapped - flat
