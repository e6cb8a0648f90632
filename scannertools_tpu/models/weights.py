"""Weight porting & persistence.

Reference parity: the reference downloads pretrained TF1/Caffe checkpoints
at runtime (face_embedding.py:31 FaceNet tar, object_detection.py:38 SSD
frozen graph, openpose_kernel.cpp:35-78 caffemodels). This environment has
no egress, so the flax models initialize deterministically random unless a
weights file is supplied; this module is the bridge:

  * ``save_params`` / ``load_params`` — flatten a variables pytree to npz
    (portable, no pickle).
  * ``from_torch_conv`` / ``from_torch_linear`` / ``from_torch_bn`` — layout
    converters (torch OIHW → flax HWIO etc.), validated by tests that build
    tiny torch models and compare outputs.
  * ``port_state_dict`` — drive a {flax path: (torch key, kind)} mapping
    over a torch ``state_dict`` to fill a flax variables tree.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


# ------------------------------------------------------------- npz persist

def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return root


def save_params(path: str, variables: Any) -> None:
    np.savez_compressed(path, **_flatten(variables))


def load_params(path: str) -> Dict[str, Any]:
    with np.load(path) as z:
        return _unflatten({k: z[k] for k in z.files})


# --------------------------------------------------------- torch converters

def from_torch_conv(w: np.ndarray) -> np.ndarray:
    """torch conv weight [O, I, kH, kW] -> flax [kH, kW, I, O]."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def from_torch_depthwise(w: np.ndarray) -> np.ndarray:
    """torch depthwise [C, 1, kH, kW] -> flax grouped-conv [kH, kW, 1, C]."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def from_torch_linear(w: np.ndarray) -> np.ndarray:
    """torch linear [O, I] -> flax kernel [I, O]."""
    return np.transpose(np.asarray(w), (1, 0))


def from_torch_bn(weight, bias, running_mean, running_var):
    """-> flax BatchNorm {scale, bias} params + {mean, var} batch_stats."""
    return (
        {"scale": np.asarray(weight), "bias": np.asarray(bias)},
        {"mean": np.asarray(running_mean), "var": np.asarray(running_var)},
    )


def from_torch_conv_transpose(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight [I, O, kH, kW] -> flax [kH, kW, I, O]."""
    return np.transpose(np.asarray(w), (2, 3, 0, 1))


def from_tf_conv(w: np.ndarray) -> np.ndarray:
    """TF conv weight [kH, kW, I, O] — already flax layout."""
    return np.asarray(w)


def from_tf_depthwise(w: np.ndarray) -> np.ndarray:
    """TF depthwise [kH, kW, C, multiplier=1] -> flax grouped-conv
    [kH, kW, 1, C]."""
    return np.transpose(np.asarray(w), (0, 1, 3, 2))


_KIND_FNS = {
    "conv": from_torch_conv,
    "conv_transpose": from_torch_conv_transpose,
    "depthwise": from_torch_depthwise,
    "linear": from_torch_linear,
    "tf_conv": from_tf_conv,
    "tf_depthwise": from_tf_depthwise,
    "raw": np.asarray,
}


def port_state_dict(variables: Dict[str, Any],
                    state_dict: Mapping[str, Any],
                    mapping: Mapping[str, Tuple[str, str]]) -> Dict[str, Any]:
    """Fill ``variables`` (a flax tree, e.g. {'params': ..., 'batch_stats':
    ...}) from a torch state_dict.

    mapping: {"params/conv1/conv/kernel": ("conv2d_1a.conv.weight", "conv"),
              ...} — flax slash-path -> (torch key, kind). Entries whose
    torch key is missing raise KeyError (porting must be total).
    """
    flat = _flatten(variables)
    for flax_key, (torch_key, kind) in mapping.items():
        if flax_key not in flat:
            raise KeyError(f"flax param {flax_key!r} not in variables tree")
        t = state_dict[torch_key]
        arr = _KIND_FNS[kind](np.asarray(getattr(t, "numpy", lambda: t)()))
        if arr.shape != flat[flax_key].shape:
            raise ValueError(
                f"{flax_key}: shape {arr.shape} != expected "
                f"{flat[flax_key].shape} (torch key {torch_key})"
            )
        flat[flax_key] = arr.astype(flat[flax_key].dtype)
    return _unflatten(flat)
