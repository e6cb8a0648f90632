"""Model zoo: flax implementations of the reference's NN ops (SURVEY §2a/2f).

Pretrained weights are not bundled (no-egress build environment); load them
via models/weights.py (npz, or ported from torch state_dicts)."""

from . import (common, facenet, facenet_detector, gender, maskrcnn,  # noqa: F401
               mtcnn, pose, ssd, weights)
