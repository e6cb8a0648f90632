"""Facenet-style fully-convolutional face detector (template regression).

Reference parity: the scannertools_caffe "Facenet" pipeline — a fully-conv
face detector whose output grid carries per-template sigmoid confidences
plus (dcx, dcy, dcw, dch) box adjustments (FacenetKernel reshapes the net
to scaled frame dims, facenet_kernel.cpp:37-46; the decode lives in
ops/detection_decode.py FacenetOutput, matching
facenet_output_kernel_cpu.cpp). This flax network produces that output
contract: [B, H/8, W/8, n_templates * 5].

Registered as ``facenet_detector`` in the generic model registry, so the
full pipeline is:

    pre  = sc.ops.NNInput(frame=frame, mean_colors=(119.3, 110.6, 101.4))
    maps = sc.ops.NNForward(input=pre, model='facenet_detector')
    info = sc.ops.InfoFromFrame(frames=frame)
    faces = sc.ops.FacenetOutput(scores=maps, frame_info=info)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

N_TEMPLATES = 25  # facenet_output_kernel_cpu.cpp:20-30


class FacenetDetector(nn.Module):
    n_templates: int = N_TEMPLATES

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] mean-subtracted, H,W % 8 == 0
        for i, f in enumerate((32, 64, 128)):
            x = nn.Conv(f, (3, 3), (2, 2), padding="SAME",
                        name=f"down{i}")(x)
            x = nn.relu(x)
            x = nn.relu(nn.Conv(f, (3, 3), padding="SAME",
                                name=f"conv{i}")(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding="SAME", name="head0")(x))
        # logits for n templates + 4 box adjustments each
        return nn.Conv(self.n_templates * 5, (1, 1), name="out")(x)


def init_params(rng: jax.Array):
    return FacenetDetector().init(rng, jnp.zeros((1, 64, 64, 3)))


def apply(variables, x):
    return FacenetDetector().apply(variables, x)


# registered as 'facenet_detector' by ops/nn_generic._register_builtins()
