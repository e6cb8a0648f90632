"""Pose ops + Pose type.

Reference parity: the ``OpenPose`` op (openpose_kernel.cpp:14-233 — packs
per-person floats [score, 18·3 pose, 70·3 face, 2·21·3 hands]) and the
``Pose`` registered type (scannertools_caffe/pose_detection.py:3-157:
normalized keypoints, face/body bbox derivation, draw pairs/colors,
``distance_to`` median-keypoint metric, PoseList uniform list).

The face/hand sub-networks of the CMU wrapper are not implemented (the
reference's own CPM2 path is body-only too); their keypoint slots are
zero-filled, preserving the serialized layout.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models import pose as pose_lib
from ..registry import register_op
from ..types import register_type
from .faces import _MODEL_CACHE, _get_params, _to_f32_frames


class Pose:
    POSE_KEYPOINTS = 18
    POSE_SCORES = 1
    FACE_KEYPOINTS = 70
    HAND_KEYPOINTS = 21

    (Nose, Neck, RShoulder, RElbow, RWrist, LShoulder, LElbow, LWrist,
     RHip, RKnee, RAnkle, LHip, LKnee, LAnkle, REye, LEye, REar,
     LEar) = range(18)
    Background = 18

    DRAW_PAIRS = [[1, 2], [1, 5], [2, 3], [3, 4], [5, 6], [6, 7], [1, 8],
                  [8, 9], [9, 10], [1, 11], [11, 12], [12, 13], [1, 0],
                  [0, 14], [14, 16], [0, 15], [15, 17]]

    DRAW_COLORS = [[255, 0, 85], [255, 0, 0], [255, 85, 0], [255, 170, 0],
                   [255, 255, 0], [170, 255, 0], [85, 255, 0], [0, 255, 0],
                   [0, 255, 85], [0, 255, 170], [0, 255, 255], [0, 170, 255],
                   [0, 85, 255], [0, 0, 255], [255, 0, 170], [170, 0, 255],
                   [255, 0, 255], [85, 0, 255]]

    def __init__(self, score: float, kp: np.ndarray):
        self._score = float(score)
        self._kp = np.asarray(kp, np.float32)  # [130, 3] normalized

    # --- (de)serialization: [score] + 130x3 f32, fixed stride ----------
    @classmethod
    def kp_count(cls) -> int:
        return cls.POSE_KEYPOINTS + cls.FACE_KEYPOINTS + 2 * cls.HAND_KEYPOINTS

    @classmethod
    def kp_size(cls) -> int:
        return cls.kp_count() * 3 + cls.POSE_SCORES  # floats per person

    def serialize(self) -> bytes:
        arr = np.concatenate([[self._score], self._kp.reshape(-1)])
        return arr.astype(np.float32).tobytes()

    @classmethod
    def deserialize(cls, buf: bytes) -> "Pose":
        arr = np.frombuffer(buf, np.float32)
        return cls(arr[0], arr[1:].reshape(cls.kp_count(), 3))

    # --- accessors (pose_detection.py:59-71) ----------------------------
    def pose_keypoints(self) -> np.ndarray:
        return self._kp[: self.POSE_KEYPOINTS]

    def face_keypoints(self) -> np.ndarray:
        return self._kp[self.POSE_KEYPOINTS:
                        self.POSE_KEYPOINTS + self.FACE_KEYPOINTS]

    def hand_keypoints(self):
        base = self._kp[self.POSE_KEYPOINTS + self.FACE_KEYPOINTS:]
        return [base[: self.HAND_KEYPOINTS], base[self.HAND_KEYPOINTS:]]

    # --- derived boxes (pose_detection.py:73-113) ------------------------
    def face_bbox(self):
        p = self.pose_keypoints()
        pts = [p[i] for i in (self.REye, self.LEye, self.REar, self.LEar,
                              self.Nose)]
        valid = [pt for pt in pts if pt[2] > 0.05]
        if not valid:
            return [(0, 0), (0, 0), 0]
        face = np.array(valid, ndmin=2)
        xmin, xmax = face[:, 0].min(), face[:, 0].max()
        width = xmax - xmin
        xmin -= width * 0.1
        xmax += width * 0.1
        yavg = float(np.mean(face[:, 1]))
        score = min(p[self.REar, 2], p[self.LEar, 2], p[self.Nose, 2])
        return [(xmin, yavg - width), (xmax, yavg + width), score]

    def body_bbox(self):
        p = self.pose_keypoints()
        return [(p[:, 0].min(), p[:, 1].min()),
                (p[:, 0].max(), p[:, 1].max()), float(np.mean(p[:, 2]))]

    def draw(self, img, thickness: int = 5, draw_threshold: float = 0.05):
        import cv2

        def to_pt(i):
            x, y = self._kp[i, 0], self._kp[i, 1]
            if not (0 <= x < 1 and 0 <= y < 1 and x == x and y == y):
                return None
            return (int(x * img.shape[1]), int(y * img.shape[0]))

        for (a, b), color in zip(self.DRAW_PAIRS, self.DRAW_COLORS):
            if self._kp[a, 2] > draw_threshold and \
                    self._kp[b, 2] > draw_threshold:
                pa, pb = to_pt(a), to_pt(b)
                if pa is not None and pb is not None:
                    cv2.line(img, pa, pb, color, thickness)
        return img

    def distance_to(self, pose: "Pose",
                    confidence_threshold: float = 0.2) -> float:
        kp, other = self.pose_keypoints(), pose.pose_keypoints()
        ds = [
            math.hypot(other[i, 0] - kp[i, 0], other[i, 1] - kp[i, 1])
            for i in range(self.POSE_KEYPOINTS)
            if kp[i, 2] > confidence_threshold
            and other[i, 2] > confidence_threshold
        ]
        return float(np.median(ds)) if ds else float("inf")


_STRIDE = Pose.kp_size() * 4  # bytes per person


def _ser_pose_list(poses: List[Pose]) -> bytes:
    return b"".join(p.serialize() for p in poses)


def _parse_pose_list(buf: bytes) -> List[Pose]:
    return [Pose.deserialize(buf[i : i + _STRIDE])
            for i in range(0, len(buf), _STRIDE)]


register_type("pose_list", _ser_pose_list, _parse_pose_list)


@register_op("OpenPose", kind="host", outputs=("pose_list",))
def openpose(ctx, frame, weights_path: Optional[str] = None,
             pose_num_scales: int = 1, pose_scale_gap: float = 0.1,
             compute_face: bool = False, compute_hands: bool = False,
             batch: int = 0):
    """Body-pose detection. ``pose_num_scales``/``pose_scale_gap`` follow
    the reference op's multi-scale knobs (openpose_kernel.cpp:94-141);
    scales are averaged in heatmap space. Keypoints are emitted normalized
    to [0,1] like the reference Pose type expects."""
    variables = _get_params("openpose", weights_path, pose_lib.init_params)
    frames = _to_f32_frames(frame)
    t, h, w, _ = frames.shape
    # pad to a multiple of 8 (network stride; CPM2Input pads to %8)
    ph = -(-h // 8) * 8
    pw = -(-w // 8) * 8
    padded = np.zeros((t, ph, pw, 3), np.float32)
    padded[:, :h, :w] = frames

    scales = tuple(
        max(0.1, 1.0 - i * pose_scale_gap) for i in range(pose_num_scales)
    )
    key = ("openpose_fn", ph, pw, t, scales)
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = jax.jit(
            lambda v, a: pose_lib.device_stage(v, a, scales)
        )
    peaks, valid, scores = _MODEL_CACHE[key](variables, jnp.asarray(padded))
    peaks = np.asarray(peaks)
    valid = np.asarray(valid)
    scores = np.asarray(scores)

    out: List[List[Pose]] = []
    for i in range(t):
        people = pose_lib.group_people(peaks[i], valid[i], scores[i])
        poses = []
        for score, kp in people:
            full = np.zeros((Pose.kp_count(), 3), np.float32)
            body = kp.copy()
            body[:, 0] /= w  # normalize like the reference Pose type
            body[:, 1] /= h
            full[: Pose.POSE_KEYPOINTS] = body
            poses.append(Pose(score, full))
        out.append(poses)
    return out


# ----------------------------------------------- CPM2 name-parity surface

@register_op("CPM2Input", kind="device", outputs=("array_f32",))
def cpm2_input(ctx, frame, scale: float = 1.0):
    """CPM2 preprocessing (cpm2_input_kernel_gpu.cpp:97-141): scale, pad
    W/H to a multiple of 8 with gray(128), map to [-0.5, 0.5] f32."""
    import jax

    from ..utils.framechunk import as_hwc_f32

    x = as_hwc_f32(frame)
    t, h, w, c = x.shape
    if scale != 1.0:
        h, w = int(round(h * scale)), int(round(w * scale))
        x = jax.image.resize(x, (t, h, w, c), "linear", antialias=False)
    ph = (-h) % 8
    pw = (-w) % 8
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                constant_values=128.0)
    return x / 256.0 - 0.5


@register_op("CPM2", kind="host", outputs=("array_f32", "array_f32"))
def cpm2(ctx, cpm2_input, weights_path: Optional[str] = None):
    """CPM2 network forward (cpm2_kernel.cpp:13-52): emits resized heatmaps
    and PAF maps at input resolution (the ImResizeLayer contract)."""
    variables = _get_params("openpose", weights_path, pose_lib.init_params)
    x = np.asarray(cpm2_input, np.float32)
    t, h, w, _ = x.shape
    key = ("cpm2_fn", t, h, w)
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = jax.jit(
            lambda v, a: pose_lib.infer_maps(v, a, (a.shape[1], a.shape[2]))
        )
    heat, paf = _MODEL_CACHE[key](variables, jnp.asarray(x))
    return [np.asarray(m) for m in np.asarray(heat)], \
        [np.asarray(m) for m in np.asarray(paf)]


@register_op("CPM2Output", kind="host", outputs=("pose_list",))
def cpm2_output(ctx, cpm2_resized_map, cpm2_joints, original_frame_info,
                threshold: float = pose_lib.THRE_PEAK):
    """PAF grouping over precomputed maps (cpm2_output_kernel_cpu.cpp:
    115-773 semantics; see models/pose.py). cpm2_resized_map: heatmaps,
    cpm2_joints: PAF maps, original_frame_info: FrameInfo for
    normalization."""
    out = []
    for t in range(len(cpm2_resized_map)):
        heat = jnp.asarray(np.asarray(cpm2_resized_map[t], np.float32))
        paf = jnp.asarray(np.asarray(cpm2_joints[t], np.float32))
        key = ("cpm2_group", heat.shape)
        if key not in _MODEL_CACHE:
            def fn(hm, pf):
                peaks, valid = pose_lib.find_peaks(hm)
                return peaks, valid, pose_lib.limb_scores(pf, peaks, valid)
            _MODEL_CACHE[key] = jax.jit(fn)
        peaks, valid, scores = _MODEL_CACHE[key](heat, paf)
        people = pose_lib.group_people(np.asarray(peaks), np.asarray(valid),
                                       np.asarray(scores))
        fi = original_frame_info[t]
        poses = []
        for score, kp in people:
            full = np.zeros((Pose.kp_count(), 3), np.float32)
            body = kp.copy()
            body[:, 0] /= max(fi.width, 1)
            body[:, 1] /= max(fi.height, 1)
            full[: Pose.POSE_KEYPOINTS] = body
            poses.append(Pose(score, full))
        out.append(poses)
    return out
