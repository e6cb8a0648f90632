"""Multi-person 2D pose estimation — OpenPose/CPM two-branch network with
Part-Affinity-Field grouping, TPU-native.

Reference parity: the scannertools_caffe pose stack — CPM2 caffe forward
(cpm2_kernel.cpp:13-28), CPM2Input preprocessing (scale, pad to %8,
[-0.5,0.5], cpm2_input_kernel_gpu.cpp:97-141) and CPM2Output's multi-person
PAF grouping (cpm2_output_kernel_cpu.cpp:115-773: per-limb candidate pairs
scored by a 10-point line integral over the affinity maps, inter threshold
0.05 / min count 9, greedy assignment, subset merging, prune cnt>=3 &&
score/cnt>0.4) — and the OpenPose wrapper op (openpose_kernel.cpp). The
algorithm is Cao et al., "Realtime Multi-Person 2D Pose Estimation using
Part Affinity Fields" (CVPR 2017); COCO-18 keypoint order matches
pose_detection.py:10-27.

TPU-native split (SURVEY §7 hard part #3): the network, heatmap peak
finding (3×3 local-max + top-K per part) and ALL line integrals (one
gather over [limbs × K × K × 10] sample points) run on device with static
shapes; only the tiny greedy assignment / subset merge runs on host over
the padded candidate arrays.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

N_PARTS = 18       # COCO-18 (pose_detection.py:5)
N_HEAT = 19        # + background
N_LIMBS = 19
N_PAF = 38
MAX_PEAKS = 24     # static per-part peak capacity
MAX_PEOPLE = 96    # cpm2_output emits <= 96 people
THRE_PEAK = 0.10   # heatmap peak threshold (OpenPose thre1)
THRE_PAF = 0.05    # PAF sample threshold (cpm2: inter threshold 0.05)
MIN_SAMPLES = 9    # of 10 integral samples (cpm2: min-count 9)
N_SAMPLES = 10

# COCO limb sequence, 0-indexed into the 18 keypoints, and the PAF channel
# pair feeding each limb (standard COCO OpenPose tables).
LIMB_SEQ = [
    (1, 2), (1, 5), (2, 3), (3, 4), (5, 6), (6, 7), (1, 8), (8, 9),
    (9, 10), (1, 11), (11, 12), (12, 13), (1, 0), (0, 14), (14, 16),
    (0, 15), (15, 17), (2, 16), (5, 17),
]
PAF_IDX = [
    (12, 13), (20, 21), (14, 15), (16, 17), (22, 23), (24, 25), (0, 1),
    (2, 3), (4, 5), (6, 7), (8, 9), (10, 11), (28, 29), (30, 31), (34, 35),
    (32, 33), (36, 37), (18, 19), (26, 27),
]


class _ConvRelu(nn.Module):
    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        return nn.relu(nn.Conv(self.features, (self.kernel, self.kernel),
                               padding="SAME", name="conv")(x))


class OpenPoseBody(nn.Module):
    """VGG19(conv1_1..conv4_2) + CPM feature convs + 6 two-branch stages.
    Output stride 8: heatmaps [B, H/8, W/8, 19], PAFs [..., 38]."""

    stages: int = 6

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] in [-0.5, 0.5]
        # VGG19 front (10 convs)
        for i, (f, pool) in enumerate([
            (64, False), (64, True), (128, False), (128, True),
            (256, False), (256, False), (256, False), (256, True),
            (512, False), (512, False),
        ]):
            x = _ConvRelu(f, name=f"vgg{i}")(x)
            if pool:
                x = nn.max_pool(x, (2, 2), (2, 2))
        # CPM feature reduction
        x = _ConvRelu(256, name="cpm0")(x)
        feat = _ConvRelu(128, name="cpm1")(x)

        def branch(inp, out_ch, stage, tag):
            h = inp
            if stage == 0:
                for j in range(3):
                    h = _ConvRelu(128, name=f"s0_{tag}_{j}")(h)
                h = _ConvRelu(512, kernel=1, name=f"s0_{tag}_3")(h)
                h = nn.Conv(out_ch, (1, 1), name=f"s0_{tag}_4")(h)
            else:
                for j in range(5):
                    h = _ConvRelu(128, kernel=7, name=f"s{stage}_{tag}_{j}")(h)
                h = _ConvRelu(128, kernel=1, name=f"s{stage}_{tag}_5")(h)
                h = nn.Conv(out_ch, (1, 1), name=f"s{stage}_{tag}_6")(h)
            return h

        paf = branch(feat, N_PAF, 0, "L1")
        heat = branch(feat, N_HEAT, 0, "L2")
        for s in range(1, self.stages):
            inp = jnp.concatenate([paf, heat, feat], axis=-1)
            paf = branch(inp, N_PAF, s, "L1")
            heat = branch(inp, N_HEAT, s, "L2")
        return heat, paf


def init_params(rng: jax.Array, stages: int = 6) -> Dict[str, Any]:
    return OpenPoseBody(stages=stages).init(
        rng, jnp.zeros((1, 64, 64, 3))
    )


class _BodyFront(nn.Module):
    """OpenPoseBody's front (VGG + CPM feature + stage 0), exposing
    ``feat`` for the pipelined refinement path. Layer names are identical
    to OpenPoseBody's, so it applies against the SAME variables tree
    (flax ignores unused params)."""

    @nn.compact
    def __call__(self, x):
        for i, (f, pool) in enumerate([
            (64, False), (64, True), (128, False), (128, True),
            (256, False), (256, False), (256, False), (256, True),
            (512, False), (512, False),
        ]):
            x = _ConvRelu(f, name=f"vgg{i}")(x)
            if pool:
                x = nn.max_pool(x, (2, 2), (2, 2))
        x = _ConvRelu(256, name="cpm0")(x)
        feat = _ConvRelu(128, name="cpm1")(x)

        def stage0(inp, out_ch, tag):
            h = inp
            for j in range(3):
                h = _ConvRelu(128, name=f"s0_{tag}_{j}")(h)
            h = _ConvRelu(512, kernel=1, name=f"s0_{tag}_3")(h)
            return nn.Conv(out_ch, (1, 1), name=f"s0_{tag}_4")(h)

        paf = stage0(feat, N_PAF, "L1")
        heat = stage0(feat, N_HEAT, "L2")
        return paf, heat, feat


class RefineStage(nn.Module):
    """One uniform OpenPose refinement stage (stages 1..5 all share this
    shape) over the packed hidden state ``[.., N_PAF + N_HEAT + 128]``
    (paf ++ heat ++ feat): emits the new paf/heat with feat passed
    through, keeping the hidden shape uniform — the pipeline-parallel
    stage function. Param child names L1_j/L2_j match OpenPoseBody's
    s{k}_L1_j/s{k}_L2_j subtrees (``refine_stage_params``)."""

    @nn.compact
    def __call__(self, h):
        feat = h[..., N_PAF + N_HEAT:]

        def branch(out_ch, tag):
            a = h
            for j in range(5):
                a = _ConvRelu(128, kernel=7, name=f"{tag}_{j}")(a)
            a = _ConvRelu(128, kernel=1, name=f"{tag}_5")(a)
            return nn.Conv(out_ch, (1, 1), name=f"{tag}_6")(a)

        paf = branch(N_PAF, "L1")
        heat = branch(N_HEAT, "L2")
        return jnp.concatenate([paf, heat, feat], axis=-1)


def refine_stage_params(variables, stages: int = 6):
    """Per-refinement-stage param subtrees of an OpenPoseBody variables
    tree, renamed for RefineStage (s{k}_L1_j -> L1_j)."""
    p = variables["params"]
    subs = []
    for s in range(1, stages):
        sub = {}
        for tag in ("L1", "L2"):
            for j in range(7):
                sub[f"{tag}_{j}"] = p[f"s{s}_{tag}_{j}"]
        subs.append({"params": sub})
    return subs


def body_forward_pipelined(variables, x: jnp.ndarray, pipe_mesh,
                           stages: int = 6):
    """OpenPoseBody forward with the refinement chain placed one stage per
    chip along ``pipe_mesh`` ('pipe' axis, size == stages-1): frames are
    the GPipe microbatches streaming through the chain via ppermute
    (parallel/pipeline_parallel.pipeline_apply_traced — trace-safe, so
    this composes into the executor's fused device segments). The front
    (VGG+CPM+stage 0) runs replicated: it is ~15% of the FLOPs; the five
    7x7-conv refinement stages dominate and their weights divide by S.

    Returns (heat, paf) like OpenPoseBody.apply — float-tolerance parity
    (scan reassociation), pinned by tests/test_pp_executor.py."""
    from ..parallel.pipeline_parallel import (pipeline_apply_traced,
                                              stack_stage_params)

    paf, heat, feat = _BodyFront().apply(variables, x)
    h = jnp.concatenate([paf, heat, feat], axis=-1)
    stacked = stack_stage_params(refine_stage_params(variables, stages))
    out = pipeline_apply_traced(
        lambda pv, hh: RefineStage().apply(pv, hh),
        stacked, h[:, None], pipe_mesh)[:, 0]
    return (out[..., N_PAF:N_PAF + N_HEAT], out[..., :N_PAF])


class OpenPoseCrop(nn.Module):
    """The CMU single-person crop networks (face: 70 kp + bg; hand: 21 kp
    + bg) behind the wrapper's face/hand flags (openpose_kernel.cpp:
    108-141). Shared topology, per the public pose_face/pose_hand deploy
    prototxts: VGG19-style front (conv1_1..conv4_4 + conv5_1/5_2), a
    conv5_3_CPM feature layer, a 1×1 stage-1 head, then ``stages`` 7×7
    refinement stages over [prev, features] concat. Layer names mirror the
    caffe layers so face/hand caffemodels port (porting_maps.
    openpose_crop_mapping)."""

    out_channels: int  # 71 face, 22 hand
    stages: int = 6

    @nn.compact
    def __call__(self, x):  # [B, H, W, 3] in [-0.5, 0.5]
        cfg = [(64, False), (64, True), (128, False), (128, True),
               (256, False), (256, False), (256, False), (256, True),
               (512, False), (512, False), (512, False), (512, False),
               (512, False), (512, False)]
        names = ["conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1",
                 "conv3_2", "conv3_3", "conv3_4", "conv4_1", "conv4_2",
                 "conv4_3", "conv4_4", "conv5_1", "conv5_2"]
        for (f, pool), name in zip(cfg, names):
            x = _ConvRelu(f, name=name)(x)
            if pool:
                x = nn.max_pool(x, (2, 2), (2, 2))
        feat = _ConvRelu(128, name="conv5_3_CPM")(x)

        h = _ConvRelu(512, kernel=1, name="conv6_1_CPM")(feat)
        out = nn.Conv(self.out_channels, (1, 1), name="conv6_2_CPM")(h)
        for s in range(2, self.stages + 1):
            h = jnp.concatenate([out, feat], axis=-1)
            for j in range(1, 6):
                h = _ConvRelu(128, kernel=7, name=f"Mconv{j}_stage{s}")(h)
            h = _ConvRelu(128, kernel=1, name=f"Mconv6_stage{s}")(h)
            out = nn.Conv(self.out_channels, (1, 1),
                          name=f"Mconv7_stage{s}")(h)
        return out  # [B, H/8, W/8, out_channels]


class _CropFront(nn.Module):
    """OpenPoseCrop's front (VGG trunk + conv5_3_CPM feature + stage-1
    head), layer names identical to OpenPoseCrop so it applies against
    the SAME variables tree (flax ignores unused params) — the replicated
    part of the pipelined crop forward."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        cfg = [(64, False), (64, True), (128, False), (128, True),
               (256, False), (256, False), (256, False), (256, True),
               (512, False), (512, False), (512, False), (512, False),
               (512, False), (512, False)]
        names = ["conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1",
                 "conv3_2", "conv3_3", "conv3_4", "conv4_1", "conv4_2",
                 "conv4_3", "conv4_4", "conv5_1", "conv5_2"]
        for (f, pool), name in zip(cfg, names):
            x = _ConvRelu(f, name=name)(x)
            if pool:
                x = nn.max_pool(x, (2, 2), (2, 2))
        feat = _ConvRelu(128, name="conv5_3_CPM")(x)
        h = _ConvRelu(512, kernel=1, name="conv6_1_CPM")(feat)
        out = nn.Conv(self.out_channels, (1, 1), name="conv6_2_CPM")(h)
        return out, feat


class _CropRefineStage(nn.Module):
    """One uniform OpenPoseCrop refinement stage (stages 2..6 share this
    shape) over the packed hidden ``[.., out_channels + 128]`` (out ++
    feat): emits the new out with feat passed through — the
    pipeline-parallel stage function (names M1..M7 map to
    Mconv{j}_stage{s} via ``crop_stage_params``)."""

    out_channels: int

    @nn.compact
    def __call__(self, h):
        feat = h[..., self.out_channels:]
        a = h
        for j in range(1, 6):
            a = _ConvRelu(128, kernel=7, name=f"M{j}")(a)
        a = _ConvRelu(128, kernel=1, name="M6")(a)
        out = nn.Conv(self.out_channels, (1, 1), name="M7")(a)
        return jnp.concatenate([out, feat], axis=-1)


def crop_stage_params(variables, stages: int = 6):
    """Per-refinement-stage param subtrees of an OpenPoseCrop variables
    tree, renamed for _CropRefineStage (Mconv{j}_stage{s} -> M{j})."""
    p = variables["params"]
    return [
        {"params": {f"M{j}": p[f"Mconv{j}_stage{s}"] for j in range(1, 8)}}
        for s in range(2, stages + 1)
    ]


def crop_forward_pipelined(variables, crops: jnp.ndarray, n_kp: int,
                           pipe_mesh, stages: int = 6) -> jnp.ndarray:
    """OpenPoseCrop forward with the ``stages-1`` uniform refinement
    stages one per chip along ``pipe_mesh`` (crops = GPipe microbatches;
    parallel/pipeline_parallel.pipeline_apply_traced). Front replicated,
    like ``body_forward_pipelined``. Returns the final maps
    [B, H/8, W/8, n_kp + 1]."""
    from ..parallel.pipeline_parallel import (pipeline_apply_traced,
                                              stack_stage_params)

    out, feat = _CropFront(n_kp + 1).apply(variables, crops)
    h = jnp.concatenate([out, feat], axis=-1)
    stacked = stack_stage_params(crop_stage_params(variables, stages))
    h = pipeline_apply_traced(
        lambda pv, hh: _CropRefineStage(n_kp + 1).apply(pv, hh),
        stacked, h[:, None], pipe_mesh)[:, 0]
    return h[..., : n_kp + 1]


FACE_KEYPOINTS = 70
HAND_KEYPOINTS = 21


def init_face_params(rng: jax.Array, stages: int = 6) -> Dict[str, Any]:
    return OpenPoseCrop(FACE_KEYPOINTS + 1, stages=stages).init(
        rng, jnp.zeros((1, 64, 64, 3)))


def init_hand_params(rng: jax.Array, stages: int = 6) -> Dict[str, Any]:
    return OpenPoseCrop(HAND_KEYPOINTS + 1, stages=stages).init(
        rng, jnp.zeros((1, 64, 64, 3)))


def crop_keypoints(variables, crops: jnp.ndarray, n_kp: int,
                   stages: int = 6, pipe_mesh=None) -> jnp.ndarray:
    """Decode a batch of single-person crops -> [B, n_kp, 3] (x, y in crop-
    normalized [0,1], score). Single subject per crop, so the per-channel
    argmax is the keypoint (the wrapper does the same for face/hands —
    there is no PAF grouping in the crop nets). ``pipe_mesh`` runs the
    refinement chain one stage per chip (PerfParams(pipeline_stages=N)
    via OpenPoseDecode's compute_face/compute_hands)."""
    if pipe_mesh is not None:
        maps = crop_forward_pipelined(variables, crops, n_kp, pipe_mesh,
                                      stages=stages)
    else:
        maps = OpenPoseCrop(n_kp + 1, stages=stages).apply(variables, crops)
    maps = maps[..., :n_kp]  # drop background
    b, mh, mw, _ = maps.shape
    flat = maps.reshape(b, mh * mw, n_kp)
    idx = jnp.argmax(flat, axis=1)                      # [B, n_kp]
    score = jnp.take_along_axis(flat, idx[:, None, :], axis=1)[:, 0, :]
    ys = (idx // mw).astype(jnp.float32) / mh
    xs = (idx % mw).astype(jnp.float32) / mw
    return jnp.stack([xs, ys, score], axis=-1)


def find_peaks(heat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """heat: [H, W, 19] -> peaks [18, MAX_PEAKS, 3] (x, y, score) and
    valid mask [18, MAX_PEAKS]. 3×3 local maxima above THRE_PEAK."""
    h, w, _ = heat.shape
    hm = heat[..., :N_PARTS]
    pad = jnp.pad(hm, ((1, 1), (1, 1), (0, 0)), constant_values=-1.0)
    is_max = jnp.ones_like(hm, dtype=bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nb = pad[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            is_max &= hm >= nb
    score = jnp.where(is_max & (hm > THRE_PEAK), hm, -1.0)  # [H,W,18]
    flat = score.transpose(2, 0, 1).reshape(N_PARTS, -1)
    top, idx = jax.lax.top_k(flat, MAX_PEAKS)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    peaks = jnp.stack([xs, ys, top], axis=-1)
    return peaks, top > 0


def limb_scores(paf: jnp.ndarray, peaks: jnp.ndarray, valid: jnp.ndarray):
    """Line-integral scores for every candidate limb connection.

    paf: [H, W, 38]; peaks: [18, MAX_PEAKS, 3]; -> scores
    [N_LIMBS, MAX_PEAKS, MAX_PEAKS] (with -inf for infeasible pairs) —
    vectorizing cpm2_output_kernel_cpu.cpp:277-316's 10-point integral.
    """
    h, w, _ = paf.shape

    a_idx = jnp.array([a for a, _ in LIMB_SEQ])
    b_idx = jnp.array([b for _, b in LIMB_SEQ])
    cx_idx = jnp.array([c for c, _ in PAF_IDX])
    cy_idx = jnp.array([c for _, c in PAF_IDX])

    pa = peaks[a_idx]  # [L, K, 3]
    pb = peaks[b_idx]
    va = valid[a_idx]
    vb = valid[b_idx]

    ax = pa[:, :, None, 0]
    ay = pa[:, :, None, 1]
    bx = pb[:, None, :, 0]
    by = pb[:, None, :, 1]
    dx = bx - ax  # [L, K, K]
    dy = by - ay
    raw_norm = jnp.sqrt(dx * dx + dy * dy)
    norm = raw_norm + 1e-8
    ux, uy = dx / norm, dy / norm

    # reference sampling (cpm2_output_kernel_cpu.cpp:568-600): points at
    # t = lm/10 for lm = 0..9 (starting AT peak A), C++ round() =
    # half-away-from-zero = floor(x+0.5) for the nonneg coords here,
    # clamped to the top edge only (low side is nonneg by construction)
    ts = jnp.arange(N_SAMPLES, dtype=jnp.float32) / N_SAMPLES
    sx = ax[..., None] + dx[..., None] * ts  # [L, K, K, S]
    sy = ay[..., None] + dy[..., None] * ts
    xi = jnp.clip(jnp.floor(sx + 0.5), 0, w - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.floor(sy + 0.5), 0, h - 1).astype(jnp.int32)

    paf_flat = paf.reshape(-1, N_PAF)
    lin = yi * w + xi  # [L, K, K, S]
    px = paf_flat[lin.reshape(-1), :].reshape(*lin.shape, N_PAF)
    fx = jnp.take_along_axis(
        px, cx_idx[:, None, None, None, None], axis=-1)[..., 0]
    fy = jnp.take_along_axis(
        px, cy_idx[:, None, None, None, None], axis=-1)[..., 0]
    dots = fx * ux[..., None] + fy * uy[..., None]  # [L, K, K, S]

    # feasible iff ALL 10 samples clear the inter threshold (count >
    # connect_inter_min_above_threshold_ = 9, :604-607) and the peaks are
    # not coincident (norm >= 1e-6, :573-576); the candidate score is then
    # sum/count = the plain mean (no distance prior in the reference)
    n_good = jnp.sum(dots > THRE_PAF, axis=-1)
    mean_score = jnp.mean(dots, axis=-1)
    feasible = (
        (n_good > MIN_SAMPLES) & (raw_norm > 1e-6)
        & va[:, :, None] & vb[:, None, :]
    )
    return jnp.where(feasible, mean_score, -jnp.inf)


def infer_maps(variables, frames_pm5: jnp.ndarray, out_hw: Tuple[int, int],
               pipe_mesh=None, upsample: str = "linear"):
    """frames in [-0.5, 0.5] [T,H,W,3] -> (heat [T,h,w,19], paf [T,h,w,38])
    resized to out_hw (the CPM2 resized-heatmap contract). ``pipe_mesh``
    (a 'pipe'-axis mesh of exactly stages-1 devices) runs the refinement
    chain stage-per-chip (body_forward_pipelined). ``upsample='cubic'``
    matches OpenPose's wrapper resize exactly (ADVICE r4 / PARITY.md
    deviation note); the default stays linear."""
    if pipe_mesh is not None:
        heat, paf = body_forward_pipelined(variables, frames_pm5, pipe_mesh)
    else:
        heat, paf = OpenPoseBody().apply(variables, frames_pm5)
    t = frames_pm5.shape[0]
    oh, ow = out_hw
    heat = jax.image.resize(heat, (t, oh, ow, N_HEAT), upsample)
    paf = jax.image.resize(paf, (t, oh, ow, N_PAF), upsample)
    return heat, paf


def merge_scale_maps(maps: List[jnp.ndarray],
                     out_hw: Tuple[int, int],
                     upsample: str = "linear") -> jnp.ndarray:
    """CMU multi-scale merge (op::resizeAndMergeCaffe semantics behind
    openpose_kernel.cpp:94-141's op::Wrapper): raw net outputs from each
    pyramid scale are CUBIC-resized to the LARGEST scale's net-output grid
    and averaged THERE — not an average of full-frame upsamplings — then
    the merged maps are upsampled once to ``out_hw`` for decoding. The
    final upsample is LINEAR to match the single-scale ``infer_maps``
    contract exactly (so scales=(1.0, 1.0) is bit-identical to (1.0,));
    only the cross-scale merge uses the cubic resizeAndMerge kernel.
    maps: per-scale [T, h_s, w_s, C], largest grid first."""
    t, bh, bw, c = maps[0].shape
    acc = maps[0]
    for m in maps[1:]:
        acc = acc + jax.image.resize(m, (t, bh, bw, c), "cubic")
    merged = acc / len(maps)
    if (bh, bw) == tuple(out_hw):
        return merged
    return jax.image.resize(merged, (t, out_hw[0], out_hw[1], c), upsample)


def device_stage(variables, frames_f32: jnp.ndarray,
                 scales: Tuple[float, ...] = (1.0,), pipe_mesh=None,
                 upsample: str = "linear"):
    """Full device side for a chunk: [T,H,W,3] raw [0,255] ->
    (peaks [T,18,K,3], valid [T,18,K], scores [T,L,K,K]).
    Preprocess matches CPM2Input: /256 - 0.5 (cpm2_input_kernel_gpu.cpp).
    Multi-scale (pose_num_scales / pose_scale_gap,
    openpose_kernel.cpp:94-141): every scale runs the net at its OWN
    resolution and the raw net outputs merge at the largest scale's
    net-output grid (``merge_scale_maps``), the CMU wrapper contract —
    not an average of full-frame upsamplings."""
    x = frames_f32 / 256.0 - 0.5
    t, h, w, _ = x.shape
    if len(scales) == 1 and scales[0] == 1.0:
        heat, paf = infer_maps(variables, x, (h, w), pipe_mesh=pipe_mesh,
                               upsample=upsample)
    else:
        heats, pafs = [], []
        for s in sorted(scales, reverse=True):  # largest grid first
            hs = max(8, int(round(h * s)) // 8 * 8)
            ws = max(8, int(round(w * s)) // 8 * 8)
            if (hs, ws) == (h, w):
                xi = x
            else:
                xi = jax.image.resize(x, (t, hs, ws, 3), "linear",
                                      antialias=False)
            if pipe_mesh is not None:
                hm, pf = body_forward_pipelined(variables, xi, pipe_mesh)
            else:
                hm, pf = OpenPoseBody().apply(variables, xi)
            heats.append(hm)
            pafs.append(pf)
        heat = merge_scale_maps(heats, (h, w), upsample=upsample)
        paf = merge_scale_maps(pafs, (h, w), upsample=upsample)

    def per_frame(hm, pf):
        peaks, valid = find_peaks(hm)
        return peaks, valid, limb_scores(pf, peaks, valid)

    return jax.vmap(per_frame)(heat, paf)


# ----------------------------------------------------------- host grouping

def group_people(peaks: np.ndarray, valid: np.ndarray,
                 scores: np.ndarray) -> List[Tuple[float, np.ndarray]]:
    """Greedy limb assignment + subset clustering (host; tiny data) — an
    exact transcription of connect_limbs_coco
    (cpm2_output_kernel_cpu.cpp:463-760), pinned to the independent numpy
    oracle in tests/test_pose.py:

    per limb k (in LIMB_SEQ order):
      * both endpoints peakless -> skip (:502-503); one side peakless ->
        each unassigned peak of the other side seeds a 1-part subset
        (:504-562);
      * otherwise greedy-accept candidate pairs in descending line-integral
        score order, each peak used once, at most min(nA, nB) connections
        (:625-646);
      * limb 0 connections each seed a 2-part subset (:650-666); for later
        limbs every subset whose A-part holds this connection's A-peak gets
        the B-peak assigned (overwriting, count incremented — the
        reference's bookkeeping, :692-720); connections matching no subset
        seed a new one (:707-719).
    Prune: cnt >= 3 and score/cnt > 0.4 (:730-732), insertion order, at
    most MAX_PEOPLE (:749).

    peaks: [18, K, 3]; valid: [18, K]; scores: [L, K, K] from
    ``limb_scores`` (-inf = infeasible). Returns
    [(score/cnt, kp [18,3] heatmap coords)].
    """
    K = peaks.shape[1]
    # subsets: part -> peak index, plus the reference's score/cnt counters
    subsets: List[Dict] = []

    for l, (pa, pb) in enumerate(LIMB_SEQ):
        va_idx = [i for i in range(K) if valid[pa, i]]
        vb_idx = [j for j in range(K) if valid[pb, j]]
        if not va_idx and not vb_idx:
            continue
        if not va_idx:
            for j in vb_idx:
                if not any(ss["parts"].get(pb) == j for ss in subsets):
                    subsets.append({"parts": {pb: j}, "cnt": 1,
                                    "score": float(peaks[pb, j, 2])})
            continue
        if not vb_idx:
            for i in va_idx:
                if not any(ss["parts"].get(pa) == i for ss in subsets):
                    subsets.append({"parts": {pa: i}, "cnt": 1,
                                    "score": float(peaks[pa, i, 2])})
            continue

        s = scores[l]
        cands = [(float(s[i, j]), i, j) for i in va_idx for j in vb_idx
                 if np.isfinite(s[i, j])]
        cands.sort(key=lambda c: -c[0])
        num = min(len(va_idx), len(vb_idx))
        occ_a, occ_b = set(), set()
        conns = []
        for sc, i, j in cands:
            if len(conns) == num:
                break
            if i in occ_a or j in occ_b:
                continue
            conns.append((i, j, sc))
            occ_a.add(i)
            occ_b.add(j)

        if l == 0:
            for i, j, sc in conns:
                subsets.append({
                    "parts": {pa: i, pb: j}, "cnt": 2,
                    "score": float(peaks[pa, i, 2] + peaks[pb, j, 2]) + sc})
        else:
            for i, j, sc in conns:
                found = 0
                for ss in subsets:
                    if ss["parts"].get(pa) == i:
                        ss["parts"][pb] = j
                        ss["cnt"] += 1
                        ss["score"] += float(peaks[pb, j, 2]) + sc
                        found += 1
                if found == 0:
                    subsets.append({
                        "parts": {pa: i, pb: j}, "cnt": 2,
                        "score": float(peaks[pa, i, 2]
                                       + peaks[pb, j, 2]) + sc})

    people = []
    for ss in subsets:
        cnt = ss["cnt"]
        if cnt < 3 or ss["score"] / cnt <= 0.4:  # reference pruning
            continue
        kp = np.zeros((N_PARTS, 3), np.float32)
        for part, pk in ss["parts"].items():
            kp[part] = peaks[part, pk]
        people.append((float(ss["score"] / cnt), kp))
        if len(people) == MAX_PEOPLE:
            break
    return people
