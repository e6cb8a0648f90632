"""Model-zoo tests: NMS/crop primitives, architectures, weight porting.

Reference analogs: TestFaceDetection/TestFaceEmbedding/TestGenderDetection/
TestObjectDetection (tests/test_all.py:196-215). Without the reference's
pretrained checkpoints (no egress), these validate the machinery —
cascade mechanics, static-shape NMS, output shapes/types, and torch→flax
weight-porting numerics — rather than detection accuracy.
"""

import numpy as np
import pytest


def test_nms_matches_reference_semantics():
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.models.common import nms

    boxes = np.array([
        [0, 0, 10, 10],
        [1, 1, 11, 11],    # IoU with 0 ~ 0.68 -> suppressed
        [20, 20, 30, 30],
        [21, 21, 29, 29],  # inside box 2, higher score -> suppresses box 2
        [50, 50, 60, 60],
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7, 0.95, 0.6], np.float32)
    # always exercised under jit (the production path; eager scatter on the
    # axon backend has shown incorrect results)
    ob, os_, ov = jax.jit(lambda b, s: nms(b, s, 0.5, 4))(
        jnp.asarray(boxes), jnp.asarray(scores))
    ob, os_, ov = np.asarray(ob), np.asarray(os_), np.asarray(ov)
    # kept: box3 (0.95), box0 (0.9), box4 (0.6); box1/box2 suppressed
    assert ov.sum() == 3
    assert np.allclose(os_[:3], [0.95, 0.9, 0.6])
    assert np.allclose(ob[0], boxes[3])
    # min-mode at thresh 0.9: the contained box 2 has inter/min_area = 1.0
    # -> suppressed, while box 1 (IoU-min 0.81) survives
    _, os2, ov2 = jax.jit(lambda b, s: nms(b, s, 0.9, 4, mode="min"))(
        jnp.asarray(boxes), jnp.asarray(scores))
    assert np.asarray(ov2).sum() == 4
    assert 0.7 not in np.asarray(os2).tolist()


def test_crop_and_resize_matches_cv2():
    import cv2
    import jax.numpy as jnp

    from scannertools_tpu.models.common import crop_and_resize

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (40, 50, 3)).astype(np.float32)
    boxes = np.array([[5, 8, 25, 32]], np.float32)  # x1,y1,x2,y2
    import jax

    got = np.asarray(jax.jit(
        lambda im, b: crop_and_resize(im, b, (16, 16))
    )(jnp.asarray(img), jnp.asarray(boxes)))[0]
    want = cv2.resize(img[8:32, 5:25], (16, 16), interpolation=cv2.INTER_LINEAR)
    assert np.abs(got - want).mean() < 3.0


def test_crop_and_resize_upsampling_clamps_to_crop_window():
    """Upsampling a small interior box: cv2.resize border-replicates at the
    CROP edges, so the device crop must not blend in frame pixels outside
    the box (its first/last sample taps land outside the crop span). Tight
    tolerance — both paths are plain f32 bilinear."""
    import cv2
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.models.common import crop_and_resize

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 50, 3)).astype(np.float32)
    # 6x5 box well inside the frame, upsampled to 16x16
    x1, y1, x2, y2 = 20, 10, 25, 16
    boxes = np.array([[x1, y1, x2, y2]], np.float32)
    got = np.asarray(jax.jit(
        lambda im, b: crop_and_resize(im, b, (16, 16))
    )(jnp.asarray(img), jnp.asarray(boxes)))[0]
    want = cv2.resize(img[y1:y2, x1:x2], (16, 16),
                      interpolation=cv2.INTER_LINEAR)
    # the border rows/cols are exactly where unclamped taps would leak
    # pixels from outside the box
    assert np.abs(got - want).max() < 1.5
    assert np.abs(got[0] - want[0]).max() < 1.5
    assert np.abs(got[-1] - want[-1]).max() < 1.5


def test_mtcnn_cascade_mechanics():
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.models import mtcnn

    params = mtcnn.init_params(jax.random.PRNGKey(0))
    frames = np.random.default_rng(1).integers(
        0, 256, (2, 48, 64, 3)
    ).astype(np.float32)
    boxes, scores, valid = jax.jit(mtcnn.detect_batch)(
        params, jnp.asarray(frames)
    )
    boxes, scores, valid = map(np.asarray, (boxes, scores, valid))
    assert boxes.shape == (2, mtcnn.MAX_FACES, 4)
    assert not np.isnan(boxes).any() and not np.isnan(scores).any()
    faces = mtcnn.apply_margins_and_normalize(
        boxes[0], scores[0], valid[0], 48, 64
    )
    for f in faces:
        assert 0 <= f[0] <= 1 and 0 <= f[1] <= 1


def test_mtcnn_pyramid_scales():
    from scannertools_tpu.models.mtcnn import pyramid_scales

    s = pyramid_scales(480, 640)  # minsize = 96 -> m = 0.125
    assert abs(s[0] - 12.0 / 96.0) < 1e-6
    assert all(abs(s[i + 1] / s[i] - 0.709) < 1e-6 for i in range(len(s) - 1))
    assert min(480 * s[-1], 640 * s[-1]) >= 12.0


def test_ssd_anchors_and_shapes():
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.models import ssd

    anchors = ssd.anchor_boxes()
    assert anchors.shape == (1917, 4)  # the canonical SSD300 anchor count
    variables = ssd.init_params(jax.random.PRNGKey(0))
    frames = np.zeros((1, 120, 160, 3), np.float32)
    boxes, scores, classes = jax.jit(ssd.detect)(variables,
                                                 jnp.asarray(frames))
    assert boxes.shape == (1, 100, 4)
    assert classes.shape == (1, 100) and classes.dtype == np.int32
    assert not np.isnan(np.asarray(boxes)).any()


def test_facenet_embedding_shape_and_norm():
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.models import facenet

    variables = facenet.init_params(jax.random.PRNGKey(0))
    crops = np.random.default_rng(0).integers(
        0, 256, (2, 160, 160, 3)
    ).astype(np.float32)
    emb = np.asarray(jax.jit(facenet.embed)(variables, jnp.asarray(crops)))
    assert emb.shape == (2, 128)
    assert np.allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-3)


def test_prewhiten_formula():
    import jax.numpy as jnp

    from scannertools_tpu.models.facenet import prewhiten

    import jax

    x = np.random.default_rng(0).integers(0, 256, (1, 8, 8, 3)).astype(np.float32)
    got = np.asarray(jax.jit(prewhiten)(jnp.asarray(x)))[0]
    want = (x[0] - x[0].mean()) / max(x[0].std(), 1.0 / np.sqrt(x[0].size))
    assert np.allclose(got, want, atol=1e-5)


def test_torch_weight_porting_conv_bn_linear():
    """Port a tiny torch model and check numerical parity with flax."""
    import torch
    import torch.nn as tnn
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from scannertools_tpu.models import weights as W

    torch.manual_seed(0)
    tconv = tnn.Conv2d(3, 4, 3, padding=1)
    tbn = tnn.BatchNorm2d(4)
    tbn.running_mean.data = torch.randn(4)
    tbn.running_var.data = torch.rand(4) + 0.5
    tlin = tnn.Linear(4, 5)
    tconv.eval(), tbn.eval(), tlin.eval()

    class FlaxNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(4, (3, 3), padding="SAME", name="conv")(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             name="bn")(x)
            x = x.mean(axis=(1, 2))
            return nn.Dense(5, name="fc")(x)

    x = np.random.default_rng(0).normal(size=(2, 8, 8, 3)).astype(np.float32)
    variables = FlaxNet().init(jax.random.PRNGKey(0), jnp.asarray(x))

    sd = {
        "conv.weight": tconv.weight.detach(), "conv.bias": tconv.bias.detach(),
        "bn.weight": tbn.weight.detach(), "bn.bias": tbn.bias.detach(),
        "bn.running_mean": tbn.running_mean, "bn.running_var": tbn.running_var,
        "fc.weight": tlin.weight.detach(), "fc.bias": tlin.bias.detach(),
    }
    mapping = {
        "params/conv/kernel": ("conv.weight", "conv"),
        "params/conv/bias": ("conv.bias", "raw"),
        "params/bn/scale": ("bn.weight", "raw"),
        "params/bn/bias": ("bn.bias", "raw"),
        "batch_stats/bn/mean": ("bn.running_mean", "raw"),
        "batch_stats/bn/var": ("bn.running_var", "raw"),
        "params/fc/kernel": ("fc.weight", "linear"),
        "params/fc/bias": ("fc.bias", "raw"),
    }
    ported = W.port_state_dict(variables, sd, mapping)
    # full-f32 contraction: TPU matmuls default to bf16 inputs otherwise
    with jax.default_matmul_precision("float32"):
        got = np.asarray(jax.jit(FlaxNet().apply)(ported, jnp.asarray(x)))

    with torch.no_grad():
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = tlin(tbn(tconv(tx)).mean(dim=(2, 3))).numpy()
    assert np.abs(got - want).max() < 1e-4, np.abs(got - want).max()


def test_params_npz_roundtrip(tmp_path):
    import jax

    from scannertools_tpu.models import gender, weights as W

    v = gender.init_params(jax.random.PRNGKey(0))
    p = str(tmp_path / "g.npz")
    W.save_params(p, v)
    v2 = W.load_params(p)
    flat1, flat2 = W._flatten(v), W._flatten(v2)
    assert set(flat1) == set(flat2)
    assert all(np.array_equal(flat1[k], flat2[k]) for k in flat1)


def test_ops_load_weights_from_npz(sc, ingested, tmp_path):
    """weights_path on detector ops loads npz params (the deployment path
    for ported checkpoints)."""
    import jax

    import scannertools_tpu as st
    from scannertools_tpu.models import mtcnn, weights as W
    from scannertools_tpu.ops import faces as faces_ops

    params = mtcnn.init_params(jax.random.PRNGKey(42))
    p = str(tmp_path / "mtcnn.npz")
    W.save_params(p, params)

    frame = sc.io.Input([ingested])
    g = sc.streams.Gather(frame, [[0]])
    det = sc.ops.MTCNNDetectFaces(frame=g, weights_path=p)
    out = st.NamedStream(sc, "weighted_faces")
    sc.run(sc.io.Output(det, [out]), st.PerfParams.manual(work_packet_size=1),
           cache_mode=st.CacheMode.Overwrite)
    assert len(out) == 1  # ran with the loaded params
    # loaded params are cached under the path key
    assert ("mtcnn", p) in faces_ops._MODEL_CACHE
    loaded = faces_ops._MODEL_CACHE[("mtcnn", p)]
    flat_a = W._flatten(params)
    flat_b = W._flatten(loaded)
    import numpy as np

    assert all(np.allclose(flat_a[k], flat_b[k]) for k in flat_a)


def test_fused_pyramid_pnet_matches_per_level():
    """The fused-canvas stage 1 (one P-Net dispatch over all pyramid
    levels) must reproduce the per-level P-Net maps on every cell whose
    receptive field lies inside its level."""
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.models import mtcnn

    params = mtcnn.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    H, W = 96, 128
    x = jnp.asarray(rng.random((H, W, 3)), jnp.float32) - 0.5

    layout = mtcnn.pyramid_layout(H, W)
    assert len(layout) >= 2
    assert all(oy % 2 == 0 for _, _, _, oy in layout)

    Hc = layout[-1][3] + layout[-1][1]
    Wc = max(ws for _, _, ws, _ in layout)
    canvas = jnp.zeros((Hc, Wc, 3), x.dtype)
    levels = []
    for s, hs, ws, oy in layout:
        xi = jax.image.resize(x, (hs, ws, 3), "linear", antialias=False)
        levels.append(xi)
        canvas = jax.lax.dynamic_update_slice(canvas, xi, (oy, 0, 0))
    probc, regc = mtcnn.PNet().apply({"params": params["pnet"]},
                                     canvas[None])
    for (s, hs, ws, oy), xi in zip(layout, levels):
        prob, reg = mtcnn.PNet().apply({"params": params["pnet"]}, xi[None])
        gh = (hs - 12) // 2 + 1
        gw = (ws - 12) // 2 + 1
        got_p = np.asarray(probc[0, oy // 2:oy // 2 + gh, :gw])
        want_p = np.asarray(prob[0, :gh, :gw])
        np.testing.assert_allclose(got_p, want_p, atol=1e-5)
        got_r = np.asarray(regc[0, oy // 2:oy // 2 + gh, :gw])
        np.testing.assert_allclose(got_r, np.asarray(reg[0, :gh, :gw]),
                                   atol=1e-5)


def test_nms_fixed_point_matches_sequential_greedy():
    """The while-loop fixed-point NMS (models/common.py) must produce the
    EXACT sequential-greedy keep set — random clouds and an adversarial
    alternating chain (kept/suppressed flip along the whole chain, the
    worst case for iteration count)."""
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.models.common import nms

    def greedy_np(boxes, scores, thr):
        order = np.argsort(-scores)
        b = boxes[order]
        kept = []
        for i in range(len(b)):
            x1 = np.maximum(b[i, 0], b[:, 0])
            y1 = np.maximum(b[i, 1], b[:, 1])
            x2 = np.minimum(b[i, 2], b[:, 2])
            y2 = np.minimum(b[i, 3], b[:, 3])
            inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
            a = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(
                b[:, 3] - b[:, 1], 0)
            union = a[i] + a - inter
            iou = np.where(union > 0, inter / union, 0)
            if not any(iou[j] > thr for j in kept):
                kept.append(i)
        return [tuple(b[i]) for i in kept]

    rng = np.random.default_rng(0)
    fn = jax.jit(lambda b, s: nms(b, s, 0.5, 96, score_thresh=0.0))
    for trial in range(3):
        centers = rng.uniform(0, 60, (96, 2))
        wh = rng.uniform(4, 18, (96, 2))
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2],
                               axis=1).astype(np.float32)
        scores = rng.uniform(0.1, 1.0, 96).astype(np.float32)
        ob, _, ov = fn(jnp.asarray(boxes), jnp.asarray(scores))
        got = [tuple(x) for x in np.asarray(ob)[np.asarray(ov)]]
        assert got == greedy_np(boxes, scores, 0.5), f"trial {trial}"

    # alternating chain: box i overlaps only box i+1; greedy keeps evens.
    n = 64
    boxes = np.stack([np.arange(n) * 6.0, np.zeros(n),
                      np.arange(n) * 6.0 + 10, np.full(n, 10.0)],
                     axis=1).astype(np.float32)   # IoU(i,i+1) = 4/16 = 0.25
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    ob, _, ov = jax.jit(lambda b, s: nms(b, s, 0.2, n))(
        jnp.asarray(boxes), jnp.asarray(scores))
    kept = np.asarray(ob)[np.asarray(ov)]
    assert len(kept) == n // 2
    assert np.allclose(kept[:, 0], np.arange(0, n, 2) * 6.0)
