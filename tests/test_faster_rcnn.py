"""Faster R-CNN forward model (models/faster_rcnn.py) + the
NNInput -> FasterRCNN -> FasterRCNNOutput chain.

Reference parity: faster_rcnn_kernel.cpp:6-33 (im_info = (H, W, 1.0),
outputs cls_prob/rois/fc7) and faster_rcnn_output_kernel_cpu.cpp:16-132
(81-class argmax, 0.7 threshold, min-NMS 0.3, fc7 gather).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scannertools_tpu.models import faster_rcnn as fr
from scannertools_tpu.models import porting_maps as pm
from scannertools_tpu.models import weights as W


def test_full_config_shapes_eval():
    """Reference blob shapes at the production config: [R,81]/[R,5]/[R,4096]
    (faster_rcnn_output_kernel_cpu.cpp:11-14), via eval_shape (no FLOPs)."""
    v = jax.eval_shape(lambda: fr.init_params(jax.random.PRNGKey(0),
                                              (224, 224)))
    out = jax.eval_shape(
        lambda vv: fr.apply(vv, jnp.zeros((2, 224, 224, 3), jnp.float32)), v)
    assert out[0].shape == (2, fr.NUM_ROIS, 81)
    assert out[1].shape == (2, fr.NUM_ROIS, 5)
    assert out[2].shape == (2, fr.NUM_ROIS, 4096)


def test_mapping_total():
    v = jax.eval_shape(lambda: fr.init_params(jax.random.PRNGKey(0),
                                              (224, 224)))
    unmapped, extra = pm.coverage_report(v, pm.faster_rcnn_mapping())
    assert not unmapped and not extra


@pytest.mark.slow
def test_port_through_synthetic_caffemodel():
    """A caffe-layout state_dict round-trips through port_faster_rcnn with
    every tensor transposed to the right flax shape."""
    v = jax.eval_shape(lambda: fr.init_params(jax.random.PRNGKey(0),
                                              (224, 224)))
    flat = {k: s.item() for k, s in W._flatten(v).items()}
    rng = np.random.RandomState(0)
    sd = {}
    for fk, (ck, kind) in pm.faster_rcnn_mapping().items():
        tgt = flat[fk].shape
        if kind == "conv":  # caffe OIHW
            sd[ck] = rng.randn(tgt[3], tgt[2], tgt[0], tgt[1]) \
                .astype(np.float32)
        elif kind == "linear" or kind.startswith("linear_conv"):
            sd[ck] = rng.randn(tgt[1], tgt[0]).astype(np.float32)
        else:
            sd[ck] = rng.randn(*tgt).astype(np.float32)
    real = fr.init_params(jax.random.PRNGKey(0), (64, 64))
    ported = W._flatten(pm.port_faster_rcnn(real, sd))
    # spot-check the transposes actually happened
    k = np.asarray(ported["params/vgg/conv1_1/kernel"])
    assert np.allclose(k, sd["conv1_1.weight"].transpose(2, 3, 1, 0))
    fc7 = np.asarray(ported["params/fc7/kernel"])
    assert np.allclose(fc7, sd["fc7.weight"].T)


def test_fc6_chw_permutation_matches_torch():
    """fc6 consumes caffe's CHW-flattened pool5; the linear_conv port must
    make flax (HWC flatten) agree with torch/caffe numerically."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    c, h, w, o = 32, 7, 7, 16
    x = rng.randn(1, h, w, c).astype(np.float32)
    w_t = rng.randn(o, c * h * w).astype(np.float32)
    want = torch.nn.functional.linear(
        torch.from_numpy(x.transpose(0, 3, 1, 2).reshape(1, -1)),
        torch.from_numpy(w_t)).numpy()
    got = x.reshape(1, -1) @ pm.linear_after_conv(w_t, (c, h, w))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.fixture(scope="module")
def small_model():
    m = fr.FasterRCNN(num_rois=8, pre_nms=64)
    v = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 96, 96, 3), jnp.float32))
    return m, v


@pytest.mark.slow
def test_small_forward_semantics(small_model):
    m, v = small_model
    x = jnp.asarray(np.random.RandomState(2).randn(1, 96, 96, 3) * 40,
                    jnp.float32)
    cls, rois, fc7 = jax.jit(m.apply)(v, x)
    cls, rois = np.asarray(cls), np.asarray(rois)
    # softmax rows sum to 1 (valid) or are exact one-hot background (padded)
    np.testing.assert_allclose(cls.sum(-1), 1.0, atol=1e-5)
    # rois are (batch=0, x1, y1, x2, y2) clipped to the image
    assert np.all(rois[..., 0] == 0)
    assert rois[..., 1:].min() >= 0
    assert rois[..., (1, 3)].max() <= 95 and rois[..., (2, 4)].max() <= 95
    valid = rois[..., 3] > rois[..., 1]
    assert valid.any()  # RPN proposes something even at random init


def test_anchor_generation_matches_pyfasterrcnn():
    """First cell's 9 anchors must match py-faster-rcnn's generate_anchors
    output (the published base anchors for scales 8,16,32 / ratios .5,1,2)."""
    a = fr.anchors_for(2, 2)[:9]
    want = np.array(
        [[-84., -40., 99., 55.], [-176., -88., 191., 103.],
         [-360., -184., 375., 199.], [-56., -56., 71., 71.],
         [-120., -120., 135., 135.], [-248., -248., 263., 263.],
         [-36., -80., 51., 95.], [-80., -168., 95., 183.],
         [-168., -344., 183., 359.]])
    # row order differs (ratio-major here); compare as sets of rows
    got = {tuple(r) for r in a.astype(int)}
    assert got == {tuple(r.astype(int)) for r in want}


def test_pipeline_chain(sc, ingested, monkeypatch):
    """NNInput -> FasterRCNN -> FasterRCNNOutput end-to-end in a graph,
    on a small-config model registered under the production name."""
    import scannertools_tpu as st
    from scannertools_tpu.ops import nn_generic
    from scannertools_tpu.ops.faces import _MODEL_CACHE

    small = fr.FasterRCNN(num_rois=8, pre_nms=64)
    monkeypatch.setitem(nn_generic._NN_REGISTRY, "faster_rcnn",
                        (lambda rng: small.init(
                            rng, jnp.zeros((1, 64, 96, 3), jnp.float32)),
                         small.apply))
    for k in [k for k in _MODEL_CACHE if "faster_rcnn" in str(k)]:
        _MODEL_CACHE.pop(k)

    frame = sc.io.Input([ingested])
    sampled = sc.streams.Gather(frame, [[0, 1]])
    pre = sc.ops.NNInput(frame=sampled,
                         mean_colors=(102.9801, 115.9465, 122.7717))
    cls_prob, rois, fc7 = sc.ops.FasterRCNN(input=pre)
    boxes, feats = sc.ops.FasterRCNNOutput(cls_prob=cls_prob, rois=rois,
                                           fc7=fc7, score_threshold=0.05)
    b_out = st.NamedStream(sc, "frcnn_boxes")
    f_out = st.NamedStream(sc, "frcnn_feats")
    sc.run(sc.io.Output([boxes, feats], [(b_out, f_out)]),
           st.PerfParams.manual(work_packet_size=4),
           cache_mode=st.CacheMode.Overwrite)
    box_rows = list(b_out.load())
    feat_rows = list(f_out.load())
    assert len(box_rows) == 2 and len(feat_rows) == 2
    for bl, fl in zip(box_rows, feat_rows):
        fl = np.asarray(fl, np.float32).reshape(-1, 4096)
        assert len(bl) == fl.shape[0]  # one fc7 row per surviving box
        for b in bl:
            assert 1 <= b.label <= 80 and b.score > 0.05

    for k in [k for k in _MODEL_CACHE if "faster_rcnn" in str(k)]:
        _MODEL_CACHE.pop(k)


def test_roi_features_vary_by_location(small_model):
    """RoIAlign must pool feature-map pixels under each proposal, not a
    corner patch: a structured input's proposals at distant locations must
    yield materially different fc7 features. (Guards the coordinate
    convention of crop_and_resize — pixel coords on the stride-16 map.)"""
    m, v = small_model
    x = np.zeros((1, 96, 96, 3), np.float32)
    x[0, 8:40, 8:40] = 120.0    # bright blob, top-left
    x[0, 56:90, 56:90] = -90.0  # dark blob, bottom-right
    cls, rois, fc7 = jax.jit(m.apply)(v, jnp.asarray(x))
    rois = np.asarray(rois[0])
    fc7 = np.asarray(fc7[0])
    valid = rois[:, 3] > rois[:, 1]
    r, f = rois[valid], fc7[valid]
    assert len(r) >= 2
    cx = (r[:, 1] + r[:, 3]) / 2
    cy = (r[:, 2] + r[:, 4]) / 2
    d = np.hypot(cx[:, None] - cx[None], cy[:, None] - cy[None])
    i, j = np.unravel_index(np.argmax(d), d.shape)
    assert d[i, j] > 16  # genuinely different image locations
    rel = np.linalg.norm(f[i] - f[j]) / (np.linalg.norm(f[i]) + 1e-6)
    assert rel > 0.05


def test_pre_nms_pool_recall():
    """The static PRE_NMS pool must retain >=99% of the reference 6000-pool
    top-300 post-NMS proposals (py-faster-rcnn TEST.RPN_PRE_NMS_TOP_N=6000,
    faster_rcnn_kernel.cpp:6-25) under a trained-detector-like score
    distribution: sharp peaks at object locations + background noise."""
    fh, fw = 38, 50  # 608x800 input -> 12996+ anchors
    anchors = fr.anchors_for(fh, fw)
    A = anchors.shape[0]
    H, W = fh * 16, fw * 16
    rng = np.random.RandomState(0)

    # ~40 objects: anchors near an object with matching size get logit
    # boosts; everything else sits in a noise floor.
    logits = rng.randn(A) * 1.0 - 4.0
    acx = (anchors[:, 0] + anchors[:, 2]) / 2
    acy = (anchors[:, 1] + anchors[:, 3]) / 2
    asz = np.sqrt((anchors[:, 2] - anchors[:, 0]) *
                  (anchors[:, 3] - anchors[:, 1]))
    for _ in range(40):
        ox, oy = rng.uniform(0, W), rng.uniform(0, H)
        osz = np.exp(rng.uniform(np.log(40), np.log(300)))
        prox = np.exp(-((acx - ox) ** 2 + (acy - oy) ** 2) / (2 * osz ** 2))
        size_match = np.exp(-((np.log(asz / osz)) ** 2) / 0.5)
        logits += 8.0 * prox * size_match
    fg = 1.0 / (1.0 + np.exp(-logits))
    deltas = (rng.randn(A, 4) * 0.1).astype(np.float32)

    def run(pre_nms):
        kb, valid = jax.jit(
            lambda f, d: fr.propose_boxes(
                jnp.asarray(anchors, jnp.float32), f, d, H, W,
                pre_nms, 300))(jnp.asarray(fg, jnp.float32),
                               jnp.asarray(deltas))
        kb, valid = np.asarray(kb), np.asarray(valid)
        return {tuple(np.round(b, 2)) for b in kb[valid]}

    ref = run(6000)
    got = run(fr.PRE_NMS)
    recall = len(ref & got) / max(1, len(ref))
    assert recall >= 0.99, (
        f"static pre-NMS pool {fr.PRE_NMS} retains only {recall:.1%} of "
        f"the 6000-pool top-300 post-NMS proposals — raise PRE_NMS")
