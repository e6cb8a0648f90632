"""Structural totality of the torch→flax porting maps: every flax param is
covered, every mapped path exists, and porting runs end-to-end against
synthetic state_dicts with the real torch shapes."""

import numpy as np
import pytest


def _fake_state_dict_for(mapping, flax_flat, inverse_kind):
    """Build a synthetic torch-style state_dict whose tensor shapes are the
    torch-side equivalents of our flax shapes."""
    sd = {}
    for flax_key, (torch_key, kind) in mapping.items():
        shape = flax_flat[flax_key].shape
        sd[torch_key] = inverse_kind(kind, shape)
    return sd


def test_mtcnn_mapping_total_and_ports():
    import jax

    from scannertools_tpu.models import mtcnn
    from scannertools_tpu.models import porting_maps as P
    from scannertools_tpu.models import weights as W

    params = mtcnn.init_params(jax.random.PRNGKey(0))
    mapping = P.mtcnn_mapping()
    missing, extra = P.coverage_report(params, mapping.keys())
    assert not missing, f"unmapped flax params: {sorted(missing)[:5]}"
    assert not extra, f"mapped but nonexistent: {sorted(extra)[:5]}"

    flat = W._flatten(params)

    def inv(kind, shape):
        rng = np.random.default_rng(0)
        if kind == "conv":  # flax [kh,kw,i,o] -> torch [o,i,kh,kw]
            kh, kw, i, o = shape
            return rng.normal(size=(o, i, kh, kw)).astype(np.float32)
        if kind == "linear":
            i, o = shape
            return rng.normal(size=(o, i)).astype(np.float32)
        if kind.startswith("linear_conv:"):
            c, h, w = (int(x) for x in kind.split(":")[1].split(","))
            o = shape[1]
            return rng.normal(size=(o, c * h * w)).astype(np.float32)
        return rng.normal(size=shape).astype(np.float32)

    sds = {"pnet": {}, "rnet": {}, "onet": {}}
    for flax_key, (torch_key, kind) in mapping.items():
        net = flax_key.split("/")[0]
        sds[net][torch_key] = inv(kind, flat[flax_key].shape)
    ported = P.port_mtcnn(params, sds)
    pf = W._flatten(ported)
    assert set(pf) == set(flat)
    # a porterd conv actually moved (not identity)
    assert not np.allclose(pf["pnet/conv1/kernel"], flat["pnet/conv1/kernel"])


def test_linear_after_conv_semantics():
    """The CHW→HWC dense permutation must match torch's flatten order."""
    import torch

    from scannertools_tpu.models.porting_maps import linear_after_conv

    c, h, w, o = 3, 2, 2, 5
    lin = torch.nn.Linear(c * h * w, o)
    x_chw = torch.arange(c * h * w, dtype=torch.float32).reshape(1, c, h, w)
    want = lin(x_chw.flatten(1)).detach().numpy()

    # flax side: HWC flatten of the same activation
    x_hwc = x_chw.permute(0, 2, 3, 1).reshape(1, -1).numpy()
    k = linear_after_conv(lin.weight.detach().numpy(), (c, h, w))
    got = x_hwc @ k + lin.bias.detach().numpy()
    assert np.allclose(got, want, atol=1e-5)


def _inv_shape(kind, shape, rng):
    """Synthetic checkpoint tensor with the source-side layout for a flax
    param of ``shape``."""
    if kind == "conv":  # flax [kh,kw,i,o] <- torch [o,i,kh,kw]
        kh, kw, i, o = shape
        return rng.normal(size=(o, i, kh, kw)).astype(np.float32)
    if kind == "conv_transpose":  # flax [kh,kw,i,o] <- torch [i,o,kh,kw]
        kh, kw, i, o = shape
        return rng.normal(size=(i, o, kh, kw)).astype(np.float32)
    if kind == "depthwise":  # flax [kh,kw,1,c] <- torch [c,1,kh,kw]
        kh, kw, one, c = shape
        return rng.normal(size=(c, one, kh, kw)).astype(np.float32)
    if kind == "linear":
        i, o = shape
        return rng.normal(size=(o, i)).astype(np.float32)
    if kind.startswith("linear_conv:"):
        c, h, w = (int(x) for x in kind.split(":")[1].split(","))
        return rng.normal(size=(shape[1], c * h * w)).astype(np.float32)
    if kind == "tf_conv":
        return rng.normal(size=shape).astype(np.float32)
    if kind == "tf_depthwise":  # flax [kh,kw,1,c] <- tf [kh,kw,c,1]
        kh, kw, one, c = shape
        return rng.normal(size=(kh, kw, c, one)).astype(np.float32)
    return rng.normal(size=shape).astype(np.float32) ** 2 + 0.1  # raw (var+)


def _check_total_and_ports(variables, mapping, port_fn):
    """Assert the mapping covers the variables tree exactly, then port a
    synthetic checkpoint through it and check every param moved."""
    import jax

    from scannertools_tpu.models import porting_maps as P
    from scannertools_tpu.models import weights as W

    # materialize eval_shape ShapeDtypeStructs as zero arrays
    variables = jax.tree_util.tree_map(
        lambda v: np.zeros(v.shape, np.float32), variables)
    missing, extra = P.coverage_report(variables, mapping.keys())
    assert not missing, f"unmapped flax params: {sorted(missing)[:8]}"
    assert not extra, f"mapped but nonexistent: {sorted(extra)[:8]}"
    flat = W._flatten(variables)
    rng = np.random.default_rng(0)
    sd = {tk: _inv_shape(kind, flat[fk].shape, rng)
          for fk, (tk, kind) in mapping.items()}
    ported = port_fn(W._unflatten(flat), sd)
    pf = W._flatten(ported)
    assert set(pf) == set(flat)
    moved = sum(not np.allclose(pf[k], 0.0) for k in pf)
    assert moved == len(pf), f"{len(pf) - moved} params left at init"


def test_ssd_mapping_total_and_ports():
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.models import porting_maps as P
    from scannertools_tpu.models import ssd

    variables = jax.eval_shape(
        ssd.SSDMobileNetV1().init, jax.random.PRNGKey(0),
        jnp.zeros((1, ssd.INPUT_SIZE, ssd.INPUT_SIZE, 3)))
    _check_total_and_ports(variables, P.ssd_mapping(), P.port_ssd)


def test_openpose_mapping_total_and_ports():
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.models import porting_maps as P
    from scannertools_tpu.models import pose

    params = jax.eval_shape(
        pose.OpenPoseBody().init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)))
    _check_total_and_ports(params, P.openpose_mapping(), P.port_openpose)


def test_gender_mapping_total_and_ports():
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.models import gender
    from scannertools_tpu.models import porting_maps as P

    variables = jax.eval_shape(
        gender.LeviHassner().init, jax.random.PRNGKey(0),
        jnp.zeros((1, gender.INPUT_SIZE, gender.INPUT_SIZE, 3)))
    _check_total_and_ports(variables, P.gender_mapping(), P.port_gender)


@pytest.mark.parametrize("arch", ["R-50-FPN", "X-101-32x8d-FPN"])
def test_maskrcnn_mapping_total_and_ports(arch):
    from scannertools_tpu.models import maskrcnn as mr
    from scannertools_tpu.models import porting_maps as P

    variables = mr.init_shapes(arch)
    _check_total_and_ports(
        variables, P.maskrcnn_mapping(arch),
        lambda v, sd: P.port_maskrcnn(v, sd, arch))


# ---------------------------------------------------------------------------
# Whole-subnet numerical parity: tiny torch twins, outputs must match the
# ported flax forward to <=1e-4 (float32 matmul precision forced on TPU).
# ---------------------------------------------------------------------------

def test_ssd_depthwise_block_matches_torch():
    import jax
    import jax.numpy as jnp
    import torch

    from scannertools_tpu.models import ssd
    from scannertools_tpu.models import weights as W

    # stride 1: torch padding=1 == TF/flax SAME there (stride-2 SAME pads
    # asymmetrically in TF/flax — the checkpoint-side convention we keep)
    c, f = 8, 16
    tw_dw = torch.nn.Conv2d(c, c, 3, 1, padding=1, groups=c, bias=False)
    tw_pw = torch.nn.Conv2d(c, f, 1, bias=False)
    bn1 = torch.nn.BatchNorm2d(c, eps=1e-3).eval()
    bn2 = torch.nn.BatchNorm2d(f, eps=1e-3).eval()
    with torch.no_grad():
        for bn in (bn1, bn2):
            bn.weight.uniform_(0.5, 1.5)
            bn.bias.uniform_(-0.5, 0.5)
            bn.running_mean.uniform_(-0.5, 0.5)
            bn.running_var.uniform_(0.5, 1.5)
    x = torch.randn(2, c, 10, 10)
    with torch.no_grad():
        want = torch.clamp(bn2(tw_pw(torch.clamp(bn1(tw_dw(x)), 0, 6))),
                           0, 6).permute(0, 2, 3, 1).numpy()

    blk = ssd.DepthwiseSeparable(f, (1, 1))
    variables = blk.init(jax.random.PRNGKey(0),
                         jnp.zeros((2, 10, 10, c)))
    mapping = {
        "params/dw/kernel": ("dw.weight", "depthwise"),
        "params/dw_bn/scale": ("bn1.weight", "raw"),
        "params/dw_bn/bias": ("bn1.bias", "raw"),
        "batch_stats/dw_bn/mean": ("bn1.running_mean", "raw"),
        "batch_stats/dw_bn/var": ("bn1.running_var", "raw"),
        "params/pw/kernel": ("pw.weight", "conv"),
        "params/pw_bn/scale": ("bn2.weight", "raw"),
        "params/pw_bn/bias": ("bn2.bias", "raw"),
        "batch_stats/pw_bn/mean": ("bn2.running_mean", "raw"),
        "batch_stats/pw_bn/var": ("bn2.running_var", "raw"),
    }
    sd = {"dw.weight": tw_dw.weight.detach(), "pw.weight": tw_pw.weight.detach(),
          "bn1.weight": bn1.weight.detach(), "bn1.bias": bn1.bias.detach(),
          "bn1.running_mean": bn1.running_mean, "bn1.running_var": bn1.running_var,
          "bn2.weight": bn2.weight.detach(), "bn2.bias": bn2.bias.detach(),
          "bn2.running_mean": bn2.running_mean, "bn2.running_var": bn2.running_var}
    ported = W.port_state_dict(variables, sd, mapping)
    with jax.default_matmul_precision("highest"):
        got = np.asarray(jax.jit(blk.apply)(
            ported, jnp.asarray(x.permute(0, 2, 3, 1).numpy())))
    assert np.abs(got - want).max() < 1e-4


def test_openpose_vgg_front_matches_torch():
    import jax
    import jax.numpy as jnp
    import torch

    from scannertools_tpu.models import porting_maps as P
    from scannertools_tpu.models import pose

    # torch twin of the first two VGG convs + pool (conv1_1, conv1_2)
    conv11 = torch.nn.Conv2d(3, 64, 3, padding=1)
    conv12 = torch.nn.Conv2d(64, 64, 3, padding=1)
    x = torch.randn(1, 3, 16, 16)
    with torch.no_grad():
        h = torch.relu(conv11(x))
        h = torch.relu(conv12(h))
        want = torch.max_pool2d(h, 2, 2).permute(0, 2, 3, 1).numpy()

    import flax.linen as nn

    class Front(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = pose._ConvRelu(64, name="vgg0")(x)
            x = pose._ConvRelu(64, name="vgg1")(x)
            return nn.max_pool(x, (2, 2), (2, 2))

    m = Front()
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    from scannertools_tpu.models import weights as W

    sd = {"conv1_1.weight": conv11.weight.detach(),
          "conv1_1.bias": conv11.bias.detach(),
          "conv1_2.weight": conv12.weight.detach(),
          "conv1_2.bias": conv12.bias.detach()}
    mapping = {
        "params/vgg0/conv/kernel": ("conv1_1.weight", "conv"),
        "params/vgg0/conv/bias": ("conv1_1.bias", "raw"),
        "params/vgg1/conv/kernel": ("conv1_2.weight", "conv"),
        "params/vgg1/conv/bias": ("conv1_2.bias", "raw"),
    }
    ported = W.port_state_dict(variables, sd, mapping)
    with jax.default_matmul_precision("highest"):
        got = np.asarray(jax.jit(m.apply)(
            ported, jnp.asarray(x.permute(0, 2, 3, 1).numpy())))
    assert np.abs(got - want).max() < 1e-4


def test_gender_levi_hassner_matches_torch():
    """Full-network twin: 3 conv blocks with caffe-style LRN + 3 fc layers.
    The twin flattens HWC (rude-carnie/TF order) before fc1, matching the
    'raw' fc port in gender_mapping."""
    import jax
    import jax.numpy as jnp
    import torch

    from scannertools_tpu.models import gender
    from scannertools_tpu.models import porting_maps as P

    torch.manual_seed(0)
    conv1 = torch.nn.Conv2d(3, 96, 7, 4)
    conv2 = torch.nn.Conv2d(96, 256, 5, padding=2)
    conv3 = torch.nn.Conv2d(256, 384, 3, padding=1)
    fc1 = torch.nn.Linear(6 * 6 * 384, 512)
    fc2 = torch.nn.Linear(512, 512)
    fc3 = torch.nn.Linear(512, 2)
    lrn = torch.nn.LocalResponseNorm(5, alpha=1e-4, beta=0.75, k=1.0)

    x = torch.rand(2, 3, 227, 227) * 255.0
    with torch.no_grad():
        h = x - 127.0
        h = lrn(torch.max_pool2d(torch.relu(conv1(h)), 3, 2))
        h = lrn(torch.max_pool2d(torch.relu(conv2(h)), 3, 2))
        h = torch.max_pool2d(torch.relu(conv3(h)), 3, 2)
        h = h.permute(0, 2, 3, 1).flatten(1)  # HWC flatten (TF order)
        h = torch.relu(fc1(h))
        h = torch.relu(fc2(h))
        want = fc3(h).numpy()

    # TF-style checkpoint dict from the twin (conv [kh,kw,i,o], fc [i,o])
    tf_vars = {}
    for name, conv in (("conv1", conv1), ("conv2", conv2), ("conv3", conv3)):
        tf_vars[f"{name}/weights"] = conv.weight.detach().permute(
            2, 3, 1, 0).numpy()
        tf_vars[f"{name}/biases"] = conv.bias.detach().numpy()
    for name, fc in (("full1", fc1), ("full2", fc2), ("output", fc3)):
        tf_vars[f"{name}/weights"] = fc.weight.detach().t().numpy()
        tf_vars[f"{name}/biases"] = fc.bias.detach().numpy()

    variables = gender.init_params(jax.random.PRNGKey(0))
    ported = P.port_gender(variables, tf_vars)
    with jax.default_matmul_precision("highest"):
        got = np.asarray(jax.jit(gender.LeviHassner().apply)(
            ported, jnp.asarray(x.permute(0, 2, 3, 1).numpy())))
    assert np.abs(got - want).max() < 2e-3, np.abs(got - want).max()


def test_maskrcnn_bottleneck_matches_torch():
    """Grouped bottleneck + FrozenBN twin (maskrcnn-benchmark block
    semantics: stride in the 1x1, no-eps frozen BN)."""
    import jax
    import jax.numpy as jnp
    import torch

    from scannertools_tpu.models import maskrcnn as mr
    from scannertools_tpu.models import weights as W

    torch.manual_seed(0)
    cin, mid, out, groups = 32, 16, 64, 4

    def frozen_bn(c):
        w = torch.rand(c) + 0.5
        b = torch.rand(c) - 0.5
        m = torch.rand(c) - 0.5
        v = torch.rand(c) + 0.5
        return w, b, m, v

    conv1 = torch.nn.Conv2d(cin, mid, 1, 2, bias=False)
    conv2 = torch.nn.Conv2d(mid, mid, 3, 1, 1, groups=groups, bias=False)
    conv3 = torch.nn.Conv2d(mid, out, 1, bias=False)
    down = torch.nn.Conv2d(cin, out, 1, 2, bias=False)
    bns = {n: frozen_bn(c) for n, c in
           (("bn1", mid), ("bn2", mid), ("bn3", out), ("dbn", out))}

    def fbn(x, n):
        w, b, m, v = bns[n]
        scale = (w / v.sqrt()).reshape(1, -1, 1, 1)
        return x * scale + (b - m * w / v.sqrt()).reshape(1, -1, 1, 1)

    x = torch.randn(1, cin, 8, 8)
    with torch.no_grad():
        y = torch.relu(fbn(conv1(x), "bn1"))
        y = torch.relu(fbn(conv2(y), "bn2"))
        y = fbn(conv3(y), "bn3")
        r = fbn(down(x), "dbn")
        want = torch.relu(y + r).permute(0, 2, 3, 1).numpy()

    blk = mr.Bottleneck(mid, out, stride=2, groups=groups)
    variables = blk.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, cin)))
    sd = {"conv1.weight": conv1.weight.detach(),
          "conv2.weight": conv2.weight.detach(),
          "conv3.weight": conv3.weight.detach(),
          "downsample.0.weight": down.weight.detach()}
    for tn, fn in (("bn1", "bn1"), ("bn2", "bn2"), ("bn3", "bn3"),
                   ("downsample.1", "dbn")):
        w, b, m, v = bns[fn]
        sd[f"{tn}.weight"], sd[f"{tn}.bias"] = w, b
        sd[f"{tn}.running_mean"], sd[f"{tn}.running_var"] = m, v
    mapping = {}
    for j, tn in ((1, "conv1"), (2, "conv2"), (3, "conv3")):
        mapping[f"params/conv{j}/kernel"] = (f"{tn}.weight", "conv")
    mapping["params/downsample_conv/kernel"] = ("downsample.0.weight", "conv")
    for fn, tn in (("bn1", "bn1"), ("bn2", "bn2"), ("bn3", "bn3"),
                   ("downsample_bn", "downsample.1")):
        mapping[f"params/{fn}/scale"] = (f"{tn}.weight", "raw")
        mapping[f"params/{fn}/bias"] = (f"{tn}.bias", "raw")
        mapping[f"batch_stats/{fn}/mean"] = (f"{tn}.running_mean", "raw")
        mapping[f"batch_stats/{fn}/var"] = (f"{tn}.running_var", "raw")
    ported = W.port_state_dict(variables, sd, mapping)
    with jax.default_matmul_precision("highest"):
        got = np.asarray(jax.jit(blk.apply)(
            ported, jnp.asarray(x.permute(0, 2, 3, 1).numpy())))
    assert np.abs(got - want).max() < 1e-4, np.abs(got - want).max()


def test_facenet_mapping_total():
    import jax

    from scannertools_tpu.models import facenet
    from scannertools_tpu.models import porting_maps as P
    from scannertools_tpu.models import weights as W

    variables = facenet.init_params(jax.random.PRNGKey(0))
    # expand the bn pseudo-entries the same way port_facenet does
    mapping = {}
    for path, (tk, kind) in P.facenet_mapping().items():
        if kind == "bn":
            bn = path[3:]
            mapping[f"params/{bn}/scale"] = 1
            mapping[f"params/{bn}/bias"] = 1
            mapping[f"batch_stats/{bn}/mean"] = 1
            mapping[f"batch_stats/{bn}/var"] = 1
        elif kind == "bn_nofscale":
            bn = path[3:]
            mapping[f"params/{bn}/bias"] = 1
            mapping[f"batch_stats/{bn}/mean"] = 1
            mapping[f"batch_stats/{bn}/var"] = 1
        else:
            mapping[f"params/{path}"] = 1
    missing, extra = P.coverage_report(variables, mapping.keys())
    assert not missing, f"unmapped: {sorted(missing)[:8]}"
    assert not extra, f"nonexistent: {sorted(extra)[:8]}"
