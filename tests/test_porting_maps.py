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
