"""Hermetic tests for the binary checkpoint parsers of the weights-in kit:
caffemodel (utils/caffemodel.py), TF frozen graph (utils/tf_frozen.py) and
the facenet binary template file (facenet_output_kernel_cpu.cpp:20-30).
Payloads are hand-encoded protobuf wire format, so no caffe/tensorflow is
needed to prove the decoders correct."""

import numpy as np
import pytest


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wt: int) -> bytes:
    return _varint((field << 3) | wt)


def _ld(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _blob(shape, data: np.ndarray, packed=True, legacy=False) -> bytes:
    buf = b""
    if legacy:
        for f, d in zip((1, 2, 3, 4), shape):
            buf += _tag(f, 0) + _varint(d)
    else:
        shp = b"".join(_tag(1, 0) + _varint(d) for d in shape)
        buf += _ld(7, shp)
    flat = np.asarray(data, "<f4").reshape(-1)
    if packed:
        buf += _ld(5, flat.tobytes())
    else:
        for v in flat:
            buf += _tag(5, 5) + np.float32(v).tobytes()
    return buf


def test_caffemodel_layerparameter_roundtrip():
    from scannertools_tpu.utils.caffemodel import parse_netparameter

    w = np.arange(2 * 3 * 1 * 1, dtype=np.float32).reshape(2, 3, 1, 1)
    b = np.asarray([0.5, -1.5], np.float32)
    layer = (_ld(1, b"conv1") + _ld(7, _blob(w.shape, w))
             + _ld(7, _blob(b.shape, b)))
    net = _ld(100, layer)
    out = parse_netparameter(net)
    np.testing.assert_array_equal(out["conv1.weight"], w)
    np.testing.assert_array_equal(out["conv1.bias"], b)


def test_caffemodel_v1layer_legacy_dims_unpacked():
    from scannertools_tpu.utils.caffemodel import parse_netparameter

    w = np.arange(4, dtype=np.float32).reshape(1, 1, 2, 2)
    layer = _ld(4, b"old") + _ld(6, _blob((1, 1, 2, 2), w, packed=False,
                                          legacy=True))
    out = parse_netparameter(_ld(2, layer))
    np.testing.assert_array_equal(out["old.weight"], w)


def test_caffemodel_skips_parameterless_layers():
    from scannertools_tpu.utils.caffemodel import parse_netparameter

    out = parse_netparameter(_ld(100, _ld(1, b"relu1")))
    assert out == {}


def _tensorproto(arr: np.ndarray, splat=False) -> bytes:
    buf = _tag(1, 0) + _varint(1)  # dtype = DT_FLOAT
    dims = b"".join(_ld(2, _tag(1, 0) + _varint(d)) for d in arr.shape)
    buf += _ld(2, dims)
    if splat:
        buf += _tag(5, 5) + np.float32(arr.reshape(-1)[0]).tobytes()
    else:
        buf += _ld(4, np.asarray(arr, "<f4").tobytes())
    return buf


def _const_node(name: str, arr: np.ndarray, splat=False) -> bytes:
    attr = _ld(1, b"value") + _ld(2, _ld(8, _tensorproto(arr, splat)))
    return _ld(1, name.encode()) + _ld(2, b"Const") + _ld(5, attr)


def test_frozen_graph_const_extraction(tmp_path):
    from scannertools_tpu.utils.tf_frozen import read_frozen_graph

    w = np.random.RandomState(0).rand(3, 3, 2, 4).astype(np.float32)
    splat = np.full((5,), 2.5, np.float32)
    graph = (_ld(1, _const_node("scope/weights", w))
             + _ld(1, _const_node("scope/gamma", splat, splat=True))
             + _ld(1, _ld(1, b"not_const") + _ld(2, b"Relu")))
    p = tmp_path / "g.pb"
    p.write_bytes(graph)
    out = read_frozen_graph(str(p))
    assert set(out) == {"scope/weights", "scope/gamma"}
    np.testing.assert_array_equal(out["scope/weights"], w)
    np.testing.assert_array_equal(out["scope/gamma"], splat)


def test_face_templates_binary_parse(tmp_path):
    from scannertools_tpu.ops.detection_decode import load_face_templates

    tpl = np.random.RandomState(1).rand(25, 4).astype("<f4")
    p = tmp_path / "templates.bin"
    p.write_bytes(tpl.tobytes() + b"trailing-ignored")
    got = load_face_templates(str(p))
    np.testing.assert_array_equal(got, tpl)
    # truncated file -> clear error
    p2 = tmp_path / "short.bin"
    p2.write_bytes(tpl.tobytes()[:100])
    with pytest.raises(ValueError, match="truncated"):
        load_face_templates(str(p2))


def test_caffemodel_feeds_porting_map():
    """End-to-end: a synthetic caffemodel for the first faster-rcnn conv
    flows through read-then-port with the real name map."""
    from scannertools_tpu.models import porting_maps as pm
    from scannertools_tpu.utils.caffemodel import parse_netparameter

    mapping = pm.faster_rcnn_mapping()
    assert mapping["params/vgg/conv1_1/kernel"][0] == "conv1_1.weight"
    w = np.random.RandomState(2).rand(64, 3, 3, 3).astype(np.float32)
    net = _ld(100, _ld(1, b"conv1_1") + _ld(7, _blob(w.shape, w)))
    sd = parse_netparameter(net)
    # caffe OIHW -> flax HWIO is the 'conv' kind used by the map
    from scannertools_tpu.models import weights as W

    got = W._KIND_FNS["conv"](sd["conv1_1.weight"])
    assert got.shape == (3, 3, 3, 64)
    np.testing.assert_array_equal(got, w.transpose(2, 3, 1, 0))


def test_frozen_graph_negative_int_vals(tmp_path):
    """Negative int32 scalars (axis/dim constants, common in frozen
    graphs) arrive as 64-bit two's-complement varints and must decode
    signed."""
    from scannertools_tpu.utils.tf_frozen import read_frozen_graph

    buf = _tag(1, 0) + _varint(3)  # dtype = DT_INT32
    dims = _ld(2, _tag(1, 0) + _varint(2))
    buf += _ld(2, dims)
    # int_val: -1 then 7, unpacked varints (wire type 0 inside field 6)
    buf += _tag(6, 0) + _varint((1 << 64) - 1)  # -1 two's complement
    buf += _tag(6, 0) + _varint(7)
    attr = _ld(1, b"value") + _ld(2, _ld(8, buf))
    node = _ld(1, b"neg") + _ld(2, b"Const") + _ld(5, attr)
    p = tmp_path / "g.pb"
    p.write_bytes(_ld(1, node))
    out = read_frozen_graph(str(p))
    np.testing.assert_array_equal(out["neg"], np.asarray([-1, 7], np.int32))
