"""Detector-decode ops, generic NN ops, NetDescriptor, vis labels."""

import numpy as np
import pytest


def test_yolo_decode_plants_box():
    from scannertools_tpu.registry import get_op

    G, B, C = 7, 2, 20
    conf = np.zeros((G * G, C), np.float32)
    obj = np.zeros((G * G, B), np.float32)
    bb = np.zeros((G * G, B, 4), np.float32)
    # plant a confident 'person' (class 14) at cell (3, 2), box 0
    o = 3 * G + 2
    conf[o, 14] = 0.9
    obj[o, 0] = 0.9
    bb[o, 0] = [0.5, 0.5, 0.0, np.sqrt(0.25)]  # center of cell, h=0.25*448
    feat = np.concatenate([conf.reshape(-1), obj.reshape(-1), bb.reshape(-1)])
    out = get_op("YoloOutput").fn(None, [feat])
    assert len(out[0]) == 1
    b = out[0][0]
    assert b.label == 14 and abs(b.score - 0.81) < 1e-5
    cx = (2 + 0.5) / G * 448
    assert abs((b.x1 + b.x2) / 2 - cx) < 1.0


def test_faster_rcnn_decode():
    from scannertools_tpu.registry import get_op

    R = 4
    probs = np.zeros((R, 81), np.float32)
    probs[:, 0] = 0.9  # background default
    probs[1, 5] = 0.95  # strong class-5 detection
    probs[2, 5] = 0.92  # overlapping duplicate -> suppressed
    rois = np.zeros((R, 5), np.float32)
    rois[1] = [0, 10, 10, 50, 50]
    rois[2] = [0, 12, 12, 52, 52]
    fc7 = np.arange(R * 4096, dtype=np.float32).reshape(R, 4096)
    boxes, feats = get_op("FasterRCNNOutput").fn(
        None, [probs], [rois], [fc7])
    assert len(boxes[0]) == 1
    assert boxes[0][0].label == 5
    # surviving feature row is ROI 1's
    assert feats[0].shape == (1, 4096)
    assert feats[0][0, 0] == 4096.0


def test_facenet_output_decode():
    from scannertools_tpu.protobufs import FrameInfo
    from scannertools_tpu.registry import get_op

    gh, gw, nt = 8, 8, 25
    m = np.full((gh, gw, nt * 5), -10.0, np.float32)
    m[4, 4, 3] = 10.0  # one confident template at cell (4,4)
    m[4, 4, nt + 3 * 4 : nt + 3 * 4 + 4] = 0.0  # zero box adjustments
    out = get_op("FacenetOutput").fn(
        None, [m], [FrameInfo(height=64, width=64, channels=3)])
    assert len(out[0]) == 1
    b = out[0][0]
    assert 0 <= b.x1 < b.x2 <= 64 and b.score > 0.99


def test_bbox_nms_op():
    from scannertools_tpu.protobufs import BoundingBox
    from scannertools_tpu.registry import get_op

    boxes = [
        BoundingBox(x1=0, y1=0, x2=10, y2=10, score=0.9),
        BoundingBox(x1=1, y1=1, x2=11, y2=11, score=0.5),
        BoundingBox(x1=40, y1=40, x2=50, y2=50, score=0.8),
    ]
    out = get_op("BboxNMS").fn(None, [boxes], threshold=0.5)
    assert len(out[0]) == 2


def test_net_descriptor_toml(tmp_path):
    from scannertools_tpu.utils.net_descriptor import NetDescriptor

    p = tmp_path / "net.toml"
    p.write_text("""
[net]
model = "gender_levi_hassner"
weights = ""
input_layers = ["data"]
output_layers = ["prob"]
input_width = 227
input_height = 227
normalize = false
pad_mod = 8

[net.input]
channel_ordering = ["red", "green", "blue"]

[mean-image]
[mean-image.colors]
red = 104.0
green = 117.0
blue = 123.0
""")
    d = NetDescriptor.from_file(str(p))
    assert d.model_path == "gender_levi_hassner"
    assert d.input_width == 227 and d.pad_mod == 8
    assert d.mean_colors == [104.0, 117.0, 123.0]


def test_nn_input_preprocessing():
    import jax

    from scannertools_tpu.registry import get_op

    frames = np.full((2, 16, 20, 3), 100, np.uint8)
    fn = get_op("NNInput").fn
    out = np.asarray(jax.jit(
        lambda x: fn(None, x, input_width=8, input_height=8,
                     mean_colors=(90.0, 90.0, 90.0), transpose=True)
    )(frames))
    assert out.shape == (2, 3, 8, 8)  # planar NCHW like caffe blobs
    assert np.allclose(out, 10.0, atol=0.5)


def test_nn_forward_registry(sc):
    from scannertools_tpu.ops.nn_generic import get_model, register_model

    with pytest.raises(KeyError):
        get_model("nope")
    assert get_model("gender_levi_hassner")


def test_visualize_labels():
    from scannertools_tpu.ops.vis_labels import (COCO_CATEGORIES,
                                                 visualize_labels)
    from scannertools_tpu.protobufs import BoundingBox

    assert COCO_CATEGORIES[1] == "person" and COCO_CATEGORIES[90] == "toothbrush"
    frame = np.zeros((40, 60, 3), np.uint8)
    boxes = [BoundingBox(x1=0.2, y1=0.2, x2=0.8, y2=0.8, score=0.9, label=1)]
    out = visualize_labels(frame, boxes)
    assert out.sum() > 0
    assert frame.sum() == 0  # input not mutated


def test_facenet_detector_full_pipeline(sc, ingested):
    """The FacenetKernel-equivalent chain: NNInput -> NNForward(facenet
    detector) -> FacenetOutput with InfoFromFrame rescaling."""
    import scannertools_tpu as st

    frame = sc.io.Input([ingested])
    g = sc.streams.Gather(frame, [[0]])
    pre = sc.ops.NNInput(frame=g, mean_colors=(119.3, 110.6, 101.4))
    maps = sc.ops.NNForward(input=pre, model="facenet_detector")
    info = sc.ops.InfoFromFrame(frames=g)
    faces = sc.ops.FacenetOutput(scores=maps, frame_info=info)
    out = st.NamedStream(sc, "fnet_faces")
    sc.run(sc.io.Output(faces, [out]), st.PerfParams.manual(work_packet_size=1),
           cache_mode=st.CacheMode.Overwrite)
    got = next(out.load())
    assert isinstance(got, list)  # random weights: any count, right type
    for b in got:
        assert 0 <= b.x1 <= 96 and 0 <= b.y2 <= 64
