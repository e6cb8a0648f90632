#!/usr/bin/env python3
"""One-command weights-in kit: reference artifacts -> ported npz per family.

The reference loads real pretrained models everywhere (face_embedding.py:
31-32, object_detection.py:38-44, openpose_kernel.cpp:35-78,
maskrcnn_detection.py:340-360). This environment has zero egress, so the
kit splits the work: on any networked machine, download the artifacts below
into one directory; then on the target host run

    python scripts/port_checkpoints.py --artifacts DIR
    ST_WEIGHTS_DIR=DIR/ported python -m pytest -m weights tests/

which ports every family through models/porting_maps.py and runs the
reference semantic goldens (tests/test_weights_goldens.py).

Artifact manifest (filenames looked up under --artifacts):

  family          file(s)                              source
  --------------  -----------------------------------  ---------------------------------
  mtcnn           mtcnn_pnet.pt mtcnn_rnet.pt          torch.save(facenet_pytorch.PNet()
                  mtcnn_onet.pt                          .state_dict(), ...) (pip
                                                         facenet-pytorch; weights are the
                                                         FaceNet repo's det1-3.npy)
  facenet         facenet_vggface2.pt                  torch.save(InceptionResnetV1(
                                                         pretrained='vggface2')
                                                         .state_dict(), ...)
                                                       NOTE: this is a SUBSTITUTION —
                                                         the reference ships the TF1
                                                         ckpt 20170512-110547
                                                         (face_embedding.py:10-14);
                                                         vggface2 is the same arch but
                                                         a different training run, so
                                                         embeddings differ numerically
                                                         (PARITY.md "Documented
                                                         deviations"). A TF1-ckpt
                                                         reader through the same
                                                         facenet porting map is the
                                                         exact-parity path once egress
                                                         exists.
  ssd             frozen_inference_graph.pb            ssd_mobilenet_v1_coco_2017_11_17
                    (or ssd_tf_vars.npz)                 tarball (download.tensorflow.org)
  gender          gender_tf_vars.npz                   rude-carnie gender checkpoint:
                                                         {v.name: reader.get_tensor(...)}
  openpose        pose_iter_440000.caffemodel          CMU openpose COCO body model
  openpose_face   pose_iter_116000.caffemodel          CMU openpose face model
  openpose_hand   pose_iter_102000.caffemodel          CMU openpose hand model
  maskrcnn        e2e_mask_rcnn_X_101_32x8d_FPN_1x.pth maskrcnn-benchmark model zoo
  faster_rcnn     VGG16_faster_rcnn_final.caffemodel   py-faster-rcnn release
  facenet_templates  facenet_templates.bin             the binary template file next to
                                                         the scanner facenet caffemodel
                                                         (facenet_output_kernel_cpu.cpp:
                                                         20-30)
  (goldens)       short_video.mp4                      the reference test video
                                                         (scannertools_infra tests.py:37)

If a family's artifact is absent the family is skipped (exit stays 0 unless
--strict). Every port validates shape-compatibility at port time
(weights.port_state_dict raises on mismatch).
"""

import argparse
import os
import shutil
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _torch_load(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict) and isinstance(sd.get("model"), dict):
        # maskrcnn-benchmark checkpoints wrap the state dict (caught by
        # the synthetic kit drill: converting the wrapper's values first
        # would bury the sub-dict in a 0-d object array)
        sd = sd["model"]
    return {k: np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
            for k, v in sd.items()}


def port_mtcnn(art):
    import jax

    from scannertools_tpu.models import mtcnn
    from scannertools_tpu.models import porting_maps as pm

    sds = {}
    for net in ("pnet", "rnet", "onet"):
        p = os.path.join(art, f"mtcnn_{net}.pt")
        if not os.path.exists(p):
            return None
        sds[net] = _torch_load(p)
    return pm.port_mtcnn(mtcnn.init_params(jax.random.PRNGKey(0)), sds)


def port_facenet(art):
    import jax

    from scannertools_tpu.models import facenet
    from scannertools_tpu.models import porting_maps as pm

    p = os.path.join(art, "facenet_vggface2.pt")
    if not os.path.exists(p):
        return None
    return pm.port_facenet(facenet.init_params(jax.random.PRNGKey(0)),
                           _torch_load(p))


def port_ssd(art):
    import jax

    from scannertools_tpu.models import porting_maps as pm
    from scannertools_tpu.models import ssd

    npz = os.path.join(art, "ssd_tf_vars.npz")
    pb = os.path.join(art, "frozen_inference_graph.pb")
    if os.path.exists(npz):
        tf_vars = dict(np.load(npz))
    elif os.path.exists(pb):
        from scannertools_tpu.utils.tf_frozen import read_frozen_graph

        consts = read_frozen_graph(pb)
        # frozen graphs name former variables either bare or with /read
        tf_vars = {k[:-5] if k.endswith("/read") else k: v
                   for k, v in consts.items()}
    else:
        return None
    return pm.port_ssd(ssd.init_params(jax.random.PRNGKey(0)), tf_vars)


def port_gender(art):
    import jax

    from scannertools_tpu.models import gender
    from scannertools_tpu.models import porting_maps as pm

    p = os.path.join(art, "gender_tf_vars.npz")
    if not os.path.exists(p):
        return None
    return pm.port_gender(gender.init_params(jax.random.PRNGKey(0)),
                          dict(np.load(p)))


def _port_caffemodel(art, fname, init_fn, port_fn):
    import jax

    p = os.path.join(art, fname)
    if not os.path.exists(p):
        return None
    from scannertools_tpu.utils.caffemodel import read_caffemodel

    return port_fn(init_fn(jax.random.PRNGKey(0)), read_caffemodel(p))


def port_openpose(art):
    from scannertools_tpu.models import porting_maps as pm
    from scannertools_tpu.models import pose

    return _port_caffemodel(art, "pose_iter_440000.caffemodel",
                            pose.init_params, pm.port_openpose)


def port_openpose_face(art):
    from scannertools_tpu.models import porting_maps as pm
    from scannertools_tpu.models import pose

    return _port_caffemodel(art, "pose_iter_116000.caffemodel",
                            pose.init_face_params, pm.port_openpose_crop)


def port_openpose_hand(art):
    from scannertools_tpu.models import porting_maps as pm
    from scannertools_tpu.models import pose

    return _port_caffemodel(art, "pose_iter_102000.caffemodel",
                            pose.init_hand_params, pm.port_openpose_crop)


def port_maskrcnn(art):
    import jax

    from scannertools_tpu.models import maskrcnn as mr
    from scannertools_tpu.models import porting_maps as pm

    p = os.path.join(art, "e2e_mask_rcnn_X_101_32x8d_FPN_1x.pth")
    if not os.path.exists(p):
        return None
    sd = _torch_load(p)
    if "model" in sd and isinstance(sd["model"], dict):  # benchmark ckpts
        sd = {k: np.asarray(v) for k, v in sd["model"].items()}
    model = mr.MaskRCNNModel(jax.random.PRNGKey(0), arch="X-101-32x8d-FPN")
    return pm.port_maskrcnn(model.variables, sd, arch="X-101-32x8d-FPN")


def port_faster_rcnn(art):
    from scannertools_tpu.models import faster_rcnn
    from scannertools_tpu.models import porting_maps as pm

    return _port_caffemodel(art, "VGG16_faster_rcnn_final.caffemodel",
                            faster_rcnn.init_params, pm.port_faster_rcnn)


def port_facenet_templates(art, out_dir):
    """Binary template artifact -> validated [25,4] npy."""
    p = os.path.join(art, "facenet_templates.bin")
    if not os.path.exists(p):
        return False
    from scannertools_tpu.ops.detection_decode import load_face_templates

    tpl = load_face_templates(p)
    np.save(os.path.join(out_dir, "facenet_templates.npy"), tpl)
    return True


FAMILIES = {
    "mtcnn": port_mtcnn,
    "facenet": port_facenet,
    "ssd": port_ssd,
    "gender": port_gender,
    "openpose": port_openpose,
    "openpose_face": port_openpose_face,
    "openpose_hand": port_openpose_hand,
    "maskrcnn": port_maskrcnn,
    "faster_rcnn": port_faster_rcnn,
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--artifacts", required=True,
                    help="directory holding the downloaded reference artifacts")
    ap.add_argument("--out", default=None,
                    help="output dir for ported npz (default ARTIFACTS/ported)")
    ap.add_argument("--families", default=None,
                    help="comma-separated subset (default: all present)")
    ap.add_argument("--strict", action="store_true",
                    help="fail (exit 1) if any requested family is missing")
    args = ap.parse_args()

    art = args.artifacts
    out_dir = args.out or os.path.join(art, "ported")
    os.makedirs(out_dir, exist_ok=True)
    wanted = (args.families.split(",") if args.families
              else list(FAMILIES) + ["facenet_templates"])

    from scannertools_tpu.models import weights as W

    ok, skipped, failed = [], [], []
    for fam in wanted:
        try:
            if fam == "facenet_templates":
                done = port_facenet_templates(art, out_dir)
                (ok if done else skipped).append(fam)
                continue
            variables = FAMILIES[fam](art)
            if variables is None:
                skipped.append(fam)
                continue
            W.save_params(os.path.join(out_dir, f"{fam}.npz"), variables)
            ok.append(fam)
        except Exception:
            traceback.print_exc()
            failed.append(fam)

    vid = os.path.join(art, "short_video.mp4")
    if os.path.exists(vid):
        shutil.copy(vid, os.path.join(out_dir, "short_video.mp4"))
        ok.append("short_video.mp4")

    print(f"ported:  {', '.join(ok) or '-'}")
    print(f"skipped: {', '.join(skipped) or '-'} (artifact not present)")
    if failed:
        print(f"FAILED:  {', '.join(failed)}")
        return 1
    print(f"\nnext: ST_WEIGHTS_DIR={out_dir} python -m pytest -m weights tests/")
    if args.strict and skipped:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
