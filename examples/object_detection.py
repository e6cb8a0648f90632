"""Object detection over sampled frames — SSD for speed or Faster-RCNN for
the reference's caffe chain (tests/test_all.py:218-220 +
faster_rcnn_kernel.cpp).

    python examples/object_detection.py video.mp4 [--model ssd|faster_rcnn]
                                        [--weights weights.npz]

Without weights the nets run deterministic random init (mechanics only —
this build environment cannot download checkpoints).
"""

import argparse

import scannertools_tpu as st
from scannertools_tpu.ops.vis_labels import COCO_CATEGORIES


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("video")
    ap.add_argument("--model", default="ssd",
                    choices=["ssd", "faster_rcnn"])
    ap.add_argument("--weights", default=None)
    ap.add_argument("--stride", type=int, default=30)
    args = ap.parse_args()

    sc = st.Client()
    video = st.NamedVideoStream(sc, "objdet_demo", path=args.video)
    frame = sc.io.Input([video])
    sampled = sc.streams.Stride(frame, [args.stride])

    if args.model == "ssd":
        objs = sc.ops.DetectObjects(frame=sampled,
                                    weights_path=args.weights)
        out = st.NamedStream(sc, "objdet_boxes")
        sc.run(sc.io.Output(objs, [out]),
               st.PerfParams.estimate(work_packet_size=8),
               cache_mode=st.CacheMode.Overwrite)
        rows = list(out.load())
    else:
        pre = sc.ops.NNInput(frame=sampled,
                             mean_colors=(102.9801, 115.9465, 122.7717))
        cls_prob, rois, fc7 = sc.ops.FasterRCNN(input=pre,
                                                weights_path=args.weights)
        boxes, feats = sc.ops.FasterRCNNOutput(cls_prob=cls_prob,
                                               rois=rois, fc7=fc7)
        out_b = st.NamedStream(sc, "frcnn_boxes")
        out_f = st.NamedStream(sc, "frcnn_feats")
        sc.run(sc.io.Output([boxes, feats], [(out_b, out_f)]),
               st.PerfParams.estimate(work_packet_size=4),
               cache_mode=st.CacheMode.Overwrite)
        rows = list(out_b.load())

    total = 0
    for i, bl in enumerate(rows):
        for b in bl:
            total += 1
            name = COCO_CATEGORIES.get(b.label, str(b.label))
            print(f"frame {i * args.stride}: {name} "
                  f"({b.x1:.2f},{b.y1:.2f})-({b.x2:.2f},{b.y2:.2f}) "
                  f"score={b.score:.2f}")
    print(f"{total} detections across {len(rows)} sampled frames "
          f"({args.model})")


if __name__ == "__main__":
    main()
