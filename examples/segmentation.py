"""Mask R-CNN instance segmentation over sampled frames (the reference's
maskrcnn_detection.py pipeline: aspect-preserving min-side-800 transform,
confidence filter 0.5, masks stored at 1/4 frame resolution).

    python examples/segmentation.py video.mp4 [maskrcnn.npz]

The optional weights npz comes from the weights-in kit
(scripts/port_checkpoints.py ports the maskrcnn-benchmark
X-101-32x8d-FPN checkpoint); without it the net runs with deterministic
random weights (pipeline mechanics only).
"""

import sys

import scannertools_tpu as st


def main(path: str, weights=None) -> None:
    sc = st.Client()
    video = st.NamedVideoStream(sc, "seg_demo", path=path)

    frame = sc.io.Input([video])
    sampled = sc.streams.Stride(frame, [30])
    kwargs = {"weights_path": weights, "arch": "X-101-32x8d-FPN"} \
        if weights else {}
    dets = sc.ops.MaskRCNNDetectObjects(frame=sampled, **kwargs)

    out = st.NamedStream(sc, "demo_masks")
    sc.run(sc.io.Output(dets, [out]),
           st.PerfParams.manual(work_packet_size=4),
           cache_mode=st.CacheMode.Overwrite)

    from scannertools_tpu.ops.vis_labels import COCO_CATEGORIES

    for i, frame_dets in enumerate(out.load()):
        names = [COCO_CATEGORIES.get(d["bbox"].label, "?")
                 for d in frame_dets]
        print(f"sampled frame {i}: {len(frame_dets)} instances {names[:5]}")
    print(sc.summarize())


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    main(sys.argv[1], *(sys.argv[2:3] or [None]))
