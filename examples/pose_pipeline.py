"""Multi-person pose over sampled frames — OpenPose body net + PAF
grouping, optionally the face/hand crop sub-networks
(scannertools_caffe's OpenPose op, openpose_kernel.cpp).

    python examples/pose_pipeline.py video.mp4 [--faces] [--hands]
                                     [--weights body.npz] [--scales N]
"""

import argparse

import scannertools_tpu as st


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("video")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--faces", action="store_true")
    ap.add_argument("--hands", action="store_true")
    ap.add_argument("--scales", type=int, default=1)
    ap.add_argument("--stride", type=int, default=30)
    args = ap.parse_args()

    sc = st.Client()
    video = st.NamedVideoStream(sc, "pose_demo", path=args.video)
    frame = sc.io.Input([video])
    sampled = sc.streams.Stride(frame, [args.stride])
    poses = sc.ops.OpenPose(frame=sampled, weights_path=args.weights,
                            pose_num_scales=args.scales,
                            compute_face=args.faces,
                            compute_hands=args.hands)
    out = st.NamedStream(sc, "pose_out")
    sc.run(sc.io.Output(poses, [out]),
           st.PerfParams.estimate(work_packet_size=4),
           cache_mode=st.CacheMode.Overwrite)

    total = 0
    for i, people in enumerate(out.load()):
        total += len(people)
        for p in people:
            kp = p.pose_keypoints()
            n_valid = int((kp[:, 2] > 0.05).sum())
            extra = ""
            if args.faces:
                extra += f" face_kp={int((p.face_keypoints()[:, 2] > 0).sum())}"
            if args.hands:
                lh, rh = p.hand_keypoints()
                extra += f" hands={int((lh[:, 2] > 0).sum())}/" \
                         f"{int((rh[:, 2] > 0).sum())}"
            print(f"frame {i * args.stride}: person "
                  f"({n_valid}/18 joints){extra}")
    print(f"{total} people across {i + 1} sampled frames")


if __name__ == "__main__":
    main()
