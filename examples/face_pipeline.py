"""Face detection + embedding + gender over sampled frames (the reference's
face suite, tests/test_all.py:196-215).

    python examples/face_pipeline.py video.mp4 [mtcnn.npz] [facenet.npz]

Weight files are optional npz pytrees (models/weights.py); without them the
nets run with deterministic random weights (mechanics only — this build
environment cannot download the pretrained checkpoints).
"""

import sys

import scannertools_tpu as st


def main(path: str, mtcnn_weights=None, facenet_weights=None) -> None:
    sc = st.Client()
    video = st.NamedVideoStream(sc, "faces_demo", path=path)

    frame = sc.io.Input([video])
    sampled = sc.streams.Stride(frame, [30])  # ~1 frame/sec at 30fps
    faces = sc.ops.MTCNNDetectFaces(frame=sampled,
                                    weights_path=mtcnn_weights)
    embs = sc.ops.EmbedFaces(frame=sampled, bboxes=faces,
                             weights_path=facenet_weights)
    genders = sc.ops.DetectGender(frame=sampled, bboxes=faces)

    out_f = st.NamedStream(sc, "demo_faces")
    out_e = st.NamedStream(sc, "demo_embs")
    out_g = st.NamedStream(sc, "demo_genders")
    pp = st.PerfParams.manual(work_packet_size=8)
    # one run, three sinked columns: the video decodes ONCE and the three
    # nets share the frame chunks (vs. one run per output = 3x decode)
    sc.run(sc.io.Output([faces, embs, genders], [(out_f, out_e, out_g)]),
           pp, cache_mode=st.CacheMode.Overwrite)

    total = 0
    for i, (fl, el, gl) in enumerate(zip(out_f.load(), out_e.load(),
                                         out_g.load())):
        total += len(fl)
        for b, g in zip(fl, gl):
            print(f"frame {i * 30}: face ({b.x1:.2f},{b.y1:.2f})-"
                  f"({b.x2:.2f},{b.y2:.2f}) score={b.score:.2f} gender={g}")
        if len(fl):
            print(f"  embeddings: {el.shape}")
    print(f"{total} faces across {i + 1} sampled frames")


if __name__ == "__main__":
    main(*sys.argv[1:])
