"""Shot detection end-to-end (the reference's canonical example,
tests/test_all.py:222-233).

    python examples/shot_detection.py /path/to/video.mp4
"""

import sys

import scannertools_tpu as st


def main(path: str) -> None:
    sc = st.Client()
    video = st.NamedVideoStream(sc, "example", path=path)

    frame = sc.io.Input([video])
    hist = sc.ops.Histogram(frame=frame)
    shots = sc.ops.ShotBoundaries(histograms=hist)
    out = st.NamedStream(sc, "example_shots")

    sc.run(sc.io.Output(shots, [out]),
           st.PerfParams.manual(work_packet_size=64, io_packet_size=256),
           cache_mode=st.CacheMode.Overwrite, show_progress=True)

    boundaries = next(out.load(rows=[0]))
    fps = video.metadata().fps
    print(f"{len(boundaries)} shot boundaries:")
    for b in boundaries:
        print(f"  frame {b}  (t={b / fps:.2f}s)")
    print()
    print(sc.summarize())


if __name__ == "__main__":
    main(sys.argv[1])
