"""Elastic multi-host processing of a video corpus.

Run this same script on every host against shared storage (NFS/GCS-mounted
``--db``); hosts race atomic claims for videos, dead hosts' stale claims
are reaped automatically, and every host returns only when the whole
corpus is committed (runtime/executor.py claims mode — the reference's
master/worker dispatch with storage as the only coordination medium).

    python examples/elastic_cluster.py --db /shared/db video1.mp4 video2.mp4 ...

Per-host chip parallelism: pass --instances N to shard each job's frame
axis over N local chips (pipeline_instances_per_node analog).
"""

import argparse

import scannertools_tpu as st


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("videos", nargs="+")
    ap.add_argument("--db", required=True, help="shared database path")
    ap.add_argument("--instances", type=int, default=1,
                    help="local chips to shard each job over")
    ap.add_argument("--claim-timeout", type=float, default=300.0,
                    help="heartbeat age (s) before a host is presumed dead")
    args = ap.parse_args()

    sc = st.Client(db_path=args.db)
    videos = [st.NamedVideoStream(sc, f"v{i}", path=p)
              for i, p in enumerate(args.videos)]

    frame = sc.io.Input(videos)
    hist = sc.ops.Histogram(frame=frame)
    shots = sc.ops.ShotBoundaries(histograms=hist)
    outs = [st.NamedStream(sc, f"shots_{i}") for i in range(len(videos))]

    sc.run(sc.io.Output(shots, outs),
           st.PerfParams.estimate(
               pipeline_instances_per_node=args.instances),
           cache_mode=st.CacheMode.Ignore,   # committed jobs are skipped
           job_distribution="claims",
           claim_timeout_sec=args.claim_timeout,
           show_progress=True)

    for i, out in enumerate(outs):
        print(f"{args.videos[i]}: cuts at {list(out.load(rows=[0]))[0]}")


if __name__ == "__main__":
    main()
