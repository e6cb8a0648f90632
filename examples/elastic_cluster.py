"""Elastic multi-host processing of a video corpus.

Run this same script on every host against shared storage (NFS/GCS-mounted
``--db``); hosts race atomic claims for videos, dead hosts' stale claims
are reaped automatically, and every host returns only when the whole
corpus is committed (runtime/executor.py claims mode — the reference's
master/worker dispatch with storage as the only coordination medium).

    python examples/elastic_cluster.py --db /shared/db video1.mp4 video2.mp4 ...

Per-host chip parallelism: pass --instances N to shard each job's frame
axis over N local chips (pipeline_instances_per_node analog).

Leaky-transport hosts (docs/PERF_NOTES.md §3): pass --recycle-rss-mb N to
bound each worker process's RSS — the executor requests a restart at the
next job boundary past the budget and this script respawns a fresh
worker; committed jobs are never re-run (parallel/recycling.py).
"""

import argparse

import scannertools_tpu as st

ARGS = None  # parsed once in main(); read by work() in respawned workers


def work(attempt: int, argv=None) -> None:
    args = ARGS or _parse(argv)
    sc = st.Client(db_path=args.db)
    videos = [st.NamedVideoStream(sc, f"v{i}", path=p)
              for i, p in enumerate(args.videos)]

    frame = sc.io.Input(videos)
    hist = sc.ops.Histogram(frame=frame)
    shots = sc.ops.ShotBoundaries(histograms=hist)
    outs = [st.NamedStream(sc, f"shots_{i}") for i in range(len(videos))]

    sc.run(sc.io.Output(shots, outs),
           st.PerfParams.estimate(
               pipeline_instances_per_node=args.instances,
               recycle_rss_mb=args.recycle_rss_mb),
           cache_mode=st.CacheMode.Ignore,   # committed jobs are skipped
           job_distribution="claims",
           claim_timeout_sec=args.claim_timeout,
           show_progress=True)

    for i, out in enumerate(outs):
        print(f"{args.videos[i]}: cuts at {list(out.load(rows=[0]))[0]}")


def _parse(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("videos", nargs="+")
    ap.add_argument("--db", required=True, help="shared database path")
    ap.add_argument("--instances", type=int, default=1,
                    help="local chips to shard each job over")
    ap.add_argument("--claim-timeout", type=float, default=300.0,
                    help="heartbeat age (s) before a host is presumed dead")
    ap.add_argument("--recycle-rss-mb", type=float, default=0.0,
                    help="respawn the worker past this RSS (0 = off)")
    return ap.parse_args(argv)


def main() -> None:
    global ARGS
    ARGS = _parse()
    if ARGS.recycle_rss_mb:
        import sys

        from scannertools_tpu.parallel.recycling import run_recycling

        # spawned workers re-parse argv (module globals don't transfer)
        run_recycling(work, args=(sys.argv[1:],))
    else:
        work(0)


if __name__ == "__main__":
    main()
