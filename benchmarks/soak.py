"""Relay-session degradation soak + in-process mitigation ladder.

ROADMAP #12 / VERDICT r3 #5: a long-lived process on the relayed TPU
backend slows ~10x over tens of minutes (identical pipeline: 7.8 vs
87.6 fps round 3). benchmarks/run_suite.py works around it with a fresh
subprocess per section; this harness DIAGNOSES it in-process: it runs
the identical histogram pipeline back-to-back for --minutes, records a
per-rep time series (wall fps, profiler-span deltas, RSS, jit-cache
sizes), and when throughput falls below --trigger x the session best for
two consecutive reps it applies the next mitigation on the ladder and
records the recovery:

  1. gc.collect()
  2. jax.clear_caches()            (jit/trace caches)
  3. executor segment-cache clear  (process-level compiled-segment cache)
  4. jax.extend.backend.clear_backends() + fresh Client
                                   (new PJRT connection to the relay)

The artifact (benchmarks/soak_results.json, written incrementally) is
the evidence for either a root-cause note in docs/PERF_NOTES.md or the
PerfParams(recycle_rss_mb=N) knob (config.py:128), whichever the ladder
shows works. Round-4 result: the ladder does NOT work in-process (PJRT
retains host copies of uploads; PERF_NOTES §3) — the cure is worker
recycling, which ``--recycle-rss-mb`` proves here: reps run in spawned
worker processes via parallel/recycling.run_recycling, each worker
exiting at the RSS budget and a fresh one continuing, so the time series
shows sawtooth-bounded RSS and non-decaying fps.

Usage: python benchmarks/soak.py --minutes 30 [--recycle-rss-mb 2048] [--out ...]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def jit_cache_sizes():
    import jax

    from scannertools_tpu.runtime import executor as ex

    live = -1
    try:
        live = len(jax.live_arrays())
    except Exception:
        pass
    return {
        "segment_cache": len(ex._SEGMENT_JIT_CACHE),
        "live_arrays": live,
    }


def make_video(path: str, n: int, w: int, h: int) -> None:
    import cv2
    import numpy as np

    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (w, h))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (h, w, 3), np.uint8)
    for i in range(n):
        f = np.roll(base, i * 7, axis=1)
        if i % 40 == 20:
            f = 255 - f
        vw.write(f)
    vw.release()


def recycle_worker(attempt: int, cfg: dict) -> None:
    """One recycled worker (module-level: mp spawn must import it).

    Runs ONE many-job histogram run under PerfParams(recycle_rss_mb=N) +
    CacheMode.Resume — the production recycling recipe (config.py:128,
    parallel/recycling). The executor raises RecycleRequested at the job
    boundary where RSS crosses the budget; committed jobs are skipped on
    the next attempt. Per-worker telemetry appends to cfg['log'] (jsonl);
    per-JOB timing is recovered by the parent from each committed
    stream's manifest mtime (storage/named.py commit writes it last).
    """
    import scannertools_tpu as st

    t0 = time.time()
    sc = st.Client(db_path=cfg["db_path"])
    video = st.NamedVideoStream(sc, "v", path=cfg["video_path"])
    n_jobs = cfg["n_jobs"]
    outs = [st.NamedStream(sc, f"h{j:04d}") for j in range(n_jobs)]
    done_before = sum(1 for o in outs if o.committed())
    rss0 = rss_mb()
    code = 0
    try:
        frame = sc.io.Input([video] * n_jobs)
        hist = sc.ops.Histogram(frame=frame)
        sc.run(sc.io.Output(hist, outs),
               st.PerfParams.manual(work_packet_size=64,
                                    recycle_rss_mb=cfg["recycle_rss_mb"]),
               cache_mode=st.CacheMode.Resume, show_progress=False)
    except st.RecycleRequested:
        code = 86
    done_after = sum(1 for o in outs if o.committed())
    with open(cfg["log"], "a") as f:
        f.write(json.dumps({
            "worker": attempt, "t_start": round(t0, 2),
            "t_end": round(time.time(), 2), "rss_start_mb": round(rss0, 1),
            "rss_end_mb": round(rss_mb(), 1), "jobs_done_before": done_before,
            "jobs_done_after": done_after, "exit": code,
        }) + "\n")
    if code:
        sys.exit(code)


def run_recycle_soak(args) -> None:
    """Drive recycle_worker processes for --minutes; write the artifact."""
    import multiprocessing as mp

    d = tempfile.mkdtemp(prefix="soak_recycle_")
    video_path = os.path.join(d, "v.mp4")
    make_video(video_path, args.frames, args.width, args.height)
    # enough jobs that the deadline, not completion, ends the soak
    n_jobs = max(64, int(args.minutes * 60 * 60 / args.frames))
    cfg = {
        "db_path": os.path.join(d, "db"), "video_path": video_path,
        "n_jobs": n_jobs, "recycle_rss_mb": args.recycle_rss_mb,
        "log": os.path.join(d, "workers.jsonl"),
    }
    t_end = time.time() + args.minutes * 60.0
    ctx = mp.get_context("spawn")
    attempt = 0
    t0 = time.time()
    while time.time() < t_end:
        p = ctx.Process(target=recycle_worker, args=(attempt, cfg))
        p.start()
        p.join()
        if p.exitcode == 0:
            break  # all jobs committed before the deadline
        if p.exitcode != 86:
            raise RuntimeError(f"worker {attempt} died rc={p.exitcode}")
        attempt += 1

    workers = []
    with open(cfg["log"]) as f:
        for line in f:
            w = json.loads(line)
            w["t_start"] = round(w["t_start"] - t0, 1)
            w["t_end"] = round(w["t_end"] - t0, 1)
            w["jobs"] = w["jobs_done_after"] - w["jobs_done_before"]
            dt = max(w["t_end"] - w["t_start"], 1e-6)
            w["fps"] = round(w["jobs"] * args.frames / dt, 1)
            workers.append(w)
    # per-job completion times from commit (manifest) mtimes
    job_times = []
    db = cfg["db_path"]
    for j in range(n_jobs):
        m = os.path.join(db, f"h{j:04d}", "manifest.json")
        try:
            job_times.append(round(os.path.getmtime(m) - t0, 1))
        except OSError:
            pass
    job_times.sort()
    # sliding per-job fps over consecutive commits within a worker span
    per_job = []
    for a, b in zip(job_times, job_times[1:]):
        if b - a > 0:
            per_job.append({"t": b, "fps": round(args.frames / (b - a), 1)})
    out = {
        "config": vars(args),
        "n_jobs": n_jobs,
        "workers": workers,
        "per_job_fps": per_job,
        "summary": {
            "n_workers": len(workers),
            "jobs_done": sum(w["jobs"] for w in workers),
            "rss_peak_mb": max((w["rss_end_mb"] for w in workers),
                               default=0.0),
            "fps_first_worker": workers[0]["fps"] if workers else 0.0,
            "fps_last_worker": workers[-1]["fps"] if workers else 0.0,
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["summary"], indent=1))
    print("recycle soak done:", args.out)


MITIGATIONS = ["gc", "clear_caches", "segment_cache", "clear_backends"]


def apply_mitigation(name: str, sc, db_path: str):
    """Returns the (possibly new) client."""
    import scannertools_tpu as st

    if name == "gc":
        gc.collect()
        return sc
    if name == "clear_caches":
        import jax

        jax.clear_caches()
        return sc
    if name == "segment_cache":
        from scannertools_tpu.runtime import executor as ex

        ex._SEGMENT_JIT_CACHE.clear()
        return sc
    if name == "clear_backends":
        import jax
        import jax.extend as jex

        from scannertools_tpu.runtime import executor as ex

        # compiled segments hold references into the old backend
        ex._SEGMENT_JIT_CACHE.clear()
        jax.clear_caches()
        jex.backend.clear_backends()
        return st.Client(db_path=db_path)
    raise KeyError(name)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--frames", type=int, default=192)
    ap.add_argument("--width", type=int, default=854)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--trigger", type=float, default=0.45,
                    help="mitigate when fps < trigger x best twice in a row")
    ap.add_argument("--recycle-rss-mb", type=float, default=0.0,
                    help=">0: soak the CURE instead of the disease — "
                    "recycled workers under PerfParams(recycle_rss_mb=N)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "soak_results.json"))
    args = ap.parse_args()

    if args.recycle_rss_mb > 0:
        if args.out.endswith("soak_results.json"):
            args.out = args.out.replace("soak_results.json",
                                        "soak_recycle_results.json")
        run_recycle_soak(args)
        return

    import scannertools_tpu as st

    d = tempfile.mkdtemp(prefix="soak_")
    video_path = os.path.join(d, "v.mp4")
    make_video(video_path, args.frames, args.width, args.height)
    db_path = os.path.join(d, "db")
    sc = st.Client(db_path=db_path)

    t_end = time.time() + args.minutes * 60.0
    reps = []
    best = 0.0
    slow_streak = 0
    ladder = list(MITIGATIONS)
    pending_mitigation = None
    rep = 0
    t0 = time.time()

    def write_out():
        with open(args.out, "w") as f:
            json.dump({
                "config": vars(args),
                "reps": reps,
            }, f, indent=1)

    while time.time() < t_end:
        rep += 1
        mitigation = None
        if pending_mitigation:
            mitigation = pending_mitigation
            sc = apply_mitigation(mitigation, sc, db_path)
            pending_mitigation = None

        video = st.NamedVideoStream(sc, "v", path=video_path)
        prof_before = dict(sc.profiler.totals())
        t1 = time.time()
        frame = sc.io.Input([video])
        hist = sc.ops.Histogram(frame=frame)
        out = st.NamedStream(sc, "h")
        sc.run(sc.io.Output(hist, [out]),
               st.PerfParams.manual(work_packet_size=64),
               cache_mode=st.CacheMode.Overwrite, show_progress=False)
        dt = time.time() - t1
        fps = args.frames / dt
        prof_after = sc.profiler.totals()
        spans = {k: round(prof_after.get(k, 0.0) - prof_before.get(k, 0.0), 3)
                 for k in prof_after}
        entry = {
            "rep": rep,
            "t": round(time.time() - t0, 1),
            "fps": round(fps, 1),
            "rss_mb": round(rss_mb(), 1),
            "caches": jit_cache_sizes(),
            "spans": {k: v for k, v in spans.items() if v > 0.001},
        }
        if mitigation:
            entry["after_mitigation"] = mitigation
        reps.append(entry)
        best = max(best, fps)

        if fps < args.trigger * best:
            slow_streak += 1
        else:
            slow_streak = 0
        if slow_streak >= 2 and ladder:
            pending_mitigation = ladder.pop(0)
            slow_streak = 0
        write_out()
        print(f"rep {rep:3d} t={entry['t']:7.1f}s fps={fps:7.1f} "
              f"rss={entry['rss_mb']:.0f}MB"
              + (f" [after {mitigation}]" if mitigation else ""),
              flush=True)

    write_out()
    print("soak done:", args.out)


if __name__ == "__main__":
    main()
