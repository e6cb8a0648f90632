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
PerfParams(recycle_backend_after_jobs=N) knob (runtime/executor.py),
whichever the ladder shows works.

Usage: python benchmarks/soak.py --minutes 30 [--out ...]
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
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "soak_results.json"))
    args = ap.parse_args()

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
