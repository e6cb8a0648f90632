"""Benchmark suite — per-op kernel throughput + end-to-end video-hours/hour.

The north-star metric (BASELINE.md): video-hours processed per hour for the
histogram / flow / face-detect suite, plus frames/sec/chip per op. Run:

    python benchmarks/run_suite.py [--quick]

Writes benchmarks/results.json and prints a table. Kernel numbers are
device-resident with per-iteration sync; the e2e number runs the real
pipeline (decode -> device -> sink) on a synthesized mp4 and therefore
includes this environment's host decode (1 CPU core) and tunnel transfer —
see docs/PERF_NOTES.md §3 before comparing across machines.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, iters=10):
    import jax

    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import scannertools_tpu as st
    from scannertools_tpu import testing
    from scannertools_tpu.models import mtcnn, ssd
    from scannertools_tpu.ops.histogram import histogram
    from scannertools_tpu.ops.optical_flow import farneback_pairs
    from scannertools_tpu.utils.framechunk import FrameChunk

    rng = np.random.default_rng(0)
    results = {"backend": jax.default_backend(),
               "device": str(jax.devices()[0])}

    # ---- kernel throughputs (480p unless noted) -------------------------
    frames = rng.integers(0, 256, (64, 480, 640, 3), np.uint8)
    chunk = FrameChunk.from_hwc(frames).device()
    dt = timeit(jax.jit(lambda c: histogram(None, c)), chunk)
    results["histogram_fps_640x480"] = round(64 / dt, 1)

    g = np.clip(rng.normal(128, 40, (9, 240, 432)), 0, 255).astype(np.float32)
    dt = timeit(jax.jit(farneback_pairs), jnp.asarray(g[:-1]),
                jnp.asarray(g[1:]), iters=5)
    results["flow_fps_432x240"] = round(8 / dt, 1)

    if not args.quick:
        det_frames = jnp.asarray(
            rng.integers(0, 256, (8, 240, 320, 3)).astype(np.float32))
        variables = ssd.init_params(jax.random.PRNGKey(0))
        dt = timeit(jax.jit(ssd.detect), variables, det_frames, iters=5)
        results["ssd_fps_320x240"] = round(8 / dt, 1)

        params = mtcnn.init_params(jax.random.PRNGKey(0))
        dt = timeit(jax.jit(mtcnn.detect_batch), params,
                    det_frames, iters=3)
        results["mtcnn_fps_320x240"] = round(8 / dt, 1)

    # ---- end-to-end: decode -> histogram+shots -> sink ------------------
    with tempfile.TemporaryDirectory() as d:
        sc = st.Client(db_path=os.path.join(d, "db"))
        n = 240 if args.quick else 480
        video, info = testing.ingest_test_video(
            sc, n=n, w=640, h=480, cuts=(n // 3, 2 * n // 3))
        frame = sc.io.Input([video])
        hist = sc.ops.Histogram(frame=frame)
        shots = sc.ops.ShotBoundaries(histograms=hist)
        out = st.NamedStream(sc, "bench_shots")
        pp = st.PerfParams.manual(work_packet_size=64, prefetch_depth=2)
        sc.run(sc.io.Output(shots, [out]), pp,
               cache_mode=st.CacheMode.Overwrite)  # warm compile
        t0 = time.perf_counter()
        sc.run(sc.io.Output(shots, [out]), pp,
               cache_mode=st.CacheMode.Overwrite)
        wall = time.perf_counter() - t0
        video_hours = (n / 24.0) / 3600.0
        results["e2e_shot_detect_fps_640x480"] = round(n / wall, 1)
        results["e2e_video_hours_per_hour"] = round(
            video_hours / (wall / 3600.0), 1)
        totals = sc.profiler.totals()
        results["e2e_decode_seconds"] = round(totals.get("source:read", 0), 2)
        results["e2e_device_seconds"] = round(
            sum(v for k, v in totals.items() if k.startswith("device:")), 2)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    for k, v in results.items():
        print(f"{k:36s} {v}")


if __name__ == "__main__":
    main()
