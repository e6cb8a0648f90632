"""Benchmark — headline: histogram-op throughput (frames/sec/chip) vs the
host OpenCV baseline (the per-frame cv::calcHist path the reference's CPU
kernel uses, histogram_kernel_cpu.cpp:25-45). Extras: Farnebäck flow
throughput vs cv2.calcOpticalFlowFarneback.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extras": {...}}

Data is device-resident (the executor's steady state; this environment's
host->device tunnel is not representative — docs/PERF_NOTES.md §3) and
every iteration syncs with block_until_ready.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import numpy as np


def _timeit(fn, *args, iters: int = 10) -> float:
    import jax

    jax.block_until_ready(fn(*args))  # compile + warmup
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_histogram(frames_np: np.ndarray) -> float:
    import jax

    from scannertools_tpu.ops.histogram import histogram
    from scannertools_tpu.utils.framechunk import FrameChunk

    chunk = FrameChunk.from_hwc(frames_np).device()
    dt = _timeit(jax.jit(lambda c: histogram(None, c)), chunk)
    return frames_np.shape[0] / dt


def bench_flow(gray0: np.ndarray, gray1: np.ndarray) -> float:
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.ops.optical_flow import farneback_pairs

    a = jnp.asarray(gray0)
    b = jnp.asarray(gray1)
    dt = _timeit(jax.jit(farneback_pairs), a, b, iters=5)
    return gray0.shape[0] / dt


def host_hist_fps(frames_np: np.ndarray, iters: int = 2) -> float:
    import cv2

    t0 = time.perf_counter()
    for _ in range(iters):
        for f in frames_np:
            for c in range(3):
                cv2.calcHist([f], [c], None, [16], [0, 256])
    return frames_np.shape[0] * iters / (time.perf_counter() - t0)


def host_flow_fps(gray0: np.ndarray, gray1: np.ndarray) -> float:
    import cv2

    t0 = time.perf_counter()
    for i in range(gray0.shape[0]):
        cv2.calcOpticalFlowFarneback(
            gray0[i].astype(np.uint8), gray1[i].astype(np.uint8), None,
            0.5, 3, 15, 3, 5, 1.2, 0)
    return gray0.shape[0] / (time.perf_counter() - t0)


def main() -> None:
    rng = np.random.default_rng(0)
    # reference test-video geometry: 640x480 RGB (tests/test_all.py:175-177)
    frames = rng.integers(0, 256, size=(64, 480, 640, 3), dtype=np.uint8)

    hist_fps = bench_histogram(frames)
    hist_cpu = host_hist_fps(frames[:16])

    # flow at 432x240 (flow is compute-bound; smaller tile keeps the bench
    # under a few minutes of compile on cold cache)
    g = rng.normal(128, 40, size=(9, 240, 432)).astype(np.float32)
    g = np.clip(g, 0, 255)
    flow_fps = bench_flow(g[:-1], g[1:])
    flow_cpu = host_flow_fps(g[:-1], g[1:])

    print(json.dumps({
        "metric": "histogram_throughput",
        "value": round(hist_fps, 1),
        "unit": "frames/sec/chip (640x480 RGB)",
        "vs_baseline": round(hist_fps / hist_cpu, 2),
        "extras": {
            "flow_fps_432x240": round(flow_fps, 1),
            "flow_vs_cv2": round(flow_fps / flow_cpu, 2),
        },
    }))


if __name__ == "__main__":
    main()
