"""Benchmark — headline: histogram-op throughput (frames/sec/chip) vs the
host OpenCV baseline (the per-frame cv::calcHist path the reference's CPU
kernel uses, histogram_kernel_cpu.cpp:25-45). Extras: Farnebäck flow
throughput vs cv2.calcOpticalFlowFarneback.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extras": {...}}

Measurement methodology (round-2 correction): on the relayed backend,
``block_until_ready`` returns at ENQUEUE, not completion — naive timing
over-reports by orders of magnitude. Device time is measured as the SLOPE
between K1 and K2 chained executions inside one jit (inputs perturbed per
iteration so XLA cannot CSE them away), synced by a scalar readback;
round-trip and dispatch overhead cancel in the subtraction. See
docs/PERF_NOTES.md §2.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import numpy as np


def _device_seconds_per_iter(make_fn, arrays, K1=4, K2=16, reps=3):
    """Pure device time of one ``make_fn(eps, *arrays)`` execution."""
    import jax
    import jax.numpy as jnp

    def runner(K):
        def prog(eps0, *arrs):
            def body(c, i):
                out = make_fn(eps0 + i.astype(jnp.float32) * 1e-6, *arrs)
                return c + jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(jnp.asarray(x, jnp.float32)),
                    out, 0.0), None
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(K))
            return c

        j = jax.jit(prog)
        float(np.asarray(jax.device_get(j(0.0, *arrays))))  # warm/compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(jax.device_get(j(1e-7, *arrays))))
            best = min(best, time.perf_counter() - t0)
        return best

    return (runner(K2) - runner(K1)) / (K2 - K1)


def bench_histogram(frames_np: np.ndarray) -> float:
    import jax.numpy as jnp

    from scannertools_tpu.ops.histogram import _histogram_jnp_flat
    from scannertools_tpu.ops.histogram import histogram  # noqa: F401
    from scannertools_tpu.utils.framechunk import FrameChunk

    chunk = FrameChunk.from_hwc(frames_np).device()
    per = _device_seconds_per_iter(
        lambda e, flat: _histogram_jnp_flat(
            flat + (e * 1e6).astype(jnp.uint8), chunk.npix, 3),
        [chunk.flat])
    return frames_np.shape[0] / per


def bench_flow(gray0: np.ndarray, gray1: np.ndarray) -> float:
    import jax.numpy as jnp

    from scannertools_tpu.ops.optical_flow import farneback_pairs

    a = jnp.asarray(gray0)
    b = jnp.asarray(gray1)
    per = _device_seconds_per_iter(
        lambda e, x, y: farneback_pairs(x + e, y), [a, b], K1=2, K2=6)
    return gray0.shape[0] / per


def bench_mtcnn(frames_np: np.ndarray) -> float:
    """Device time of the full MTCNN cascade forward (the face-detect leg
    of the north-star suite, BASELINE.md) at 320x240, random weights —
    throughput is weight-independent (static shapes)."""
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.models import mtcnn

    params = mtcnn.init_params(jax.random.PRNGKey(0))
    frames = jnp.asarray(frames_np.astype(np.float32))
    per = _device_seconds_per_iter(
        lambda e, x: mtcnn.detect_batch(params, x + e), [frames],
        K1=2, K2=6)
    return frames_np.shape[0] / per


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

    g = rng.normal(128, 40, size=(9, 240, 432)).astype(np.float32)
    g = np.clip(g, 0, 255)
    flow_fps = bench_flow(g[:-1], g[1:])
    flow_cpu = host_flow_fps(g[:-1], g[1:])

    # the reference test-video geometry (tests/test_all.py:175-177)
    g4 = rng.normal(128, 40, size=(9, 480, 640)).astype(np.float32)
    g4 = np.clip(g4, 0, 255)
    flow_fps_480 = bench_flow(g4[:-1], g4[1:])
    flow_cpu_480 = host_flow_fps(g4[:-1], g4[1:])

    extras_nn = {}
    try:
        det = rng.integers(0, 256, size=(8, 240, 320, 3), dtype=np.uint8)
        extras_nn["mtcnn_fps_320x240"] = round(bench_mtcnn(det), 1)
    except Exception as exc:  # never fail the headline on an NN hiccup
        extras_nn["mtcnn_error"] = repr(exc)[:120]

    print(json.dumps({
        "metric": "histogram_throughput",
        "value": round(hist_fps, 1),
        "unit": "frames/sec/chip (640x480 RGB, device-time slope)",
        "vs_baseline": round(hist_fps / hist_cpu, 2),
        "extras": {
            "flow_fps_640x480": round(flow_fps_480, 1),
            "flow_vs_cv2_640x480": round(flow_fps_480 / flow_cpu_480, 2),
            "flow_fps_432x240": round(flow_fps, 1),
            "flow_vs_cv2": round(flow_fps / flow_cpu, 2),
            **extras_nn,
            **_recorded_e2e(),
            "methodology": "scan-slope (block_until_ready lies on relays)",
        },
    }))


def _recorded_e2e() -> dict:
    """Headline e2e/full-regime numbers from the committed suite record
    (benchmarks/results.json — measured by benchmarks/run_suite.py, which
    takes ~1h; this one-liner only re-measures the kernels live).
    Explicitly labeled recorded_, never re-measured here."""
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "benchmarks", "results.json")) as f:
            r = json.load(f)
        out = {}
        for k in ("e2e_shot_detect_fps_640x480", "e2e_video_hours_per_hour",
                  "e2e_flow_store_default_fps_640x480",
                  "maskrcnn_r50_fps_1080p_full_caps"):
            if k in r:
                out["recorded_" + k] = r[k]
        return out
    except Exception:
        return {}


if __name__ == "__main__":
    main()
