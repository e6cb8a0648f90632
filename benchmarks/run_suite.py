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


def device_seconds_per_iter(make_fn, arrays, K1=4, K2=16, reps=3):
    """Honest device time per execution: slope between K1 and K2 chained
    runs inside one jit, synced by scalar readback. block_until_ready
    returns at ENQUEUE on relayed backends — never time with it (the
    round-1 kernel numbers made that mistake; bench.py docstring)."""
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
        float(np.asarray(jax.device_get(j(0.0, *arrays))))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(jax.device_get(j(1e-7, *arrays))))
            best = min(best, time.perf_counter() - t0)
        return best

    return (runner(K2) - runner(K1)) / (K2 - K1)


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

    # ---- kernel throughputs (480p unless noted), honest device time ----
    frames = rng.integers(0, 256, (64, 480, 640, 3), np.uint8)
    chunk = FrameChunk.from_hwc(frames).device()
    from scannertools_tpu.ops.histogram import _histogram_jnp_flat

    per = device_seconds_per_iter(
        lambda e, flat: _histogram_jnp_flat(
            flat + (e * 1e6).astype(jnp.uint8), chunk.npix, 3),
        [chunk.flat])
    results["histogram_fps_640x480"] = round(64 / per, 1)
    print(f"{'histogram_fps_640x480':36s} "
          f"{results['histogram_fps_640x480']}", flush=True)

    g = np.clip(rng.normal(128, 40, (9, 240, 432)), 0, 255).astype(np.float32)
    ga, gb = jnp.asarray(g[:-1]), jnp.asarray(g[1:])
    per = device_seconds_per_iter(
        lambda e, a, b: farneback_pairs(a + e, b), [ga, gb], K1=2, K2=6)
    results["flow_fps_432x240"] = round(8 / per, 1)
    print(f"{'flow_fps_432x240':36s} {results['flow_fps_432x240']}",
          flush=True)

    if not args.quick:
        det_frames = jnp.asarray(
            rng.integers(0, 256, (8, 240, 320, 3)).astype(np.float32))
        variables = ssd.init_params(jax.random.PRNGKey(0))
        per = device_seconds_per_iter(
            lambda e, x: ssd.detect(variables, x + e), [det_frames],
            K1=2, K2=8)
        results["ssd_fps_320x240"] = round(8 / per, 1)
        print(f"{'ssd_fps_320x240':36s} {results['ssd_fps_320x240']}",
              flush=True)

        params = mtcnn.init_params(jax.random.PRNGKey(0))
        per = device_seconds_per_iter(
            lambda e, x: mtcnn.detect_batch(params, x + e), [det_frames],
            K1=2, K2=8)
        results["mtcnn_fps_320x240"] = round(8 / per, 1)
        print(f"{'mtcnn_fps_320x240':36s} {results['mtcnn_fps_320x240']}",
              flush=True)

    # ---- end-to-end: decode -> device -> sink (the full executor path).
    # Three pipelines of the north-star suite (BASELINE.md): shot
    # detection, optical flow (stencil halos), face detect+embed+gender
    # (three sinked columns, one decode). Each is warmed once and timed
    # best-of-3 (the relay link has one-time stalls; PERF_NOTES §3).
    with tempfile.TemporaryDirectory() as d:
        sc = st.Client(db_path=os.path.join(d, "db"))
        # e2e is host/link-bound in this environment — 240 frames measures
        # the same steady-state fps as longer streams without risking the
        # suite's wall clock on relay stalls (PERF_NOTES §3)
        n = 240
        video, info = testing.ingest_test_video(
            sc, n=n, w=640, h=480, cuts=(n // 3, 2 * n // 3))
        pp = st.PerfParams.manual(work_packet_size=64, prefetch_depth=2)

        def timed(build, warm_name, tag, reps=3):
            build(warm_name)  # warm compile
            best = float("inf")
            for i in range(reps):
                t0 = time.perf_counter()
                build(f"{tag}{i}")
                best = min(best, time.perf_counter() - t0)
            return best

        def section(key, fn):
            # one pathological section (relay stall) must not kill the
            # suite; partial results still print + persist
            try:
                results[key] = fn()
            except Exception as e:  # pragma: no cover - env failures
                results[key] = f"failed: {type(e).__name__}"
            print(f"{key:36s} {results[key]}", flush=True)

        def shots_run(name):
            frame = sc.io.Input([video])
            hist = sc.ops.Histogram(frame=frame)
            shots = sc.ops.ShotBoundaries(histograms=hist)
            sc.run(sc.io.Output(shots, [st.NamedStream(sc, name)]), pp,
                   cache_mode=st.CacheMode.Overwrite)

        def do_shots():
            wall = timed(shots_run, "w_sh", "t_sh")
            results["e2e_video_hours_per_hour"] = round((n / 24.0) / wall, 1)
            return round(n / wall, 1)

        section("e2e_shot_detect_fps_640x480", do_shots)

        def flow_hist_run(name):
            # flow consumed ON DEVICE (FlowHistogram), tiny sink — the
            # production analytics pattern; decode+stencil+compute bound
            frame = sc.io.Input([video])
            flow = sc.ops.OpticalFlow(frame=frame)
            fh = sc.ops.FlowHistogram(flow=flow)
            sc.run(sc.io.Output(fh, [st.NamedStream(sc, name)]), pp,
                   cache_mode=st.CacheMode.Overwrite)

        section("e2e_flow_hist_fps_640x480",
                lambda: round(n / timed(flow_hist_run, "w_fh", "t_fh"), 1))

        def flow_store_run(name):
            # sinks the full flow fields like the reference's flow
            # pipeline (2.4 MB/frame at 480p — readback + IO included;
            # on this rig that is relay-readback-bound, PERF_NOTES §3)
            frame = sc.io.Input([video])
            flow = sc.ops.OpticalFlow(frame=frame)
            sc.run(sc.io.Output(flow, [st.NamedStream(sc, name)]), pp,
                   cache_mode=st.CacheMode.Overwrite)

        section("e2e_flow_store_fps_640x480",
                lambda: round(n / timed(flow_store_run, "w_fl", "t_fl",
                                        reps=1), 1))

        if not args.quick:
            def face_run(name):
                frame = sc.io.Input([video])
                faces = sc.ops.MTCNNDetectFaces(frame=frame)
                embs = sc.ops.EmbedFaces(frame=frame, bboxes=faces)
                genders = sc.ops.DetectGender(frame=frame, bboxes=faces)
                sc.run(sc.io.Output(
                    [faces, embs, genders],
                    [(st.NamedStream(sc, name + "f"),
                      st.NamedStream(sc, name + "e"),
                      st.NamedStream(sc, name + "g"))]), pp,
                    cache_mode=st.CacheMode.Overwrite)

            section("e2e_face_suite_fps_640x480",
                    lambda: round(n / timed(face_run, "w_fa", "t_fa",
                                            reps=2), 1))

        # ---- multi-video job-boundary overlap (ROADMAP #7): 3 jobs in one
        # run; the decode thread pre-opens job N+1's decoder when job N's
        # last chunk is decoded. A/B via ST_TPU_NO_JOB_OVERLAP.
        n3 = 96
        vids = [testing.ingest_test_video(
            sc, n=n3, w=640, h=480, cuts=(n3 // 2,), name=f"mv{j}")[0]
            for j in range(3)]

        def three_video_run(name):
            frame = sc.io.Input(vids)
            hist = sc.ops.Histogram(frame=frame)
            shots = sc.ops.ShotBoundaries(histograms=hist)
            sc.run(sc.io.Output(
                shots, [st.NamedStream(sc, f"{name}_{j}") for j in range(3)]),
                pp, cache_mode=st.CacheMode.Overwrite)

        def do_three(flag):
            prev = os.environ.pop("ST_TPU_NO_JOB_OVERLAP", None)
            if flag:
                os.environ["ST_TPU_NO_JOB_OVERLAP"] = "1"
            try:
                return round(3 * n3 / timed(three_video_run,
                                            f"w3{flag}", f"t3{flag}"), 1)
            finally:
                os.environ.pop("ST_TPU_NO_JOB_OVERLAP", None)
                if prev is not None:
                    os.environ["ST_TPU_NO_JOB_OVERLAP"] = prev

        section("e2e_3video_shot_fps_overlap", lambda: do_three(False))
        section("e2e_3video_shot_fps_no_overlap", lambda: do_three(True))

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
