"""Worker-process recycling for long runs on leaky transports.

ROADMAP #12 root cause (measured, docs/PERF_NOTES.md §3): the relayed
PJRT backend permanently retains the host copy of every byte uploaded to
the device — `jax.device_put` of a 50 MB array grows RSS by exactly 50 MB
with zero live arrays, and none of gc.collect / jax.clear_caches /
jax.extend.backend.clear_backends / malloc_trim reclaims it. A long video
run's RSS therefore grows by its total ingested bytes until the host
pages and throughput collapses ~10x (the round-3 "relay-session
degradation").

The framework-level mitigation is the same one every production engine
uses for leaky workers: bound the damage and recycle the process at a
safe boundary. ``PerfParams(recycle_rss_mb=N)`` makes the executor raise
:class:`scannertools_tpu.RecycleRequested` at the next JOB boundary once
RSS exceeds the budget (each completed job is already committed, so
nothing is lost), and :func:`run_recycling` drives fresh worker processes
until the run completes:

    import scannertools_tpu as st
    from scannertools_tpu.parallel.recycling import run_recycling

    def work(attempt):           # module-level (spawn must import it)
        sc = st.Client(db_path=DB)
        ... build graph ...
        sc.run(out, st.PerfParams.manual(recycle_rss_mb=4096),
               cache_mode=st.CacheMode.Resume)   # skip committed jobs

    run_recycling(work, max_restarts=20)

Reference analog: the engine's master restarts lost/failed workers and
reassigns their work (SURVEY §2j worker-loss reassignment); here the
"loss" is deliberate and leak-bounded. Works with both job
distributions — "static" slices re-run and skip committed jobs;
"claims" workers release their look-ahead claim before exiting so the
successor re-claims it immediately.
"""

from __future__ import annotations

import multiprocessing as mp
from typing import Callable

RECYCLE_EXIT_CODE = 86  # child exits with this when RecycleRequested


def _child(target: Callable, attempt: int, args: tuple) -> None:
    import sys

    from ..config import RecycleRequested

    try:
        target(attempt, *args)
    except RecycleRequested:
        sys.exit(RECYCLE_EXIT_CODE)


def run_recycling(target: Callable, *, args: tuple = (),
                  max_restarts: int = 100) -> int:
    """Run ``target(attempt, *args)`` in fresh spawned processes until it
    finishes without raising RecycleRequested. Returns the number of
    processes used. ``target`` must be importable from a module (spawn
    semantics) and must use a cache mode that skips committed jobs on
    attempt > 0 (CacheMode.Resume or Ignore)."""
    ctx = mp.get_context("spawn")
    for attempt in range(max_restarts + 1):
        p = ctx.Process(target=_child, args=(target, attempt, args))
        p.start()
        p.join()
        if p.exitcode == 0:
            return attempt + 1
        if p.exitcode != RECYCLE_EXIT_CODE:
            raise RuntimeError(
                f"recycled worker attempt {attempt} failed with exit code "
                f"{p.exitcode}")
    raise RuntimeError(f"run did not complete within {max_restarts} restarts")
