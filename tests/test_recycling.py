"""Worker recycling for the leaky-transport mitigation (ROADMAP #12):
PerfParams(recycle_rss_mb=N) raises RecycleRequested at a job boundary,
and parallel/recycling.run_recycling drives fresh spawned workers until
every job commits — committed jobs never re-run.

Runs in a subprocess (spawn children must import the worker from a real
module file; the CPU backend keeps it hermetic)."""

import os
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys, tempfile
import numpy as np
import cv2

# spawn children re-execute this module: pin the workdir through the
# environment so every process shares one db / video set / tally file
d = os.environ.setdefault("ST_RECYCLE_TEST_DIR", tempfile.mkdtemp())
DB = os.path.join(d, "db")
VIDS = []
for j in range(4):
    path = os.path.join(d, f"v{j}.mp4")
    if not os.path.exists(path):
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24,
                            (64, 48))
        for i in range(6):
            w.write(np.full((48, 64, 3), 30 * j + i, np.uint8))
        w.release()
    VIDS.append(path)
COUNT = os.path.join(d, "runs.txt")

import scannertools_tpu as st


def work(attempt):
    # tally per-process job executions so the test can prove no re-runs
    sc = st.Client(db_path=DB)
    vids = [st.NamedVideoStream(sc, f"v{j}", path=p)
            for j, p in enumerate(VIDS)]
    ran = {"n": 0}
    from scannertools_tpu.runtime import executor as ex
    orig = ex.Executor._run_job
    def counting(self, *a, **k):
        ran["n"] += 1
        return orig(self, *a, **k)
    ex.Executor._run_job = counting

    frame = sc.io.Input(vids)
    hist = sc.ops.Histogram(frame=frame)
    outs = [st.NamedStream(sc, f"h{j}") for j in range(4)]
    try:
        # 1 MB budget: always exceeded -> recycle after every job boundary
        sc.run(sc.io.Output(hist, outs),
               st.PerfParams.manual(work_packet_size=8, recycle_rss_mb=1),
               cache_mode=st.CacheMode.Resume, show_progress=False)
    finally:
        with open(COUNT, "a") as f:
            f.write(f"{attempt}:{ran['n']}\n")


if __name__ == "__main__":
    # direct surface: RecycleRequested is raised and typed
    try:
        work(0)
        raise SystemExit("expected RecycleRequested")
    except st.RecycleRequested as e:
        assert "committed" in str(e)
    print("RAISE_OK")

    from scannertools_tpu.parallel.recycling import run_recycling
    procs = run_recycling(work, max_restarts=10)
    # the direct call above did job 0; each respawn does exactly one more
    # job (budget always exceeded), the last one finishes jobs 3 then exits
    # cleanly without hitting a boundary after it
    lines = open(COUNT).read().split()
    per_proc = [int(x.split(":")[1]) for x in lines]
    assert per_proc[0] == 1, lines            # the direct call
    assert all(n == 1 for n in per_proc[1:]), lines
    assert sum(per_proc) == 4, lines          # every job ran EXACTLY once
    assert procs == len(per_proc) - 1

    sc = st.Client(db_path=DB)
    for j in range(4):
        rows = list(st.NamedStream(sc, f"h{j}").load())
        assert len(rows) == 6, (j, len(rows))
    print("RECYCLE_OK")
"""


@pytest.mark.slow
def test_recycling_run_completes_without_reruns(tmp_path):
    script = tmp_path / "recycle_child.py"
    script.write_text(_CHILD)
    env = dict(os.environ)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        [root] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                  if p and "axon" not in p])
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run([sys.executable, str(script)], env=env,
                         capture_output=True, text=True, timeout=1800)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "RAISE_OK" in res.stdout
    assert "RECYCLE_OK" in res.stdout
