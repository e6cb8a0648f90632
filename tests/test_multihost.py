"""True multi-host execution tests (subprocess-based).

Reference parity: the Scanner master/worker control plane — multiple worker
processes executing one job set (SURVEY §2j; scannertools_infra/tests.py:
17-33 master/worker ports). TPU-native equivalents under test:

  * ``jax.distributed.initialize`` two-process bring-up with static
    per-process job slices (``host_job_slice``): each process runs exactly
    its share, the union commits every job.
  * elastic claims mode surviving a SIGKILLed worker: the dead host's
    heartbeats stop, the surviving host's automatic ``reclaim_stale`` retry
    pass (runtime/executor.py run()) absorbs its jobs — no manual
    intervention, matching the master's worker-loss reassignment.

Both run on the virtual CPU backend in scrubbed subprocesses (the axon
sitecustomize pins the parent to the tunneled TPU).
"""

import os
import signal
import socket
import subprocess
import sys
import textwrap
import time

import numpy as np
import pytest

_COMMON = textwrap.dedent("""
    import os, sys, time
    os.environ["JAX_PLATFORMS"] = "cpu"
    import numpy as np
    import jax

    def check_cpu():
        if jax.devices()[0].platform != "cpu":
            print("NO_CPU_BACKEND")
            raise SystemExit(0)

    import scannertools_tpu as st
    from scannertools_tpu.io.video import VideoMetadata

    N_JOBS = 6

    class FakeVideo:
        is_video = True
        def __init__(self, seed, slow=0.0):
            rng = np.random.default_rng(seed)
            self.frames = rng.integers(0, 256, (12, 16, 128, 3), np.uint8)
            self.slow = slow
        def __len__(self): return 12
        def metadata(self):
            return VideoMetadata("fake", 12, 24.0, 128, 16)
        def decoder(self): return self
        def read_frames(self, idxs, out=None):
            if self.slow:
                time.sleep(self.slow)
            data = self.frames[list(idxs)]
            if out is not None:
                out[:] = data
                return out
            return data
        def close(self): pass
        def committed(self): return True
        def type_name(self): return "frame"

    def build(sc, slow=0.0):
        vids = [FakeVideo(j, slow) for j in range(N_JOBS)]
        frame = sc.io.Input([v for v in vids])
        hist = sc.ops.Histogram(frame=frame)
        outs = [st.NamedStream(sc, f"mh{j}") for j in range(N_JOBS)]
        return sc.io.Output(hist, outs), outs
""")

_STATIC_WORKER = _COMMON + textwrap.dedent("""
    pid = int(sys.argv[1]); port = sys.argv[2]; db = sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    check_cpu()
    assert jax.process_count() == 2, jax.process_count()

    sc = st.Client(db_path=db)
    out, outs = build(sc)
    # static distribution: this process runs exactly host_job_slice's share
    from scannertools_tpu.parallel.sharded import host_job_slice
    mine = list(host_job_slice(N_JOBS))
    sc.run(out, st.PerfParams.manual(work_packet_size=8),
           cache_mode=st.CacheMode.Ignore)
    done = [j for j in mine if outs[j].committed()]
    print(f"P{pid} ran jobs {sorted(done)}")
    assert done == mine, (done, mine)
    print(f"P{pid} MULTIHOST_OK")
""")

_CLAIMS_WORKER = _COMMON + textwrap.dedent("""
    role = sys.argv[1]; db = sys.argv[2]
    check_cpu()
    sc = st.Client(db_path=db)
    if role == "victim":
        # slow decode so the parent can SIGKILL this worker mid-job,
        # leaving heartbeated-then-stale claims behind
        out, outs = build(sc, slow=0.4)
        print("VICTIM_STARTED", flush=True)
        sc.run(out, st.PerfParams.manual(work_packet_size=4),
               cache_mode=st.CacheMode.Ignore, job_distribution="claims")
    else:
        out, outs = build(sc)
        sc.run(out, st.PerfParams.manual(work_packet_size=4),
               cache_mode=st.CacheMode.Ignore, job_distribution="claims",
               claim_timeout_sec=2.0)
        missing = [j for j in range(N_JOBS) if not outs[j].committed()]
        assert not missing, f"jobs never completed: {missing}"
        print("FINISHER_OK")
""")


def _scrubbed_env():
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in p]
    if repo not in parts:
        parts.insert(0, repo)
    env["PYTHONPATH"] = os.pathsep.join(parts)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.expanduser("~/.jax_cache")
    return env


def _check(res_stdout, res_stderr):
    if "NO_CPU_BACKEND" in res_stdout:
        pytest.skip("environment pins JAX to the tunneled TPU; CPU "
                    "subprocess unavailable")


def test_two_process_jax_distributed_static_slices(tmp_path):
    """Both processes initialize jax.distributed against one coordinator;
    each runs its host_job_slice; the union commits all jobs."""
    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]
    env = _scrubbed_env()
    script = tmp_path / "worker.py"
    script.write_text(_STATIC_WORKER)
    db = str(tmp_path / "db")
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid), str(port),
                          db], env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=420)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("jax.distributed CPU bring-up timed out in this sandbox")
    for rc, out, err in outs:
        _check(out, err)
        assert rc == 0, out + err
        assert "MULTIHOST_OK" in out, out + err
    # the two slices are disjoint and complete
    ran = []
    for _, out, _ in outs:
        line = [l for l in out.splitlines() if "ran jobs" in l][0]
        ran.append(eval(line.split("ran jobs ")[1]))
    assert sorted(ran[0] + ran[1]) == list(range(6))
    assert not (set(ran[0]) & set(ran[1]))


def test_claims_mode_survives_killed_worker(tmp_path):
    """Kill a claims-mode worker mid-job; a second worker's automatic
    reclaim_stale retry pass completes the dead host's jobs and every
    output verifies against the reference histogram."""
    env = _scrubbed_env()
    script = tmp_path / "worker.py"
    script.write_text(_CLAIMS_WORKER)
    db = str(tmp_path / "db")

    victim = subprocess.Popen(
        [sys.executable, str(script), "victim", db], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    # wait for it to start claiming/running, then kill it mid-job
    t0 = time.time()
    started = False
    while time.time() - t0 < 300:
        if victim.poll() is not None:
            break
        claims_dir = os.path.join(db, "_claims")
        if os.path.isdir(claims_dir) and any(
                fn for root, _, fns in os.walk(claims_dir) for fn in fns):
            started = True
            time.sleep(1.0)  # let it get into a job body
            break
        time.sleep(0.1)
    if victim.poll() is not None:
        out, err = victim.communicate()
        _check(out, err)
        pytest.fail(f"victim exited early: {out}{err}")
    if not started:
        victim.kill()
        pytest.skip("victim never claimed a job (slow sandbox)")
    victim.send_signal(signal.SIGKILL)
    victim.wait()

    # claims from the dead worker are now stale (heartbeats stopped)
    time.sleep(2.5)
    res = subprocess.run([sys.executable, str(script), "finisher", db],
                         env=env, capture_output=True, text=True,
                         timeout=420)
    _check(res.stdout, res.stderr)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "FINISHER_OK" in res.stdout, res.stdout + res.stderr

    # verify every job's output against the reference histogram
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import scannertools_tpu as st
    from scannertools_tpu.ops.histogram import histogram_reference_np

    sc = st.Client(db_path=db)
    for j in range(6):
        rng = np.random.default_rng(j)
        frames = rng.integers(0, 256, (12, 16, 128, 3), np.uint8)
        got = np.stack([np.stack(h) for h in st.NamedStream(
            sc, f"mh{j}").load()])
        want = histogram_reference_np(frames)
        assert (got == want).all(), f"job {j} output corrupt after recovery"


def test_claims_run_waits_out_stale_holder(tmp_path):
    """A survivor that reaches the completion loop BEFORE the dead host's
    claims age out must wait, reap, and finish the stranded jobs (the
    round-3 review scenario: early finisher + fresh-but-dead claims)."""
    import numpy as np

    import scannertools_tpu as st
    from scannertools_tpu.io.video import VideoMetadata
    from scannertools_tpu.ops.histogram import histogram_reference_np
    from scannertools_tpu.parallel.workqueue import WorkClaims

    class FakeVideo:
        is_video = True

        def __init__(self, seed):
            rng = np.random.default_rng(seed)
            self.frames = rng.integers(0, 256, (6, 16, 128, 3), np.uint8)

        def __len__(self):
            return 6

        def metadata(self):
            return VideoMetadata("fake", 6, 24.0, 128, 16)

        def decoder(self):
            return self

        def read_frames(self, idxs, out=None):
            data = self.frames[list(idxs)]
            if out is not None:
                out[:] = data
                return out
            return data

        def close(self):
            pass

        def committed(self):
            return True

        def type_name(self):
            return "frame"

    sc = st.Client(db_path=str(tmp_path))
    vids = [FakeVideo(j) for j in range(3)]
    frame = sc.io.Input(vids)
    hist = sc.ops.Histogram(frame=frame)
    outs = [st.NamedStream(sc, f"wait_{j}") for j in range(3)]

    # a "dead host" freshly claimed job 1 and will never heartbeat again;
    # its claim is YOUNGER than the timeout when our run starts
    run_key = "|".join(s.name for s in outs)
    dead = WorkClaims(str(tmp_path), run_key)
    assert dead.try_claim(1)

    import time

    t0 = time.time()
    sc.run(sc.io.Output(hist, outs),
           st.PerfParams.manual(work_packet_size=4),
           cache_mode=st.CacheMode.Ignore, job_distribution="claims",
           claim_timeout_sec=3.0)
    # the run had to outwait the 3 s staleness window for job 1
    assert time.time() - t0 >= 2.0
    for j, out in enumerate(outs):
        assert out.committed(), f"job {j} stranded"
        got = np.stack([np.stack(h) for h in out.load()])
        assert (got == histogram_reference_np(vids[j].frames)).all()


def test_lookahead_claim_heartbeats_while_prev_job_runs(tmp_path,
                                                        monkeypatch):
    """The claims iterator claims job N+1 (lookahead for decoder warmup)
    BEFORE job N runs; the executor must refresh BOTH claims per chunk or
    the prefetched claim ages past claim_timeout_sec during a long job and
    a live peer reaps + double-executes it (workqueue.py's invariant:
    only dead holders' claims are reaped)."""
    import scannertools_tpu as st
    from scannertools_tpu.parallel import workqueue
    from scannertools_tpu.storage.python import PythonStream

    calls = []
    orig = workqueue.WorkClaims.heartbeat
    monkeypatch.setattr(
        workqueue.WorkClaims, "heartbeat",
        lambda self, job: (calls.append(job), orig(self, job))[1])

    sc = st.Client(db_path=str(tmp_path / "db"))
    frames = np.random.default_rng(0).integers(
        0, 256, (8, 16, 32, 3), np.uint8)
    ins = [PythonStream(list(frames)) for _ in range(2)]
    frame = sc.io.Input(ins)
    hist = sc.ops.Histogram(frame=frame)
    outs = [st.NamedStream(sc, f"hb{j}") for j in range(2)]
    sc.run(sc.io.Output(hist, outs),
           st.PerfParams.manual(work_packet_size=2),
           cache_mode=st.CacheMode.Overwrite, job_distribution="claims")
    assert all(o.committed() for o in outs)
    # 4 chunks per job -> heartbeats fire during both jobs. The looked-ahead
    # job must be refreshed while the first is still running: its id appears
    # in the call log BEFORE the first job's final heartbeat.
    assert calls, "claims mode must heartbeat"
    first, other = calls[0], 1 - calls[0]
    k = calls.index(other)
    assert first in calls[k + 1:], (
        f"prefetched claim {other} was never heartbeated while job "
        f"{first} ran: {calls}")
