"""Graph executor: lowers the pipeline IR to jitted JAX chunk programs.

This is the TPU-native replacement for the Scanner engine's run loop
(master/worker gRPC scheduling + C++ kernel threads, SURVEY §1 L0). The
design:

  * Each job (stream) is planned as a sequence of fixed-size frame chunks
    (``PerfParams.work_packet_size`` analog). Static chunk shapes keep XLA
    compiles cached after the first chunk.
  * Maximal runs of device ops are fused into one traced function per
    segment, so intermediates never leave HBM and XLA fuses elementwise work
    into neighbors.
  * Temporal stencils (reference ``.stencil({0,1})``, e.g. optical flow) are
    planned as chunk halos: a backward interval pass computes how many extra
    rows each node needs; sources decode the halo (replicate-clamped at
    stream edges, matching the engine's boundary handling).
  * Stateful ops (reference bounded/unbounded state: tracker.py:12,
    montage_kernel_cpu.cpp:111) carry python/pytree state chunk-to-chunk and
    force per-stream sequential order (which this executor is anyway).
  * Whole-stream ops (reference batch=10**7 idiom, shot_detection.py:11)
    accumulate their inputs across chunks and run once at end-of-stream.
  * Host decode runs in a prefetch thread, double-buffering chunks ahead of
    device execution (``prefetch_depth``).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax

from .. import types as typeslib
from ..config import CacheMode, PerfParams
from ..graph import (InputNode, Node, NodeOutput, OpNode, OutputNode,
                     SampleNode, toposort)
from ..registry import get_op
from ..utils.framechunk import FrameChunk
from .context import OpContext
from .profiler import Profiler


def _rss_mb() -> float:
    """Resident set size of this process in MB (Linux)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def _clamp(i: int, lo: int, hi: int) -> int:
    return max(lo, min(hi, i))


def _ser_params(v) -> str:
    """Deterministic serialization for op params (array bytes hashed, not
    elided by repr) — used by the resume signature and the segment cache."""
    import hashlib

    if isinstance(v, np.ndarray):
        return (f"ndarray({v.shape},{v.dtype},"
                f"{hashlib.sha256(v.tobytes()).hexdigest()})")
    if isinstance(v, (list, tuple)):
        return f"{type(v).__name__}[" + ",".join(_ser_params(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k!r}:{_ser_params(x)}" for k, x in sorted(v.items(), key=repr)
        ) + "}"
    return repr(v)


# Process-level compiled-segment cache. jax.jit wrappers are cheap to CALL
# but expensive to CREATE-and-first-call (retrace + persistent-cache lookup:
# ~1s per segment on this backend, measured) — and the executor used to make
# fresh wrappers per job, so a 100-video run re-paid that 100×. Keyed by the
# segment's *structure* (op names, params, stencil intervals, wiring, input
# avals, chunk length, mesh, stream meta), not node identity, so any
# structurally identical graph — across jobs, runs, and Clients in one
# process — reuses the compiled executable.
_SEGMENT_JIT_CACHE: Dict[Any, Any] = {}

# Process-level cache of resolved op aux pytrees (model weights). Keyed by
# (op name, serialized params, placement) so weights load/replicate once per
# process, not per job/chunk. Placement: None (default device), "cpu"
# (forced CPU backend), or the mesh size (replicated over the data mesh).
_AUX_CACHE: Dict[Any, Any] = {}


def _resolve_aux(opdef, node, ctx, placement, mesh=None, cpu_dev=None):
    base_key = (opdef.name, _ser_params(node.params))
    key = base_key + (placement,)
    if key in _AUX_CACHE:
        return _AUX_CACHE[key]
    host_key = base_key + ("__host__",)
    if host_key in _AUX_CACHE:
        val = _AUX_CACHE[host_key]
    else:
        val = opdef.aux(ctx, node.params)
        _AUX_CACHE[host_key] = val
    if placement == "cpu":
        val = jax.tree_util.tree_map(
            lambda leaf: jax.device_put(leaf, cpu_dev), val)
    elif isinstance(placement, int):
        # data-parallel runs replicate weights over the mesh (the reference
        # replicates the whole pipeline per instance, SURVEY §2j)
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())
        val = jax.tree_util.tree_map(
            lambda leaf: jax.device_put(leaf, rep), val)
    else:
        # default single-device placement: move the weights to the device
        # ONCE here — an npz-loaded numpy pytree passed straight into the
        # jitted segment would otherwise re-upload the full checkpoint
        # host->HBM on every chunk
        val = jax.tree_util.tree_map(jax.device_put, val)
    _AUX_CACHE[key] = val
    return val


def _aval_key(a) -> tuple:
    if isinstance(a, FrameChunk):
        return ("fc", tuple(a.flat.shape), str(a.flat.dtype), a.h, a.w, a.c,
                a.fmt, a.full_range, a.bt709)
    return (tuple(a.shape), str(a.dtype))


class _Value:
    """A chunk-scoped dataflow value: rows [a+lo, b+hi] of a node's stream."""

    __slots__ = ("data", "lo", "hi", "is_device")

    def __init__(self, data, lo: int, hi: int, is_device: bool):
        self.data = data
        self.lo = lo
        self.hi = hi
        self.is_device = is_device

    def slice_rows(self, want_lo: int, want_hi: int, T: int):
        """Rows [a+want_lo, b+want_hi] of this value (static offsets)."""
        start = want_lo - self.lo
        length = T + (want_hi - want_lo)
        assert start >= 0, (start, want_lo, self.lo)
        if isinstance(self.data, FrameChunk):
            return self.data.slice_rows(start, length)
        return self.data[start : start + length]


def _to_host(data):
    """Device value -> host object for host ops / sinks."""
    if isinstance(data, FrameChunk):
        return data.host().hwc_u8()
    if isinstance(data, list):
        return data
    return np.asarray(jax.device_get(data))


class Executor:
    def __init__(self, client):
        self.client = client
        self.profiler: Profiler = client.profiler
        self._mesh = None  # set per run() from PerfParams

    # ------------------------------------------------------------------ plan

    def _intervals(self, order: List[Node]) -> Dict[int, Tuple[int, int]]:
        """Backward pass: rows (relative to the output chunk) each node must
        produce. Output/sink nodes need (0, 0); an op with stencil (s_lo,
        s_hi) needing (lo, hi) requires (lo+s_lo, hi+s_hi) of its inputs."""
        need: Dict[int, Tuple[int, int]] = {}

        def widen(nid: int, lo: int, hi: int):
            cur = need.get(nid, (0, 0))
            need[nid] = (min(cur[0], lo), max(cur[1], hi))

        for node in reversed(order):
            lo, hi = need.get(node.id, (0, 0))
            if isinstance(node, OpNode):
                s_lo, s_hi = get_op(node.name).stencil
            else:
                s_lo, s_hi = 0, 0
            for e in node.inputs.values():
                widen(e.node.id, lo + s_lo, hi + s_hi)
            need.setdefault(node.id, (lo, hi))
        return need

    def _effective_rows(self, order: List[Node], source: InputNode, job: int,
                        n_rows: int) -> List[int]:
        def root_of(s: Node) -> Node:
            n = s
            while isinstance(n, SampleNode):
                n = n.inputs["input"].node
            return n

        samples = [n for n in order if isinstance(n, SampleNode)
                   and root_of(n) is source]
        # chained samplers compose (Range of a Stride etc.). *Parallel*
        # branches never reach here: run() partitions the output columns
        # per sampling branch (_sampling_groups) and launches one sub-run
        # per branch, so each planned order holds a single linear chain.
        heads = [s for s in samples
                 if not isinstance(s.inputs["input"].node, SampleNode)]
        if len(heads) > 1:
            raise AssertionError(
                "parallel sampling branches survived _sampling_groups"
            )
        rows = list(range(n_rows))
        for node in samples:
            rows = [rows[i] for i in node.indices(job, len(rows))]
        return rows

    def _sampling_groups(self, output: OutputNode,
                         order: List[Node]) -> Optional[List[OutputNode]]:
        """Partition the output columns by sampling branch (VERDICT r3 #8).

        The reference graph composes stream samplings freely — a Gather
        branch and a full-rate branch can feed different sinks in one graph
        (tests/test_all.py:41,167,183). Each branch has its own row domain,
        so the chunk planner runs one sub-run per branch: this computes,
        per column, which sample-chain tip (or the raw Input) it reads each
        source through, groups identical assignments, and returns one
        OutputNode per group (None when a single group covers everything —
        the common case, zero overhead).

        An op whose inputs mix two different samplings of one source has no
        well-defined zipped row domain — rejected with a clear error.
        """
        # per node: source_id -> frozenset of sample-path tips; a tip is a
        # SampleNode id, or None for a direct (full-rate) read
        sig: Dict[int, Dict[int, frozenset]] = {}
        for n in order:
            if isinstance(n, InputNode):
                sig[n.id] = {n.id: frozenset([None])}
            elif isinstance(n, SampleNode):
                up = n.inputs["input"].node
                if not isinstance(up, (InputNode, SampleNode)):
                    raise NotImplementedError(
                        "sampling an op output is not supported; sample "
                        "the Input and branch after")
                (src_id,) = sig[up.id].keys()
                sig[n.id] = {src_id: frozenset([n.id])}
            else:
                merged: Dict[int, set] = {}
                for e in n.inputs.values():
                    for src_id, tips in sig.get(e.node.id, {}).items():
                        merged.setdefault(src_id, set()).update(tips)
                if isinstance(n, OpNode):
                    for src_id, tips in merged.items():
                        if len(tips) > 1:
                            raise ValueError(
                                f"op '{n.name}' zips two different "
                                "samplings of one Input — the row domains "
                                "differ; sample once and branch after")
                sig[n.id] = {k: frozenset(v) for k, v in merged.items()}

        def col_key(e: NodeOutput):
            return tuple(sorted(
                (src_id, tuple(sorted(-1 if t is None else t for t in tips)))
                for src_id, tips in sig[e.node.id].items()))

        keys = [col_key(e) for e in output.columns]
        if len(set(keys)) <= 1:
            return None
        groups: Dict[Any, List[int]] = {}
        for i, k in enumerate(keys):
            groups.setdefault(k, []).append(i)
        outs = []
        for idxs in groups.values():
            cols = [output.columns[i] for i in idxs]
            streams = []
            for job in range(len(output.streams)):
                sinks = self._job_sinks(output, job)
                if len(sinks) != len(output.columns):
                    raise ValueError(
                        f"job {job}: {len(output.columns)} output "
                        f"column(s) but {len(sinks)} sink stream(s); pass "
                        "one sink per column")
                sel = [sinks[i] for i in idxs]
                streams.append(sel[0] if len(sel) == 1 else tuple(sel))
            names = ([output.col_names[i] for i in idxs]
                     if output.col_names else None)
            outs.append(OutputNode(cols, streams, names))
        return outs

    # ------------------------------------------------------------------ run

    def run(
        self,
        output: OutputNode,
        perf_params: Optional[PerfParams] = None,
        cache_mode: CacheMode = CacheMode.Error,
        show_progress: bool = False,
        job_distribution: str = "static",
        claim_timeout_sec: float = 300.0,
    ):
        perf = perf_params or PerfParams.estimate()
        order = toposort(output)
        sources = [n for n in order if isinstance(n, InputNode)]
        if not sources:
            raise ValueError("graph has no Input")
        # parallel sampling branches -> one sub-run per branch, each with
        # its own row domain (see _sampling_groups)
        groups = self._sampling_groups(output, order)
        if groups is not None:
            for sub in groups:
                self.run(sub, perf_params=perf_params, cache_mode=cache_mode,
                         show_progress=show_progress,
                         job_distribution=job_distribution,
                         claim_timeout_sec=claim_timeout_sec)
            return
        # Compact sink encodings (VERDICT r4 #5): an op that declares a
        # compact storage dtype (OpDef.compact_sink, e.g. OpticalFlow's
        # float16 flow — 4x fewer device->host and sink bytes, <0.1 px
        # error at video scales, upcast on load) gets it by default when
        # its output feeds ONLY sinks. Explicit op params and
        # PerfParams(sink_dtype="float32") both win over the steering.
        if perf.sink_dtype in ("auto", "float16"):
            op_consumed = {
                e.node.id
                for n in order if isinstance(n, OpNode)
                for e in n.inputs.values()
            }
            for node in order:
                if not isinstance(node, OpNode):
                    continue
                pname = getattr(get_op(node.name), "compact_sink", None)
                steered = getattr(node, "_sink_steered", None)
                if (pname and (pname not in node.params or steered == pname)
                        and node.id not in op_consumed
                        and any(e.node is node for e in output.columns)):
                    node.params[pname] = "float16"
                    node._sink_steered = pname  # injected, not user-passed
        elif perf.sink_dtype == "float32":
            # a graph object re-run with steering disabled must shed any
            # param a previous auto run injected (explicit user params
            # were never overwritten, so only the sentinel is removed)
            for node in order:
                pname = getattr(node, "_sink_steered", None)
                if pname:
                    node.params.pop(pname, None)
                    node._sink_steered = None
        else:
            raise ValueError(
                f"sink_dtype must be auto|float32|float16, got "
                f"{perf.sink_dtype!r}")
        # multi-source graphs zip rows across inputs (reference: N-input
        # jobs, e.g. audio + captions in old/test_audio.py:7-29); every
        # input must carry the same number of per-job streams
        if len({len(s.streams) for s in sources}) != 1:
            raise ValueError(
                "all Inputs must have the same number of job streams: "
                + ", ".join(str(len(s.streams)) for s in sources)
            )
        need = self._intervals(order)

        # Multi-chip: shard the frame axis of device segments over the local
        # mesh (pipeline_instances_per_node analog; parallel/sharded.py).
        self._mesh = None
        n_dev = len(jax.devices())
        if n_dev > 1 and perf.pipeline_instances_per_node != 1:
            from ..parallel.sharded import data_mesh

            n = perf.pipeline_instances_per_node
            self._mesh = data_mesh(min(n if n > 1 else n_dev, n_dev))

        # Multi-host job distribution (reference master/worker analog):
        # "static"  — deterministic per-process slices (host_job_slice);
        # "claims"  — elastic storage-backed claims (parallel/workqueue.py).
        n_jobs = len(sources[0].streams)
        claims = None
        if job_distribution == "claims":
            from ..parallel.workqueue import WorkClaims

            run_key = "|".join(
                getattr(s, "name", f"{type(s).__name__}#{i}")
                for i, s in enumerate(
                    x for job_s in output.streams
                    for x in (job_s if isinstance(job_s, (list, tuple))
                              else [job_s])
                )
            )
            claims = WorkClaims(self.client.config.db_path, run_key)
            if cache_mode == CacheMode.Overwrite:
                # committed runs leave their claims in place (they mark the
                # job done for Ignore/Resume); an explicit Overwrite must be
                # able to re-claim, so clear this run's namespace first
                claims.clear()
            jobs = claims.iter_jobs(n_jobs)
        else:
            from ..parallel.sharded import host_job_slice

            jobs = host_job_slice(n_jobs)
        # Job-boundary overlap: job N's decode thread, once it drains its
        # last chunk, pre-opens job N+1's decoders and decodes their first
        # frame (container probe + seek index + first keyframe) — hiding the
        # next job's ramp behind job N's remaining compute + sink drain +
        # commit (ROADMAP #7; reference analog: the engine's io-packet
        # pipeline crossing table boundaries).
        warm_decoders: Dict[Tuple[int, int], Any] = {}

        def warm_job(job: int) -> None:
            for si, src in enumerate(sources):
                ins = src.streams[job]
                if not getattr(ins, "is_video", False) or \
                        (job, si) in warm_decoders:
                    continue
                try:
                    dec = ins.decoder()
                    rows = self._effective_rows(order, src, job, len(ins))
                    if rows:
                        dec.read_frames([rows[0]])
                    warm_decoders[(job, si)] = dec
                except Exception:
                    pass  # warmup is best-effort; the job opens its own

        import os as _os

        overlap = not _os.environ.get("ST_TPU_NO_JOB_OVERLAP")

        def run_one(job: int, nxt: Optional[int] = None) -> None:
            sink_streams = self._job_sinks(output, job)
            committed = all(s.committed() for s in sink_streams)
            if committed:
                if cache_mode == CacheMode.Error:
                    raise RuntimeError(
                        f"job {job}: output stream already committed "
                        "(pass cache_mode=CacheMode.Ignore/Overwrite)"
                    )
                if cache_mode in (CacheMode.Ignore, CacheMode.Resume):
                    return
            # Heartbeat BOTH claims this host holds: the running job and the
            # looked-ahead next job (claimed by the iterator pull below
            # before this job runs — without a refresh its claim would age
            # past claim_timeout_sec during a long job and a live peer would
            # reap it, double-executing the job).
            def _hb(j=job, n=nxt):
                claims.heartbeat(j)
                if n is not None:
                    claims.heartbeat(n)

            self._run_job(output, order, need, sources, job, sink_streams,
                          perf, show_progress,
                          resume=cache_mode == CacheMode.Resume,
                          heartbeat=_hb if claims is not None else None,
                          warm=warm_decoders,
                          on_decode_drained=(lambda n=nxt: warm_job(n))
                          if (nxt is not None and overlap) else None)
            did_work[0] = True

        did_work = [False]  # set by run_one on a real (non-skipped) job

        def check_recycle_budget() -> None:
            # ROADMAP #12 root cause: the relayed PJRT backend retains the
            # host copy of every upload — RSS grows by total ingested bytes
            # and is unreclaimable in-process (docs/PERF_NOTES.md §3). At a
            # job boundary every completed job is committed, so a typed
            # restart request loses nothing; run_recycling (or any caller)
            # re-runs in a fresh process with Ignore/Resume semantics.
            # Guarded on did_work: a fresh worker whose BASELINE RSS already
            # exceeds the budget must still make progress (skipping
            # committed jobs costs nothing and must never trigger a
            # restart loop).
            if not did_work[0]:
                return
            if perf.recycle_rss_mb and _rss_mb() > perf.recycle_rss_mb:
                from ..config import RecycleRequested

                raise RecycleRequested(
                    f"process RSS {_rss_mb():.0f} MB > "
                    f"recycle_rss_mb={perf.recycle_rss_mb:g}; completed "
                    "jobs are committed — re-run in a fresh process with "
                    "CacheMode.Ignore/Resume to continue")

        try:
            it = iter(jobs)
            cur = next(it, None)
            while cur is not None:
                nxt = next(it, None)
                run_one(cur, nxt)
                cur = nxt
                if cur is not None:
                    try:
                        check_recycle_budget()
                    except Exception:
                        # don't strand the looked-ahead claim until it ages
                        # out — the successor process re-claims it instantly
                        if claims is not None:
                            claims.release(cur)
                        raise
        finally:
            for dec in warm_decoders.values():  # unconsumed warmups
                try:
                    dec.close()
                except Exception:
                    pass
            warm_decoders.clear()

        if claims is not None:
            # Elastic completion: a claims-mode run returns only when EVERY
            # job is committed (the reference master waits for all work).
            # A dead host's claims go stale (no heartbeat) — reap them and
            # absorb the jobs, so the run completes without manual
            # intervention (worker-loss reassignment, SURVEY §2j).
            # Committed jobs are never reaped; uncommitted-but-claimed jobs
            # whose holder is alive keep heartbeating, so this host just
            # waits on them (and re-checks for staleness each pass).
            import time as _time

            def _committed(j: int) -> bool:
                return all(s.committed() for s in self._job_sinks(output, j))

            while True:
                if all(_committed(j) for j in range(n_jobs)):
                    break
                claims.reclaim_stale(older_than_sec=claim_timeout_sec,
                                     is_committed=_committed)
                progressed = False
                for job in claims.iter_jobs(n_jobs):
                    run_one(job)
                    progressed = True
                    check_recycle_budget()
                if not progressed:
                    # remaining jobs are claimed by live (heartbeating)
                    # hosts — wait for them to commit or go stale
                    _time.sleep(min(5.0, max(0.5, claim_timeout_sec / 4)))

    def _job_sinks(self, output: OutputNode, job: int):
        s = output.streams[job]
        if isinstance(s, (list, tuple)):
            return list(s)
        return [s]

    def _resume_signature(self, order, output, rows_per, W,
                          in_streams, ingest: str = "auto") -> str:
        """Content hash namespacing CacheMode.Resume shards. Covers the full
        graph topology (per-node input edges by topo position), op params
        (deterministically serialized — array params hashed by bytes, not
        elided by repr), the sinked (node, column) list, the sampled row set
        + chunk size, and the input stream identity (video path + size +
        mtime), so no structurally different run can reuse foreign shards."""
        import hashlib
        import os as _os

        pos = {n.id: i for i, n in enumerate(order)}
        ser = _ser_params

        nodes_sig = []
        for n in order:
            edges = sorted(
                (name, pos[e.node.id], e.index) for name, e in n.inputs.items()
            )
            params = ""
            if isinstance(n, OpNode):
                params = ser(n.params)
            elif isinstance(n, SampleNode):
                params = ser((n.mode, n.per_job))
            nodes_sig.append((type(n).__name__, getattr(n, "name", ""),
                              edges, params))
        sinks_sig = sorted(
            (pos[e.node.id], e.index) for e in output.columns
        )
        idents: List[Any] = []
        for in_stream in in_streams:
            ident: List[Any] = [type(in_stream).__name__,
                                getattr(in_stream, "name", None),
                                len(in_stream)]
            if getattr(in_stream, "is_video", False):
                try:
                    p = in_stream.video_path()
                    st = _os.stat(p)
                    ident += [p, st.st_size, int(st.st_mtime)]
                except (AttributeError, OSError):
                    pass
            idents.append(ident)
        sig_src = repr((rows_per, W, nodes_sig, sinks_sig, idents, ingest))
        return hashlib.sha256(sig_src.encode()).hexdigest()[:12]

    def _run_job(self, output, order, need, sources, job, sink_streams, perf,
                 show_progress, resume: bool = False, heartbeat=None,
                 warm=None, on_decode_drained=None):
        in_streams = [s.streams[job] for s in sources]
        stream_meta = {}
        for ins in in_streams:
            if getattr(ins, "is_video", False):
                m = ins.metadata()
                stream_meta = {"fps": m.fps, "width": m.width,
                               "height": m.height}
                break
        # Axis reservations are METADATA-driven (VERDICT r4 #2): devices
        # are reserved only when some op in this graph DECLARES the axis
        # (OpDef.sp_halo/stages/experts) — a requested axis nothing can
        # consume reserves nothing. The axes place conflicting shardings
        # on the same chips, so combining them (or stacking one on a >1
        # data-parallel mesh) is rejected up front with a clear error
        # instead of an opaque GSPMD failure at trace time (ADVICE r4).
        declared = {"sp": [], "stages": [], "experts": []}
        for n in order:
            if not isinstance(n, OpNode):
                continue
            od = get_op(n.name)
            if od.sp_halo is not None:
                h = od.sp_halo(n.params)
                if h is not None:
                    declared["sp"].append(int(h))
            if od.stages is not None:
                L = int(od.stages(n.params) or 0)
                if L >= 2:
                    declared["stages"].append(L)
            if od.experts is not None:
                E = int(od.experts(n.params) or 0)
                if E > 0:
                    declared["experts"].append(E)
        # PerfParams.estimate() defers packet/axis sizing to here, where
        # the job's frame geometry, stencil halo, and the graph's declared
        # axis capabilities are all known (VERDICT r4 #8)
        if perf.auto:
            frame_bytes = None
            halo = 0
            for src in sources:
                s_lo, s_hi = need[src.id]
                halo = max(halo, s_hi - s_lo)
            if stream_meta.get("width"):
                frame_bytes = stream_meta["width"] * stream_meta["height"] * 3
            perf = perf.resolve(
                frame_bytes, halo,
                n_devices=1 if self._mesh is None
                else int(self._mesh.devices.size),
                rows=int(stream_meta.get("height") or 0),
                declared_stages=tuple(declared["stages"]),
                declared_sp_halos=tuple(declared["sp"]),
                declared_experts=tuple(declared["experts"]),
                total_devices=len(jax.devices()),
            )
        axes_on = {
            "pipeline_stages": perf.pipeline_stages > 1,
            "spatial_shards": perf.spatial_shards > 1,
            "expert_shards": perf.expert_shards > 1,
            "pipeline_instances_per_node":
                self._mesh is not None and self._mesh.devices.size > 1,
        }
        if sum(axes_on.values()) > 1:
            on = [k for k, v in axes_on.items() if v]
            raise ValueError(
                f"PerfParams axes {on} are mutually exclusive: each "
                "reserves the same mesh devices with a different sharding "
                "inside one fused segment. Pick one per run.")
        pipe_devices = None
        if perf.pipeline_stages > 1 and declared["stages"]:
            devs = jax.devices()
            if len(devs) >= perf.pipeline_stages:
                pipe_devices = devs[: perf.pipeline_stages]
        sp_devices = None
        if perf.spatial_shards > 1 and declared["sp"]:
            devs = jax.devices()
            if len(devs) >= perf.spatial_shards:
                sp_devices = devs[: perf.spatial_shards]
        ep_devices = None
        if perf.expert_shards > 1 and declared["experts"]:
            devs = jax.devices()
            if len(devs) >= perf.expert_shards:
                ep_devices = devs[: perf.expert_shards]
        ctx = OpContext(
            job=job,
            stream_meta=stream_meta,
            resources_dir=self.client.config.resources_dir(),
            profiler=self.profiler,
            pipe_devices=pipe_devices,
            sp_devices=sp_devices,
            ep_devices=ep_devices,
        )

        # rows are zipped across inputs (reference N-input jobs): every
        # source must sample down to the same element count
        rows_per = [self._effective_rows(order, src, job, len(ins))
                    for src, ins in zip(sources, in_streams)]
        n_out = len(rows_per[0])
        if any(len(r) != n_out for r in rows_per):
            raise ValueError(
                "multi-input graphs zip rows 1:1; effective row counts "
                f"differ per input: {[len(r) for r in rows_per]}"
            )
        W = perf.work_packet_size

        # Column plumbing -------------------------------------------------
        op_nodes = [n for n in order if isinstance(n, OpNode)]
        ws_nodes = [n for n in op_nodes if get_op(n.name).kind == "whole_stream"]
        ws_ids = {n.id for n in ws_nodes}
        # sink columns: (edge, writer, deferred?). Strict 1:1 — silently
        # mapping excess columns onto the last sink would open two writers
        # on the same stream (interleaved corruption).
        if len(sink_streams) != len(output.columns):
            raise ValueError(
                f"job {job}: {len(output.columns)} output column(s) but "
                f"{len(sink_streams)} sink stream(s); pass one sink per "
                "column (per-job tuples for multi-column outputs)"
            )
        writers = []
        for i, edge in enumerate(output.columns):
            tname = self._column_type(edge)
            writers.append(
                (edge, sink_streams[i].writer(tname), edge.node.id in ws_ids))

        # whole-stream accumulators: node.id -> list of per-chunk host inputs
        ws_acc: Dict[int, List[List[Any]]] = {
            n.id: [[] for _ in n.inputs] for n in ws_nodes
        }
        state: Dict[int, Any] = {}
        jit_cache: Dict[int, Any] = {}

        # Prefetching decode ----------------------------------------------
        all_chunks = list(range(0, n_out, W))
        chunks = all_chunks

        # Chunk-granular resume (CacheMode.Resume; SURVEY §5 shard
        # manifests): requires shard-capable writers and a chunk-local graph
        # (no stateful carry, no whole-stream accumulation).
        stateful = any(get_op(n.name).kind == "stateful" for n in op_nodes)
        shard_mode = (
            resume and not stateful and not ws_nodes
            and all(w.supports_shards for _, w, _ in writers)
        )
        if shard_mode:
            # namespace shards by the run signature so a changed sampling /
            # graph wiring / input video / sinked column / chunk size can
            # never resume from foreign shards
            sig = self._resume_signature(order, output, rows_per, W,
                                         in_streams, perf.ingest)
            for _, w, _ in writers:
                w.shard_key = sig
            done = None
            for _, w, _ in writers:
                shards = w.existing_shards()
                mine = {
                    a for a in all_chunks
                    if shards.get(a) == min(a + W, n_out) - a
                }
                done = mine if done is None else (done & mine)
            done = done or set()
            chunks = [a for a in all_chunks if a not in done]
            if done and show_progress:
                print(f"  job {job}: resuming, {len(done)}/"
                      f"{len(all_chunks)} chunks already done", flush=True)
        elif resume:
            shard_mode = False

        # io_packet_size expresses how far ahead the host may read
        # (reference io packets); realized here as prefetch depth in chunks.
        # The staging ring needs depth+2 slots: `depth` queued + 1 parked in
        # the queue handoff + 1 being decoded. prefetch_depth=0 disables the
        # decode thread entirely (strict single-thread alternation — faster
        # on transports that serialize concurrent device access poorly).
        depth = 0 if perf.prefetch_depth <= 0 else max(
            perf.prefetch_depth,
            perf.io_packet_size // max(perf.work_packet_size, 1))

        # Per-source decode state (multi-source graphs zip N inputs):
        # decoder + staging ring per video input, prefetch-upload decision
        # per input's own consumer set.
        decoders: List[Any] = []
        rings: List[Any] = []
        uploads: List[bool] = []
        yuvs: List[bool] = []
        metas: List[Dict[str, Any]] = []
        import os as _os2

        no_yuv = bool(_os2.environ.get("ST_TPU_NO_YUV"))
        for si_idx, (src, ins) in enumerate(zip(sources, in_streams)):
            decoder = (warm or {}).pop((job, si_idx), None)
            if decoder is None:
                decoder = ins.decoder() if getattr(ins, "is_video", False) \
                    else None
            meta = {}
            if decoder is not None:
                m = ins.metadata()
                meta = {"fps": m.fps, "width": m.width, "height": m.height}

            # Double-buffered host->HBM: when every consumer of this input's
            # frames is a device op, the prefetch thread uploads right after
            # decode, overlapping the previous chunk's compute. Mixed
            # host/device consumers keep frames on the host.
            def _root(n):
                while isinstance(n, SampleNode):
                    n = n.inputs["input"].node
                return n

            frame_node_ids = {src.id} | {
                n.id for n in order
                if isinstance(n, SampleNode) and _root(n) is src
            }
            consumers = [
                n for n in order if isinstance(n, OpNode)
                and any(e.node.id in frame_node_ids for e in n.inputs.values())
            ]
            upload = bool(consumers) and all(
                get_op(n.name).kind == "device"
                or get_op(n.name).device_inputs  # host op driving nested
                for n in consumers               # device programs (pose)
            ) and decoder is not None and not pipe_devices \
                and not sp_devices and not ep_devices
            # (stage-pipelined / row-sharded / expert-sharded segments span
            # a multi-device mesh; frames stay host-side so jit shards them
            # rather than fighting a single-device-committed input)
            # I420 ingest (VERDICT r3 #1): frames headed straight for the
            # device travel as 1.5 B/px YUV planes (half the uplink bytes of
            # RGB24, zero host swscale) with the YUV->RGB conversion fused
            # into the device segment (utils/framechunk.py). Host-consumed
            # frames keep the RGB24 decode — no upload to save, and host
            # ops expect RGB arrays for free.
            can_i420 = getattr(decoder, "i420_supported", False)
            if perf.ingest == "i420" and decoder is not None and not can_i420:
                raise ValueError(
                    "PerfParams(ingest='i420') but the source cannot decode "
                    "to planar I420 (non-4:2:0 pixel format, odd dims, or "
                    "the cv2 fallback decoder)")
            yuv = (upload and not no_yuv and can_i420
                   and perf.ingest in ("auto", "i420"))
            ring = None
            if decoder is not None and meta:
                from ..io.prefetch import ChunkRing

                s_lo, s_hi = need[src.id]
                frame_bytes = meta["height"] * meta["width"] * 3
                if yuv:
                    frame_bytes = meta["height"] * meta["width"] * 3 // 2
                ring = ChunkRing((W + (s_hi - s_lo)) * frame_bytes, depth + 2)
            uploads.append(upload)
            yuvs.append(yuv)
            decoders.append(decoder)
            rings.append(ring)
            metas.append(meta)

        def decode_chunk(a: int):
            b = min(a + W, n_out) - 1
            T = b - a + 1
            vals: Dict[Tuple[int, int], _Value] = {}
            for si, (src, ins) in enumerate(zip(sources, in_streams)):
                s_lo, s_hi = need[src.id]
                rows = rows_per[si]
                positions = [
                    _clamp(p, 0, n_out - 1)
                    for p in range(a + s_lo, b + s_hi + 1)
                ]
                src_rows = [rows[p] for p in positions]
                decoder, ring, meta = decoders[si], rings[si], metas[si]
                yuv = yuvs[si]
                out_buf = None
                if decoder is not None and ring is not None:
                    # slot waits (consumer busy, e.g. compiling) are not
                    # decode time — keep out of source:read
                    with self.profiler.span("source:wait_slot"):
                        slot = ring.acquire()
                    h, w = meta["height"], meta["width"]
                    if yuv:
                        fb = h * w * 3 // 2
                        out_buf = slot[: len(src_rows) * fb].reshape(
                            len(src_rows), fb
                        )
                    else:
                        out_buf = slot[: len(src_rows) * h * w * 3].reshape(
                            len(src_rows), h, w, 3
                        )
                with self.profiler.span("source:read"):
                    if decoder is not None:
                        if yuv:
                            planes = decoder.read_frames_i420(
                                src_rows, out=out_buf)
                            if ring is not None:
                                ring.commit()
                            data = FrameChunk.from_i420(
                                planes, meta["height"], meta["width"],
                                full_range=getattr(
                                    decoder, "i420_full_range", False),
                                bt709=getattr(decoder, "i420_bt709", False))
                        else:
                            frames = decoder.read_frames(
                                src_rows, out=out_buf)
                            if ring is not None:
                                ring.commit()
                            data = FrameChunk.from_hwc(frames)
                        if uploads[si]:
                            with self.profiler.span("source:upload"):
                                data = data.device()
                                jax.block_until_ready(data.flat)
                        vals[(src.id, 0)] = _Value(data, s_lo, s_hi,
                                                   is_device=uploads[si])
                    else:
                        elems = list(ins.load_bytes(src_rows))
                        parse = typeslib.get_type(ins.type_name()).parse
                        vals[(src.id, 0)] = _Value(
                            [parse(e) for e in elems], s_lo, s_hi, False)
            return a, T, vals

        prefetched = _Prefetcher(decode_chunk, chunks, depth=depth,
                                 on_drained=on_decode_drained)
        # sink serialization + IO runs off the critical path: chunk N+1's
        # decode/compute overlaps chunk N's writes (reference save workers)
        sink_worker = _SinkWorker(depth=2 * max(1, len(writers)))

        last_chunk = [-1, 0]
        try:
            for a, T, src_vals in prefetched:
                last_chunk[:] = (a, T)
                values: Dict[Tuple[int, int], _Value] = dict(src_vals)
                self._run_chunk(order, need, values, ctx, T, jit_cache, state,
                                ws_acc, ws_ids)
                # write non-deferred sink columns (async; the _to_host
                # device_get inside stays synchronous — it is also what
                # guarantees device work reading the staging slots is done
                # before ring.release below)
                for edge, writer, deferred in writers:
                    if deferred:
                        continue
                    val = values[(edge.node.id, edge.index)]
                    self._write_column(writer, edge, val, T,
                                       shard_start=a if shard_mode else None,
                                       sink_worker=sink_worker)
                for ring in rings:
                    # all device work for this chunk is synced by the
                    # device_get in sink writes / host-op conversions above,
                    # so the staging slots can be recycled
                    if ring is not None:
                        ring.release()
                if heartbeat is not None:
                    heartbeat()
                if show_progress:
                    print(f"  job {job}: rows {a + T}/{n_out}", flush=True)

            # all async writes must land before deferred writes / commit
            sink_worker.flush()

            # end-of-stream: whole-stream ops then deferred sinks
            ws_out: Dict[Tuple[int, int], List[Any]] = {}
            for node in ws_nodes:
                opdef = get_op(node.name)
                args = [
                    _concat_host(parts) for parts in ws_acc[node.id]
                ]
                with self.profiler.span(f"op:{node.name}"):
                    res = opdef.fn(ctx, *args, **node.params)
                if opdef.n_outputs == 1:
                    ws_out[(node.id, 0)] = list(res)
                else:
                    for k, r in enumerate(res):
                        ws_out[(node.id, k)] = list(r)
            for edge, writer, deferred in writers:
                if not deferred:
                    continue
                tname = self._column_type(edge)
                ser = typeslib.get_type(tname).serialize
                for el in ws_out[(edge.node.id, edge.index)]:
                    writer.append(b"" if el is None else ser(el))

            for _, writer, _ in writers:
                if shard_mode:
                    writer.commit_from_shards(all_chunks)
                else:
                    writer.commit()
        except Exception as e:
            e.add_note(
                f"scannertools_tpu: job {job}, chunk rows "
                f"{last_chunk[0]}..{last_chunk[0] + last_chunk[1] - 1} "
                f"of {n_out}"
            )
            sink_worker.close()  # no write may race the aborts below
            for _, writer, _ in writers:
                writer.abort()
            raise
        finally:
            sink_worker.close()
            # order matters: wake a producer blocked in ring.acquire, join the
            # decode thread, and only then free ring slots / the decoders it
            # may have been writing into
            for ring in rings:
                if ring is not None:
                    ring.cancel()
            prefetched.close()
            for ring in rings:
                if ring is not None:
                    ring.close()
            for decoder in decoders:
                if decoder is not None:
                    decoder.close()
            ctx.close()

    # ----------------------------------------------------------- chunk exec

    def _run_chunk(self, order, need, values, ctx, T, jit_cache, state,
                   ws_acc, ws_ids):
        # who consumes each (node, output)? Segments return ONLY outputs
        # consumed outside themselves — interior intermediates (e.g. raw
        # flow fields feeding FlowHistogram) stay fused inside the XLA
        # program and are never materialized as program outputs (a 15×
        # e2e difference on transports that eagerly fetch jit outputs).
        consumers: Dict[Tuple[int, int], set] = {}
        for node in order:
            for e in node.inputs.values():
                consumers.setdefault((e.node.id, e.index), set()) \
                    .add(node.id)
        # group maximal runs of device ops into fused segments
        i = 0
        n = len(order)
        while i < n:
            node = order[i]
            if isinstance(node, OpNode) and get_op(node.name).kind == "device":
                seg = [node]
                j = i + 1
                # ops forced onto different backends can't share a segment
                while j < n and isinstance(order[j], OpNode) and \
                        get_op(order[j].name).kind == "device" and \
                        order[j].device == node.device:
                    seg.append(order[j])
                    j += 1
                self._run_device_segment(seg, need, values, ctx, T,
                                         jit_cache, consumers)
                i = j
                continue
            self._run_host_node(node, need, values, ctx, T, state, ws_acc,
                                ws_ids)
            i += 1

    def _gather_input(self, values, edge: NodeOutput, want_lo, want_hi, T,
                      device: bool):
        v = values[(edge.node.id, edge.index)]
        data = v.slice_rows(want_lo, want_hi, T)
        if device and isinstance(data, list):
            data = np.stack(data)
        return data

    def _run_device_segment(self, seg: List[OpNode], need, values, ctx, T,
                            jit_cache, consumers):
        # T participates in the key: slice offsets inside the traced function
        # are python ints derived from T, so a shorter tail chunk must retrace.
        key = (tuple(n.id for n in seg), T)
        seg_ids_set = {n.id for n in seg}
        # outputs consumed outside the segment (by later ops, whole-stream
        # accumulators, or the Output node's sink columns)
        out_keys = [
            (n.id, k) for n in seg for k in range(get_op(n.name).n_outputs)
            if any(c not in seg_ids_set
                   for c in consumers.get((n.id, k), ()))
        ]
        if not out_keys:  # degenerate graph: keep everything (safety)
            out_keys = [(n.id, k) for n in seg
                        for k in range(get_op(n.name).n_outputs)]
        forced = seg[0].device  # grouping guarantees uniformity
        cpu_dev = None
        if forced == "cpu":
            try:
                cpu_dev = jax.local_devices(backend="cpu")[0]
            except RuntimeError as e:
                raise RuntimeError(
                    f"op {seg[0].name}: device=DeviceType.CPU requested but "
                    "the JAX CPU backend is unavailable (JAX_PLATFORMS "
                    "excludes 'cpu'; set JAX_PLATFORMS=tpu,cpu or drop the "
                    "device= kwarg)"
                ) from e
        # external inputs of the segment, in deterministic order
        seg_ids = {n.id for n in seg}
        ext: List[Tuple[int, int, int, int]] = []  # (node.id, idx, lo, hi)
        ext_edges: List[NodeOutput] = []
        for node in seg:
            n_lo, n_hi = need[node.id]
            s_lo, s_hi = get_op(node.name).stencil
            for e in node.inputs.values():
                if e.node.id not in seg_ids and \
                        (e.node.id, e.index) not in {(x[0], x[1]) for x in ext}:
                    ev = values[(e.node.id, e.index)]
                    ext.append((e.node.id, e.index, ev.lo, ev.hi))
                    ext_edges.append(e)

        arrays = []
        for e in ext_edges:
            v = values[(e.node.id, e.index)]
            data = v.data
            if isinstance(data, list):
                data = np.stack(data)
            arrays.append(data)  # FrameChunks pass through as pytrees

        # model weights (OpDef.aux) enter as real jit arguments — resolved
        # once per process, replicated over the mesh in sharded runs — so
        # they are never embedded as trace-time constants
        placement = "cpu" if cpu_dev is not None else (
            int(self._mesh.devices.size) if self._mesh is not None else None)
        aux_meta: List[Tuple[int, Any, int, int]] = []
        aux_leaves: List[Any] = []
        for si_, node in enumerate(seg):
            opdef_n = get_op(node.name)
            if opdef_n.aux is None:
                continue
            val = _resolve_aux(opdef_n, node, ctx, placement, self._mesh,
                               cpu_dev)
            leaves, tdef = jax.tree_util.tree_flatten(val)
            aux_meta.append((si_, tdef, len(aux_leaves), len(leaves)))
            aux_leaves.extend(leaves)

        if key not in jit_cache:
            import os as _os

            no_jit = bool(_os.environ.get("ST_TPU_NO_JIT"))
            # structural key: reusable across jobs/runs/Clients (the closure
            # below only reads per-node structure, stencils and params — all
            # captured here — plus ctx, whose traced influence is limited to
            # stream_meta, also in the key)
            pos = {(nid, idx): ("ext", k)
                   for k, (nid, idx, _, _) in enumerate(ext)}
            for si_, node in enumerate(seg):
                for oi in range(get_op(node.name).n_outputs):
                    pos[(node.id, oi)] = ("seg", si_, oi)
            struct = tuple(
                (node.name, _ser_params(node.params), need[node.id],
                 tuple((nm, pos[(e.node.id, e.index)])
                       for nm, e in node.inputs.items()))
                for node in seg
            )
            seg_pos = {n.id: i for i, n in enumerate(seg)}
            skey = (
                struct,
                tuple((lo, hi) for _, _, lo, hi in ext),
                tuple(_aval_key(a) for a in arrays),
                tuple(_aval_key(a) for a in aux_leaves),
                T,
                None if self._mesh is None else int(self._mesh.devices.size),
                None if not ctx.pipe_devices
                else tuple(d.id for d in ctx.pipe_devices),
                None if not ctx.sp_devices
                else tuple(d.id for d in ctx.sp_devices),
                None if not ctx.ep_devices
                else tuple(d.id for d in ctx.ep_devices),
                tuple(sorted(ctx.stream_meta.items())),
                no_jit,
                forced,
                tuple((seg_pos[nid], k) for nid, k in out_keys),
            )
            if skey not in _SEGMENT_JIT_CACHE:
                if len(_SEGMENT_JIT_CACHE) >= 256:  # runaway-shape backstop
                    _SEGMENT_JIT_CACHE.clear()
                seg_nodes = list(seg)
                need_s = dict(need)
                ext_meta = list(ext)
                out_sel = list(out_keys)
                aux_meta_c = list(aux_meta)
                n_ext = len(ext_meta)

                def segment_fn(*all_args):
                    arrays = all_args[:n_ext]
                    auxs = all_args[n_ext:]
                    local: Dict[Tuple[int, int], _Value] = {}
                    for (nid, idx, lo, hi), arr in zip(ext_meta, arrays):
                        local[(nid, idx)] = _Value(arr, lo, hi, True)
                    aux_by_seg = {
                        si_: jax.tree_util.tree_unflatten(
                            tdef, auxs[start:start + cnt])
                        for si_, tdef, start, cnt in aux_meta_c
                    }
                    for si_, node in enumerate(seg_nodes):
                        opdef = get_op(node.name)
                        n_lo, n_hi = need_s[node.id]
                        s_lo, s_hi = opdef.stencil
                        args = []
                        for e in node.inputs.values():
                            v = local[(e.node.id, e.index)]
                            args.append(
                                v.slice_rows(n_lo + s_lo, n_hi + s_hi, T))
                        if si_ in aux_by_seg:
                            res = opdef.fn(ctx, aux_by_seg[si_], *args,
                                           **node.params)
                        else:
                            res = opdef.fn(ctx, *args, **node.params)
                        if opdef.n_outputs == 1:
                            res = (res,)
                        for k, r in enumerate(res):
                            local[(node.id, k)] = _Value(r, n_lo, n_hi, True)
                    # only externally-consumed outputs leave the program;
                    # interior intermediates get DCE'd/fused by XLA
                    return tuple(local[kk].data for kk in out_sel)

                _SEGMENT_JIT_CACHE[skey] = (
                    segment_fn if no_jit else jax.jit(segment_fn))
            jit_cache[key] = (_SEGMENT_JIT_CACHE[skey], list(out_keys))

        fn, stored_keys = jit_cache[key]
        if cpu_dev is not None:
            # commit inputs to the CPU backend; jit follows committed
            # placement. Outputs come back as host numpy so a downstream
            # accelerator segment re-uploads cleanly instead of tripping
            # over committed CPU arrays.
            arrays = [jax.device_put(a, cpu_dev) for a in arrays]
            with self.profiler.span(
                    "device:" + "+".join(n.name for n in seg) + "@cpu"):
                outs = fn(*arrays, *aux_leaves)
                outs = jax.tree_util.tree_map(
                    lambda o: np.asarray(jax.device_get(o)), outs)
            self._store_segment_outputs(stored_keys, need, values, outs)
            return
        if self._mesh is not None:
            # frames sharded over the data axis; GSPMD partitions the whole
            # segment and inserts halo collectives for stencil slices
            from ..parallel.sharded import pad_rows_to_multiple, shard_value
            from ..utils.flags import current_mesh, sharded_mode

            # device_put requires the sharded dim divisible by the mesh, but
            # chunk lengths (tail chunks, stencil halos) rarely are — pad the
            # frame axis by replicating the last row. The executor's slicing
            # is all front-anchored, so padded tail rows are never read;
            # uneven intermediate/output shapes inside jit are GSPMD's job.
            m = int(self._mesh.devices.size)
            arrays = [shard_value(self._mesh, pad_rows_to_multiple(a, m))
                      for a in arrays]
            token = sharded_mode.set(True)
            token_m = current_mesh.set(self._mesh)
            try:
                with self.profiler.span(
                        "device:" + "+".join(n.name for n in seg)):
                    outs = fn(*arrays, *aux_leaves)
            finally:
                sharded_mode.reset(token)
                current_mesh.reset(token_m)
            self._store_segment_outputs(stored_keys, need, values, outs)
            return
        with self.profiler.span("device:" + "+".join(n.name for n in seg)):
            outs = fn(*arrays, *aux_leaves)
        self._store_segment_outputs(stored_keys, need, values, outs)

    def _store_segment_outputs(self, out_keys, need, values, outs):
        for (nid, oi), data in zip(out_keys, outs):
            n_lo, n_hi = need[nid]
            values[(nid, oi)] = _Value(data, n_lo, n_hi, True)

    def _run_host_node(self, node, need, values, ctx, T, state, ws_acc,
                       ws_ids):
        if isinstance(node, InputNode):
            return  # source value injected by the chunk loop
        if isinstance(node, SampleNode):
            e = node.inputs["input"]
            values[(node.id, 0)] = values[(e.node.id, e.index)]
            return
        if isinstance(node, OutputNode):
            return
        assert isinstance(node, OpNode), node
        opdef = get_op(node.name)
        n_lo, n_hi = need[node.id]
        s_lo, s_hi = opdef.stencil

        args = []
        for e in node.inputs.values():
            v = values[(e.node.id, e.index)]
            data = v.slice_rows(n_lo + s_lo, n_hi + s_hi, T)
            if (v.is_device or isinstance(data, FrameChunk)) \
                    and not opdef.device_inputs:
                data = _to_host(data)
            args.append(data)

        if node.id in ws_ids:
            for slot, a in enumerate(args):
                # accumulated values outlive the chunk; frame arrays may be
                # views of recycled decode-ring slots -> deep copy here
                if isinstance(a, np.ndarray):
                    a = a.copy()
                ws_acc[node.id][slot].append(a)
            return

        with self.profiler.span(f"op:{node.name}"):
            if opdef.kind == "stateful":
                st = state.get(node.id)
                if st is None and opdef.init_state is not None:
                    st = opdef.init_state(ctx)
                st, res = opdef.fn(ctx, st, *args, **node.params)
                state[node.id] = st
            else:
                res = opdef.fn(ctx, *args, **node.params)
        if opdef.n_outputs == 1:
            res = (res,)
        for k, r in enumerate(res):
            values[(node.id, k)] = _Value(r, n_lo, n_hi, False)

    # ------------------------------------------------------------- sinks

    def _column_type(self, edge: NodeOutput) -> str:
        node = edge.node
        if isinstance(node, OpNode):
            return get_op(node.name).outputs[edge.index]
        if isinstance(node, (InputNode, SampleNode)):
            src = node
            while isinstance(src, SampleNode):
                src = src.inputs["input"].node
            s = src.streams[0]
            return s.type_name()
        raise ValueError(f"cannot sink from {node}")

    def _write_column(self, writer, edge, val: _Value, T: int,
                      shard_start=None, sink_worker=None):
        data = val.slice_rows(0, 0, T)
        was_host = not val.is_device
        if val.is_device or isinstance(data, FrameChunk):
            data = _to_host(data)
        if was_host and isinstance(data, np.ndarray):
            # host-path frame arrays (incl. host FrameChunks) can be views
            # of recycled decode-ring slots; the async writer outlives the
            # chunk, so detach (device_get results are already fresh)
            data = data.copy()
        elif was_host and isinstance(data, list):
            # same hazard element-wise: a host op may return numpy views
            # into ring slots inside a list column
            data = [el.copy() if isinstance(el, np.ndarray) else el
                    for el in data]
        ser = typeslib.get_type(self._column_type(edge)).serialize

        def emit():
            with self.profiler.span("sink:write"):
                if isinstance(data, list):
                    elements = [b"" if el is None else
                                el if isinstance(el, bytes) else ser(el)
                                for el in data]
                else:
                    elements = [ser(data[t]) for t in range(T)]
                if shard_start is not None:
                    # durable per-chunk shard (CacheMode.Resume checkpoints)
                    writer.append_shard(shard_start, elements)
                else:
                    for el in elements:
                        writer.append(el)

        if sink_worker is not None:
            sink_worker.submit(emit)
        else:
            emit()


def _concat_host(parts: List[Any]):
    if not parts:
        return []
    if isinstance(parts[0], np.ndarray):
        return np.concatenate(parts, axis=0)
    out = []
    for p in parts:
        out.extend(p)
    return out


class _SinkWorker:
    """Serialize + write sink elements off the chunk critical path.

    Reference analog: the engine's save workers — sink IO runs on its own
    thread so kernel threads never block on storage (SURVEY §1 L0). One FIFO
    worker preserves per-writer append order; errors surface on the next
    submit() or at flush() (before commit, so a failed write can never be
    committed). The queue is bounded: a slow disk applies backpressure
    instead of buffering the whole stream in memory.
    """

    def __init__(self, depth: int = 4):
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._err: Optional[BaseException] = None
        self._closed = False
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _work(self):
        while True:
            task = self._q.get()
            try:
                if task is None:
                    return
                if self._err is None:  # after an error, drop (order broken)
                    try:
                        task()
                    except BaseException as e:  # surface via submit/flush
                        self._err = e
            finally:
                self._q.task_done()

    def submit(self, task) -> None:
        if self._err is not None:
            raise self._err
        self._q.put(task)

    def flush(self) -> None:
        """Drain all pending writes; raise any deferred error."""
        self._q.join()
        if self._err is not None:
            raise self._err

    def close(self) -> None:
        """Idempotent; drains pending tasks then joins the worker. Callers
        tearing down after an error must close() before writer.abort() so no
        write races the abort."""
        if self._closed:
            return
        self._closed = True
        self._q.put(None)
        self._thread.join()


class _Prefetcher:
    """Decode-ahead: runs ``fn(chunk_start)`` in a worker thread, keeping up
    to ``depth`` chunks queued (the double-buffered host→HBM overlap of the
    north star; reference analog: io packets decoded ahead of kernel threads)."""

    def __init__(self, fn, starts: Sequence[int], depth: int = 2,
                 on_drained=None):
        self._starts = list(starts)
        self._fn = fn
        self._stop = threading.Event()
        self._thread = None
        # fires once after the LAST chunk is decoded (while compute/sinks
        # still run) — the hook for next-job decoder warmup
        self._on_drained = on_drained
        if depth <= 0:
            # synchronous mode: decode inline on the consumer thread. On
            # hosts where concurrent device access from two threads is
            # slow (single-stream transports), strict alternation wins.
            return
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _drained(self):
        cb, self._on_drained = self._on_drained, None
        if cb is not None:
            try:
                cb()
            except Exception:
                pass  # warmup is best-effort

    def _work(self):
        try:
            for a in self._starts:
                if self._stop.is_set():
                    return
                self._q.put(self._fn(a))
            self._drained()
            self._q.put(None)
        except BaseException as e:  # surface decode errors to the consumer
            self._q.put(e)

    def __iter__(self):
        if self._thread is None:  # synchronous mode
            for a in self._starts:
                if self._stop.is_set():
                    return
                yield self._fn(a)
            self._drained()
            return
        while True:
            item = self._q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def close(self):
        """Stop and JOIN the worker before the caller tears down resources
        the worker writes into (decode ring slots, decoder handles) — without
        the join, an error-path close() can free a slot mid-write
        (use-after-free in st_io.cpp). The drain loop keeps the queue empty
        so a worker blocked in q.put() can finish its final put and see the
        stop flag."""
        self._stop.set()
        if self._thread is None:
            return
        while self._thread.is_alive():
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass
            self._thread.join(timeout=0.05)
