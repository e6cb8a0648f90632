"""Executor/runtime features: multi-job runs, multi-column sinks, stride
sampling, python-op stencils, profiler traces (reference analogs: multi-job
Jobs in old/prelude.py, FasterRCNNOutput's two output columns, Stride
streams, stencil=[-1,0] python ops, profiler().write_trace)."""

import json
import os

import numpy as np
import pytest


def test_two_jobs_one_graph(sc, test_video, texture_video):
    """One graph, two input videos -> two committed output streams."""
    import scannertools_tpu as st

    v1 = st.NamedVideoStream(sc, "j1", path=test_video["path"])
    v2 = st.NamedVideoStream(sc, "j2", path=texture_video["path"])
    frame = sc.io.Input([v1, v2])
    g = sc.streams.Range(frame, [(0, 10), (0, 6)])  # per-job sampling
    hist = sc.ops.Histogram(frame=g)
    o1, o2 = st.NamedStream(sc, "j1_h"), st.NamedStream(sc, "j2_h")
    sc.run(sc.io.Output(hist, [o1, o2]),
           st.PerfParams.manual(work_packet_size=8),
           cache_mode=st.CacheMode.Overwrite)
    assert len(o1) == 10 and len(o2) == 6
    assert o1.committed() and o2.committed()


def test_multi_column_output(sc):
    """An op with two outputs sinks to two streams per job
    (FasterRCNNOutput-style)."""
    import scannertools_tpu as st

    @st.register_python_op(name="SplitEvenOdd", outputs=("object", "object"))
    def split_even_odd(ctx, elements):
        evens = [e * 2 for e in elements]
        odds = [e * 2 + 1 for e in elements]
        return evens, odds

    ins = st.PythonStream([0, 1, 2, 3])
    node = sc.ops.SplitEvenOdd(elements=sc.io.Input([ins]))
    oe, oo = st.NamedStream(sc, "evens"), st.NamedStream(sc, "odds")
    sc.run(sc.io.Output([node[0], node[1]], [(oe, oo)]),
           st.PerfParams.estimate(), cache_mode=st.CacheMode.Overwrite)
    assert list(oe.load()) == [0, 2, 4, 6]
    assert list(oo.load()) == [1, 3, 5, 7]


def test_stride_sampling(sc, ingested, video_frames):
    import scannertools_tpu as st
    from scannertools_tpu.ops.histogram import histogram_reference_np

    frame = sc.io.Input([ingested])
    strided = sc.streams.Stride(frame, [25])
    hist = sc.ops.Histogram(frame=strided)
    out = st.NamedStream(sc, "stride_h")
    sc.run(sc.io.Output(hist, [out]), st.PerfParams.estimate(),
           cache_mode=st.CacheMode.Overwrite)
    idx = list(range(0, 240, 25))
    assert len(out) == len(idx)
    got = list(out.load())
    want = histogram_reference_np(video_frames[idx])
    assert (np.stack(got[2]) == want[2]).all()

    srange = sc.streams.StridedRange(frame, [(10, 100, 30)])
    out2 = st.NamedStream(sc, "srange_h")
    sc.run(sc.io.Output(sc.ops.Histogram(frame=srange), [out2]),
           st.PerfParams.estimate(), cache_mode=st.CacheMode.Overwrite)
    assert len(out2) == len(range(10, 100, 30))


def test_python_op_with_stencil(sc):
    """register_python_op(stencil=[-1, 0]) — host op sees 1-frame halo."""
    import scannertools_tpu as st

    @st.register_python_op(name="HostDiff", stencil=[-1, 0],
                           outputs=("object",))
    def host_diff(ctx, elements):
        # elements has T+1 entries (leading halo); emit T diffs
        return [elements[i + 1] - elements[i]
                for i in range(len(elements) - 1)]

    ins = st.PythonStream([1, 4, 9, 16, 25, 36])
    node = sc.ops.HostDiff(elements=sc.io.Input([ins]))
    out = st.NamedStream(sc, "diffs")
    sc.run(sc.io.Output(node, [out]), st.PerfParams.manual(work_packet_size=2),
           cache_mode=st.CacheMode.Overwrite)
    # row 0 clamps to itself -> 0, then first differences
    assert list(out.load()) == [0, 3, 5, 7, 9, 11]


def test_profiler_trace_export(sc, ingested, tmp_path):
    import scannertools_tpu as st

    frame = sc.io.Input([ingested])
    g = sc.streams.Gather(frame, [[0, 1, 2]])
    out = st.NamedStream(sc, "ptrace")
    sc.run(sc.io.Output(sc.ops.Histogram(frame=g), [out]),
           st.PerfParams.estimate(), cache_mode=st.CacheMode.Overwrite)
    trace = str(tmp_path / "trace.json")
    sc.table("ptrace").profiler().write_trace(trace)
    events = json.load(open(trace))["traceEvents"]
    names = {e["name"] for e in events}
    assert "source:read" in names
    assert any(n.startswith("device:Histogram") for n in names)
    assert "profiler totals" in sc.summarize()


def test_sink_worker_error_surfaces_before_commit(sc, ingested, tmp_path):
    """Errors raised inside the async sink writer (serialization/IO off
    the critical path) must fail the run — never silently commit. A
    FilesStream with fewer paths than rows throws mid-write."""
    import pytest

    import scannertools_tpu as st
    from scannertools_tpu.storage.files import FilesStream

    frame = sc.io.Input([ingested])
    g = sc.streams.Range(frame, [(0, 32)])
    hist = sc.ops.Histogram(frame=g)
    short = FilesStream([str(tmp_path / f"h{i}.bin") for i in range(8)])
    with pytest.raises(IndexError, match="more elements than paths"):
        sc.run(sc.io.Output(hist, [short]),
               st.PerfParams.manual(work_packet_size=8),
               cache_mode=st.CacheMode.Overwrite)


def test_parallel_sampling_branches(sc, ingested):
    """A Gather branch and a full-rate branch on ONE Input feeding
    different sinks in one graph (the reference composes stream samplings
    freely, tests/test_all.py:41,167,183; VERDICT r3 #8). Each branch gets
    its own row domain via per-branch sub-runs."""
    import numpy as np

    import scannertools_tpu as st

    frame = sc.io.Input([ingested])
    pick = [3, 9, 17]
    g = sc.streams.Gather(frame, [pick])
    h_all = sc.ops.Histogram(frame=frame)
    h_some = sc.ops.Histogram(frame=g)
    o_all = st.NamedStream(sc, "branch_all")
    o_some = st.NamedStream(sc, "branch_some")
    sc.run(sc.io.Output([h_all, h_some], [(o_all, o_some)]),
           st.PerfParams.manual(work_packet_size=8),
           cache_mode=st.CacheMode.Overwrite)
    alla = list(o_all.load())
    some = list(o_some.load())
    assert len(alla) == len(ingested)
    assert len(some) == len(pick)
    for j, i in enumerate(pick):
        np.testing.assert_array_equal(some[j], alla[i])


def test_zipping_two_samplings_rejected(sc, ingested):
    """An op whose inputs mix two different samplings of one Input has no
    well-defined zipped row domain — must raise, not silently misalign."""
    import pytest as _pytest

    import scannertools_tpu as st

    frame = sc.io.Input([ingested])
    g1 = sc.streams.Gather(frame, [[0, 1, 2]])
    g2 = sc.streams.Gather(frame, [[3, 4, 5]])
    d = sc.ops.FrameDifference(frame=g1, other=g2)
    out = st.NamedStream(sc, "zip_reject")
    with _pytest.raises(ValueError, match="two different samplings"):
        sc.run(sc.io.Output(d, [out]),
               st.PerfParams.manual(work_packet_size=4),
               cache_mode=st.CacheMode.Overwrite)
