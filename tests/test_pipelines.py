"""Legacy Pipeline API (reference old/prelude.py:219-424 UX:
``compute_histograms(sc, videos=[...])`` with job-level caching)."""

import numpy as np
import pytest


def test_compute_histograms_runner(sc, ingested, video_frames):
    from scannertools_tpu.pipelines import compute_histograms
    from scannertools_tpu.ops.histogram import histogram_reference_np

    outs = compute_histograms(sc, videos=[ingested],
                              frames=[list(range(0, 40, 5))])
    assert len(outs) == 1
    got = list(outs[0].load())
    assert len(got) == 8
    want = histogram_reference_np(video_frames[0:40:5])
    assert (np.stack(got[0]) == want[0]).all()
    # job-level cache: second run skips committed output (old/prelude.py:241)
    outs2 = compute_histograms(sc, videos=[ingested],
                               frames=[list(range(0, 40, 5))])
    assert outs2[0].committed()


def test_brightness_pipeline_runner(sc, ingested):
    from scannertools_tpu.pipelines import compute_brightness

    outs = compute_brightness(sc, videos=[ingested], frames=[[0, 1, 2]])
    vals = list(outs[0].load())
    assert len(vals) == 3
    assert all(0 <= float(v[0]) <= 255 for v in vals)


def test_shot_detection_pipeline_runner(sc, ingested, test_video):
    from scannertools_tpu.pipelines import detect_shots

    outs = detect_shots(sc, videos=[ingested])
    found = next(outs[0].load(rows=[0]))
    assert found == test_video["cuts"]


@pytest.mark.slow
def test_flow_histogram_and_drawflow_composition(sc, texture_video):
    """Flow consumers compose: OpticalFlow -> FlowHistogram + DrawFlow
    (old/histograms.py:49-81, vis.py:8-12)."""
    import scannertools_tpu as st

    video = st.NamedVideoStream(sc, "texc", path=texture_video["path"])
    frame = sc.io.Input([video])
    g = sc.streams.Range(frame, [(0, 8)])
    flow = sc.ops.OpticalFlow(frames=g)
    fh = sc.ops.FlowHistogram(flow=flow)
    draw = sc.ops.DrawFlow(frame=g, flow=flow)
    o1, o2 = st.NamedStream(sc, "fh"), st.NamedStream(sc, "df")
    pp = st.PerfParams.manual(work_packet_size=8)
    sc.run(sc.io.Output(fh, [o1]), pp, cache_mode=st.CacheMode.Overwrite)
    sc.run(sc.io.Output(draw, [o2]), pp, cache_mode=st.CacheMode.Overwrite)
    h = next(o1.load())
    assert h.shape == (2, 64)
    w = texture_video["w"]
    d = next(o2.load())
    assert d.shape[1] == 2 * w  # frame hstacked with the flow panel


def test_hsv_histogram_runner(sc, ingested):
    from scannertools_tpu.pipelines import compute_hsv_histograms

    outs = compute_hsv_histograms(sc, videos=[ingested], frames=[[0, 1]])
    got = list(outs[0].load())
    assert len(got) == 2 and len(got[0]) == 3


def test_block_graph_api(sc, ingested, test_video):
    """Block/BlockGraph wiring (reference old/pipeline.py:12-211): blocks
    resolve inputs by output name, toposort themselves, run through sinks."""
    import pytest

    import scannertools_tpu as st
    from scannertools_tpu.pipelines import (Block, BlockGraph,
                                            FrameSourceBlock, HistogramBlock,
                                            ShotBoundariesBlock)

    g = BlockGraph(sc)
    g.add(ShotBoundariesBlock())  # added out of order: toposort must fix
    g.add(FrameSourceBlock(ingested))
    g.add(HistogramBlock())
    out = st.NamedStream(sc, "block_shots")
    g.run(sinks={"boundaries": out},
          perf_params=st.PerfParams.manual(work_packet_size=64))
    assert next(out.load(rows=[0])) == test_video["cuts"]

    # unsatisfiable inputs -> clear error
    g2 = BlockGraph(sc)
    g2.add(HistogramBlock())
    with pytest.raises(ValueError, match="unsatisfiable"):
        g2.wire()

    # sink name that no block produced -> clear error
    g3 = BlockGraph(sc)
    g3.add(FrameSourceBlock(ingested))
    with pytest.raises(KeyError, match="no block produced"):
        g3.run(sinks={"nope": out})
