"""PerfParams.estimate() — a real estimator, not fixed defaults.

Reference parity: the engine's PerfParams.estimate() sized io/work packets
from stream statistics (SURVEY §1 L0 knobs; tests/test_all.py:45). Here the
executor resolves deferred params per job from frame geometry + stencil
halo + mesh size.
"""

import numpy as np

from scannertools_tpu.config import PerfParams


def test_resolution_drives_chunking():
    p = PerfParams.estimate()
    w480 = p.resolve(640 * 480 * 3).work_packet_size
    w1080 = p.resolve(1920 * 1080 * 3).work_packet_size
    assert w480 > w1080 >= 8
    assert w480 % 8 == 0 and w1080 % 8 == 0
    # roughly constant byte budget
    assert abs(w480 * 640 * 480 - w1080 * 1920 * 1080) / (w480 * 640 * 480) < 0.5


def test_halo_and_mesh_respected():
    p = PerfParams.estimate()
    base = p.resolve(640 * 480 * 3, halo=0).work_packet_size
    with_halo = p.resolve(640 * 480 * 3, halo=32).work_packet_size
    assert with_halo <= base
    sharded = p.resolve(640 * 480 * 3, n_devices=8)
    assert sharded.work_packet_size % 64 == 0  # multiple of 8*8


def test_overrides_stay_fixed():
    p = PerfParams.estimate(work_packet_size=32)
    r = p.resolve(1920 * 1080 * 3)
    assert r.work_packet_size == 32
    assert r.io_packet_size >= 32


def test_manual_passthrough():
    p = PerfParams.manual(work_packet_size=10, io_packet_size=5)
    assert p.resolve(10**9) is p  # manual params never re-resolved
    assert p.io_packet_size == 10  # clamped up to work size


def test_estimate_runs_end_to_end(sc, ingested):
    import scannertools_tpu as st

    frame = sc.io.Input([ingested])
    hist = sc.ops.Histogram(frame=frame)
    out = st.NamedStream(sc, "est_hist")
    sc.run(sc.io.Output(hist, [out]), st.PerfParams.estimate(),
           cache_mode=st.CacheMode.Overwrite)
    rows = list(out.load())
    assert len(rows) == 240


def test_axis_estimator_pipeline_stages():
    """VERDICT r4 #8: resolve() sizes the parallel axes from the graph's
    declared OpDef metadata instead of passing requests through blindly."""
    p = PerfParams.estimate(pipeline_stages=-1)
    # auto-pick: longest declared chain, if devices suffice
    r = p.resolve(100, declared_stages=(5,), total_devices=8)
    assert r.pipeline_stages == 5
    # not enough devices -> declined
    assert p.resolve(100, declared_stages=(5,),
                     total_devices=4).pipeline_stages == 0
    # nothing declares a chain -> declined
    assert p.resolve(100, total_devices=8).pipeline_stages == 0
    # explicit request smaller than every declared chain can't engage
    q = PerfParams.estimate(pipeline_stages=3)
    assert q.resolve(100, declared_stages=(5,),
                     total_devices=8).pipeline_stages == 0
    # explicit request >= a declared chain is accepted
    assert q.resolve(100, declared_stages=(3,),
                     total_devices=8).pipeline_stages == 3


def test_axis_estimator_spatial_shards():
    p = PerfParams.estimate(spatial_shards=-1)
    # auto-pick: largest device count dividing the rows w/ shard >= halo
    r = p.resolve(100, rows=480, declared_sp_halos=(2,), total_devices=8)
    assert r.spatial_shards == 8
    # rows that don't divide 8 or 7... 6 divides 450
    assert p.resolve(100, rows=450, declared_sp_halos=(1,),
                     total_devices=8).spatial_shards == 6
    # no op declares row-shardability -> declined
    assert p.resolve(100, rows=480, total_devices=8).spatial_shards == 0
    # explicit request with non-dividing rows -> declined
    q = PerfParams.estimate(spatial_shards=7)
    assert q.resolve(100, rows=480, declared_sp_halos=(2,),
                     total_devices=8).spatial_shards == 0
    # explicit request that fits -> accepted
    q = PerfParams.estimate(spatial_shards=4)
    assert q.resolve(100, rows=480, declared_sp_halos=(2,),
                     total_devices=8).spatial_shards == 4
    # shard smaller than the halo -> declined (8 rows / 4 < halo 3)
    assert q.resolve(100, rows=8, declared_sp_halos=(3,),
                     total_devices=8).spatial_shards == 0


def test_axis_estimator_expert_shards():
    p = PerfParams.estimate(expert_shards=-1)
    # auto-pick: largest device count dividing a declared expert count
    assert p.resolve(100, declared_experts=(16,),
                     total_devices=8).expert_shards == 8
    assert p.resolve(100, declared_experts=(6,),
                     total_devices=8).expert_shards == 6
    # nothing declares experts -> declined
    assert p.resolve(100, total_devices=8).expert_shards == 0
    # explicit request not dividing any declared count -> declined
    q = PerfParams.estimate(expert_shards=5)
    assert q.resolve(100, declared_experts=(16,),
                     total_devices=8).expert_shards == 0
    # explicit divisor -> accepted
    q = PerfParams.estimate(expert_shards=4)
    assert q.resolve(100, declared_experts=(16,),
                     total_devices=8).expert_shards == 4


def test_axes_mutually_exclusive(sc, ingested):
    """ADVICE r4: combining two parallel axes would place conflicting
    meshes on the same chips inside one fused segment — rejected with a
    clear error instead of an opaque GSPMD failure."""
    import pytest

    import scannertools_tpu as st

    frame = sc.io.Input([ingested])
    hist = sc.ops.Histogram(frame=frame)
    out = st.NamedStream(sc, "axes_conflict")
    with pytest.raises(ValueError, match="mutually exclusive"):
        sc.run(sc.io.Output(hist, [out]),
               st.PerfParams.manual(work_packet_size=32, pipeline_stages=5,
                                    spatial_shards=4),
               cache_mode=st.CacheMode.Overwrite)
