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
