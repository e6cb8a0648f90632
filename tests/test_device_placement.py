"""Per-op device forcing (device=DeviceType.CPU) — the reference's
DeviceTestBench analog (tests/test_all.py:141-147): the same op body runs
on the CPU backend and the default backend and must agree exactly.
"""

import numpy as np
import pytest

import scannertools_tpu as st
from scannertools_tpu.config import DeviceType


def _run_hist(sc, ingested, name, device=None):
    frame = sc.io.Input([ingested])
    sampled = sc.streams.Range(frame, [(0, 48)])
    kwargs = {"frame": sampled}
    if device is not None:
        kwargs["device"] = device
    hist = sc.ops.Histogram(**kwargs)
    out = st.NamedStream(sc, name)
    sc.run(sc.io.Output(hist, [out]),
           st.PerfParams.manual(work_packet_size=16),
           cache_mode=st.CacheMode.Overwrite)
    return [np.stack(h) for h in out.load()]


def test_cpu_forcing_matches_default(sc, ingested):
    default = _run_hist(sc, ingested, "dev_hist_default")
    forced = _run_hist(sc, ingested, "dev_hist_cpu", device=DeviceType.CPU)
    assert len(default) == len(forced) == 48
    for a, b in zip(default, forced):
        np.testing.assert_array_equal(a, b)


def test_gpu_alias_accepted(sc, ingested):
    """Reference pipelines pass device=DeviceType.GPU; it maps to the
    default accelerator (no error, same results)."""
    rows = _run_hist(sc, ingested, "dev_hist_gpu", device=DeviceType.GPU)
    assert len(rows) == 48


def test_mixed_device_graph_splits_segments(sc, ingested):
    """A CPU-forced op between default-device ops still composes: segments
    split at the device boundary and results flow through."""
    frame = sc.io.Input([ingested])
    sampled = sc.streams.Range(frame, [(0, 8)])
    blurred = sc.ops.Blur(frame=sampled, kernel_size=3, sigma=0.5,
                          device=DeviceType.CPU)
    hist = sc.ops.Histogram(frame=blurred)
    out = st.NamedStream(sc, "dev_mixed")
    sc.run(sc.io.Output(hist, [out]),
           st.PerfParams.manual(work_packet_size=8),
           cache_mode=st.CacheMode.Overwrite)
    rows = list(out.load())
    assert len(rows) == 8


@pytest.mark.slow
def test_nn_forward_with_aux_on_cpu(sc, ingested):
    """device=DeviceType.CPU on a composite NN op: the aux weights follow
    the segment onto the CPU backend (executor._resolve_aux placement) and
    results match the accelerator run."""
    import numpy as np

    import scannertools_tpu as st

    frame = sc.io.Input([ingested])
    g = sc.streams.Gather(frame, [[0]])
    res = {}
    for tag, kwargs in (("dev", {}), ("cpu", {"device": st.DeviceType.CPU})):
        faces = sc.ops.MTCNNDetectFaces(frame=g, **kwargs)
        out = st.NamedStream(sc, f"nncpu_{tag}")
        sc.run(sc.io.Output(faces, [out]),
               st.PerfParams.manual(work_packet_size=1),
               cache_mode=st.CacheMode.Overwrite)
        res[tag] = [(b.x1, b.y1, b.x2, b.y2, b.score)
                    for b in next(out.load())]
    assert len(res["dev"]) == len(res["cpu"])
    for a, b in zip(res["dev"], res["cpu"]):
        np.testing.assert_allclose(a, b, atol=5e-3)  # backend fp drift


def test_aux_default_placement_device_put_once():
    """Default (single-device) placement must move aux weights to the
    device ONCE at resolve time: an npz-loaded numpy pytree passed raw
    into the jitted segment re-uploads the whole checkpoint every chunk."""
    import types

    import jax
    import numpy as np

    from scannertools_tpu.runtime import executor as ex

    calls = []

    def aux(ctx, params):
        calls.append(1)
        return {"w": np.ones((4, 4), np.float32)}

    opdef = types.SimpleNamespace(name="_test_aux_default_op", aux=aux)
    node = types.SimpleNamespace(params={})
    v1 = ex._resolve_aux(opdef, node, None, None)
    v2 = ex._resolve_aux(opdef, node, None, None)
    assert len(calls) == 1, "aux loader must run once per process"
    assert isinstance(v1["w"], jax.Array), type(v1["w"])
    assert v1 is v2, "resolved aux must be cached per placement"
