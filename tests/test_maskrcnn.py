"""Mask R-CNN mechanics (reference maskrcnn_detection.py:27-330 contract)."""

import numpy as np


def test_maskrcnn_forward_shapes():
    import jax
    import jax.numpy as jnp

    from scannertools_tpu.models import maskrcnn as mr

    model = mr.MaskRCNNModel(jax.random.PRNGKey(0))
    fn = jax.jit(lambda v, x: model.infer(v, mr.preprocess(x)))
    frames = np.random.default_rng(0).integers(
        0, 255, (1, 48, 64, 3)).astype(np.float32)
    b, s, l, m = fn(model.variables, jnp.asarray(frames))
    assert np.asarray(b).shape == (1, mr.MAX_DET, 4)
    assert np.asarray(m).shape == (1, mr.MAX_DET, 28, 28)
    assert np.isfinite(np.asarray(b)).all()
    # boxes live inside the input square
    bb = np.asarray(b)
    assert (bb >= 0).all() and (bb <= mr.INPUT_SIZE).all()


def test_maskrcnn_op_contract(sc, ingested):
    import scannertools_tpu as st

    frame = sc.io.Input([ingested])
    g = sc.streams.Gather(frame, [[0]])
    dets = sc.ops.MaskRCNNDetectObjects(frame=g, confidence_threshold=0.0)
    out = st.NamedStream(sc, "mrcnn")
    sc.run(sc.io.Output(dets, [out]), st.PerfParams.manual(work_packet_size=1),
           cache_mode=st.CacheMode.Overwrite)
    got = next(out.load())
    assert isinstance(got, list)
    for d in got:
        assert set(d) == {"bbox", "mask"}
        assert d["mask"].shape == (64 // 4, 96 // 4)
        assert 0.0 <= d["bbox"].x1 <= 1.0
