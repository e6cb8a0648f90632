"""Fixed-capacity truncation semantics under object overflow (VERDICT r3
weak #4 / next #7): when a frame carries more objects than a detector's
static output capacity, the pipeline must truncate SCORE-ORDERED — the
contract the reference's fixed shapes imply (object_detection.py:47 reads
exactly 100 rows; maskrcnn-benchmark TEST.DETECTIONS_PER_IMG=100).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _grid_boxes(n, span=1000.0, size=4.0):
    """n well-separated small boxes (no NMS interaction)."""
    g = int(np.ceil(np.sqrt(n)))
    step = span / g
    assert step > 2 * size
    out = []
    for i in range(n):
        y, x = divmod(i, g)
        cx, cy = (x + 0.5) * step, (y + 0.5) * step
        out.append((cx - size, cy - size, cx + size, cy + size))
    return np.asarray(out, np.float32)


@pytest.mark.slow
def test_ssd_truncates_score_ordered_past_100():
    """150 separated objects -> exactly NUM_OUT rows = the global top-100
    scores, descending (models/ssd.py _postprocess_explicit)."""
    from scannertools_tpu.models import ssd

    n = 150
    rng = np.random.default_rng(0)
    boxes = _grid_boxes(n, span=1.0, size=0.002)  # normalized coords
    scores = rng.uniform(0.3, 0.99, n).astype(np.float32)
    labels = rng.integers(1, 90, n).astype(np.int32)
    ob, os_, ol = jax.jit(ssd._postprocess_explicit, static_argnums=3)(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels), 0.6)
    ob, os_, ol = np.asarray(ob), np.asarray(os_), np.asarray(ol)
    assert ob.shape == (ssd.NUM_OUT, 4)
    # descending scores, and exactly the global top-100
    assert (np.diff(os_) <= 1e-7).all()
    want = np.sort(scores)[::-1][:ssd.NUM_OUT]
    np.testing.assert_allclose(os_, want, rtol=1e-6)
    # every emitted box is one of the inputs, paired with its own score
    order = np.argsort(-scores)[:ssd.NUM_OUT]
    np.testing.assert_allclose(ob, boxes[order], atol=1e-5)
    np.testing.assert_array_equal(ol, labels[order])


@pytest.mark.slow
def test_maskrcnn_truncates_score_ordered_past_max_det():
    """2x max_det separated detections -> exactly the top max_det by
    score (models/maskrcnn.py select_detections)."""
    from scannertools_tpu.models import maskrcnn as mr

    max_det = 32
    n = 2 * max_det
    rng = np.random.default_rng(1)
    boxes = _grid_boxes(n)
    scores = rng.uniform(0.2, 0.95, n).astype(np.float32)
    labels = rng.integers(1, mr.NUM_CLASSES, n).astype(np.int32)
    fb, fs, fl = jax.jit(mr.select_detections, static_argnums=(4,))(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        2000.0, max_det)
    fb, fs, fl = np.asarray(fb), np.asarray(fs), np.asarray(fl)
    assert fb.shape == (max_det, 4)
    assert (np.diff(fs) <= 1e-7).all()
    order = np.argsort(-scores)[:max_det]
    np.testing.assert_allclose(fs, scores[order], rtol=1e-6)
    np.testing.assert_allclose(fb, boxes[order], atol=1e-4)
    np.testing.assert_array_equal(fl, labels[order])


def test_maskrcnn_per_class_nms_and_threshold():
    """select_detections must NMS within a class but never across classes,
    and drop sub-SCORE_THRESH rows."""
    from scannertools_tpu.models import maskrcnn as mr

    # two overlapping boxes, same class -> one survives; same geometry in
    # a different class -> unaffected; one sub-threshold row -> dropped
    boxes = np.asarray([
        [10, 10, 50, 50],
        [12, 12, 52, 52],   # IoU ~0.8 with row 0, same class
        [11, 11, 51, 51],   # same spot, different class
        [200, 200, 240, 240],
    ], np.float32)
    scores = np.asarray([0.9, 0.8, 0.7, 0.04], np.float32)
    labels = np.asarray([3, 3, 5, 7], np.int32)
    fb, fs, fl = mr.select_detections(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        1000.0, 4)
    fs, fl = np.asarray(fs), np.asarray(fl)
    kept = fs > 0
    assert kept.sum() == 2
    np.testing.assert_allclose(fs[:2], [0.9, 0.7], rtol=1e-6)
    np.testing.assert_array_equal(fl[:2], [3, 5])
