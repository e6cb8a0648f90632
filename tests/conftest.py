"""Test fixtures.

Reference parity: scannertools_infra's shared pytest fixtures (tests.py:17-80)
— a throwaway db, an in-process client, and a real short video. The reference
downloads short_video.mp4 from GCS; this environment has no egress, so we
synthesize an mp4 with a known shot structure (ground truth cuts) and known
content, which makes goldens *exact* instead of magic constants.

Tests force the JAX CPU backend with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; bench.py uses the real chip).
"""

import os

# Default to CPU when no accelerator plugin is configured. Under the axon
# TPU tunnel JAX_PLATFORMS is already set to "axon" and tests run on the
# real chip (which exercises the production backend — pallas kernels
# included). Multi-chip sharding is validated by test_parallel.py in a
# subprocess with 8 virtual CPU devices.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Persistent XLA compile cache: repeated suite runs skip the (slow) compiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def test_video(tmp_path_factory):
    """Synthetic mp4: 240 frames, 96x64, 24fps, shots cut at known frames.

    Each shot has a distinct dominant color and slow in-shot motion, so
    histogram diffs spike exactly at cuts.
    """
    import cv2

    path = str(tmp_path_factory.mktemp("video") / "short_video.mp4")
    cuts = [60, 120, 180]  # ground-truth shot boundaries
    shot_colors = [(200, 40, 40), (40, 200, 40), (40, 40, 200), (200, 200, 40)]
    n, h, w = 240, 64, 96
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (w, h))
    assert writer.isOpened()
    shot = 0
    for i in range(n):
        if shot < len(cuts) and i >= cuts[shot]:
            shot += 1
        r, g, b = shot_colors[shot]
        frame = np.zeros((h, w, 3), np.uint8)
        frame[:, :] = (b, g, r)  # cv2 wants BGR
        # slow in-shot motion: a moving bar
        x = (i * 2) % w
        frame[:, x : min(x + 8, w)] = (255, 255, 255)
        writer.write(frame)
    writer.release()
    return {"path": path, "cuts": cuts, "n": n, "h": h, "w": w}


@pytest.fixture(scope="session")
def video_frames(test_video):
    """All decoded RGB frames of the test video (golden source of truth)."""
    import cv2

    cap = cv2.VideoCapture(test_video["path"])
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f[:, :, ::-1].copy())
    cap.release()
    assert len(frames) == test_video["n"]
    return np.stack(frames)


@pytest.fixture(scope="session")
def texture_video(tmp_path_factory):
    """48 frames of smoothed random texture translating +1 px/frame in x —
    dense texture everywhere, so optical flow is well-defined (the color-bar
    video is degenerate for flow: flat background has no gradient)."""
    import cv2

    path = str(tmp_path_factory.mktemp("video") / "texture.mp4")
    rng = np.random.default_rng(11)
    h, w, n = 64, 96, 48
    big = cv2.GaussianBlur(
        rng.integers(0, 256, (h, w + n + 8, 3), np.uint8).astype(np.float32),
        (0, 0), 2.0,
    )
    big = ((big - big.min()) / (big.max() - big.min() + 1e-6) * 255) \
        .astype(np.uint8)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (w, h))
    assert writer.isOpened()
    for i in range(n):
        writer.write(big[:, i : i + w])
    writer.release()
    return {"path": path, "n": n, "h": h, "w": w, "dx_per_frame": 1.0}


@pytest.fixture()
def sc(tmp_path):
    import scannertools_tpu as st

    return st.Client(db_path=str(tmp_path / "db"))


@pytest.fixture()
def ingested(sc, test_video):
    import scannertools_tpu as st

    return st.NamedVideoStream(sc, "test1", path=test_video["path"])
