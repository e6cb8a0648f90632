"""scannertools_tpu — a TPU-native video-analysis framework.

A ground-up rebuild of the capabilities of scanner-research/scannertools
(reference at /root/reference): pipeline graphs over sampled video streams,
a standard library of per-frame ops (histogram, shot detection, optical flow,
face/object/pose detection, tracking, imgproc), and pluggable storage —
executed as jitted JAX/XLA/Pallas programs on TPU instead of the reference's
Scanner-engine C++/CUDA kernels. See SURVEY.md for the blueprint.

Quick start (mirrors the reference's scannerpy API, tests/test_all.py:150-159):

    import scannertools_tpu as st
    sc = st.Client()
    video = st.NamedVideoStream(sc, 'test1', path='video.mp4')
    frame = sc.io.Input([video])
    hist = sc.ops.Histogram(frame=frame)
    out = st.NamedStream(sc, 'test1_hist')
    sc.run(sc.io.Output(hist, [out]), st.PerfParams.estimate(),
           cache_mode=st.CacheMode.Overwrite)
    histograms = list(out.load())
"""

from . import protobufs, types
from .config import (CacheMode, Config, DeviceType, PerfParams,
                     RecycleRequested)
from .client import Client
from .registry import register_op, register_python_op
from .runtime.context import Kernel
from .storage import (AudioStorage, AudioStream, CaptionStorage,
                      CaptionStream, FilesStorage, FilesStream, NamedStream,
                      NamedVideoStream, PackedFileStorage, PackedFileStream,
                      PythonStorage, PythonStream)

# Populate the op registry.
from . import ops as _ops  # noqa: F401

FrameType = "frame"  # type tag for python-op signatures (scannerpy.FrameType)

__version__ = "0.1.0"

__all__ = [
    "AudioStorage", "AudioStream", "CacheMode", "CaptionStorage",
    "CaptionStream", "Client", "Config", "DeviceType", "FilesStorage",
    "FilesStream", "FrameType", "Kernel", "NamedStream", "NamedVideoStream",
    "PackedFileStorage", "PackedFileStream", "PerfParams", "PythonStorage",
    "PythonStream", "RecycleRequested", "protobufs", "register_op",
    "register_python_op", "types",
]
