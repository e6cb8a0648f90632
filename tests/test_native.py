"""Native C++ IO runtime (runtime/native/st_io.cpp via ctypes)."""

import numpy as np
import pytest


def _lib():
    from scannertools_tpu.utils import native

    lib = native.load("st_io")
    if lib is None:
        pytest.skip("no g++ toolchain available")
    return lib


def test_native_packed_reader_matches_python(tmp_path):
    _lib()
    from scannertools_tpu.storage.packed_format import (PackedReader,
                                                        write_packed)

    path = str(tmp_path / "x.pack")
    elems = [b"alpha", b"", b"b" * 10000, bytes(range(256))]
    write_packed(path, elems)
    r = PackedReader(path)
    assert r._native is not None, "native reader should engage"
    assert len(r) == 4
    assert list(r.read()) == elems
    assert list(r.read([3, 1])) == [elems[3], b""]


def test_native_ring_spsc():
    _lib()
    from scannertools_tpu.io.prefetch import ChunkRing

    ring = ChunkRing(slot_bytes=64, nslots=3)
    assert ring.native
    # fill all 3 slots
    for i in range(3):
        slot = ring.acquire()
        slot[:] = i
        ring.commit()
    with pytest.raises(TimeoutError):
        ring.acquire(timeout=0.05)  # full
    # consume in order
    ring.release()
    s = ring.acquire()  # now one slot free again
    s[:] = 99
    ring.commit()
    ring.close()


def test_pipeline_uses_ring(sc, ingested, video_frames):
    """End-to-end equality with ring staging active (decode -> histogram)."""
    import scannertools_tpu as st
    from scannertools_tpu.ops.histogram import histogram_reference_np

    frame = sc.io.Input([ingested])
    g = sc.streams.Range(frame, [(0, 40)])
    hist = sc.ops.Histogram(frame=g)
    out = st.NamedStream(sc, "ring_hist")
    sc.run(sc.io.Output(hist, [out]),
           st.PerfParams.manual(work_packet_size=16, prefetch_depth=2),
           cache_mode=st.CacheMode.Overwrite)
    got = np.stack([np.stack(h) for h in out.load()])
    want = histogram_reference_np(video_frames[:40])
    assert (got == want).all()
