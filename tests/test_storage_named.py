"""Named-stream storage + packed container tests
(reference analog: storage roundtrips in tests/test_all.py:64-137)."""

import os

import numpy as np
import pytest


def test_packed_roundtrip(tmp_path):
    from scannertools_tpu.storage.packed_format import (PackedAppender,
                                                        PackedReader,
                                                        write_packed)

    path = str(tmp_path / "x.pack")
    elems = [b"hello", b"", b"worlds" * 100, b"\x00\x01"]
    write_packed(path, elems)
    r = PackedReader(path)
    assert len(r) == 4
    assert list(r.read()) == elems
    assert list(r.read([2, 0])) == [elems[2], elems[0]]

    # streaming appender
    path2 = str(tmp_path / "y.pack")
    a = PackedAppender(path2)
    for e in elems:
        a.append(e)
    a.commit()
    assert list(PackedReader(path2).read()) == elems


def test_packed_format_is_reference_compatible(tmp_path):
    """Header layout: u64 n, u64 sizes[n], payloads
    (packed_file_source.cpp:104-119)."""
    import struct

    from scannertools_tpu.storage.packed_format import write_packed

    path = str(tmp_path / "x.pack")
    write_packed(path, [b"ab", b"cdef"])
    raw = open(path, "rb").read()
    n, s0, s1 = struct.unpack("<3Q", raw[:24])
    assert (n, s0, s1) == (2, 2, 4)
    assert raw[24:] == b"abcdef"


def test_named_stream_roundtrip(sc):
    import scannertools_tpu as st

    s = st.NamedStream(sc, "t")
    assert not s.exists() and not s.committed()
    w = s.writer("bytes")
    w.append(b"a")
    w.append(b"bb")
    assert not s.committed()  # not until commit
    w.commit()
    assert s.committed() and len(s) == 2
    assert list(s.load()) == [b"a", b"bb"]


def test_named_video_ingest(sc, test_video):
    import scannertools_tpu as st

    v = st.NamedVideoStream(sc, "vid", path=test_video["path"])
    assert v.committed()
    assert len(v) == test_video["n"]
    m = v.metadata()
    assert (m.width, m.height) == (test_video["w"], test_video["h"])
    frames = list(v.load_frames(rows=[0, 5, 100]))
    assert len(frames) == 3
    assert frames[0].shape == (test_video["h"], test_video["w"], 3)


def test_seek_plan_runs():
    from scannertools_tpu.io.video import _runs

    assert _runs([0, 1, 2]) == [[0, 1, 2]]
    assert _runs([0, 100, 101]) == [[0], [100, 101]]
    assert _runs([5, 10, 200, 210, 600]) == [[5, 10], [200, 210], [600]]


def test_ingest_videos_copy_mode(sc, test_video, tmp_path):
    """sc.ingest_videos with inplace=False copies the container into the db
    (reference ingest inplace semantics, infra/tests.py:66-80)."""
    import os

    import scannertools_tpu as st

    (v,) = sc.ingest_videos([("copied", test_video["path"])], inplace=False)
    assert v.committed() and len(v) == test_video["n"]
    assert os.path.dirname(v.video_path()).endswith("copied")
    # original path no longer needed: delete nothing, just verify db copy
    assert os.path.isfile(v.video_path())

    (v2,) = sc.ingest_videos([("linked", test_video["path"])], inplace=True)
    assert v2.video_path() == os.path.abspath(test_video["path"])
