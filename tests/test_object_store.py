"""Remote Files backends (gcs/s3) against an in-process HTTP object store.

Reference parity: files_source.cpp:122-165 — every source/sink accepts
(storage_type, bucket, region, endpoint) and reads/writes through
storehouse's gcs/s3 backends. Zero-egress here, so the server is local;
the S3 handler also checks the request is properly SigV4-signed (header
shape + correct payload hash), which is what a real endpoint enforces.
"""

import hashlib
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from scannertools_tpu.storage.files import FilesStorage, FilesStream
from scannertools_tpu.storage.object_store import (GCSClient, ObjectStoreError,
                                                   S3Client)

_STORE = {}
_ERRORS = []

_SIG_RE = re.compile(
    r"AWS4-HMAC-SHA256 Credential=\w+/\d{8}/[\w-]+/s3/aws4_request, "
    r"SignedHeaders=[\w;-]+, Signature=[0-9a-f]{64}")


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def _body(self):
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n) if n else b""

    def _check_sigv4(self, body):
        auth = self.headers.get("Authorization", "")
        if not _SIG_RE.match(auth):
            _ERRORS.append(f"bad Authorization: {auth!r}")
        if self.headers.get("x-amz-content-sha256") != \
                hashlib.sha256(body).hexdigest():
            _ERRORS.append("payload hash mismatch")
        if not self.headers.get("x-amz-date"):
            _ERRORS.append("missing x-amz-date")

    def _gcs_key(self):
        # /storage/v1/b/<bucket>/o/<urlencoded key>[?alt=media]
        import urllib.parse

        path = self.path.split("?")[0]
        m = re.match(r"/storage/v1/b/([^/]+)/o/(.+)", path)
        if m:
            return m.group(1) + "/" + urllib.parse.unquote(m.group(2))
        return None

    def do_PUT(self):  # s3
        body = self._body()
        self._check_sigv4(body)
        _STORE[self.path.lstrip("/")] = body
        self.send_response(200)
        self.end_headers()

    def do_POST(self):  # gcs upload
        import urllib.parse

        q = urllib.parse.parse_qs(self.path.split("?", 1)[1])
        m = re.match(r"/upload/storage/v1/b/([^/]+)/o", self.path)
        if self.headers.get("Authorization") != "Bearer test-token":
            _ERRORS.append("gcs: missing bearer token")
        _STORE[m.group(1) + "/" + q["name"][0]] = self._body()
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"{}")

    def do_GET(self):
        key = self._gcs_key()
        if key is None:  # s3 path-style
            self._check_sigv4(b"")
            key = self.path.lstrip("/")
        if key in _STORE:
            data = _STORE[key] if "alt=media" in self.path or \
                self._gcs_key() is None else b"{}"
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
        else:
            self.send_response(404)
            self.end_headers()

    def do_HEAD(self):
        self._check_sigv4(b"")
        self.send_response(200 if self.path.lstrip("/") in _STORE else 404)
        self.end_headers()

    def do_DELETE(self):
        key = self._gcs_key() or self.path.lstrip("/")
        _STORE.pop(key, None)
        self.send_response(204)
        self.end_headers()


@pytest.fixture(scope="module")
def server():
    _STORE.clear()
    _ERRORS.clear()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_s3_roundtrip_signed(server):
    c = S3Client("bkt", region="us-east-1", endpoint=server,
                 access_key="AKID", secret_key="SECRET")
    c.put("videos/a.bin", b"payload-1")
    assert c.get("videos/a.bin") == b"payload-1"
    assert c.exists("videos/a.bin")
    assert not c.exists("videos/missing.bin")
    c.delete("videos/a.bin")
    assert not c.exists("videos/a.bin")
    assert _ERRORS == []


def test_s3_get_missing_raises(server):
    c = S3Client("bkt", endpoint=server, access_key="A", secret_key="S")
    with pytest.raises(ObjectStoreError):
        c.get("nope")


def test_gcs_roundtrip(server):
    c = GCSClient("gbkt", endpoint=server, token="test-token")
    c.put("x/y.bin", b"gcs-data")
    assert c.get("x/y.bin") == b"gcs-data"
    assert c.exists("x/y.bin")
    c.delete("x/y.bin")
    assert not c.exists("x/y.bin")
    assert _ERRORS == []


def test_files_stream_on_s3(server):
    """FilesStream/Writer with storage_type='s3' — the reference's remote
    Files source/sink pattern (same kwargs, files_source.cpp:149-165)."""
    storage = FilesStorage(storage_type="s3", bucket="bkt",
                           region="us-east-1", endpoint=server)
    stream = FilesStream(["out/0.bin", "out/1.bin"], storage=storage)
    # stream paths are object keys; the client addresses them under the
    # bucket — write two elements, read them back
    w = stream.writer("bytes")
    w.append(b"elem-0")
    w.append(b"elem-1")
    w.commit()
    assert stream.committed()
    assert list(stream.load_bytes()) == [b"elem-0", b"elem-1"]
    stream.delete()
    assert not stream.exists()


def test_posix_unchanged(tmp_path):
    p = [str(tmp_path / "a"), str(tmp_path / "b")]
    s = FilesStream(p)
    w = s.writer("bytes")
    w.append(b"x")
    w.append(b"y")
    assert s.committed() and list(s.load_bytes()) == [b"x", b"y"]


def test_unknown_storage_type():
    with pytest.raises(ValueError):
        FilesStorage(storage_type="ftp")
