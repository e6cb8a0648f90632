"""Postgres adapter over the pure-python wire driver (storage/pgwire.py),
tested against an in-process v3 wire-protocol server emulator backed by
sqlite — the same framing and SCRAM-SHA-256 exchange a real server runs.

Reference parity: scannertools_sql is postgres-only (pqxx, sql.cpp:6-20)
and its tests run against a live server (tests/test_all.py:171-294); the
emulator plays that role in this zero-egress image. The SQLStorage flows
exercised here mirror tests/test_sql.py's sqlite versions 1:1.
"""

import base64
import hashlib
import hmac
import os
import socket
import sqlite3
import struct
import threading

import pytest

from scannertools_tpu.storage.pgwire import PgError, connect, quote_literal
from scannertools_tpu.storage.sql import (SQLConfig, SQLInputStream,
                                          SQLOutputStream, SQLQuery,
                                          SQLStorage)

USER, PASSWORD = "scanner", "hunter2"


# ------------------------------------------------------------- emulator

def _msg(tag, payload):
    return tag + struct.pack("!I", len(payload) + 4) + payload


class _PgEmulator:
    """Speaks enough of the v3 protocol for the driver: SCRAM-SHA-256
    auth (server side, real verification) + simple queries via sqlite."""

    def __init__(self):
        self._db = sqlite3.connect(":memory:", check_same_thread=False)
        self._lock = threading.Lock()
        self._bufs = {}
        self._srv = socket.create_server(("127.0.0.1", 0))
        self.port = self._srv.getsockname()[1]
        self.auth_failures = 0
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def _accept_loop(self):
        while True:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,),
                             daemon=True).start()

    def close(self):
        self._srv.close()

    # ---- framing helpers (buffered: recv can return more than asked)
    def _read_exact(self, c, n):
        buf = self._bufs.setdefault(c, b"")
        while len(buf) < n:
            chunk = c.recv(65536)
            if not chunk:
                raise ConnectionError
            buf += chunk
        out, self._bufs[c] = buf[:n], buf[n:]
        return out

    def _read_msg(self, c):
        tag = self._read_exact(c, 1)
        (ln,) = struct.unpack("!I", self._read_exact(c, 4))
        return tag, self._read_exact(c, ln - 4)

    # ---- SCRAM server side
    def _scram(self, c):
        tag, payload = self._read_msg(c)
        assert tag == b"p"
        mech_end = payload.index(b"\x00")
        assert payload[:mech_end] == b"SCRAM-SHA-256"
        (n,) = struct.unpack("!I", payload[mech_end + 1:mech_end + 5])
        client_first = payload[mech_end + 5:mech_end + 5 + n].decode()
        bare = client_first.split(",", 2)[2]
        cnonce = dict(p.split("=", 1) for p in bare.split(","))["r"]

        salt = os.urandom(16)
        iters = 4096
        snonce = cnonce + base64.b64encode(os.urandom(9)).decode()
        server_first = (f"r={snonce},s={base64.b64encode(salt).decode()},"
                        f"i={iters}")
        c.sendall(_msg(b"R", struct.pack("!I", 11) + server_first.encode()))

        tag, payload = self._read_msg(c)
        assert tag == b"p"
        client_final = payload.decode()
        parts = dict(p.split("=", 1) for p in client_final.split(","))
        without_proof = client_final.rsplit(",p=", 1)[0]
        auth_msg = ",".join([bare, server_first, without_proof])

        salted = hashlib.pbkdf2_hmac("sha256", PASSWORD.encode(), salt,
                                     iters)
        client_key = hmac.new(salted, b"Client Key", hashlib.sha256).digest()
        stored = hashlib.sha256(client_key).digest()
        sig = hmac.new(stored, auth_msg.encode(), hashlib.sha256).digest()
        want = bytes(a ^ b for a, b in zip(client_key, sig))
        if base64.b64decode(parts["p"]) != want:
            self.auth_failures += 1
            c.sendall(_msg(b"E", b"SFATAL\x00M" +
                           b"password authentication failed\x00\x00"))
            raise ConnectionError("bad password")
        server_key = hmac.new(salted, b"Server Key", hashlib.sha256).digest()
        v = hmac.new(server_key, auth_msg.encode(), hashlib.sha256).digest()
        final = b"v=" + base64.b64encode(v)
        c.sendall(_msg(b"R", struct.pack("!I", 12) + final))

    def _serve(self, c):
        try:
            (ln,) = struct.unpack("!I", self._read_exact(c, 4))
            self._read_exact(c, ln - 4)  # startup params
            c.sendall(_msg(b"R", struct.pack("!I", 10) +
                           b"SCRAM-SHA-256\x00\x00"))
            self._scram(c)
            c.sendall(_msg(b"R", struct.pack("!I", 0)))
            c.sendall(_msg(b"S", b"server_version\x00emulated-16\x00"))
            c.sendall(_msg(b"Z", b"I"))
            while True:
                tag, payload = self._read_msg(c)
                if tag == b"X":
                    return
                if tag != b"Q":
                    continue
                sql = payload.rstrip(b"\x00").decode()
                self._run_query(c, sql)
        except ConnectionError:
            pass
        finally:
            c.close()

    def _run_query(self, c, sql):
        # real postgres answers COMMIT/ROLLBACK outside a transaction with
        # a WARNING, not an error; the emulator autocommits per statement
        if sql.strip().upper() in ("COMMIT", "ROLLBACK", "BEGIN"):
            c.sendall(_msg(b"C", sql.strip().upper().encode() + b"\x00"))
            c.sendall(_msg(b"Z", b"I"))
            return
        try:
            with self._lock:
                cur = self._db.execute(sql)
                rows = cur.fetchall() if cur.description else []
                desc = cur.description
                self._db.commit()
        except sqlite3.Error as e:
            c.sendall(_msg(b"E", b"SERROR\x00M" + str(e).encode() +
                           b"\x00\x00"))
            c.sendall(_msg(b"Z", b"I"))
            return
        if desc:
            oids = []
            cols = b""
            for j, d in enumerate(desc):
                sample = next((r[j] for r in rows if r[j] is not None), None)
                oid = (20 if isinstance(sample, int) else
                       701 if isinstance(sample, float) else
                       17 if isinstance(sample, bytes) else 25)
                oids.append(oid)
                cols += d[0].encode() + b"\x00" + struct.pack(
                    "!IHIhih", 0, 0, oid, -1, -1, 0)
            c.sendall(_msg(b"T", struct.pack("!H", len(desc)) + cols))
            for r in rows:
                body = struct.pack("!H", len(r))
                for j, v in enumerate(r):
                    if v is None:
                        body += struct.pack("!i", -1)
                    else:
                        if isinstance(v, bytes):
                            t = b"\\x" + v.hex().encode()
                        elif isinstance(v, bool):
                            t = b"t" if v else b"f"
                        else:
                            t = str(v).encode()
                        body += struct.pack("!i", len(t)) + t
                c.sendall(_msg(b"D", body))
        n = len(rows) if desc else self._db.total_changes
        c.sendall(_msg(b"C", f"OK {n}".encode() + b"\x00"))
        c.sendall(_msg(b"Z", b"I"))


@pytest.fixture(scope="module")
def pg():
    srv = _PgEmulator()
    yield srv
    srv.close()


# ------------------------------------------------------------ driver

def test_scram_handshake_and_query(pg):
    conn = connect("127.0.0.1", pg.port, USER, PASSWORD, "db")
    cur = conn.cursor()
    cur.execute("SELECT 1 + 1 AS two, 'x' AS s, NULL AS n")
    assert cur.description[0][0] == "two"
    assert cur.fetchone() == (2, "x", None)
    conn.close()


def test_bad_password_rejected(pg):
    with pytest.raises(PgError):
        connect("127.0.0.1", pg.port, USER, "wrong", "db")
    assert pg.auth_failures >= 1


def test_parameter_binding(pg):
    conn = connect("127.0.0.1", pg.port, USER, PASSWORD, "db")
    cur = conn.cursor()
    cur.execute("CREATE TABLE IF NOT EXISTS t (a, b)")
    cur.execute("INSERT INTO t VALUES (%s, %s)", ("it's", 3.5))
    cur.execute("SELECT a, b FROM t WHERE a = %s", ("it's",))
    assert cur.fetchall() == [("it's", 3.5)]
    conn.close()


def test_error_surfaces_and_connection_survives(pg):
    conn = connect("127.0.0.1", pg.port, USER, PASSWORD, "db")
    cur = conn.cursor()
    with pytest.raises(PgError):
        cur.execute("SELECT * FROM nonexistent_table")
    cur.execute("SELECT 7")
    assert cur.fetchone() == (7,)
    conn.close()


def test_quote_literal():
    assert quote_literal(None) == "NULL"
    assert quote_literal(5) == "5"
    assert quote_literal(True) == "TRUE"
    assert quote_literal("a'b") == "'a''b'"
    assert quote_literal("a\\b") == " E'a\\\\b'"
    assert quote_literal(b"\x01\x02") == r"'\x0102'"


# --------------------------------------------- SQLStorage on postgres

def _storage(pg, job_table=None):
    cfg = SQLConfig(adapter="postgres", hostaddr="127.0.0.1", port=pg.port,
                    user=USER, password=PASSWORD, dbname="db")
    return SQLStorage(cfg, job_table=job_table)


def test_sql_streams_on_postgres(pg):
    """The reference test flow (scannertools_sql/tests/test_all.py:214-294):
    grouped input elements, update-by-id output, job-completion table."""
    st = _storage(pg, job_table="jobs")
    conn = st.connection()
    cur = conn.cursor()
    cur.execute("CREATE TABLE IF NOT EXISTS vid (id INTEGER, grp INTEGER, "
                "a INTEGER, b INTEGER)")
    cur.execute("CREATE TABLE IF NOT EXISTS jobs (name TEXT)")
    cur.execute("DELETE FROM vid")
    for i in range(6):
        cur.execute("INSERT INTO vid VALUES (%s, %s, %s, %s)",
                    (i, i // 2, i * 10, 0))
    conn.commit()

    q = SQLQuery(fields="vid.id as id, vid.a as a", table="vid",
                 id="vid.id", group="vid.grp")
    ins = SQLInputStream(q, filter="1=1", storage=st)
    assert len(ins) == 3  # one element per distinct group
    import json

    elements = [json.loads(b.decode()) for b in ins.load_bytes()]
    assert [len(e) for e in elements] == [2, 2, 2]
    assert elements[0][0]["a"] == 0 and elements[1][0]["a"] == 20

    out = SQLOutputStream("vid", storage=st, job_name="job-pg",
                          insert=False)
    assert not out.committed()
    w = out.writer("bytes")
    for e in elements:
        rows = [{"id": r["id"], "b": r["a"] + 1} for r in e]
        w.append(json.dumps(rows).encode())
    w.commit()
    assert out.committed()  # job recorded in the jobs table
    cur.execute("SELECT b FROM vid ORDER BY id")
    assert [r[0] for r in cur.fetchall()] == [1, 11, 21, 31, 41, 51]


def test_bind_outside_quotes_only():
    """%s binding must not disturb literal braces (postgres array/JSON
    literals), %s inside quoted strings, or dollar-quoted blocks — the
    failure modes of str.format-based substitution."""
    from scannertools_tpu.storage.pgwire import _bind

    assert _bind("INSERT INTO t VALUES ('{1,2}', %s)", [3]) == \
        "INSERT INTO t VALUES ('{1,2}', 3)"
    assert _bind("SELECT 'a%sb', %s", ["x'y"]) == "SELECT 'a%sb', 'x''y'"
    assert _bind("SELECT $$100%s$$, %s", [1]) == "SELECT $$100%s$$, 1"
    assert _bind('SELECT "col%s", %s', [2]) == 'SELECT "col%s", 2'


def test_bind_handles_comments_and_quoted_identifiers():
    """Comments are opaque: an apostrophe inside a -- or /* */ comment must
    not desynchronize the quote scanner, and %s inside comments stays
    literal. Doubled quotes inside identifiers ("a""b") must not close the
    identifier early."""
    from scannertools_tpu.storage.pgwire import _bind

    assert _bind("SELECT %s -- don't bind %s here\n, %s", [1, 2]) == \
        "SELECT 1 -- don't bind %s here\n, 2"
    assert _bind("SELECT %s /* isn't /* nested %s */ ok */, %s", [1, 2]) == \
        "SELECT 1 /* isn't /* nested %s */ ok */, 2"
    assert _bind('SELECT "a""b%s", %s', [7]) == 'SELECT "a""b%s", 7'
    # trailing line comment without newline
    assert _bind("SELECT %s -- tail", [5]) == "SELECT 5 -- tail"


def test_quote_literal_nonfinite_floats():
    assert quote_literal(float("nan")) == "'NaN'::float8"
    assert quote_literal(float("inf")) == "'Infinity'::float8"
    assert quote_literal(float("-inf")) == "'-Infinity'::float8"
