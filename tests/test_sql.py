"""SQL storage tests mirroring the reference's postgres suite
(scannertools_sql/tests/test_all.py:50-134: AddOne update-by-id, AddAll
group aggregation, inserts, job-completion table) on sqlite."""

import json

import pytest


@pytest.fixture()
def sql_env(sc, tmp_path):
    import sqlite3

    from scannertools_tpu.storage.sql import SQLConfig, SQLStorage

    db = str(tmp_path / "t.db")
    conn = sqlite3.connect(db)
    cur = conn.cursor()
    cur.execute("CREATE TABLE test (id integer PRIMARY KEY, a integer, "
                "b integer, grp integer)")
    for i, (a, grp) in enumerate([(10, 0), (20, 0), (30, 1)], start=1):
        cur.execute("INSERT INTO test (id, a, b, grp) VALUES (?, ?, 0, ?)",
                    (i, a, grp))
    cur.execute("CREATE TABLE jobs (id integer PRIMARY KEY, name text)")
    cur.execute("CREATE TABLE test2 (id integer PRIMARY KEY, b integer, "
                "s text)")
    conn.commit()
    storage = SQLStorage(SQLConfig(adapter="sqlite", dbname=db),
                         job_table="jobs")
    yield sc, storage, conn
    conn.close()


def test_sql_update_by_id(sql_env):
    import scannertools_tpu as st
    from scannertools_tpu.storage.sql import (SQLInputStream,
                                              SQLOutputStream, SQLQuery)

    sc, storage, conn = sql_env

    @st.register_python_op(name="AddOne", outputs=("bytes",))
    def add_one(ctx, rows):
        out = []
        for row in rows:
            r = json.loads(bytes(row).decode())
            out.append(json.dumps(
                [{"id": x["id"], "b": x["a"] + 1} for x in r]
            ).encode())
        return out

    stream = SQLInputStream(
        query=SQLQuery(fields="test.id as id, test.a as a", table="test",
                       id="test.id", group="test.id"),
        filter="1=1", storage=storage)
    assert len(stream) == 3
    node = sc.ops.AddOne(rows=sc.io.Input([stream]))
    out = SQLOutputStream(table="test", storage=storage, job_name="foobar",
                          insert=False)
    sc.run(sc.io.Output(node, [out]), st.PerfParams.estimate(),
           cache_mode=st.CacheMode.Overwrite)

    assert [r[0] for r in conn.execute("SELECT b FROM test ORDER BY id")] \
        == [11, 21, 31]
    assert conn.execute("SELECT name FROM jobs").fetchone()[0] == "foobar"
    assert out.committed()


def test_sql_group_aggregation(sql_env):
    """One element per DISTINCT group; op sees all group rows at once."""
    import scannertools_tpu as st
    from scannertools_tpu.storage.sql import (SQLInputStream,
                                              SQLOutputStream, SQLQuery)

    sc, storage, conn = sql_env

    @st.register_python_op(name="AddAll", outputs=("bytes",))
    def add_all(ctx, rows):
        out = []
        for row in rows:
            r = json.loads(bytes(row).decode())
            total = sum(x["a"] for x in r)
            out.append(json.dumps(
                [{"id": x["id"], "b": total} for x in r]
            ).encode())
        return out

    stream = SQLInputStream(
        query=SQLQuery(fields="test.id as id, test.a as a", table="test",
                       id="test.id", group="test.grp"),
        filter="1=1", storage=storage)
    assert len(stream) == 2  # two distinct grp values
    node = sc.ops.AddAll(rows=sc.io.Input([stream]))
    out = SQLOutputStream(table="test", storage=storage, job_name="agg",
                          insert=False)
    sc.run(sc.io.Output(node, [out]), st.PerfParams.estimate(),
           cache_mode=st.CacheMode.Overwrite)
    assert [r[0] for r in conn.execute("SELECT b FROM test ORDER BY id")] \
        == [30, 30, 30]


def test_sql_insert(sql_env):
    import scannertools_tpu as st
    from scannertools_tpu.storage.sql import (SQLInputStream,
                                              SQLOutputStream, SQLQuery)

    sc, storage, conn = sql_env

    @st.register_python_op(name="SQLInsertTest", outputs=("bytes",))
    def sql_insert(ctx, rows):
        out = []
        for row in rows:
            r = json.loads(bytes(row).decode())
            out.append(json.dumps(
                [{"s": "hello world", "b": x["a"] + 1} for x in r]
            ).encode())
        return out

    stream = SQLInputStream(
        query=SQLQuery(fields="test.id as id, test.a as a", table="test",
                       id="test.id", group="test.grp"),
        filter="1=1", storage=storage)
    node = sc.ops.SQLInsertTest(rows=sc.io.Input([stream]))
    out = SQLOutputStream(table="test2", storage=storage, job_name="ins",
                          insert=True)
    sc.run(sc.io.Output(node, [out]), st.PerfParams.estimate(),
           cache_mode=st.CacheMode.Overwrite)
    assert conn.execute("SELECT s FROM test2").fetchone()[0] == "hello world"
    assert conn.execute("SELECT COUNT(*) FROM test2").fetchone()[0] == 3
