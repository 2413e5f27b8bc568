"""Catalog lifecycle: per-doc index upsert (O15/O16), cascade delete
(O25/O32), id assignment (O31), introspection (O26)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from vector_database_spark.operators.catalog import (
    assign_ids,
    delete_documents,
    index_documents,
    index_hierarchy,
    index_stats,
    load_index,
)
from vector_database_spark.sources.generators import random_uniform


def _text_table(spark, n_docs=3, per_doc=40):
    return (
        random_uniform(spark, n_docs * per_doc, 4, seed=5)
        .withColumn("doc_id", F.col("id") % n_docs)
        .withColumnRenamed("id", "text_id")
    )


def test_index_documents_roundtrip_and_partition_swap(spark):
    txt = _text_table(spark)
    path = tempfile.mkdtemp() + "/text_index"
    index_documents(txt, path, local_threshold=16)
    idx = load_index(spark, path)
    assert idx.select("doc_id").distinct().count() == 3
    leaves = idx.where(F.col("text_id").isNotNull())
    assert leaves.count() == txt.count()

    # Re-index only doc 1 — docs 0/2 partitions must be untouched.
    before_0 = idx.where(F.col("doc_id") == 0).count()
    index_documents(txt, path, doc_ids=[1], local_threshold=16)
    idx2 = load_index(spark, path)
    assert idx2.where(F.col("doc_id") == 0).count() == before_0
    assert idx2.select("doc_id").distinct().count() == 3


def test_delete_documents_cascade(spark):
    txt = _text_table(spark)
    path = tempfile.mkdtemp() + "/text_index"
    index_documents(txt, path, local_threshold=16)
    out = delete_documents(spark, path, [2], table_dfs={"text": txt})
    idx = load_index(spark, path)
    assert idx.where(F.col("doc_id") == 2).count() == 0
    assert idx.select("doc_id").distinct().count() == 2
    assert out["text"].where(F.col("doc_id") == 2).count() == 0


def test_assign_ids(spark):
    df = spark.range(100).select((F.col("id") * 2).alias("x"))
    sparse = assign_ids(df, id_col="sid")
    assert sparse.select("sid").distinct().count() == 100
    dense = assign_ids(df, id_col="did", dense=True, order_by="x")
    vals = sorted(r.did for r in dense.collect())
    assert vals == list(range(100))


def test_hierarchy_and_stats(spark):
    txt = _text_table(spark, n_docs=1, per_doc=64)
    path = tempfile.mkdtemp() + "/text_index"
    index_documents(txt, path, local_threshold=16)
    idx = load_index(spark, path)
    h = index_hierarchy(idx)
    rows = {r.range_id: r for r in h.collect()}
    assert rows[0].parent_range_id is None and rows[0].depth == 0
    for rid, r in rows.items():
        if rid > 0:
            assert r.parent_range_id == (rid - 1) // 2
            assert r.depth == (rid + 1).bit_length() - 1
    st = index_stats(idx).collect()[0]
    assert st.n_leaves == 64
    assert st.n_nodes == len(rows)
    assert st.max_depth >= 6


def test_asof_join_semantics(spark):
    from vector_database_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 20, "e2"), (2, 15, "e3"), (3, 5, "e4")],
        "k long, ts long, ev string",
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 15, 200.0), (2, 15, 300.0)],
        "k long, ts long, val double",
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", right_values=["val"]
    )
    rows = {r.ev: r.val_asof for r in out.collect()}
    assert rows == {
        "e1": 100.0,  # right ts 5 <= 10
        "e2": 200.0,  # right ts 15 <= 20
        "e3": 300.0,  # equal ts counts (<=)
        "e4": None,  # no preceding right row
    }


def test_asof_join_forward_nearest(spark):
    from vector_database_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 20, "e2"), (2, 15, "e3"), (3, 5, "e4"), (1, 25, "e5")],
        "k long, ts long, ev string",
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 15, 200.0), (2, 15, 300.0), (1, 22, 400.0)],
        "k long, ts long, val double",
    )
    fwd = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        right_values=["val"], direction="forward",
    )
    assert {r.ev: r.val_asof for r in fwd.collect()} == {
        "e1": 200.0,  # smallest right ts >= 10 is 15
        "e2": 400.0,  # 22 >= 20
        "e3": 300.0,  # equal ts counts (>=)
        "e4": None,   # k=3 has no right rows
        "e5": None,   # no right row at/after 25
    }
    near = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        right_values=["val"], direction="nearest",
    )
    assert {r.ev: r.val_asof for r in near.collect()} == {
        "e1": 100.0,  # exact midpoint (5 vs 15 around 10): ties go BACKWARD
        "e2": 400.0,  # |20-22|=2 < |20-15|=5
        "e3": 300.0,  # exact hit
        "e4": None,   # k=3 has no right rows
        "e5": 400.0,  # only backward exists
    }


def test_range_join_boundaries(spark):
    from vector_database_spark.operators.joins import range_join

    facts = spark.createDataFrame(
        [(1, 4.0), (2, 5.0), (3, 9.99), (4, 10.0)], "id long, v double"
    )
    b = spark.createDataFrame(
        [("lo", 0.0, 5.0), ("hi", 5.0, 10.0)], "bucket string, lo double, hi double"
    )
    out = {r.id: r.bucket for r in range_join(facts, b, value_col="v").collect()}
    # half-open [lo, hi): 5.0 goes to 'hi', 10.0 matches nothing
    assert out == {1: "lo", 2: "hi", 3: "hi", 4: None}


def test_bucketed_join_is_shuffle_free(spark):
    from vector_database_spark.operators.catalog import (
        read_bucketed,
        save_bucketed,
    )

    left = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("a")
    )
    right = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), (F.col("id") + 7).alias("b")
    )
    with tempfile.TemporaryDirectory() as d:
        save_bucketed(
            left, "vds_bkt_left", bucket_col="doc_id", n_buckets=4,
            path=f"{d}/left",
        )
        save_bucketed(
            right, "vds_bkt_right", bucket_col="doc_id", n_buckets=4,
            path=f"{d}/right",
        )
        try:
            l = read_bucketed(spark, "vds_bkt_left")
            r = read_bucketed(spark, "vds_bkt_right")
            # force SMJ so the test asserts the exchange-free bucketed
            # plan rather than a broadcast fallback
            prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                j = l.join(r, "doc_id")
                plan = j._jdf.queryExecution().executedPlan().toString()
                assert "SortMergeJoin" in plan, plan
                assert "Exchange" not in plan, plan
                # bucket-sorted tables: no extra Sort before the SMJ
                assert j.count() == 500
                got = {(x.doc_id, x.a, x.b) for x in j.collect()}
                assert (0, 0, 7) in got and (499, 1497, 506) in got
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            # groupBy on the bucket column is also exchange-free
            agg = read_bucketed(spark, "vds_bkt_left").groupBy("doc_id").agg(
                F.sum("a").alias("s")
            )
            aplan = agg._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in aplan, aplan
        finally:
            spark.sql("DROP TABLE IF EXISTS vds_bkt_left")
            spark.sql("DROP TABLE IF EXISTS vds_bkt_right")


def test_asof_join_tolerance(spark):
    """merge_asof-style tolerance: matches further than the bound are
    nulled; numeric ts columns use the column's own units, and the
    nearest direction gates on the CHOSEN side's distance."""
    from vector_database_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 50, "e2"), (1, 23, "e3")],
        "k long, ts long, ev string",
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 22, 200.0)], "k long, ts long, val double"
    )
    back = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        right_values=["val"], tolerance=10,
    )
    assert {r.ev: r.val_asof for r in back.collect()} == {
        "e1": 100.0,  # dist 5 <= 10
        "e2": None,   # latest at 22, dist 28 > 10
        "e3": 200.0,  # dist 1
    }
    near = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        right_values=["val"], direction="nearest", tolerance=3,
    )
    assert {r.ev: r.val_asof for r in near.collect()} == {
        "e1": None,   # nearest is 5 (dist 5) > 3
        "e2": None,
        "e3": 200.0,  # dist 1
    }
    # temporal columns: tolerance is seconds
    lt = spark.createDataFrame(
        [(1, 100, "e1"), (1, 400, "e2")], "k long, s long, ev string"
    ).selectExpr("k", "timestamp_micros(s * 1000000) AS ts", "ev")
    rt = spark.createDataFrame(
        [(1, 90, 1.0)], "k long, s long, val double"
    ).selectExpr("k", "timestamp_micros(s * 1000000) AS ts", "val")
    out = asof_join(
        lt, rt, on="k", left_ts="ts", right_ts="ts",
        right_values=["val"], tolerance=60,
    )
    assert {r.ev: r.val_asof for r in out.collect()} == {
        "e1": 1.0,   # 10 s back
        "e2": None,  # 310 s back > 60
    }


def test_asof_tolerance_ntz_is_timezone_independent(spark):
    """Regression: NTZ distances must use the tz-independent
    timestampdiff form. Across a spring-forward transition in a
    DST session timezone, the cast-to-timestamp epoch difference
    understates the wall-clock gap and wrongly keeps the match."""
    from vector_database_spark.operators.joins import asof_join

    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        lt = spark.createDataFrame(
            [(1, "2024-03-10 03:30:00", "e1")], "k long, s string, ev string"
        ).selectExpr("k", "CAST(s AS TIMESTAMP_NTZ) AS ts", "ev")
        rt = spark.createDataFrame(
            [(1, "2024-03-10 01:45:00", 1.0)], "k long, s string, val double"
        ).selectExpr("k", "CAST(s AS TIMESTAMP_NTZ) AS ts", "val")
        out = asof_join(
            lt, rt, on="k", left_ts="ts", right_ts="ts",
            right_values=["val"], tolerance=5400,
        )
        # wall-clock gap is 6300 s > 5400: must be NULLed regardless
        # of the session timezone's DST fold
        assert [r.val_asof for r in out.collect()] == [None]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_versioned_table_merge_and_time_travel(spark, tmp_path):
    """MERGE INTO on a versioned copy-on-write table: update +
    insert + delete in one merge, snapshot isolation (old versions
    readable), crash-safe listing (_SUCCESS-gated)."""
    from pyspark.sql import functions as F

    from vector_database_spark.operators.catalog import (
        merge_table,
        read_table,
        write_table_version,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, score double",
    )
    v0 = write_table_version(base, path)
    assert v0 == 0

    updates = spark.createDataFrame(
        [
            (2, "B2", 22.0, False),   # update
            (4, "d", 40.0, False),    # insert
            (3, None, 0.0, True),     # delete
        ],
        "id long, name string, score double, _delete boolean",
    )
    v1 = merge_table(
        spark, path, updates, key_cols=("id",), delete_col="_delete"
    )
    assert v1 == 1
    now = {
        r["id"]: (r["name"], r["score"])
        for r in read_table(spark, path).collect()
    }
    assert now == {1: ("a", 10.0), 2: ("B2", 22.0), 4: ("d", 40.0)}
    # time travel: version 0 untouched
    old = {r["id"] for r in read_table(spark, path, version=0).collect()}
    assert old == {1, 2, 3}

    # a partial (uncommitted) snapshot dir is invisible
    import os

    os.makedirs(f"{path}/v=7", exist_ok=True)
    with open(f"{path}/v=7/part-junk.parquet", "wb") as f:
        f.write(b"not parquet")
    latest = read_table(spark, path)
    assert latest.count() == 3  # still v=1

    # merge without delete_col: pure upsert
    up2 = spark.createDataFrame([(1, "A", 11.0)], "id long, name string, score double")
    v2 = merge_table(spark, path, up2, key_cols=("id",))
    got = {r["id"]: r["name"] for r in read_table(spark, path).collect()}
    assert v2 == 2 and got[1] == "A" and got[2] == "B2"


def test_merge_table_rejects_null_and_duplicate_keys(spark, tmp_path):
    from vector_database_spark.operators.catalog import (
        merge_table,
        write_table_version,
    )

    path = str(tmp_path / "tbl2")
    write_table_version(
        spark.createDataFrame([(1, "a")], "id long, name string"), path
    )
    import pytest as _pt

    dup = spark.createDataFrame(
        [(2, "x"), (2, "y")], "id long, name string"
    )
    with _pt.raises(ValueError, match="duplicate keys"):
        merge_table(spark, path, dup, key_cols=("id",))
    nul = spark.createDataFrame([(None, "x")], "id long, name string")
    with _pt.raises(ValueError, match="NULL keys"):
        merge_table(spark, path, nul, key_cols=("id",))


def test_vacuum_table_retention(spark, tmp_path):
    """Snapshot GC: keep_last newest committed versions survive,
    expired versions are gone (and read_table on them raises), the
    current snapshot is untouched, and an uncommitted in-flight
    directory is left alone."""
    import os

    from vector_database_spark.operators.catalog import (
        read_table,
        vacuum_table,
        write_table_version,
    )

    path = str(tmp_path / "vt")
    for i in range(4):
        df = spark.createDataFrame([(1, i)], "id long, val long")
        write_table_version(df, path)

    # plant an in-flight (uncommitted) writer directory
    os.makedirs(f"{path}/v=99")
    with open(f"{path}/v=99/part-stale.parquet", "w") as f:
        f.write("partial")

    deleted = vacuum_table(spark, path, keep_last=2)
    assert deleted == [0, 1]
    assert read_table(spark, path).first()["val"] == 3
    assert read_table(spark, path, version=2).first()["val"] == 2
    try:
        read_table(spark, path, version=0)
        raise AssertionError("expired version must not be readable")
    except ValueError:
        pass
    assert not os.path.exists(f"{path}/v=0")
    assert os.path.exists(f"{path}/v=99/part-stale.parquet")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        vacuum_table(spark, path, keep_last=0)
