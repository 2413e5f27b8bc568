"""SQL entry-point parity: the reference's interface is T-SQL procs
(DDL.sql:234-295, 352-419), so the engine must be drivable from a SQL
string — the recursive-CTE search must equal the DataFrame walker
(which itself equals brute force, v01's gate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vector_database_spark import sql_api
from vector_database_spark.operators.index_build import build_index
from vector_database_spark.operators.search import knn, search


@pytest.fixture(scope="module")
def vecs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
        .localCheckpoint()
    )


@pytest.fixture(scope="module")
def idx(spark, vecs):
    return build_index(vecs, local_threshold=128).localCheckpoint()


def _panel(spark, vecs):
    return spark.createDataFrame(
        [
            (int(r.id), [float(x) for x in r.vector])
            for r in vecs.where(F.col("id").isin([3, 99])).collect()
        ],
        "qid long, qvec array<double>",
    )


def test_sql_search_matches_dataframe_path(spark, vecs, idx):
    sql_api.register_engine_views(spark, vecs, idx)
    qdf = _panel(spark, vecs)
    got = {
        (r.qid, r.id, round(r.dist, 6))
        for r in sql_api.sql_search(spark, qdf, 1.4).collect()
    }
    panel = [(int(r.qid), list(r.qvec)) for r in qdf.collect()]
    want = {
        (r.qid, r.id, round(r.dist, 6))
        for r in search(idx, vecs, panel, 1.4).collect()
    }
    assert got == want and got


def test_sql_knn_matches_operator(spark, vecs):
    vecs.createOrReplaceTempView("vectors")
    qdf = _panel(spark, vecs)
    got = {
        (r.qid, r.id, r.rank)
        for r in sql_api.sql_knn(spark, qdf, 5).collect()
    }
    panel = [(int(r.qid), list(r.qvec)) for r in qdf.collect()]
    want = {
        (r.qid, r.id, r.rank) for r in knn(vecs, panel, 5).collect()
    }
    assert got == want and len(got) == 10


def test_register_tables_sql_query(spark):
    sql_api.register_tables(spark, SF_DIR)
    n = spark.sql("SELECT count(*) AS n FROM lineitem").first()["n"]
    assert n > 0
    joined = spark.sql(
        """
        SELECT r.r_name, count(*) AS n
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    ).collect()
    assert len(joined) == 5


def test_sql_index_document_builds_swaps_and_searches(spark, tmp_path):
    """Round-6 verdict item 5: the whole build→swap→search flow
    through the SQL surface only — register a text view, CALL the
    IndexDocument analog, search via the recursive-CTE SQL, mutate
    one document, re-index JUST that document, and verify the swap:
    results match the DataFrame path rebuilt from scratch at every
    step, and untouched documents' results never change."""
    from vector_database_spark.operators.search import (
        brute_force_search,
    )
    from vector_database_spark.sources.generators import random_uniform

    idx_path = str(tmp_path / "sql_idx")
    txt = (
        random_uniform(spark, 120, 4, seed=31)
        .select(
            (F.col("id") % 3).alias("doc_id"),
            F.col("id").alias("text_id"),
            "vector",
        )
        .localCheckpoint()
    )
    txt.createOrReplaceTempView("text")
    sql_api.sql_build_index(spark, idx_path, local_threshold=16)
    q = [0.2, -0.1, 0.3, 0.05]
    qdf = spark.createDataFrame([(0, q)], "qid long, qvec array<double>")
    got = {
        (r.id, round(r.dist, 9))
        for r in sql_api.sql_search(spark, qdf, 0.8).collect()
    }
    want = {
        (r.id, round(r.dist, 9))
        for r in brute_force_search(
            txt.select(F.col("text_id").alias("id"), "vector"), [(0, q)], 0.8
        ).collect()
    }
    assert got == want and got

    # mutate doc 1 (shift its vectors), swap ONLY that partition
    txt2 = txt.withColumn(
        "vector",
        F.when(
            F.col("doc_id") == 1,
            F.transform("vector", lambda x: x + F.lit(0.25)),
        ).otherwise(F.col("vector")),
    ).localCheckpoint()
    txt2.createOrReplaceTempView("text")
    sql_api.sql_index_document(spark, idx_path, 1, local_threshold=16)
    after = {
        (r.id, round(r.dist, 9))
        for r in sql_api.sql_search(spark, qdf, 0.8).collect()
    }
    want2 = {
        (r.id, round(r.dist, 9))
        for r in brute_force_search(
            txt2.select(F.col("text_id").alias("id"), "vector"), [(0, q)], 0.8
        ).collect()
    }
    assert after == want2
    # untouched documents (0, 2) answer identically before and after
    assert {x for x in got if x[0] % 3 != 1} == {
        x for x in after if x[0] % 3 != 1
    }
    # doc-scoped SQL search sees the NEW doc-1 vectors
    scoped = {
        (r.id, round(r.dist, 9))
        for r in sql_api.sql_search(spark, qdf, 0.8, doc_id=1).collect()
    }
    assert scoped == {x for x in want2 if x[0] % 3 == 1}


def test_sql_index_document_ivf_family_lifecycle(spark, tmp_path):
    """Round-7 verdict item 7: the SQL-first story on the IVF
    family. Same flow as the BSP test — register a text view, CALL
    the IndexDocument analog with index_type=, search via the IVF
    SQL ball search (triangle-inequality cell pruning + exact
    refine), mutate one document, re-index through the single-doc
    form, verify against brute force at every step — for BOTH ivf
    and ivfadc."""
    from vector_database_spark.operators.search import brute_force_search
    from vector_database_spark.sources.generators import random_uniform

    q = [0.2, -0.1, 0.3, 0.05]
    qdf = spark.createDataFrame([(0, q)], "qid long, qvec array<double>")
    txt = (
        random_uniform(spark, 120, 4, seed=31)
        .select(
            (F.col("id") % 3).alias("doc_id"),
            F.col("id").alias("text_id"),
            "vector",
        )
        .localCheckpoint()
    )
    txt2 = txt.withColumn(
        "vector",
        F.when(
            F.col("doc_id") == 1,
            F.transform("vector", lambda x: x + F.lit(0.25)),
        ).otherwise(F.col("vector")),
    ).localCheckpoint()
    for t in ("ivf", "ivfadc"):
        root = str(tmp_path / f"sql_{t}")
        txt.createOrReplaceTempView("text")
        sql_api.sql_build_index(
            spark, root, index_type=t, n_cells=4, pq_m=2
        )
        got = {
            (r.id, round(r.dist, 9))
            for r in sql_api.sql_ivf_search(spark, qdf, 0.8).collect()
        }
        want = {
            (r.id, round(r.dist, 9))
            for r in brute_force_search(
                spark.table("vectors"), [(0, q)], 0.8
            ).collect()
        }
        assert got == want and got, t

        # mutate doc 1, swap through the single-doc form (text-store
        # swap is per-doc; the coarse layout rebuild is corpus-global
        # by contract)
        txt2.createOrReplaceTempView("text")
        sql_api.sql_index_document(
            spark, root, 1, index_type=t, n_cells=4, pq_m=2
        )
        after = {
            (r.id, round(r.dist, 9))
            for r in sql_api.sql_ivf_search(spark, qdf, 0.8).collect()
        }
        # ground truth = the registered vectors view (the STORE:
        # ingest casts to the stored precision — the add_documents
        # contract — so the store, not the raw view, is the
        # system-of-record the search must match)
        want2 = {
            (r.id, round(r.dist, 9))
            for r in brute_force_search(
                spark.table("vectors"), [(0, q)], 0.8
            ).collect()
        }
        assert after == want2, t
        # untouched documents answer identically before and after
        assert {x for x in got if x[0] % 3 != 1} == {
            x for x in after if x[0] % 3 != 1
        }, t


def test_sql_index_document_mips_views_and_dot_sql(spark, tmp_path):
    """Round-9 verdict item 5, SQL spelling: index_type='mips'
    registers the augmented-space assignment as `vector_index` and
    the augmented centroids as `vector_cells`; the docstring's
    pure-SQL probe + exact-dot query equals the facade's knn_dot
    with the same nprobe/k."""
    from vector_database_spark.api import VectorDatabase
    from vector_database_spark.sources.generators import random_uniform

    q = [0.2, -0.1, 0.3, 0.05]
    txt = (
        random_uniform(spark, 100, 4, seed=91)
        .select(
            (F.col("id") % 2).alias("doc_id"),
            F.col("id").alias("text_id"),
            "vector",
        )
        .localCheckpoint()
    )
    root = str(tmp_path / "sql_mips")
    txt.createOrReplaceTempView("text")
    sql_api.sql_build_index(spark, root, index_type="mips", n_cells=8)
    assert sorted(spark.table("vector_index").columns) == ["cell", "id"]
    assert sorted(spark.table("vector_cells").columns) == ["cell", "cvec"]
    assert len(spark.table("vector_cells").first()["cvec"]) == 5  # dims+1

    qlit = "array(" + ", ".join(repr(float(x)) for x in q) + ")"
    qaug = (
        "array(" + ", ".join(repr(float(x)) for x in q) + ", 0.0D)"
    )
    k, nprobe = 10, 3
    got = [
        (int(r.id), round(float(r.ip), 9))
        for r in spark.sql(f"""
        WITH pc AS (SELECT cell FROM vector_cells
                    ORDER BY aggregate(zip_with(cvec, {qaug},
                        (a, b) -> (a - b) * (a - b)), 0.0D,
                        (s, x) -> s + x), cell
                    LIMIT {nprobe})
        SELECT v.id, aggregate(zip_with(v.vector, {qlit},
               (a, b) -> CAST(a AS DOUBLE) * b), 0.0D,
               (s, x) -> s + x) AS ip
        FROM vectors v JOIN vector_index i ON i.id = v.id
        WHERE i.cell IN (SELECT cell FROM pc)
        ORDER BY ip DESC, v.id LIMIT {k}
        """).collect()
    ]
    vdb = VectorDatabase(spark, root, index_type="mips", n_cells=8)
    want = [
        (int(r.text_id), round(float(r.ip), 9))
        for r in vdb.knn_dot(q, k, nprobe=nprobe).orderBy("rank").collect()
    ]
    assert got == want and len(got) == k


def test_sql_index_document_bq_views_and_hamming_sql(spark, tmp_path):
    """Round-8 verdict item 5 + round-9 item 1, SQL spelling:
    index_type='bq' registers the cell-carrying code-lane table as
    `vector_index` and the coarse centroids as `vector_cells`; the
    docstring's pure-SQL cell-probed Hamming candidate query,
    reranked exactly against `vectors`, equals the facade's own
    cell-pruned bq search with the same bq_nprobe/bq_m."""
    from vector_database_spark.api import VectorDatabase
    from vector_database_spark.operators.ann import bq_lane_exprs
    from vector_database_spark.sources.generators import random_uniform

    q = [0.2, -0.1, 0.3, 0.05]
    txt = (
        random_uniform(spark, 100, 4, seed=37)
        .select(
            (F.col("id") % 2).alias("doc_id"),
            F.col("id").alias("text_id"),
            "vector",
        )
        .localCheckpoint()
    )
    root = str(tmp_path / "sql_bq")
    txt.createOrReplaceTempView("text")
    sql_api.sql_build_index(spark, root, index_type="bq", n_cells=8)
    assert sorted(spark.table("vector_index").columns) == [
        "cell", "code", "id"
    ]
    assert sorted(spark.table("vector_cells").columns) == ["cell", "cvec"]

    # query lanes via the same expression the engine uses
    qdf = spark.createDataFrame([(q,)], "qvec array<double>")
    qlanes = qdf.select(
        F.array(*bq_lane_exprs("qvec", 4)).alias("qcode")
    ).first()["qcode"]
    lanes_sql = ", ".join(f"{int(x)}L" for x in qlanes)
    qlit = "array(" + ", ".join(repr(float(x)) for x in q) + ")"
    m, nprobe = 24, 3
    cand = spark.sql(f"""
        WITH pc AS (SELECT cell FROM vector_cells
                    ORDER BY aggregate(zip_with(cvec, {qlit},
                        (a, b) -> (a - b) * (a - b)),
                        0.0D, (s, x) -> s + x), cell
                    LIMIT {nprobe})
        SELECT id, aggregate(zip_with(code, array({lanes_sql}),
               (a, b) -> bit_count(a ^ b)), 0L, (s, x) -> s + x) AS h
        FROM vector_index WHERE cell IN (SELECT cell FROM pc)
        ORDER BY h, id LIMIT {m}
    """)
    cand.createOrReplaceTempView("bq_cand")
    rer = spark.sql(f"""
        SELECT v.id, sqrt(aggregate(zip_with(v.vector, {qlit},
               (a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)),
               0.0D, (s, x) -> s + x)) AS dist
        FROM vectors v JOIN bq_cand c ON c.id = v.id
    """).where(F.col("dist") <= 0.8)
    got = {(int(r.id), round(float(r.dist), 9)) for r in rer.collect()}

    vdb = VectorDatabase(
        spark, root, index_type="bq", n_cells=8, bq_m=m, bq_nprobe=nprobe,
        bq_route="cells",  # pin the cell path: the SQL above replays it
    )
    want = {
        (int(r.text_id), round(float(r.dist), 9))
        for r in vdb.search(q, 0.8).collect()
    }
    assert got == want and got


def test_sql_index_document_bq_hd_replay(spark, tmp_path):
    """Round-12 verdict item 3 (done-when): the SQL front door builds
    an HD 'bq' layout (`sql_build_index(bq_hd_blocks=2)`) and the
    docstring's spelled Hamming candidate query — with its
    ``array(...query lanes...)`` literals computed over the
    TRANSFORMED query (`ann.hd_transform_py` at the stored params) —
    reranked exactly against `vectors`, equals the facade's own
    cell-pruned search over the same store. Pins the transformed
    space end-to-end through the SQL surface."""
    from vector_database_spark.api import VectorDatabase
    from vector_database_spark.operators.ann import (
        BQ_LANE_BITS,
        hd_transform_py,
    )
    from vector_database_spark.sources.generators import random_uniform

    q = [0.2, -0.1, 0.3, 0.05]
    blocks, seed = 2, 5
    txt = (
        random_uniform(spark, 100, 4, seed=37)
        .select(
            (F.col("id") % 2).alias("doc_id"),
            F.col("id").alias("text_id"),
            "vector",
        )
        .localCheckpoint()
    )
    root = str(tmp_path / "sql_bq_hd")
    txt.createOrReplaceTempView("text")
    sql_api.sql_build_index(
        spark, root, index_type="bq", n_cells=8,
        bq_hd_blocks=blocks, bq_hd_seed=seed,
    )
    # transformed query lanes, driver-side — exact integer twin of
    # the transform the stored codes were built with
    t = hd_transform_py(q, dim=4, blocks=blocks, seed=seed, scale=1_000_000)
    lanes = []
    for lo in range(0, len(t), BQ_LANE_BITS):
        lane = 0
        for i in range(lo, min(lo + BQ_LANE_BITS, len(t))):
            if t[i] >= 0:
                lane += 1 << (i - lo)
        lanes.append(lane)
    lanes_sql = ", ".join(f"{x}L" for x in lanes)
    qlit = "array(" + ", ".join(repr(float(x)) for x in q) + ")"
    m, nprobe = 24, 3
    cand = spark.sql(f"""
        WITH pc AS (SELECT cell FROM vector_cells
                    ORDER BY aggregate(zip_with(cvec, {qlit},
                        (a, b) -> (a - b) * (a - b)),
                        0.0D, (s, x) -> s + x), cell
                    LIMIT {nprobe})
        SELECT id, aggregate(zip_with(code, array({lanes_sql}),
               (a, b) -> bit_count(a ^ b)), 0L, (s, x) -> s + x) AS h
        FROM vector_index WHERE cell IN (SELECT cell FROM pc)
        ORDER BY h, id LIMIT {m}
    """)
    cand.createOrReplaceTempView("bq_hd_cand")
    rer = spark.sql(f"""
        SELECT v.id, sqrt(aggregate(zip_with(v.vector, {qlit},
               (a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)),
               0.0D, (s, x) -> s + x)) AS dist
        FROM vectors v JOIN bq_hd_cand c ON c.id = v.id
    """).where(F.col("dist") <= 0.8)
    got = {(int(r.id), round(float(r.dist), 9)) for r in rer.collect()}

    # serving facade opened WITHOUT HD knobs — stored meta drives the
    # transform (the source-of-truth rule)
    vdb = VectorDatabase(
        spark, root, index_type="bq", n_cells=8, bq_m=m,
        bq_nprobe=nprobe, bq_route="cells",
    )
    want = {
        (int(r.text_id), round(float(r.dist), 9))
        for r in vdb.search(q, 0.8).collect()
    }
    assert got == want and got
