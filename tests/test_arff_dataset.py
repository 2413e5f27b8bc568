"""Build + search on the vendored real-distribution fixture
(`data/2d-10c.arff`, a 2d-10c clustering-benchmark analog — the
dataset family the reference's tests run on,
MempryVectorIndex.Tests/MemoryVectorIndexTests.cs:116-134), including
the reference's non-normalized "bad distribution" degraded case
(MemoryVectorIndexTests.cs:95-113): coordinates live on a ~[0,30]^2
canvas, far outside the [-1,1] envelope the reference's trie assumes.
The BSP tree must stay EXACT either way — degraded distributions may
cost pruning efficiency, never correctness.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vector_database_spark.operators.index_build import build_index
from vector_database_spark.operators.search import (
    brute_force_search,
    search,
    search_stats,
)
from vector_database_spark.sources.arff import read_arff, read_arff_vectors

ARFF = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "data", "2d-10c.arff")


@pytest.fixture(scope="module")
def arff_vectors(spark):
    vecs = read_arff_vectors(spark, ARFF, label_col="class").persist()
    vecs.count()
    yield vecs
    vecs.unpersist()


def test_read_arff_schema_and_rows(spark):
    df = read_arff(spark, ARFF)
    assert df.columns == ["x", "y", "class"]
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "double", "double", "string",
    ]
    assert df.count() == 2250
    # ten nominal classes survive the round trip
    assert df.select("class").distinct().count() == 10


def test_build_search_exact_on_raw_unnormalized(arff_vectors, spark):
    """Degraded-distribution case: raw coordinates (no normalization),
    search == brute force exactly."""
    vecs = arff_vectors.select("id", "vector")
    idx = build_index(vecs, local_threshold=256).persist()
    n = vecs.count()
    assert idx.count() == 2 * n - 1
    assert idx.where(F.col("id").isNotNull()).count() == n

    panel = [
        (int(r.id), list(r.vector))
        for r in vecs.where(F.col("id").isin([5, 500, 1700])).collect()
    ]
    got = {
        (r.qid, r.id)
        for r in search(idx, vecs, panel, 1.5, strategy="broadcast").collect()
    }
    want = {(r.qid, r.id) for r in brute_force_search(vecs, panel, 1.5).collect()}
    assert got and got == want
    idx.unpersist()


def test_search_prunes_on_clustered_distribution(arff_vectors, spark):
    """On a genuinely clustered 2-D distribution a cluster-radius query
    must touch a small corpus fraction — the pruning the tree exists
    for (reference README.md:72)."""
    vecs = arff_vectors.select("id", "vector")
    idx = build_index(vecs, local_threshold=256).persist()
    panel = [
        (int(r.id), list(r.vector))
        for r in vecs.where(F.col("id").isin([5, 500])).collect()
    ]
    st = {r.qid: r for r in search_stats(
        idx, vecs, panel, 0.8, strategy="broadcast"
    ).collect()}
    for qid, r in st.items():
        assert r.n_matches >= 1, qid
        assert r.candidate_frac <= 0.5, (qid, r.candidate_frac)
    idx.unpersist()


def test_normalized_matches_raw_semantics(arff_vectors, spark):
    """Normalizing to [-1,1] (the reference's expected envelope) and
    scaling the domain by the same factor preserves the result set."""
    vecs = arff_vectors.select("id", "vector")
    stats = vecs.select(
        F.max(F.abs(F.col("vector")[0])).alias("mx"),
        F.max(F.abs(F.col("vector")[1])).alias("my"),
    ).first()
    scale = float(max(stats.mx, stats.my))
    norm = vecs.select(
        "id",
        F.array(
            (F.col("vector")[0] / scale), (F.col("vector")[1] / scale)
        ).alias("vector"),
    ).persist()
    idx = build_index(norm, local_threshold=256).persist()
    panel_raw = [
        (int(r.id), list(r.vector))
        for r in vecs.where(F.col("id").isin([5, 1700])).collect()
    ]
    panel = [(q, [x / scale for x in v]) for q, v in panel_raw]
    got = {
        (r.qid, r.id)
        for r in search(idx, norm, panel, 1.5 / scale, strategy="broadcast").collect()
    }
    want_raw = {
        (r.qid, r.id)
        for r in brute_force_search(vecs, panel_raw, 1.5).collect()
    }
    assert got == want_raw
    idx.unpersist()
    norm.unpersist()
