"""PageRank contracts: equality with a local numpy power iteration
(same fixed-iteration algorithm; tolerance because distributed double
summation order differs), mass conservation, dangling handling, and
degree stats."""

from __future__ import annotations

import numpy as np

from vector_database_spark.operators.graph import degree_stats, pagerank

EDGES = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 0), (2, 4)]  # 4 dangles
N, D, ITERS = 5, 0.85, 20


def _numpy_pagerank():
    out: dict = {}
    for s, t in EDGES:
        out.setdefault(s, []).append(t)
    r = np.full(N, 1.0 / N)
    for _ in range(ITERS):
        nr = np.zeros(N)
        dangling = sum(r[i] for i in range(N) if i not in out)
        for s, ts in out.items():
            for t in ts:
                nr[t] += r[s] / len(ts)
        r = (1 - D) / N + D * dangling / N + D * nr
    return r


def test_pagerank_matches_numpy_power_iteration(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["node"]: r["rank"] for r in pagerank(df, iters=ITERS).collect()
    }
    want = _numpy_pagerank()
    assert set(got) == set(range(N))
    for i in range(N):
        assert abs(got[i] - want[i]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_parallel_edges_and_empty(spark):
    # parallel edges count once
    df = spark.createDataFrame(
        EDGES + [(0, 1), (0, 1)], "src long, dst long"
    )
    got = {
        r["node"]: r["rank"] for r in pagerank(df, iters=ITERS).collect()
    }
    want = _numpy_pagerank()
    for i in range(N):
        assert abs(got[i] - want[i]) < 1e-12
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty, iters=3).count() == 0


def test_degree_stats(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    ds = {
        r["node"]: (r["out_deg"], r["in_deg"])
        for r in degree_stats(df).collect()
    }
    assert ds == {0: (2, 2), 1: (1, 1), 2: (2, 2), 3: (1, 0), 4: (0, 1)}


def test_degree_stats_multigraph_consistency(spark):
    """degree_stats defaults to the pagerank convention (parallel
    edges count once); dedup=False gives multigraph degrees."""
    df = spark.createDataFrame(
        EDGES + [(0, 1), (0, 1)], "src long, dst long"
    )
    ds = {r["node"]: r["out_deg"] for r in degree_stats(df).collect()}
    assert ds[0] == 2
    multi = {
        r["node"]: r["out_deg"]
        for r in degree_stats(df, dedup=False).collect()
    }
    assert multi[0] == 4
    import pytest

    from vector_database_spark.operators.graph import pagerank

    with pytest.raises(ValueError, match="checkpoint_every"):
        pagerank(df, checkpoint_every=0)


def test_pagerank_fixedpoint_tracks_double(spark):
    """The integer fixed-point variant (17/20 damping, floor steps)
    must track the double power iteration within the accumulated
    floor error — including the dangling-mass path."""
    from vector_database_spark.operators.graph import pagerank_fixedpoint

    df = spark.createDataFrame(EDGES, "src long, dst long")
    S = 10**12
    fx = {
        r["node"]: r["rank_units"] / S
        for r in pagerank_fixedpoint(df, iters=ITERS, scale=S).collect()
    }
    want = _numpy_pagerank()
    for i in range(N):
        assert abs(fx[i] - want[i]) < 1e-9  # floor drift << 1e-9 at 1e12
    # determinism: a second run is bit-identical
    fx2 = {
        r["node"]: r["rank_units"]
        for r in pagerank_fixedpoint(df, iters=ITERS, scale=S).collect()
    }
    assert fx2 == {k: round(v * S) for k, v in fx.items()}


def test_graph_beam_search_monotone_and_deterministic(spark, embeddings):
    """Beam search over the kNN graph: more hops never worsen the
    best distance (the beam keeps its ef closest visited nodes, and
    the visited set only grows), two runs are identical, and the beam
    only ever contains graph nodes."""
    from pyspark.sql import functions as F

    from vector_database_spark.operators.graph import (
        graph_beam_search,
        knn_graph,
    )

    vecs = embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    ).where(F.col("id") < 200)
    edges = knn_graph(vecs, 3).select("src", "dst").localCheckpoint()
    qdf = vecs.where(F.col("id").isin([7, 150])).select(
        F.col("id").alias("qid"),
        F.col("vector").cast("array<double>").alias("qvec"),
    )
    nodes = {r.id for r in vecs.select("id").collect()}
    best = {}
    for hops in (1, 2, 4):
        rows = graph_beam_search(
            edges, vecs, qdf, ef=4, hops=hops
        ).collect()
        assert all(r.id in nodes for r in rows)
        for qid in (7, 150):
            d = min(r.dist for r in rows if r.qid == qid)
            assert d <= best.get(qid, float("inf")) + 1e-12
            best[qid] = min(best.get(qid, float("inf")), d)
    again = graph_beam_search(edges, vecs, qdf, ef=4, hops=4).collect()
    four = graph_beam_search(edges, vecs, qdf, ef=4, hops=4).collect()
    assert {(r.qid, r.id, r.rank) for r in again} == {
        (r.qid, r.id, r.rank) for r in four
    }


def test_knn_graph_dgemm_matches_expr(spark, embeddings):
    """The dgemm scale path must agree with the expression (oracle)
    path edge-for-edge — numpy's pairwise sums differ from the
    sequential folds only in the last ulp, which can reorder an edge
    only at an exact distance tie (none in this corpus)."""
    from pyspark.sql import functions as F

    from vector_database_spark.operators.graph import knn_graph

    vecs = embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    ).where(F.col("id") < 300)
    a = {(r.src, r.dst, r.rank) for r in knn_graph(vecs, 4, method="expr").collect()}
    b = {(r.src, r.dst, r.rank) for r in knn_graph(vecs, 4, method="dgemm").collect()}
    assert a == b and len(a) == 300 * 4
