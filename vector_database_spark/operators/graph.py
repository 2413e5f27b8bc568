"""Iterative graph analytics: PageRank over an edge DataFrame.

Second member of the engine's bounded-iteration family (connected
components lives in `operators.dedup`): fixed-iteration power method
with dangling-mass redistribution, expressed as per-iteration
DataFrame joins/aggregates. Per iteration: ONE join of ranks to
edges on the source key and ONE aggregate on the destination key —
both equi-keyed shuffles, nothing quadratic, no driver-side graph.
Lineage is truncated with a localCheckpoint every few iterations
(the repo's CC pattern) so 20 iterations do not build a 20-deep plan.

Determinism: the iteration count is FIXED (not convergence-tested),
so the result is the same algorithm on every run; double summation
order across partitions can differ, so tests compare against a local
numpy power iteration with a tolerance rather than bit equality (the
gate is rows-only, like t12's BPE).

Reference analog: none (no graph surface in the reference); part of
the brief's iterative-algorithm capability surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 20,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Ranks over the directed graph `edges` (parallel edges count
    once — deduplicated up front). Returns (node, rank) with ranks
    summing to 1. Nodes are every distinct endpoint; dangling nodes
    (no out-edges) redistribute their mass uniformly, the standard
    formulation."""
    if int(checkpoint_every) < 1:
        raise ValueError("checkpoint_every must be >= 1")
    d = float(damping)
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg")).localCheckpoint(
        eager=False
    )
    # dangling nodes are a property of the GRAPH, not the iteration:
    # deg has one row per node WITH out-edges, so dangling exist iff
    # deg.count() < n (no extra anti-join job; the count also warms
    # the deg checkpoint for the loop). Only dangling graphs pay the
    # per-iteration eager mass aggregate — a bipartite or strongly-
    # connected graph stays fully lazy between checkpoints.
    has_dangling = deg.count() < n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(int(iters)):
        with_deg = ranks.join(
            deg, ranks["node"] == deg["src"], "left"
        ).select("node", "rank", "out_deg")
        contrib = (
            with_deg.where(F.col("out_deg").isNotNull())
            .join(e, F.col("node") == e["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("c"))
        )
        # dangling mass WITHOUT a second pass over with_deg: total
        # mass is 1 every iteration and each non-dangling src's rank
        # is fully distributed across its out-edges, so
        # dangling = 1 - sum(contrib). The mass invariant holds only
        # up to FP rounding: sum(contrib) re-associates rank/out_deg
        # products, so `dangling` can drift from the direct
        # sum-over-dangling-ranks by ~iters * n * ulp — far inside the
        # rows-only gate's 1e-6 tolerance for any realistic
        # iteration count, but NOT bit-exact (g03's fixed-point
        # integer variant is the bit-exact form; renormalize ranks
        # periodically if running thousands of iterations). One tiny
        # aggregate over the
        # contrib output (O(nodes) rows, already shuffled) replaces
        # the round-3 shape's eager with_deg checkpoint + separate
        # dangling scan — ONE job per iteration instead of three on
        # dangling graphs, and with_deg is consumed exactly once.
        dangling = 0.0
        if has_dangling:
            # the aggregate's full pass warms the checkpoint so the
            # ranks join below reuses stored blocks, not lineage
            contrib = contrib.localCheckpoint(eager=False)
            dangling = 1.0 - (
                contrib.agg(F.sum("c")).first()[0] or 0.0
            )
        base = (1.0 - d) / n + d * dangling / n
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(d) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % int(checkpoint_every) == 0 or i == int(iters) - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def degree_stats(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    dedup: bool = True,
) -> DataFrame:
    """Per-node in/out degree in one pass (endpoint union +
    conditional counts): the basic graph profile. Parallel edges
    count once by default — the SAME convention as `pagerank`, so the
    two profiles agree on any multigraph; pass ``dedup=False`` for
    multigraph degrees."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if dedup:
        e = e.dropDuplicates(["src", "dst"])
    both = e.select(
        F.col("src").alias("node"), F.lit(1).alias("is_out")
    ).unionByName(
        e.select(F.col("dst").alias("node"), F.lit(0).alias("is_out"))
    )
    return both.groupBy("node").agg(
        F.sum("is_out").cast("long").alias("out_deg"),
        F.sum(1 - F.col("is_out")).cast("long").alias("in_deg"),
    )


def pagerank_fixedpoint(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 20,
    scale: int = 10**12,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Deterministic integer PageRank: ranks are BIGINT fixed-point
    units (``scale`` = mass 1.0), damping is the rational 17/20, and
    every step floors — so each iteration is pure integer arithmetic
    whose sums re-associate freely. Unlike the double `pagerank`,
    the result is BIT-IDENTICAL on any engine, partitioning, or
    execution order: an ANSI-SQL oracle can replay all ``iters``
    iterations as unrolled CTEs and hash-match (no SQL engine allows
    aggregation inside a recursive CTE, so the replay unrolls).

    Per iteration: floor(R/out_deg) contributions summed per dst
    (one equi-join + one aggregate), dangling mass redistributed as
    floor(dangling/n), update R' = (3*scale) div (20*n) +
    (17 * (contrib + dangling div n)) div 20. Floor losses mean the
    total mass drifts a few units below ``scale`` — deterministic,
    and bounded by iters * n units. Plans are truncated with the
    same periodic localCheckpoint as `pagerank`."""
    if int(checkpoint_every) < 1:
        raise ValueError("checkpoint_every must be >= 1")
    S = int(scale)
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_units", F.lit(0).cast("long"))
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg")).localCheckpoint(
        eager=False
    )
    has_dangling = deg.count() < n
    base = (3 * S) // (20 * n)
    ranks = nodes.withColumn("r", F.lit(S // n).cast("long"))
    for i in range(int(iters)):
        with_deg = ranks.join(
            deg, ranks["node"] == deg["src"], "left"
        ).select("node", "r", "out_deg")
        dangling_share = 0
        if has_dangling:
            with_deg = with_deg.localCheckpoint(eager=True)
            dm = (
                with_deg.where(F.col("out_deg").isNull())
                .agg(F.sum("r"))
                .first()[0]
                or 0
            )
            dangling_share = int(dm) // n
        contrib = (
            with_deg.where(F.col("out_deg").isNotNull())
            .join(e, F.col("node") == e["src"])
            .groupBy("dst")
            .agg(
                F.sum(
                    F.expr("r div out_deg")
                ).alias("c")
            )
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                F.expr(
                    f"CAST({base} + (17 * (COALESCE(c, 0) + "
                    f"{dangling_share})) div 20 AS BIGINT)"
                ).alias("r"),
            )
        )
        if (i + 1) % int(checkpoint_every) == 0 or i == int(iters) - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("r").alias("rank_units"))


def knn_graph(
    vecs: DataFrame,
    k: int,
    *,
    id_col: str = "id",
    vector_col: str = "vector",
    metric: str = "euclidean",
    method: str = "expr",
) -> DataFrame:
    """k-nearest-neighbor GRAPH construction — the foundation every
    graph-based ANN index (HNSW/NSG/DiskANN families) builds on: for
    each vector, its k nearest OTHER vectors as directed edges
    ``(src, dst, dist, rank)``. Same two-phase top-k shape as
    `search.knn` (distances map-side inside the scan stage, Arrow
    per-batch pre-reduction, one slim survivor window) with the self
    edge excluded BEFORE ranking, so ranks are 1..k over true
    neighbors.

    ``method='expr'`` (default) computes distances as the bit-exact
    Catalyst folds — the g04 oracle path; cost is n² interpreted
    folds (the measured 8×-slow HOF regime — fine for gate-scale and
    for per-block refinement, wrong for bulk builds).
    ``method='dgemm'`` is the SCALE path: one Arrow-batched BLAS
    pass per partition against the corpus matrix closed over as
    plain lists (the `_assign_cells` shape) — distances agree with
    the folds to an ulp (numpy sums are pairwise), so edge SETS can
    differ only at exact distance ties; a pytest pins dgemm == expr
    on the fixture (the a01 kernel/expr-twin rule). Past driver-
    memory corpora, build blockwise with the d05 block-pair kernel
    or IVF-bucketed candidates and refine per block."""
    from pyspark.sql.window import Window

    from vector_database_spark.functions.vector import (
        cosine_similarity,
        euclidean,
    )

    if method not in ("expr", "dgemm"):
        raise ValueError(f"method must be expr|dgemm, got {method!r}")
    src = vecs.select(
        F.col(id_col).cast("long").alias("id"), F.col(vector_col).alias("_vec")
    )
    if method == "dgemm":
        if metric != "euclidean":
            raise ValueError("knn_graph dgemm path supports euclidean only")
        rows = vecs.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vector_col).cast("array<double>").alias("v"),
        ).collect()
        ids = [int(r["id"]) for r in rows]
        mat = [list(r["v"]) for r in rows]
        kk = int(k)

        def kern(batches):
            import numpy as np
            import pandas as pd

            Q = np.asarray(mat, dtype=np.float64)
            qid = np.asarray(ids, dtype=np.int64)
            q2 = (Q * Q).sum(axis=1)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
                )
                sid = pdf["id"].to_numpy(np.int64)
                d2 = (
                    (X * X).sum(axis=1)[:, None]
                    - 2.0 * (X @ Q.T)
                    + q2[None, :]
                )
                np.maximum(d2, 0.0, out=d2)
                self_mask = sid[:, None] == qid[None, :]
                d2[self_mask] = np.inf
                out_src, out_dst, out_d, out_r = [], [], [], []
                for r in range(len(sid)):
                    order = np.lexsort((qid, d2[r]))
                    # the inf-masked self pair must never survive the
                    # cut: when k >= corpus size it would otherwise
                    # emit a spurious (src, src, inf) edge the expr
                    # path (which filters id != qid) never produces
                    order = order[np.isfinite(d2[r][order])][:kk]
                    out_src.extend([sid[r]] * len(order))
                    out_dst.extend(qid[order])
                    out_d.extend(np.sqrt(d2[r][order]))
                    out_r.extend(range(1, len(order) + 1))
                yield pd.DataFrame(
                    {
                        "src": pd.array(out_src, dtype="int64"),
                        "dst": pd.array(out_dst, dtype="int64"),
                        "dist": pd.array(out_d, dtype="float64"),
                        "rank": pd.array(out_r, dtype="int64"),
                    }
                )

        return vecs.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vector_col).cast("array<double>").alias("v"),
        ).mapInPandas(kern, "src long, dst long, dist double, rank long")
    qdf = vecs.select(
        F.col(id_col).cast("long").alias("qid"),
        F.col(vector_col).cast("array<double>").alias("qvec"),
    )
    crossed = src.crossJoin(F.broadcast(qdf)).where(F.col("id") != F.col("qid"))
    if metric == "euclidean":
        dist = euclidean(F.col("_vec"), F.col("qvec"))
    elif metric == "cosine":
        dist = F.lit(1.0) - cosine_similarity(F.col("_vec"), F.col("qvec"))
    else:
        raise ValueError(f"unknown metric {metric!r}")
    narrow = crossed.select(
        F.col("qid").alias("src"), F.col("id").alias("dst"), dist.alias("dist")
    )
    from vector_database_spark.operators.search import _grouped_topk

    local = _grouped_topk(narrow, k, "src", "dst")
    w = Window.partitionBy("src").orderBy(F.col("dist").asc(), F.col("dst").asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("src", "dst", "dist", "rank")
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED simple graph —
    the clustering-structure primitive (a kNN graph's triangle
    density is exactly what graph-ANN navigability and community
    detection read). ``edges``: any (src, dst) pairs; they are
    symmetrized and deduplicated here. Returns ``(node, n_tri)`` for
    every node incident to ≥1 edge (0 when in no triangle).

    Shape: the node-iterator join on the a<b<c canonical orientation
    — each triangle is enumerated exactly once as (a<b), (b<c), (a<c)
    edge triples, via two equi-joins over the oriented edge list.
    All-integer — exact on any engine. At scale the standard
    degree-orientation refinement (orient low-degree → high-degree)
    bounds the join fan-out; the canonical orientation here is its
    id-ordered special case."""
    und = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).alias("a"),
            F.greatest(F.col("src"), F.col("dst")).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])  # x < y < z by construction
    per_node = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    nodes = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .distinct()
    )
    return nodes.join(per_node, "node", "left").select(
        "node", F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri")
    )


def graph_beam_search(
    edges: DataFrame,
    vectors_df: DataFrame,
    queries_df: DataFrame,
    *,
    ef: int = 4,
    hops: int = 4,
    id_col: str = "id",
    vector_col: str = "vector",
) -> DataFrame:
    """Graph-based ANN SEARCH — the navigable-graph paradigm
    (HNSW/NSG) expressed batch-synchronously: starting from a
    deterministic entry point (the minimum id), every query expands
    its beam along the kNN graph's out-edges for a FIXED number of
    hops, keeping the ef closest visited nodes by (dist, id) after
    each expansion. Returns ``(qid, id, dist, rank)`` — the beam
    after the final hop.

    Design choices that make it Spark-shaped AND replayable: all
    queries walk TOGETHER (one edge join + one distance projection +
    one top-ef window per hop — hop count is fixed, so the plan is a
    bounded chain, the BSP-search driver-loop pattern); re-visiting a
    node is harmless (the beam is a distinct id set re-ranked each
    hop), so no visited-set state is carried; and every distance is
    the bit-exact L2 fold, so a hop-unrolled SQL replay matches the
    beam node-for-node. Greedy per-query best-first search (the
    literature's sequential form) trades those properties for fewer
    distance evaluations — on a cluster the batch-synchronous form
    wins until ef·|queries| approaches the corpus."""
    from vector_database_spark.functions.vector import euclidean

    vecs = vectors_df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vector_col).alias("_vec"),
    )
    entry = vecs.agg(F.min("id")).first()[0]
    if entry is None:
        raise ValueError("graph_beam_search: empty vector table")
    out_edges = edges.select(
        F.col("src").cast("long").alias("id"),
        F.col("dst").cast("long").alias("_dst"),
    )
    qdf = queries_df.select(
        F.col("qid").cast("long").alias("qid"), F.col("qvec")
    )
    qb = F.broadcast(qdf.localCheckpoint(eager=False))
    beam = qdf.select("qid").withColumn("id", F.lit(int(entry)).cast("long"))
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())

    def rank_beam(cand: DataFrame) -> DataFrame:
        return (
            cand.join(vecs, "id")
            .join(qb, "qid")
            .withColumn("dist", euclidean(F.col("_vec"), F.col("qvec")))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(ef))
        )

    for _ in range(int(hops)):
        nb = beam.join(out_edges, "id").select(
            "qid", F.col("_dst").alias("id")
        )
        cand = beam.select("qid", "id").unionByName(nb).distinct()
        beam = rank_beam(cand).select("qid", "id")
        # bounded chain (hops is small and fixed), but cut lineage so
        # the final action doesn't re-execute every hop's join twice
        beam = beam.localCheckpoint(eager=False)
    return rank_beam(beam.select("qid", "id")).select(
        "qid", "id", "dist", "rank"
    )
