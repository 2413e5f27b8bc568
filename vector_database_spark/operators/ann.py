"""Approximate nearest-neighbor search — the scale path beside the
exact BSP tree.

Three strategies:

* ``brute_topk`` — exact baseline (same as operators.search.knn);
  the recall oracle for everything below.
* ``rp_lsh_*`` — random-hyperplane (signed random projection) LSH:
  deterministic seeded hyperplanes, sign-bit bucket codes, multi-table
  banding. Candidate generation is an equi-join on (table, code) —
  never quadratic. Good for cosine similarity.
* ``ivf_*`` — inverted-file index: k-means-style coarse centroids
  (deterministic seeded init + a few Lloyd iterations in DataFrames),
  each vector assigned to its nearest centroid; queries probe the
  ``nprobe`` nearest cells. This is the classic billion-scale layout:
  the centroid table is tiny (broadcast), the big table is
  partitioned/clustered by cell id so a query touches nprobe
  partitions only.

MLlib's BucketedRandomProjectionLSH covers the L2 case; these are
implemented directly in DataFrame expressions to keep cosine support,
deterministic behavior, and full pushdown visibility.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vector_database_spark.functions.vector import dot, euclidean, l2_norm


def _hyperplanes(dims: int, n_bits: int, n_tables: int, seed: int) -> list[list[list[float]]]:
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dims)] for _ in range(n_bits)]
        for _ in range(n_tables)
    ]


def rp_lsh_codes(
    df: DataFrame,
    *,
    id_col: str = "id",
    vector_col: str = "vector",
    dims: int,
    n_bits: int = 12,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(id, table, code): sign-bit bucket code per hash table."""
    planes = _hyperplanes(dims, n_bits, n_tables, seed)
    rows = []
    v = F.col(vector_col)
    for t, table in enumerate(planes):
        bits = []
        for b, plane in enumerate(table):
            proj = dot(v, F.array(*[F.lit(x) for x in plane]))
            bits.append(F.when(proj >= 0, F.lit(1 << b)).otherwise(F.lit(0)))
        code = bits[0]
        for extra in bits[1:]:
            code = code + extra
        rows.append(
            F.struct(F.lit(t).alias("table"), code.cast("long").alias("code"))
        )
    return df.select(
        F.col(id_col).alias("id"),
        v.alias("_vec"),
        F.explode(F.array(*rows)).alias("tc"),
    ).select(
        "id", "_vec", F.col("tc.table").alias("table"), F.col("tc.code").alias("code")
    )


def rp_lsh_knn(
    vectors_df: DataFrame,
    queries_df: DataFrame,
    k: int,
    *,
    id_col: str = "id",
    vector_col: str = "vector",
    dims: int,
    n_bits: int = 12,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine kNN: queries and vectors share bucket codes;
    candidates = bucket-mates in ANY table; rank candidates exactly.

    Returns (qid, id, cos_dist, rank). Recall depends on
    n_bits/n_tables; verify against `brute_topk` in tests."""
    vc = rp_lsh_codes(
        vectors_df,
        id_col=id_col,
        vector_col=vector_col,
        dims=dims,
        n_bits=n_bits,
        n_tables=n_tables,
        seed=seed,
    )
    qc = rp_lsh_codes(
        queries_df.select(
            F.col("qid").alias("id"), F.col("qvec").alias("vector")
        ),
        dims=dims,
        n_bits=n_bits,
        n_tables=n_tables,
        seed=seed,
    ).select(
        F.col("id").alias("qid"),
        F.col("_vec").alias("qvec"),
        "table",
        "code",
    )
    cand = (
        vc.join(qc, ["table", "code"])
        .select("qid", "qvec", "id", "_vec")
        .distinct()
    )
    cos_dist = 1.0 - dot(F.col("_vec"), F.col("qvec")) / (
        l2_norm(F.col("_vec")) * l2_norm(F.col("qvec"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_dist").asc(), F.col("id").asc())
    return (
        cand.withColumn("cos_dist", cos_dist)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "id", "cos_dist", "rank")
    )


def ivf_build(
    df: DataFrame,
    *,
    id_col: str = "id",
    vector_col: str = "vector",
    n_cells: int = 16,
    iters: int = 3,
    seed: int = 42,
) -> tuple[DataFrame, list[list[float]]]:
    """Train coarse centroids (mini Lloyd in DataFrames) and assign
    every vector to its nearest cell.

    Returns (assigned_df with `cell` column, centroids). Init is the
    first n_cells vectors by a seeded hash order — deterministic.
    At real scale: sample ~256k rows for training, persist the
    assignment clustered by cell (the inverted file), broadcast the
    centroid table everywhere.
    """
    vecs = df.select(F.col(id_col).alias("id"), F.col(vector_col).alias("vector"))
    # deterministic sample: order by murmur hash of id
    init = (
        vecs.withColumn("_h", F.hash(F.col("id") + F.lit(seed)))
        .orderBy("_h")
        .limit(n_cells)
        .collect()
    )
    centroids = [[float(x) for x in r.vector] for r in init]

    for _ in range(iters):
        with_cell = _assign_cells(vecs, centroids)
        # recompute centroids as per-cell per-dimension means
        means = (
            with_cell.select("cell", F.posexplode("vector").alias("idx", "val"))
            .groupBy("cell", "idx")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r.cell, {})[r.idx] = r.m
        dims = len(centroids[0])
        centroids = [
            [by_cell.get(c, {}).get(d, centroids[c][d]) for d in range(dims)]
            for c in range(len(centroids))
        ]

    return _assign_cells(vecs, centroids), centroids


def _assign_cells(vecs: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Attach the nearest-centroid `cell` column (argmin of squared L2
    over the broadcast centroid array, all in codegen)."""
    cent_arr = F.array(*[F.array(*[F.lit(x) for x in c]) for c in centroids])
    d2 = (
        "transform(_cents, c -> aggregate(zip_with(vector, c, "
        "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), 0D, (a, v) -> a + v))"
    )
    return (
        vecs.withColumn("_cents", cent_arr)
        .withColumn(
            "cell",
            F.expr(f"array_position({d2}, array_min({d2})) - 1").cast("int"),
        )
        .drop("_cents")
    )


def ivf_knn(
    assigned_df: DataFrame,
    centroids: list[list[float]],
    queries_df: DataFrame,
    k: int,
    *,
    nprobe: int = 4,
) -> DataFrame:
    """Probe the nprobe nearest cells per query, rank candidates
    exactly: (qid, id, dist, rank). At scale the assigned table is
    partitioned by `cell`, so each query reads nprobe partitions —
    partition pruning does the fan-out reduction."""
    spark = assigned_df.sparkSession
    cents = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cell int, cvec array<double>"
    )
    qc = (
        queries_df.crossJoin(F.broadcast(cents))
        .withColumn("cdist", euclidean(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cdist").asc(), F.col("cell").asc())
    probes = (
        qc.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= nprobe)
        .select("qid", "qvec", "cell")
    )
    cand = assigned_df.join(F.broadcast(probes), "cell")
    wk = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        cand.withColumn("dist", euclidean(F.col("vector"), F.col("qvec")))
        .withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .select("qid", "id", "dist", "rank")
    )


def ivf_write(
    assigned_df: DataFrame, centroids: list[list[float]], path: str
) -> None:
    """Persist the inverted file: vectors partitioned by cell (the
    physical layout that makes nprobe search touch nprobe partitions),
    plus the centroid table alongside."""
    spark = assigned_df.sparkSession
    assigned_df.repartition("cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{path}/vectors")
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, cvec array<double>",
    ).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_read(spark, path: str) -> tuple[DataFrame, list[list[float]]]:
    assigned = spark.read.parquet(f"{path}/vectors")
    cents = [
        list(r.cvec)
        for r in spark.read.parquet(f"{path}/centroids").orderBy("cell").collect()
    ]
    return assigned, cents
