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


# Cap on the driver-local training matrix: float64 CELLS (rows×dims),
# ~256 MB at the cap. The row sample is further capped by train_rows.
_TRAIN_CELL_BUDGET = 32_000_000


def ivf_build(
    df: DataFrame,
    *,
    id_col: str = "id",
    vector_col: str = "vector",
    n_cells: int = 16,
    iters: int = 3,
    seed: int = 42,
    train_rows: int = 262_144,
) -> tuple[DataFrame, list[list[float]]]:
    """Train coarse centroids and assign every vector to its nearest
    cell. Returns (assigned_df with `cell` column, centroids).

    Scale shape (the classic IVF recipe, e.g. the inverted-file layout
    of Jégou et al.'s IVFADC): Lloyd runs on a BOUNDED deterministic
    sample (≤ ``train_rows`` rows, further capped so the training
    matrix stays ≤ ~256 MB) pulled with a parallel hash-threshold
    filter — never a full-table pass per iteration, never a global
    sort. The sampled matrix trains locally in numpy (vectorized
    ‖x‖²−2x·c+‖c‖² argmin per iteration — milliseconds at 256k×64×256
    cells), then ONE distributed pass assigns all rows via the
    Arrow-batched BLAS kernel in `_assign_cells`. Init is the first
    n_cells sample rows in seeded-hash order — deterministic.
    """
    import numpy as np

    vecs = df.select(F.col(id_col).alias("id"), F.col(vector_col).alias("vector"))
    first = vecs.select(F.size("vector").alias("d")).first()
    if first is None or first["d"] is None:
        raise ValueError("ivf_build: empty input")
    dims = int(first["d"])
    cap = max(n_cells * 4, min(int(train_rows), _TRAIN_CELL_BUDGET // max(1, dims)))

    n = vecs.count()
    hashed = vecs.select(
        "id", "vector", F.xxhash64(F.col("id") + F.lit(seed)).alias("_h")
    )
    if n > cap:
        # parallel deterministic sample: keep rows whose hash falls
        # under a threshold sized with 25% margin, trim exactly below.
        thr = min(1 << 20, int((1 << 20) * 1.25 * cap / n) + 1)
        hashed = hashed.where(F.pmod(F.col("_h"), F.lit(1 << 20)) < F.lit(thr))
    rows = hashed.collect()
    rows.sort(key=lambda r: (r["_h"], r["id"]))
    rows = rows[:cap]
    X = np.asarray([r["vector"] for r in rows], dtype=np.float64)

    k = min(n_cells, len(rows))
    C = X[:k].copy()
    x2 = (X * X).sum(axis=1)
    for _ in range(max(0, int(iters))):
        d2 = x2[:, None] - 2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        a = d2.argmin(axis=1)
        counts = np.bincount(a, minlength=k).astype(np.float64)
        sums = np.zeros_like(C)
        np.add.at(sums, a, X)
        nonempty = counts > 0
        C[nonempty] = sums[nonempty] / counts[nonempty, None]
        # empty cells keep their previous centroid (reference-free
        # deterministic behavior; matches the prior DataFrame Lloyd)

    centroids = [[float(v) for v in c] for c in C]
    return _assign_cells(vecs, centroids), centroids


def _assign_cells(vecs: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Attach the nearest-centroid `cell` column.

    Arrow-batched BLAS kernel: each batch computes the full
    batch×cells squared-distance matrix as ‖x‖² − 2 X·Cᵀ + ‖c‖² and
    takes the row argmin (first minimum — the same lowest-cell
    tie-break as SQL ``array_position(array_min(...))``). The round-2
    version evaluated an interpreted array-HOF distance per (row,
    centroid) — the repo's own measured-8×-slow pattern — and fell
    over at thousands of cells; one dgemm per batch doesn't.
    """
    from pyspark.sql.types import IntegerType, StructField, StructType

    cents = [[float(x) for x in c] for c in centroids]
    out_schema = StructType(list(vecs.schema.fields) + [StructField("cell", IntegerType())])

    def assign(batches):
        import numpy as np

        C = np.asarray(cents, dtype=np.float64)
        c2 = (C * C).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["vector"]]
            )
            d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c2[None, :]
            out = pdf.copy()
            out["cell"] = d2.argmin(axis=1).astype("int32")
            yield out

    return vecs.mapInPandas(assign, out_schema)


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
