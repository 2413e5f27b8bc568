"""Synthetic vector-set generators mirroring the reference's fixtures
(FIXTURES.md §A; VectorIndex.MainTest/Program.cs:54-66,163-181 and the
grid fixtures in MemoryVectorIndexTests.cs:10-113).

All generators are distributed (spark.range + column expressions) and
deterministic — no driver-side materialization, so they scale to any
row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def random_uniform(
    spark: SparkSession, n: int, dims: int, seed: int = 0
) -> DataFrame:
    """Seeded uniform vectors with components in [-1, 1]
    (reference GetRandomDataset, Program.cs:163-181)."""
    # One rand column per dimension keeps everything in codegen; the
    # per-dimension seed offset makes components independent.
    cols = F.array(*[F.rand(seed + i) * 2.0 - 1.0 for i in range(dims)])
    return spark.range(n).select(
        F.col("id"), cols.cast("array<float>").alias("vector")
    )


def one_hot(spark: SparkSession, dims: int) -> DataFrame:
    """Adversarial identity set: vector[k] = 1 iff k == id
    (Program.cs:54-66). Every dimension has equal variance — exercises
    split-dimension tie-breaking."""
    seq = F.sequence(F.lit(0), F.lit(dims - 1))
    vec = F.transform(
        seq, lambda k: F.when(k == F.col("id"), F.lit(1.0)).otherwise(F.lit(0.0))
    )
    return spark.range(dims).select(
        F.col("id"), vec.cast("array<float>").alias("vector")
    )


def grid_2d(spark: SparkSession, side: int, normalized: bool = True) -> DataFrame:
    """Regular side×side 2-D grid; `normalized` scales into [-1, 1]
    (grid fixtures, MemoryVectorIndexTests.cs:10-113)."""
    half = (side - 1) / 2.0
    scale = half if half > 0 else 1.0
    i = (F.col("id") / side).cast("long").cast("double")
    j = (F.col("id") % side).cast("double")
    if normalized:
        vec = F.array((i - half) / scale, (j - half) / scale)
    else:
        vec = F.array(i - 1.0, j - 1.0)
    return spark.range(side * side).select(
        F.col("id"), vec.cast("array<float>").alias("vector")
    )


def clusters(
    spark: SparkSession,
    n: int,
    dims: int,
    n_clusters: int = 10,
    seed: int = 0,
    spread: float = 0.08,
) -> DataFrame:
    """Clustered points à la the 2d-10c ARFF fixture
    (MemoryVectorIndexTests.cs:116-134): deterministic cluster centers
    in [-0.8, 0.8], deterministic sin-hash jitter around them, clamped
    into [-1, 1]. Fully reproducible without RNG state."""
    df = spark.range(n).withColumn(
        "_cluster", (F.col("id") % n_clusters).cast("int")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda d: F.least(
            F.greatest(
                F.sin((F.col("_cluster") + 1) * 2654435.761 + d * 97.13) * 0.8
                + F.sin(F.col("id") * 12.9898 + d * 78.233 + F.lit(float(seed)))
                * spread,
                F.lit(-1.0),
            ),
            F.lit(1.0),
        ),
    )
    return df.select(
        "id",
        F.col("_cluster").alias("label"),
        vec.cast("array<float>").alias("vector"),
    )
