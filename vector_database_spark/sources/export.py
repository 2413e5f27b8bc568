"""Export sinks (reference O28: CSV dumps of index rows and vector
sets, VectorIndex.MainTest/Program.cs:76-80,93-131,145-149)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_index_csv(index_df: DataFrame, path: str, *, header: bool = True) -> None:
    """Index rows as CSV: RangeID,Dimension,Mid,ID shape of the
    reference plus our doc/child columns."""
    (
        index_df.select(
            "doc_id",
            "range_id",
            "dimension",
            "mid",
            "low_range_id",
            "high_range_id",
            "id",
        )
        .write.mode("overwrite")
        .option("header", str(header).lower())
        .csv(path)
    )


def export_vectors_csv(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "id",
    vector_col: str = "vector",
    header: bool = True,
) -> None:
    """Vectors as `id|comma-joined components` — the reference's
    train/test dump format (Program.cs:145-149)."""
    (
        df.select(
            F.col(id_col).alias("id"),
            F.concat_ws(",", F.col(vector_col).cast("array<string>")).alias("vector"),
        )
        .write.mode("overwrite")
        .option("header", str(header).lower())
        .option("sep", "|")
        .csv(path)
    )


def export_jsonl(
    df: DataFrame,
    path: str,
    *,
    compression: str | None = "gzip",
) -> None:
    """Training-data JSONL sink: one JSON object per line, gzip by
    default (the interchange format LLM data pipelines feed trainers
    and labelers). Spark's json writer is distributed and splittable
    per file; pair with `.repartition(n)` upstream to control shard
    count/size."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark, path: str, schema: str | None = None) -> DataFrame:
    """Read a JSONL dataset back; pass an explicit DDL ``schema`` to
    skip the inference pass (an extra full read at scale)."""
    r = spark.read
    if schema:
        r = r.schema(schema)
    return r.json(path)


def export_orc(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] | None = None,
    compression: str = "zstd",
) -> None:
    """Columnar ORC sink (Spark-native second columnar format beside
    parquet — what Hive/Trino warehouses often mandate). zstd by
    default; pass ``partition_by`` for partition-pruned reads."""
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark, path: str) -> DataFrame:
    """Read an ORC dataset (schema travels with the files; predicate
    pushdown and column pruning work as with parquet)."""
    return spark.read.orc(path)
