"""Streaming dedup — the ingest-time twin of `operators.dedup`.

A training-data firehose dedups at ingest so duplicates never reach
storage: key every document by its normalized-text hash and drop
repeats inside the watermark horizon. State is one key per distinct
document bounded by the watermark (Spark expires keys older than the
event-time horizon) — the streaming analog of `exact_dedup`'s
hash-groupBy, with the same normalization, so a batch backfill and the
streaming path keep identical keys.

The batch sketches (`operators.sketch.count_min`, KMV) run UNCHANGED
on streaming DataFrames (explode + groupBy are stream-capable
aggregations) — tested in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_database_spark.operators.dedup import normalize_text


def streaming_exact_dedup(
    docs: DataFrame,
    *,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop exact duplicates (normalized text) arriving within the
    watermark horizon. Exactly one document per key survives; a key
    already in state always drops later arrivals (cross-batch
    determinism), but WITHIN one micro-batch the surviving row is
    engine-chosen (partition order), as with Spark's own
    dropDuplicates. State size is the distinct-document count inside
    the horizon, not the stream length — the property that makes this
    run forever at ingest scale."""
    keyed = docs.withColumn("_dedup_key", F.md5(normalize_text(text_col)))
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_dedup_key"])
        .drop("_dedup_key")
    )
