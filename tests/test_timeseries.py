"""Hypertable rollup contracts: cascade exactness, merge-ability
(incremental maintenance), finalize projection, width validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vector_database_spark.operators import timeseries as ts
from vector_database_spark.workload import _events


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


@pytest.fixture(scope="module")
def events(spark):
    return _events(spark, SF_DIR)


def test_cascade_equals_direct(spark, events):
    """hour-from-minutes must equal hour-from-raw bit for bit: the
    mergeable state (integer sums, min/max, orderable first/last
    structs) is the whole design."""
    minute, hour = ts.hypertable_rollup(events, (60, 3600))
    direct = ts.rollup_events(events, 3600)
    assert _sorted_rows(ts.finalize_rollup(hour)) == _sorted_rows(
        ts.finalize_rollup(direct)
    )


def test_merge_equals_full(spark, events):
    """merge(rollup(A), rollup(B)) == rollup(A union B) — the
    foreachBatch incremental-refresh contract, including a key that
    straddles the split (same bucket present in both halves)."""
    a = events.where(F.col("event_id") % 2 == 0)
    b = events.where(F.col("event_id") % 2 == 1)
    merged = ts.merge_rollup(ts.rollup_events(a, 60), ts.rollup_events(b, 60))
    full = ts.rollup_events(events, 60)
    assert _sorted_rows(ts.finalize_rollup(merged)) == _sorted_rows(
        ts.finalize_rollup(full)
    )


def test_first_last_deterministic_on_ts_ties(spark):
    """Equal timestamps break ties on id — min/max of the (ts, id, v)
    struct, not engine-chosen first/last."""
    rows = [
        (1, "2024-01-01 00:00:07", "a", 5.0),
        (2, "2024-01-01 00:00:07", "a", 3.0),
        (3, "2024-01-01 00:00:09", "a", 9.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = ts.finalize_rollup(ts.rollup_events(df, 60)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["first_value"] == 5.0  # id 1 beats id 2 at the tied ts
    assert r["last_value"] == 9.0
    assert r["n"] == 3 and r["min_value"] == 3.0 and r["max_value"] == 9.0


def test_finalize_schema_and_bucket_alignment(spark, events):
    minute = ts.rollup_events(events, 60)
    fin = ts.finalize_rollup(minute)
    assert fin.columns == [
        "bucket_s", "event_type", "n", "sum_micros",
        "min_value", "max_value", "first_value", "last_value",
    ]
    misaligned = fin.where(F.col("bucket_s") % 60 != 0).count()
    assert misaligned == 0
    # conservation: bucket counts sum to the input row count
    assert (
        fin.agg(F.sum("n")).collect()[0][0] == events.count()
    )


def test_non_nesting_widths_rejected(spark, events):
    with pytest.raises(ValueError):
        ts.hypertable_rollup(events, (60, 90))
    with pytest.raises(ValueError):
        ts.hypertable_rollup(events, ())
