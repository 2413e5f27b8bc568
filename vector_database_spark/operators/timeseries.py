"""Hypertable rollup: cascading multi-resolution time-bucket aggregates.

The brief's "hypertable rollup" (TimescaleDB continuous-aggregate
shape): raw events are aggregated once into the FINEST time bucket;
every coarser resolution is computed from the next-finer level, never
from raw data. The per-bucket state is deliberately mergeable —
count, fixed-point sum, min, max, and first/last carried as orderable
(ts, id, value) structs — so

* cascading is exact (hour-from-minutes == hour-from-raw, bit for
  bit: integer sums are associative, min/max are idempotent, and
  min-of-first-structs is the global first),
* incremental maintenance is a union + re-aggregate of ONLY the
  touched buckets (`merge_rollup`), the foreachBatch refresh shape.

At 100 TB: the finest rollup is ONE map-side-combinable aggregate
keyed on (bucket, keys) — partial aggregation collapses each input
partition to ~|buckets x keys| rows before the single shuffle. Every
coarser level reads the (much smaller) finer level, so a year of raw
data is scanned exactly once regardless of how many resolutions are
maintained. No windows, no driver state. With ``first_last=False``
every buffer field is a fixed-width primitive and the whole cascade
is pure HashAggregate; the OHLC struct state trades that for exact
deterministic first/last via Spark's sort-based aggregation fallback
(struct/string/min_by buffers all fall back — measured; a
decimal(38,0) pack of (ts, id) hash-aggregates but cannot carry the
value losslessly).

Value sums are carried as BIGINT micro-units (floor(value * 1e6)):
double summation is not associative, so a cascade could never
hash-match a direct computation; fixed-point sums are exact at any
grouping order and any scale (9e12 events of magnitude 1e6 fit i64).
min/max/first/last keep the raw double — they select, never
arithmetic.

Reference analog: the reference stores flat fact tables and computes
aggregates per query (DDL.sql defines no rollup storage); this module
is part of the §2.2 capability surface the brief requires beyond it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICROS = 1_000_000


def _epoch_us(df: DataFrame, ts_col: str) -> str:
    """SQL fragment for exact integer epoch-microseconds of `ts_col`.
    TIMESTAMP_NTZ (what parquet micros read as) gets the
    timezone-independent timestampdiff form — unix_micros would force
    an NTZ->TZ cast whose session-timezone offset shifts bucket
    boundaries."""
    dtype = dict(df.dtypes).get(ts_col)
    if dtype == "timestamp_ntz":
        return (
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        )
    return f"unix_micros({ts_col})"


def time_bucket_s(df: DataFrame, ts_col: str, width_s: int) -> F.Column:
    """Epoch-second start of `ts_col`'s `width_s`-wide bucket, as
    BIGINT (integer arithmetic end-to-end: exact, engine-portable)."""
    w_us = int(width_s) * MICROS
    # integer `div` end-to-end: epoch micros ~1.7e18 exceed double's
    # exact range, so a float division could misplace boundary rows
    return F.expr(
        f"CAST(({_epoch_us(df, ts_col)} div {w_us}) * {int(width_s)}"
        " AS BIGINT)"
    )


def _state_agg(first_col: str | None, last_col: str | None):
    """The mergeable aggregate set over a prepared frame carrying
    n/sum_micros/min_value/max_value (+ the orderable first/last
    structs when requested). Without first/last every buffer field is
    a fixed-width primitive, so the whole cascade runs as pure
    HashAggregate; the struct min/max forces Spark's sort-based
    aggregation fallback (measured: struct, string, and min_by
    orderings ALL fall back — only fixed-width primitives and
    decimals hash-aggregate, and a decimal(38,0) cannot carry
    (ts, id) AND the value losslessly)."""
    aggs = [
        F.sum("n").cast("long").alias("n"),
        F.sum("sum_micros").cast("long").alias("sum_micros"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    ]
    if first_col is not None:
        aggs.append(F.min(first_col).alias("first_s"))
    if last_col is not None:
        aggs.append(F.max(last_col).alias("last_s"))
    return aggs


def rollup_events(
    df: DataFrame,
    width_s: int,
    *,
    ts_col: str = "ts",
    id_col: str = "event_id",
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    first_last: bool = True,
) -> DataFrame:
    """Aggregate RAW events into `width_s`-second buckets with the
    mergeable rollup state. One aggregate pass; map-side partials
    collapse each scan partition to |buckets x keys| rows.

    ``first_last=True`` (the OHLC shape) carries deterministic
    first/last as orderable (ts, id, value) structs — exact, but the
    struct buffers force Spark's sort-based aggregation fallback.
    ``first_last=False`` keeps only fixed-width state (count / sum /
    min / max) and the whole cascade stays pure HashAggregate — the
    shape to pick for metrics rollups at the 100 TB end."""
    cols = [
        time_bucket_s(df, ts_col, width_s).alias("bucket_s"),
        *[F.col(k) for k in key_cols],
        F.lit(1).cast("long").alias("n"),
        F.floor(F.col(value_col) * F.lit(MICROS)).cast("long").alias(
            "sum_micros"
        ),
        F.col(value_col).cast("double").alias("min_value"),
        F.col(value_col).cast("double").alias("max_value"),
    ]
    if first_last:
        ord_s = F.struct(
            F.col(ts_col).alias("ts"),
            F.col(id_col).cast("long").alias("id"),
            F.col(value_col).cast("double").alias("v"),
        )
        cols.append(ord_s.alias("_ord"))
    prepared = df.select(*cols)
    fl = "_ord" if first_last else None
    return prepared.groupBy("bucket_s", *key_cols).agg(*_state_agg(fl, fl))


def cascade_rollup(
    finer: DataFrame,
    width_s: int,
    *,
    key_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Roll a finer rollup level up to `width_s`-second buckets
    WITHOUT touching raw data. Exact: integer sums re-associate
    freely, min(first_s) over finer buckets is the global first.
    `width_s` must be a multiple of the finer level's width (bucket
    starts then nest exactly). first/last presence is inferred from
    the finer level's columns."""
    has_fl = "first_s" in finer.columns
    coarse = F.expr(
        f"CAST((bucket_s div {int(width_s)}) * {int(width_s)} AS BIGINT)"
    )
    cols = [
        coarse.alias("bucket_s"),
        *[F.col(k) for k in key_cols],
        "n",
        "sum_micros",
        "min_value",
        "max_value",
    ]
    if has_fl:
        cols += [F.col("first_s").alias("_first"),
                 F.col("last_s").alias("_last")]
    prepared = finer.select(*cols)
    return prepared.groupBy("bucket_s", *key_cols).agg(
        *_state_agg("_first" if has_fl else None,
                    "_last" if has_fl else None)
    )


def hypertable_rollup(
    df: DataFrame,
    widths_s: Sequence[int] = (60, 3600),
    *,
    ts_col: str = "ts",
    id_col: str = "event_id",
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    first_last: bool = True,
) -> list[DataFrame]:
    """The full cascade: raw -> widths_s[0] -> widths_s[1] -> ...
    Each width must divide the next. Returns one DataFrame per
    resolution (mergeable state schema); `finalize_rollup` turns a
    level into the user-facing frame. See `rollup_events` for the
    ``first_last`` trade-off (exact OHLC vs pure-HashAggregate)."""
    widths = [int(w) for w in widths_s]
    if not widths:
        raise ValueError("widths_s must be non-empty")
    for a, b in zip(widths, widths[1:]):
        if b % a != 0:
            raise ValueError(
                f"each resolution must divide the next: {b} % {a} != 0"
            )
    levels = [
        rollup_events(
            df,
            widths[0],
            ts_col=ts_col,
            id_col=id_col,
            key_cols=key_cols,
            value_col=value_col,
            first_last=first_last,
        )
    ]
    for w in widths[1:]:
        levels.append(cascade_rollup(levels[-1], w, key_cols=key_cols))
    return levels


def merge_rollup(
    level: DataFrame,
    delta: DataFrame,
    *,
    key_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Merge a new batch's rollup state into an existing level of the
    SAME resolution (incremental / continuous-aggregate maintenance):
    union + one re-aggregate. Because the state is mergeable, this is
    exact — merge(rollup(A), rollup(B)) == rollup(A union B) — and
    the shuffle is bounded by touched (bucket, key) rows, not raw
    events. foreachBatch shape: rollup_events(batch) -> merge into
    the stored level -> dynamic-partition-overwrite touched buckets.
    first/last presence is inferred from the level's columns (both
    sides must agree — unionByName raises otherwise)."""
    has_fl = "first_s" in level.columns
    return level.unionByName(delta).groupBy("bucket_s", *key_cols).agg(
        *_state_agg("first_s" if has_fl else None,
                    "last_s" if has_fl else None)
    )


def finalize_rollup(level: DataFrame) -> DataFrame:
    """User-facing projection of a rollup level: extract first/last
    values from the orderable structs when present. Pure projection
    (no shuffle)."""
    tail = []
    if "first_s" in level.columns:
        tail = [F.col("first_s.v").alias("first_value"),
                F.col("last_s.v").alias("last_value")]
    return level.select(
        "bucket_s",
        *[c for c in level.columns if c not in (
            "bucket_s", "n", "sum_micros", "min_value", "max_value",
            "first_s", "last_s",
        )],
        "n",
        "sum_micros",
        "min_value",
        "max_value",
        *tail,
    )
