"""Stream-stream joins with event-time bounds.

The remaining Structured Streaming join capability next to
windows/sessionization/keyed state: two unbounded streams joined on a
key plus an event-time interval. Watermarks on BOTH sides plus the
time-range predicate are what let Spark expire join state — without
them a stream-stream join buffers forever. State per side is bounded
by (watermark + interval) of data, regardless of stream length.

Batch frames pass through the same plan (Spark's unified semantics),
which is how tests oracle the streaming result against a plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join right-side events to left-side events with
    ``left_ts <= right_ts <= left_ts + within`` on a shared key —
    the attribution shape (impression → click within N minutes).

    Column names from both sides are preserved with ``l_`` / ``r_``
    prefixes on the timestamps; the join key keeps its name. Outer
    variants ('leftOuter'/'rightOuter') emit unmatched rows once the
    watermark passes — both sides MUST carry watermarks for state to
    expire."""
    lt = left.withColumnRenamed(left_ts, "l_ts")
    rt = right.withColumnRenamed(right_ts, "r_ts")
    if lt.isStreaming:
        lt = lt.withWatermark("l_ts", watermark)
    if rt.isStreaming:
        rt = rt.withWatermark("r_ts", watermark)
    cond = (
        (lt[on] == rt[on])
        & (rt["r_ts"] >= lt["l_ts"])
        & (rt["r_ts"] <= lt["l_ts"] + F.expr(f"INTERVAL {within}"))
    )
    joined = lt.join(rt, cond, how)
    # collapse the two key columns into one. COALESCE, not a plain
    # drop of the right side: under rightOuter the unmatched right
    # rows carry the key ONLY on the right column — dropping it would
    # NULL the key on exactly the rows the outer join exists to emit
    return joined.withColumn("_k", F.coalesce(lt[on], rt[on])).drop(
        lt[on]
    ).drop(rt[on]).withColumnRenamed("_k", on)
