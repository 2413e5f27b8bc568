"""Streaming hypertable rollup — continuous-aggregate maintenance.

The streaming twin of `operators.timeseries`: each micro-batch is
collapsed to its finest-resolution rollup delta (a few rows per
touched (bucket, key)) and persisted; readers merge base + deltas and
cascade to any registered resolution. Because the rollup state is
exact-mergeable, the stored aggregate equals the batch rollup of all
events ever ingested — across micro-batch boundaries, redeliveries,
and restarts.

Storage layout under ``state_path`` (plain parquet, no state store —
queryable, restart-safe, seedable from a batch backfill):

* ``delta/batch=<id>/`` — the micro-batch's finest-level rollup.
  Written with per-batch OVERWRITE, so foreachBatch's at-least-once
  redelivery replaces the same rows instead of double-counting.
* ``base/upto=<id>/`` — compacted merge of every delta with
  batch <= id. Readers use ONLY the highest ``upto`` plus deltas
  beyond it, so a crash between writing a new base and deleting the
  merged deltas can never double-count: stale deltas are ignored by
  construction and deleted as hygiene on the next compaction.

Compaction at batch N merges deltas <= N-1 only (micro-batches run
serially, so those are committed and can never be redelivered; batch
N itself is the only replay candidate and always stays a delta until
a LATER batch compacts it).

At 100 TB the batch delta is |touched buckets x keys| rows — the
shuffle is bounded by key cardinality, never the event rate — and a
reader merges one compacted base with at most ``compact_every``
deltas.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from vector_database_spark.operators.timeseries import (
    cascade_rollup,
    merge_rollup_many,
    rollup_events,
)


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def _list_ids(spark: SparkSession, path: str, prefix: str) -> list[int]:
    """COMMITTED batch/upto ids under `path` (`<prefix>=<id>` dirs),
    via a driver-side FS listing — no data read. Only dirs whose
    parquet job committed (`_SUCCESS` marker present) count: a crash
    mid-write leaves a partial dir, and trusting it would corrupt the
    state permanently (readers would skip the still-present deltas
    'by construction' while reading a broken base). Partial dirs are
    simply ignored — the writer's overwrite (delta replay) or the
    next compaction (base) replaces them."""
    fs, hpath = _fs(spark, path)
    jvm = spark._jvm
    if not fs.exists(hpath):
        return []
    out = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if name.startswith(f"{prefix}="):
            try:
                bid = int(name.split("=", 1)[1])
            except ValueError:
                continue
            ok = jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
            if fs.exists(ok):
                out.append(bid)
    return sorted(out)


def _delete(spark: SparkSession, path: str) -> None:
    fs, hpath = _fs(spark, path)
    fs.delete(hpath, True)


def read_rollup(
    spark: SparkSession,
    state_path: str,
    *,
    key_cols: Sequence[str] = ("event_type",),
    width_s: int | None = None,
    finest_s: int = 60,
    as_of_batch: int | None = None,
) -> DataFrame | None:
    """Current rollup state: highest-`upto` base merged with every
    delta beyond it, cascaded to `width_s` when coarser than the
    stored finest resolution. None if nothing was ingested yet.

    ``as_of_batch`` reads the state AS OF that micro-batch id (time
    travel): the newest base with ``upto <= as_of_batch`` plus deltas
    in ``(upto, as_of_batch]``. Requires the writer to keep history
    (``streaming_rollup_ingest(retain_history=True)``) — the default
    compaction prunes superseded bases/deltas, and a pruned as-of
    read raises instead of silently returning the wrong snapshot."""
    bases = _list_ids(spark, f"{state_path}/base", "upto")
    deltas = _list_ids(spark, f"{state_path}/delta", "batch")
    if as_of_batch is None:
        upto = bases[-1] if bases else -1
    else:
        cut = int(as_of_batch)
        eligible = [b for b in bases if b <= cut]
        upto = eligible[-1] if eligible else -1
        if upto == -1 and bases and (not deltas or deltas[0] != 0):
            # A base NEWER than the cut exists but no base at/below
            # it, and delta 0 is gone: the pre-cut deltas were
            # compacted into that newer base and deleted — the
            # snapshot is unreconstructable. The delta-0 probe also
            # catches a compaction that CRASHED mid-hygiene (deletes
            # run in ascending batch order, so any partial delete
            # removes delta 0 first) — without it a half-deleted
            # prefix would silently yield an incomplete snapshot.
            # Caveat: a stream whose batch 0 was EMPTY writes no
            # delta 0 and refuses here even under retain_history.
            raise ValueError(
                f"read_rollup: history before batch {cut} was "
                "compacted away — ingest with retain_history=True "
                "for as-of reads"
            )
        deltas = [b for b in deltas if b <= cut]
    parts = []
    if upto >= 0:
        parts.append(spark.read.parquet(f"{state_path}/base/upto={upto}"))
    for b in deltas:
        if b > upto:
            parts.append(spark.read.parquet(f"{state_path}/delta/batch={b}"))
    if not parts:
        return None
    # ONE union + ONE aggregate — a pairwise merge chain would run
    # len(parts)-1 sequential shuffle aggregations
    merged = merge_rollup_many(parts, key_cols=key_cols)
    if width_s is not None and int(width_s) != int(finest_s):
        merged = cascade_rollup(
            merged, int(width_s), key_cols=key_cols,
            finer_width_s=int(finest_s),
        )
    return merged


def streaming_rollup_ingest(
    events_stream: DataFrame,
    state_path: str,
    *,
    finest_s: int = 60,
    ts_col: str = "ts",
    id_col: str = "event_id",
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    first_last: bool = True,
    checkpoint: str | None = None,
    compact_every: int = 8,
    retain_history: bool = False,
):
    """Maintain the finest-level rollup of an events stream under
    ``state_path``. Returns the started StreamingQuery; query the
    state at any resolution with `read_rollup`. ``first_last=False``
    keeps the state fixed-width (pure HashAggregate per batch — the
    metrics-pipeline shape); readers infer the schema either way.

    ``retain_history=True`` keeps superseded bases and compacted
    deltas on disk instead of deleting them, enabling
    ``read_rollup(..., as_of_batch=N)`` time travel to ANY committed
    batch (the Delta-Lake-style snapshot story at rollup granularity);
    current-state reads are unaffected — they always use the newest
    base + newer deltas. Storage grows with history; prune externally
    when snapshots age out."""
    keys = tuple(key_cols)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        delta = rollup_events(
            batch_df,
            int(finest_s),
            ts_col=ts_col,
            id_col=id_col,
            key_cols=keys,
            value_col=value_col,
            first_last=first_last,
        )
        # redelivery-idempotent: the batch replaces its own partition
        delta.write.mode("overwrite").parquet(
            f"{state_path}/delta/batch={batch_id}"
        )
        bases = _list_ids(spark, f"{state_path}/base", "upto")
        upto = bases[-1] if bases else -1
        pending = [
            b
            for b in _list_ids(spark, f"{state_path}/delta", "batch")
            if upto < b < batch_id  # never the replayable current batch
        ]
        if len(pending) < int(compact_every):
            return
        parts = (
            [spark.read.parquet(f"{state_path}/base/upto={upto}")]
            if bases
            else []
        )
        parts += [
            spark.read.parquet(f"{state_path}/delta/batch={b}")
            for b in pending
        ]
        merged = merge_rollup_many(parts, key_cols=keys)
        new_upto = pending[-1]
        # materialize before any delete: the plan reads the old base
        merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(
            f"{state_path}/base/upto={new_upto}"
        )
        # hygiene only — readers already ignore everything below:
        # stale bases and deltas <= the new upto. retain_history keeps
        # them for as-of reads (time travel).
        if not retain_history:
            for b in bases:
                _delete(spark, f"{state_path}/base/upto={b}")
            for b in pending:
                _delete(spark, f"{state_path}/delta/batch={b}")

    w = events_stream.writeStream.foreachBatch(_process)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()
