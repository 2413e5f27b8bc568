"""Streaming data-quality monitoring: histogram state accumulated per
micro-batch + chi-square drift against a reference snapshot — the
streaming twin of `sketch.distribution_drift` (monitoring is naturally
a streaming concern: the reference histogram is yesterday's crawl, the
accumulating one is today's feed).

State layout follows the repo's crash-safe parquet-state rule
(streaming/dedup.py): per-batch counts land in ``batch=<id>`` dirs
with mode=overwrite — idempotent under foreachBatch's at-least-once
redelivery (a redelivered batch overwrites its own directory instead
of double-counting) — and readers aggregate across batch dirs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _bin_expr(value_col: str, lo: float, hi: float, n_bins: int):
    width = (float(hi) - float(lo)) / int(n_bins)
    val = F.col(value_col).cast("double")
    b = F.floor((val - F.lit(float(lo))) / F.lit(width)).cast("long")
    return val, F.least(F.greatest(b, F.lit(0)), F.lit(int(n_bins) - 1))


def streaming_histogram_ingest(
    stream_df: DataFrame,
    state_path: str,
    checkpoint: str,
    *,
    value_col: str = "value",
    lo: float,
    hi: float,
    n_bins: int = 16,
    group_cols: list[str] | None = None,
    trigger_once: bool = False,
):
    """foreachBatch sink accumulating per-(group, bin) counts: each
    micro-batch writes ITS OWN aggregated counts (n_bins × groups
    rows — the map-side-combined histogram shape, never raw rows)
    into ``batch=<id>``; `read_histogram` sums across batches. The
    state is mergeable by construction, so restarts and redeliveries
    are safe without read-modify-write."""
    gp = list(group_cols or [])

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        val, b = _bin_expr(value_col, lo, hi, n_bins)
        h = (
            batch_df.where(val.isNotNull() & ~F.isnan(val))
            .select(*gp, b.alias("bin"))
            .groupBy(*gp, "bin")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        h.write.mode("overwrite").parquet(f"{state_path}/batch={batch_id}")

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_histogram(
    spark: SparkSession, state_path: str, *, group_cols: list[str] | None = None
) -> DataFrame:
    """Merged (group…, bin, c) across all committed batch dirs."""
    gp = list(group_cols or [])
    return (
        spark.read.option("basePath", state_path)
        .parquet(f"{state_path}/batch=*")
        .groupBy(*gp, "bin")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def drift_vs_reference(
    current: DataFrame,
    reference: DataFrame,
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Chi-square drift of the accumulated stream histogram against a
    reference histogram (both ``(group…, bin, c)``) — identical term
    arithmetic and bin-ordered fold as `sketch.distribution_drift`,
    so streamed-then-compared equals batch-compared exactly."""
    gp = list(group_cols or [])
    a = current.select(*gp, "bin", F.col("c").alias("a"))
    b = reference.select(*gp, "bin", F.col("c").alias("b"))
    j = (
        a.join(b, [*gp, "bin"], "full_outer")
        .select(
            *gp,
            "bin",
            F.coalesce("a", F.lit(0)).cast("long").alias("a"),
            F.coalesce("b", F.lit(0)).cast("long").alias("b"),
        )
    )
    totals = j.groupBy(*gp).agg(
        F.sum("a").cast("long").alias("n_a"),
        F.sum("b").cast("long").alias("n_b"),
    )
    jt = j.join(F.broadcast(totals), gp) if gp else j.crossJoin(
        F.broadcast(totals)
    )
    jt = jt.where((F.col("n_a") > 0) & (F.col("n_b") > 0))
    pa = F.col("a") / F.col("n_a").cast("double")
    pb = F.col("b") / F.col("n_b").cast("double")
    term = ((pa - pb) * (pa - pb)) / (pa + pb)
    return (
        jt.where(F.col("a") + F.col("b") > 0)
        .withColumn("term", term)
        .groupBy(*gp)
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.count(F.lit(1)).cast("long").alias("bins_used"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("bin", "term"))),
                    lambda s: s["term"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("chi2"),
        )
    )


def streaming_quantile_sketch_ingest(
    stream_df: DataFrame,
    state_path: str,
    checkpoint: str,
    *,
    id_col: str,
    value_col: str = "value",
    key_cols: list[str] | None = None,
    m: int = 256,
    salt: int = 9001,
    trigger_once: bool = False,
):
    """Streaming twin of `sketch.quantile_sketch` (round-6 verdict
    item 7): each micro-batch writes ITS OWN per-key bottom-m sketch
    state (keys × m rows, never the data) into ``batch=<id>`` —
    idempotent under redelivery (a redelivered batch overwrites its
    own dir), crash-safe like every parquet state in this repo.
    `read_quantile_sketch` merges across batch dirs; because the
    sample is bottom-m by a SEEDED ROW HASH, the merged state equals
    the batch-mode sketch over the union of all rows EXACTLY, for any
    micro-batch split and across restarts (order-independence is the
    whole point of hashing instead of KLL compaction here)."""
    gp = list(key_cols or [])

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from vector_database_spark.operators.sketch import quantile_sketch

        st = quantile_sketch(
            batch_df,
            id_col=id_col,
            value_col=value_col,
            key_cols=gp,
            m=m,
            salt=salt,
        )
        st.write.mode("overwrite").parquet(f"{state_path}/batch={batch_id}")

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_quantile_sketch(
    spark: SparkSession,
    state_path: str,
    *,
    key_cols: list[str] | None = None,
    m: int = 256,
) -> DataFrame:
    """The merged sketch state across all committed batch dirs —
    identical to `sketch.quantile_sketch` over the full stream."""
    from vector_database_spark.operators.sketch import quantile_sketch_merge

    gp = list(key_cols or [])
    states = spark.read.option("basePath", state_path).parquet(
        f"{state_path}/batch=*"
    )
    return quantile_sketch_merge(states, key_cols=gp, m=m)


def streaming_hll_ingest(
    stream_df: DataFrame,
    state_path: str,
    checkpoint: str,
    *,
    value_col: str,
    key_cols: list[str] | None = None,
    p: int = 8,
    salt: int = 77,
    trigger_once: bool = False,
):
    """Streaming HyperLogLog: each micro-batch writes its own
    register table into ``batch=<id>`` (the repo's crash-safe state
    rule); `read_hll` max-merges across dirs. Registers are MAXIMA,
    so redelivery, restarts, and merge order are all trivially safe —
    the merged state equals `sketch.hll_registers` over every row
    ever seen, bit-for-bit."""
    gp = list(key_cols or [])

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from vector_database_spark.operators.sketch import hll_registers

        regs = hll_registers(
            batch_df, value_col=value_col, key_cols=gp, p=p, salt=salt
        )
        regs.write.mode("overwrite").parquet(f"{state_path}/batch={batch_id}")

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_hll(
    spark: SparkSession,
    state_path: str,
    *,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Merged HLL registers across all committed batch dirs."""
    from vector_database_spark.operators.sketch import hll_merge

    gp = list(key_cols or [])
    regs = spark.read.option("basePath", state_path).parquet(
        f"{state_path}/batch=*"
    )
    return hll_merge(regs.select(*gp, "bucket", "reg"), key_cols=gp)


def streaming_bloom_ingest(
    stream_df: DataFrame,
    state_path: str,
    checkpoint: str,
    *,
    key_col: str = "key",
    n_bits: int = 16384,
    k: int = 3,
    trigger_once: bool = False,
):
    """Streaming Bloom filter: each micro-batch writes its own lane
    table into ``batch=<id>`` (the crash-safe state rule);
    `read_bloom` bit_or-merges across dirs. Lane bits are ORed
    monotone state, so redelivery, restarts, and merge order are all
    trivially safe — the merged filter equals `sketch.bloom_build`
    over every row ever seen, bit-for-bit (the streaming-HLL
    argument with max swapped for bitwise-or)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from vector_database_spark.operators.sketch import bloom_build

        lanes = bloom_build(
            batch_df, key_col=key_col, n_bits=n_bits, k=k
        )
        lanes.write.mode("overwrite").parquet(
            f"{state_path}/batch={batch_id}"
        )

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_kmv_ingest(
    stream_df: DataFrame,
    state_path: str,
    checkpoint: str,
    *,
    value_col: str = "key",
    k: int = 64,
    trigger_once: bool = False,
):
    """Streaming KMV sketch: each micro-batch writes ITS OWN bottom-k
    sketch (`sketch.kmv_sketch` — one row, ≤ k longs) into
    ``batch=<id>``; `read_kmv` merges by selection algebra (bottom-k
    of the concatenated mins == the sketch of everything ever seen —
    the order-independent, idempotent-under-redelivery property the
    bloom/HLL twins rely on). The merged sketch feeds
    `sketch.kmv_set_estimates` directly, e.g. day-over-day user-set
    union/intersection estimates from two state dirs."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from vector_database_spark.operators.sketch import kmv_sketch

        sk = kmv_sketch(batch_df, value_col, k=k)
        sk.write.mode("overwrite").parquet(f"{state_path}/batch={batch_id}")

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_kmv(spark: SparkSession, state_path: str, *, k: int = 64) -> DataFrame:
    """Merged bottom-k sketch across all committed batch dirs: ONE
    (mins) row — flatten the per-batch arrays, distinct, sort, cut
    (exactly the sketch a one-shot batch pass produces,
    pytest-pinned)."""
    from pyspark.sql import functions as F

    batches = spark.read.option("basePath", state_path).parquet(
        f"{state_path}/batch=*"
    )
    return (
        batches.select(F.explode("mins").alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(int(k))
        .groupBy()
        .agg(F.sort_array(F.collect_list("hv")).alias("mins"))
    )


def read_bloom(spark: SparkSession, state_path: str) -> DataFrame:
    """Merged Bloom lanes across all committed batch dirs.

    State dirs written before geometry binding (round 9) carry only
    (lane, bits); those batches were all built with the historical
    defaults (16384, 3), so missing geometry columns are backfilled
    with them before the merge. Spark's parquet union resolves a
    column present in SOME batch files as null in the others, so the
    backfill is per-ROW coalesce, which also merges a state dir
    mixing old and new batch files correctly — provided the new
    batches use the same defaults (anything else is a mixed-geometry
    state dir, and the grouped merge keeps those lanes separate so
    `bloom_probe`'s validation rejects them loudly)."""
    from pyspark.sql import functions as F

    lanes = spark.read.option("basePath", state_path).parquet(
        f"{state_path}/batch=*"
    )
    for col, default in (("n_bits", 16384), ("k", 3)):
        if col not in lanes.columns:
            lanes = lanes.withColumn(col, F.lit(default))
        else:
            lanes = lanes.withColumn(
                col, F.coalesce(F.col(col), F.lit(default))
            )
    # geometry columns are constants per build; grouping by them
    # keeps them on the merged filter (bloom_probe reads + validates)
    return lanes.groupBy("lane", "n_bits", "k").agg(
        F.bit_or("bits").alias("bits")
    ).select("lane", "bits", "n_bits", "k")
