"""Sketch / sampling operators for 100 TB-scale profiling.

Spark ships HyperLogLog (`approx_count_distinct`) and GK quantiles
(`percentile_approx`), but their estimates are engine-internal — no
external oracle can reproduce them bit-for-bit. The operators here are
the *deterministic* counterparts a data-quality gate can hash-check:

* ``kmv_distinct`` — K-Minimum-Values distinct-count estimator
  (Bar-Yossef et al. 2002): hash every value with the md5-derived
  ``h60``, keep the k smallest distinct hashes per group, estimate
  ``(k-1) / u_k`` where ``u_k = (kth+1)/2^60`` maps the k-th smallest
  hash into (0, 1]. Any engine with md5 computes the identical estimate, so the
  *approximation itself* is oracle-checkable — unlike HLL.
* ``hash_sample`` — deterministic Bernoulli sampling by hash bucket:
  the same row set on every engine, every run, any partitioning. The
  standard trick for reproducible train/eval splits and for profiling
  a 100 TB table by reading ~1% of it.

Scale shape: ``kmv_distinct`` is one distinct (map-side combined) plus
one k-row-per-group window — the sketch state is k longs per group,
like HLL's register array. ``hash_sample`` is a pure filter: it pushes
into the scan, samples consistently across tables (same key ⇒ same
fate, enabling joinable samples), and never shuffles.

Reference context: the reference has no sketches (SURVEY.md §2.2);
these belong to the north-star profiling surface alongside dedup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vector_database_spark.functions.hashing import h60, h60_sql

# h60 yields 60-bit hashes; dividing by 2^60 maps them into [0, 1).
H60_SPAN = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col,
    *,
    k: int = 64,
    estimate_col: str = "est_distinct",
) -> DataFrame:
    """Per-group distinct-count estimate from the k minimum hash values.

    ``value_col`` may be a column name or a Column (cast to string
    before hashing so the oracle's VARCHAR rendering agrees). Groups
    with fewer than k distinct hashes report the exact distinct count
    (the sketch is lossless below its capacity).
    """
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    hashed = (
        df.select(*group_cols, h60(val.cast("string")).alias("hv"))
        # NULL values hash to NULL: they are not a distinct VALUE and
        # the two engines order NULLs differently (Spark nulls-first,
        # DuckDB nulls-last) — a NULL in the reservoir would both
        # steal a slot and desynchronize the k-th statistic
        .where(F.col("hv").isNotNull())
        .distinct()  # (group, hash) dedup: map-side combined, k-bounded later
    )
    w = Window.partitionBy(*group_cols).orderBy("hv")
    kept = (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("hv").alias("kth"),
        )
    )
    # (kth + 1) maps the hash into (0, 1]: a group whose k-th smallest
    # hash is 0 (probability ~2^-60 but catastrophic) would otherwise
    # divide by zero. Bias introduced: ≤ 2^-60 relative — none at the
    # double's 53-bit precision for realistic kth.
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.lit(float(k - 1))
        / ((F.col("kth") + F.lit(1)).cast("double") / F.lit(H60_SPAN))
    )
    return kept.select(*group_cols, est.alias(estimate_col))


def kmv_distinct_sql(
    table: str,
    group_cols: list[str],
    value_expr: str,
    *,
    k: int = 64,
    estimate_col: str = "est_distinct",
) -> str:
    """DuckDB rendering of the identical estimate (the oracle side)."""
    groups = ", ".join(group_cols)
    hv = h60_sql(f"CAST({value_expr} AS VARCHAR)")
    return f"""
WITH hashed AS (
  SELECT DISTINCT {groups}, {hv} AS hv FROM {table}
  WHERE {hv} IS NOT NULL
), ranked AS (
  SELECT {groups}, hv,
         row_number() OVER (PARTITION BY {groups} ORDER BY hv) AS rn
  FROM hashed
), kept AS (
  SELECT {groups}, count(*) AS n_kept, max(hv) AS kth
  FROM ranked WHERE rn <= {k} GROUP BY {groups}
)
SELECT {groups},
       CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
            ELSE {float(k - 1)} / (CAST(kth + 1 AS DOUBLE) / {H60_SPAN})
       END AS {estimate_col}
FROM kept
"""


def kmv_sketch(
    df: DataFrame,
    value_col,
    *,
    k: int = 64,
    n_shards: int = 64,
) -> DataFrame:
    """ONE-row bottom-``k`` KMV sketch of a value set: ``(mins
    array<long>)`` — the k smallest h60 hashes, ascending. The
    mergeable-set primitive behind `kmv_set_estimates`: bottom-k of a
    union == bottom-k of the concatenated sketches (selection algebra,
    exactly SQL-replayable).

    Scale shape (the s09 two-level rule): the global bottom-k is NOT
    one single-task window over all distinct hashes — hashes shard by
    ``pmod(hv, n_shards)``, each shard keeps its own bottom-k in a
    parallel window (output ≤ n_shards × k longs), and one final
    window over that tiny set cuts the true global bottom-k (bottom-k
    of shard-wise bottom-k's is exact: any global bottom-k member is
    in its shard's bottom-k)."""
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    hashed = (
        df.select(h60(val.cast("string")).alias("hv"))
        .where(F.col("hv").isNotNull())
        .distinct()
        .withColumn("_sh", F.pmod(F.col("hv"), F.lit(int(n_shards))))
    )
    w_sh = Window.partitionBy("_sh").orderBy("hv")
    local = (
        hashed.withColumn("_rn", F.row_number().over(w_sh))
        .where(F.col("_rn") <= int(k))
        .select("hv")
    )
    w = Window.partitionBy(F.lit(1)).orderBy("hv")
    return (
        local.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= int(k))
        .groupBy()
        .agg(F.sort_array(F.collect_list("hv")).alias("mins"))
    )


def kmv_set_estimates(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    *,
    k: int = 64,
) -> DataFrame:
    """Distinct-cardinality estimates for the UNION and INTERSECTION
    of two sets from their `kmv_sketch` rows (Beyer et al.'s KMV set
    algebra): ``(n_u, kth, rho, est_a, est_b, est_union,
    est_intersection)``.

    The union sketch U is the bottom-k of the concatenated mins —
    exactly the sketch a direct pass over A ∪ B would produce
    (selection algebra, no re-hash). ``rho`` counts U's members
    present in BOTH input sketches — an unbiased Jaccard sample over
    the k smallest union hashes — and the intersection estimate is
    ``rho * est_union / |U|``. When every input set is under the
    sketch capacity everything is EXACT (the sketch is the whole
    hash set). Every output is an integer selection or one fixed
    float expression over integers, so a DuckDB list-algebra replay
    hash-matches (the s13 gate)."""
    a = sketch_a.select(F.col("mins").alias("_ma"))
    b = sketch_b.select(F.col("mins").alias("_mb"))
    kk = int(k)
    merged = F.slice(
        F.array_sort(
            F.array_distinct(F.concat(F.col("_ma"), F.col("_mb")))
        ),
        1,
        kk,
    )
    est = lambda n, kth: F.when(  # noqa: E731
        n < kk, n.cast("double")
    ).otherwise(
        F.lit(float(kk - 1))
        / ((kth + F.lit(1)).cast("double") / F.lit(H60_SPAN))
    )
    out = (
        a.crossJoin(b)
        .withColumn("_u", merged)
        .withColumn("n_u", F.size("_u").cast("long"))
        # guard the empty-union case with CASE WHEN: even
        # try_element_at raises INVALID_INDEX_OF_ZERO at index 0
        # (only out-of-bounds indexes return null)
        .withColumn(
            "kth",
            F.when(
                F.col("n_u") > 0,
                F.try_element_at("_u", F.col("n_u").cast("int")),
            ),
        )
        .withColumn(
            "rho",
            F.size(
                F.array_intersect(
                    F.array_intersect(F.col("_u"), F.col("_ma")),
                    F.col("_mb"),
                )
            ).cast("long"),
        )
        .withColumn("_na", F.size("_ma").cast("long"))
        .withColumn("_nb", F.size("_mb").cast("long"))
    )
    return out.select(
        "n_u",
        "kth",
        "rho",
        est(
            F.col("_na"),
            F.when(
                F.col("_na") > 0,
                F.try_element_at("_ma", F.col("_na").cast("int")),
            ),
        ).alias("est_a"),
        est(
            F.col("_nb"),
            F.when(
                F.col("_nb") > 0,
                F.try_element_at("_mb", F.col("_nb").cast("int")),
            ),
        ).alias("est_b"),
        est(F.col("n_u"), F.col("kth")).alias("est_union"),
        # n_u = 0 (both sets empty): intersection is exactly 0, and
        # the ratio would be an ANSI divide-by-zero
        F.when(
            F.col("n_u") > 0,
            F.col("rho").cast("double")
            * est(F.col("n_u"), F.col("kth"))
            / F.col("n_u").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("est_intersection"),
    )


def hash_sample(
    df: DataFrame,
    key_col,
    *,
    fraction: float = 0.05,
    salt: int = 0,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose hashed key lands
    in the first ``fraction * buckets`` of ``buckets`` hash buckets.

    Sampling by a *key* (not per-row randomness) keeps the sample
    consistent across tables and runs: every row of every table with
    the same key value is kept or dropped together, so sampled fact
    tables still join. ``salt`` selects an independent sample.
    """
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    cut = int(round(fraction * buckets))
    bucket = h60(key.cast("string"), salt) % F.lit(buckets)
    return df.where(bucket < cut)


def hash_sample_sql(
    key_expr: str,
    *,
    fraction: float = 0.05,
    salt: int = 0,
    buckets: int = 10_000,
) -> str:
    """DuckDB WHERE-clause predicate matching ``hash_sample``."""
    cut = int(round(fraction * buckets))
    hv = h60_sql(f"CAST({key_expr} AS VARCHAR)", salt)
    return f"({hv} % {buckets}) < {cut}"


def weighted_sample(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    weight_col,
    *,
    k: int = 5,
    salt: int = 0,
) -> DataFrame:
    """Deterministic weighted reservoir sample (Efraimidis–Spirakis
    A-ES, 2006): per group, keep the k rows with the largest
    ``u^(1/w)`` where ``u = (h60(key)+1)/2^60 ∈ (0,1]`` and ``w`` is
    the row's positive weight. Every engine with md5 + pow draws the
    SAME sample — reproducible importance sampling for training-data
    mixes (sample documents ∝ quality score, rows ∝ revenue, …).

    Scale shape: one narrow projection + a per-group top-k window —
    identical cost profile to any top-k; the reservoir never exceeds
    k rows per group in the shuffle (window + filter; map-side
    pre-reduce applies the same as `operators.search.knn`).

    Rows with weight <= 0 or null are excluded (A-ES domain). Returns
    the sampled rows with a ``rank`` column (1 = first drawn).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    key = F.col(key_col)
    u = (h60(key.cast("string"), salt) + F.lit(1)).cast("double") / F.lit(H60_SPAN)
    aes = F.pow(u, F.lit(1.0) / w.cast("double"))
    win = Window.partitionBy(*group_cols).orderBy(
        F.col("_aes").desc(), key.asc()
    )
    return (
        df.where(w.isNotNull() & (w.cast("double") > 0))
        .withColumn("_aes", aes)
        .withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .drop("_aes")
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    quotas: DataFrame,
    *,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum quota sampling — the training-mix builder: each
    stratum (domain, language, quality bucket, …) contributes exactly
    ``quota`` rows (or all of them if smaller), drawn deterministically
    as the quota smallest md5-hash ranks. The draw is reproducible on
    any engine/partitioning, and under corpus growth it only changes
    by displacement — a drawn key stays drawn unless a new key hashes
    below it inside a full quota (no reshuffling of survivors).

    ``quotas``: a (strata..., quota) DataFrame — typically a groupBy
    over the same table (proportional / sqrt / capped allocations).
    Scale shape: one per-stratum top-k window + a broadcast join of
    the tiny quota table; the shuffle carries survivors only once AQE
    sees the rank filter. Returns sampled rows + ``rank``."""
    key = F.col(key_col)
    win = Window.partitionBy(*strata_cols).orderBy(
        F.col("_hrank").asc(), key.asc()
    )
    return (
        df.withColumn("_hrank", h60(key.cast("string"), salt))
        .withColumn("rank", F.row_number().over(win))
        .join(F.broadcast(quotas), strata_cols)
        .where(F.col("rank") <= F.col("quota"))
        .drop("_hrank", "quota")
    )


def stratified_sample_sql(
    table: str,
    strata_cols: list[str],
    key_expr: str,
    quota_sql: str,
    *,
    salt: int = 0,
) -> str:
    """DuckDB rendering of the identical draw. ``quota_sql`` must
    yield (strata..., quota)."""
    groups = ", ".join(strata_cols)
    hv = h60_sql(f"CAST({key_expr} AS VARCHAR)", salt)
    return f"""
SELECT * EXCLUDE (_hrank, quota) FROM (
  SELECT t.*, {hv} AS _hrank,
         row_number() OVER (PARTITION BY {groups}
                            ORDER BY {hv} ASC, {key_expr} ASC) AS rank
  FROM {table} t
) s JOIN ({quota_sql}) q USING ({groups})
WHERE s.rank <= q.quota
"""


def weighted_sample_sql(
    table: str,
    group_cols: list[str],
    key_expr: str,
    weight_expr: str,
    *,
    k: int = 5,
    salt: int = 0,
) -> str:
    """DuckDB rendering of the identical A-ES draw (oracle side).
    Emits ``SELECT *, rank FROM ...`` — project in an outer query."""
    groups = ", ".join(group_cols)
    hv = h60_sql(f"CAST({key_expr} AS VARCHAR)", salt)
    u = f"(CAST({hv} + 1 AS DOUBLE) / {H60_SPAN})"
    aes = f"pow({u}, 1.0 / CAST({weight_expr} AS DOUBLE))"
    return f"""
SELECT * FROM (
  SELECT *, row_number() OVER (
           PARTITION BY {groups}
           ORDER BY {aes} DESC, {key_expr} ASC) AS rank
  FROM {table}
  WHERE {weight_expr} IS NOT NULL AND CAST({weight_expr} AS DOUBLE) > 0
) WHERE rank <= {k}
"""


def count_min(
    df: DataFrame,
    value_col,
    *,
    width: int = 256,
    depth: int = 4,
    salt: int = 0,
) -> DataFrame:
    """Count-Min sketch table (Cormode & Muthukrishnan 2005):
    ``(row, bucket, c)`` — ``depth`` independent md5-salted hash rows
    of ``width`` counters each.

    One explode (×depth) + one hash aggregate, map-side combined: the
    sketch state is ``depth × width`` longs REGARDLESS of input size —
    the fixed-memory frequency summary for 100 TB streams. Like every
    sketch in this module the hashing is md5-derived, so an external
    SQL engine reproduces the identical table (and therefore identical
    estimates) bit-for-bit — unlike engine-internal CMS
    implementations.
    """
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                (h60(val.cast("string"), salt + r) % F.lit(width)).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("rb"))
        .select(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def count_min_estimate(
    sketch: DataFrame,
    items: DataFrame,
    value_col: str,
    *,
    width: int = 256,
    depth: int = 4,
    salt: int = 0,
) -> DataFrame:
    """Point-query the sketch for each item: the CMS estimate is the
    MIN over the depth rows of the item's bucket counters (always >=
    the true count; over-estimates come only from collisions).
    Missing (row, bucket) cells count 0. Returns items + ``est``."""
    val = F.col(value_col)
    probes = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                (h60(val.cast("string"), salt + r) % F.lit(width)).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    exploded = items.select(val.alias(value_col), F.explode(probes).alias("rb")).select(
        value_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    )
    joined = exploded.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return (
        joined.groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )


def fixed_histogram(
    df: DataFrame,
    value_col,
    *,
    lo: float,
    hi: float,
    n_bins: int = 32,
) -> DataFrame:
    """Fixed-width histogram: ``(bin, n, lo_val, hi_val)`` — the
    deterministic distribution profile. Unlike `percentile_approx`
    (engine-internal GK sketch, not externally reproducible), every
    engine computes the identical bins, so the profile itself is
    oracle-checkable.

    One map-side-combined hash aggregate into ``n_bins`` rows
    regardless of input size; bins are trivially mergeable across
    partitions/days — the fixed-memory shape for 100 TB profiling.
    Out-of-range values clamp to the edge bins; NULLs and NaNs are
    dropped (floor(NaN) cast to long is a job-aborting error under
    Spark 4 ANSI mode). Only order-independent aggregates
    (count/min/max) so the result is bit-stable under any
    partitioning."""
    if not (float(hi) > float(lo)) or int(n_bins) <= 0:
        # width 0 would turn the bin division into Infinity and the
        # ANSI cast into a runtime error deep inside the job — fail
        # at the API with the actual mistake instead
        raise ValueError("fixed_histogram requires hi > lo and n_bins > 0")
    val = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    width = (float(hi) - float(lo)) / int(n_bins)
    b = F.floor((val - F.lit(float(lo))) / F.lit(width)).cast("long")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(int(n_bins) - 1))
    return (
        df.where(val.isNotNull() & ~F.isnan(val))
        .select(b.alias("bin"), val.alias("_v"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_v").alias("lo_val"),
            F.max("_v").alias("hi_val"),
        )
    )


def fixed_histogram_sql(
    table: str,
    value_expr: str,
    *,
    lo: float,
    hi: float,
    n_bins: int = 32,
) -> str:
    """DuckDB rendering of the identical histogram (oracle side).
    Same clamp + floor arithmetic in double precision — IEEE ops, so
    the bins agree bit-for-bit."""
    width = (float(hi) - float(lo)) / int(n_bins)
    b = (
        f"LEAST(GREATEST(CAST(floor((CAST({value_expr} AS DOUBLE) - {lo!r}) "
        f"/ {width!r}) AS BIGINT), 0), {int(n_bins) - 1})"
    )
    return (
        f"SELECT {b} AS bin, count(*)::BIGINT AS n, "
        f"min(CAST({value_expr} AS DOUBLE)) AS lo_val, "
        f"max(CAST({value_expr} AS DOUBLE)) AS hi_val "
        f"FROM {table} WHERE {value_expr} IS NOT NULL "
        f"AND NOT isnan(CAST({value_expr} AS DOUBLE)) GROUP BY 1"
    )


def count_min_sql(
    table: str,
    value_expr: str,
    *,
    width: int = 256,
    depth: int = 4,
    salt: int = 0,
) -> str:
    """DuckDB rendering of the identical sketch table (oracle side)."""
    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS row, ({h60_sql(f'CAST({value_expr} AS VARCHAR)', salt + r)})"
        f" % {width} AS bucket FROM {table}"
        for r in range(depth)
    )
    return f"SELECT row, bucket, count(*) AS c FROM (\n{unions}\n) GROUP BY row, bucket"


def mad_outliers(
    df: DataFrame,
    *,
    value_col: str = "value",
    key_cols: Sequence[str] = ("event_type",),
    k: float = 3.0,
    id_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Robust per-group outlier detection via median absolute
    deviation: flag rows with |x - median| > k * MAD. Median/MAD are
    exact interpolated percentiles (identical continuous-quantile
    definition on every engine — the r19 contract), so the flags and
    the reported ``robust_z = |x - med| / MAD`` are reproducible bit
    for bit; no 1.4826 normal-consistency factor (that is a display
    convention — fold it into k if normal-referenced cutoffs are
    wanted). Groups with MAD = 0 (constant majorities) flag nothing.

    Shape: two grouped percentile aggregates (each needs its group
    sorted — at 100 TB swap in approx_percentile with a bounded
    error) + two broadcast joins of |groups|-row stats frames; the
    data table shuffles only for the group-key aggregates."""
    kp = [str(c) for c in key_cols]
    v = F.col(value_col).cast("double")
    med = df.groupBy(*kp).agg(
        F.percentile(v, F.lit(0.5)).alias("_med")
    )
    # materialize the med-joined frame once: the mad aggregate AND the
    # output join both consume it — without this the input table is
    # re-scanned for every branch (~4 scans per call)
    with_med = df.join(F.broadcast(med), kp).localCheckpoint(eager=False)
    mad = with_med.groupBy(*kp).agg(
        F.percentile(F.abs(v - F.col("_med")), F.lit(0.5)).alias("_mad")
    )
    dev = F.abs(v - F.col("_med"))
    return (
        with_med.join(F.broadcast(mad), kp)
        .where((F.col("_mad") > 0) & (dev > F.lit(float(k)) * F.col("_mad")))
        .select(
            *[str(c) for c in id_cols],
            *kp,
            v.alias("value"),
            (dev / F.col("_mad")).alias("robust_z"),
        )
    )


def quantile_two_pass(
    df: DataFrame,
    *,
    value_col: str = "value",
    q: float = 0.5,
    key_cols: Sequence[str] = (),
    n_buckets: int = 1024,
) -> DataFrame:
    """EXACT per-key order statistics WITHOUT a global sort — the
    100 TB quantile shape: `F.percentile`/a full sort must move or
    buffer every value per key, while this runs (1) one stats
    aggregate, (2) one histogram aggregate over ``n_buckets`` value
    ranges, then (3) sorts ONLY the bucket(s) containing the target
    ranks (expected n/n_buckets rows per key). Returns the two
    bracketing order statistics around rank h = (n-1)*q:
    (keys..., n, v_lo, v_hi) with v_lo at rank floor(h)+1 and v_hi at
    ceil(h)+1 — pure value SELECTIONS, no interpolation arithmetic,
    so any engine replays them exactly (s06's oracle). Callers
    wanting the interpolated percentile combine them as
    (1-g)*v_lo + g*v_hi.

    Skew caveat: a key whose values are all equal lands in one bucket
    and pass 3 sorts that key entirely — the sort is Spark's
    spill-safe external sort, so it costs time, never memory."""
    kp = [str(k) for k in key_cols]
    B = int(n_buckets)
    qf = float(q)
    v = F.col(value_col).cast("double")
    # quantiles are over NON-NULL values (the standard semantics);
    # without this filter the histogram counts null rows (count(*))
    # while the target ranks come from count(v), shifting every pick
    df = df.where(v.isNotNull())
    stats = df.groupBy(*kp).agg(
        F.min(v).alias("_lo"),
        F.max(v).alias("_hi"),
        F.count(v).alias("_n"),
    )
    h = (F.col("_n") - 1) * F.lit(qf)
    kq = stats.select(
        *kp,
        "_lo",
        "_hi",
        "_n",
        (F.floor(h) + 1).cast("long").alias("_k_lo"),
        (F.ceil(h) + 1).cast("long").alias("_k_hi"),
    )
    bucket = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(B - 1),
            F.greatest(
                F.lit(0),
                F.floor(
                    (v - F.col("_lo"))
                    / (F.col("_hi") - F.col("_lo"))
                    * F.lit(float(B))
                ),
            ),
        )
    ).cast("int")
    keyed = df.join(F.broadcast(kq), kp) if kp else df.crossJoin(
        F.broadcast(kq)
    )
    bucketed = keyed.withColumn("_b", bucket)
    hist = bucketed.groupBy(*kp, "_b").agg(F.count(F.lit(1)).alias("_c"))
    wb = Window.partitionBy(*kp).orderBy("_b")
    cum = hist.withColumn(
        "_below", F.sum("_c").over(wb) - F.col("_c")
    ).join(kq.select(*kp, "_k_lo", "_k_hi"), kp)
    spec = None
    for which, kcol in (("lo", "_k_lo"), ("hi", "_k_hi")):
        s = cum.where(
            (F.col("_below") < F.col(kcol))
            & (F.col("_below") + F.col("_c") >= F.col(kcol))
        ).select(
            *kp,
            "_b",
            "_below",
            (F.col(kcol) - F.col("_below")).alias("_rank_in_bucket"),
            F.lit(which).alias("_which"),
        )
        spec = s if spec is None else spec.unionByName(s)
    tgt = bucketed.join(F.broadcast(spec), [*kp, "_b"])
    wr = Window.partitionBy(*kp, "_which").orderBy(v)
    picked = (
        tgt.withColumn("_rk", F.row_number().over(wr))
        .where(F.col("_rk") == F.col("_rank_in_bucket"))
        .groupBy(*kp)
        .pivot("_which", ["lo", "hi"])
        .agg(F.first(v))
    )
    return picked.join(kq.select(*kp, "_n"), kp).select(
        *kp,
        F.col("_n").cast("long").alias("n"),
        F.col("lo").alias("v_lo"),
        F.col("hi").alias("v_hi"),
    )


def table_profile(
    df: DataFrame,
    cols: list[str],
    *,
    k: int = 64,
) -> DataFrame:
    """ANALYZE-style column statistics — the stats pass a cost-based
    optimizer (or a data-quality dashboard) runs over a table: one row
    per profiled column with ``(col_name, n, n_null, est_distinct,
    vmin, vmax, len_min, len_max)``. `vmin`/`vmax` are populated for
    numeric columns (as doubles), `len_min`/`len_max` for strings;
    `est_distinct` is the k-minimum-values estimate — md5-based and
    therefore DETERMINISTIC and cross-engine reproducible, unlike
    HLL (the s01 contract).

    Scale shape: ALL per-column min/max/null counts come from ONE
    map-side-combined aggregate over a single scan (never one job
    per column); the distinct sketches share ONE exploded
    (col_idx, hash) pass — early `distinct` prunes to unique hashes
    per column, then a k-bounded window — so the whole profile is two
    scans and one shuffle regardless of how many columns are
    profiled. The profile itself is n_cols rows, assembled
    driver-side (bounded smallness).

    Hash rendering caveat (documented, not hidden): doubles are
    hashed via their string cast; Spark and DuckDB both emit the
    shortest round-trip decimal, which agrees for |v| < 1e7 — above
    that Java switches to scientific notation and an external SQL
    replay diverges. Profile monetary/measure columns (bounded
    magnitude) freely; canonicalize astronomically-scaled doubles
    before profiling.
    """
    from pyspark.sql.types import NumericType, StringType

    kinds = {c: df.schema[c].dataType for c in cols}
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"_nn_{c}")
        )
        if isinstance(kinds[c], NumericType):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"_mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"_mx_{c}"))
        elif isinstance(kinds[c], StringType):
            aggs.append(
                F.min(F.length(F.col(c))).cast("long").alias(f"_lmn_{c}")
            )
            aggs.append(
                F.max(F.length(F.col(c))).cast("long").alias(f"_lmx_{c}")
            )
    stats = df.agg(*aggs).first()

    pairs = df.select(
        F.posexplode(
            F.array(*[F.col(c).cast("string") for c in cols])
        ).alias("ci", "v")
    )
    hashed = (
        pairs.select("ci", h60(F.col("v")).alias("hv"))
        .where(F.col("hv").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("ci").orderBy("hv")
    kept = (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy("ci")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("hv").alias("kth"))
    )
    est_expr = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        / ((F.col("kth") + F.lit(1)).cast("double") / F.lit(H60_SPAN))
    )
    ests = {
        r["ci"]: float(r["est"])
        for r in kept.select("ci", est_expr.alias("est")).collect()
    }

    rows = []
    for i, c in enumerate(cols):
        rows.append(
            (
                c,
                int(stats["_n"]),
                int(stats[f"_nn_{c}"]),
                float(ests.get(i, 0.0)),
                float(stats[f"_mn_{c}"])
                if isinstance(kinds[c], NumericType)
                and stats[f"_mn_{c}"] is not None
                else None,
                float(stats[f"_mx_{c}"])
                if isinstance(kinds[c], NumericType)
                and stats[f"_mx_{c}"] is not None
                else None,
                int(stats[f"_lmn_{c}"])
                if isinstance(kinds[c], StringType)
                and stats[f"_lmn_{c}"] is not None
                else None,
                int(stats[f"_lmx_{c}"])
                if isinstance(kinds[c], StringType)
                and stats[f"_lmx_{c}"] is not None
                else None,
            )
        )
    return df.sparkSession.createDataFrame(
        rows,
        "col_name string, n long, n_null long, est_distinct double, "
        "vmin double, vmax double, len_min long, len_max long",
    )


def distribution_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int = 16,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Distribution drift between two snapshots — the training-data
    monitoring pass that answers "did this feed's value distribution
    move since the last crawl": per group, the symmetric chi-square
    distance ``χ² = Σ_bins (p_i − q_i)² / (p_i + q_i)`` between the
    two snapshots' normalized fixed-width histograms. Chi-square is
    deliberately the NO-LOG drift measure (PSI/KL need ln — libm,
    engine-unstable; χ² carries the same alarm signal in pure
    exact-rounded rational arithmetic), and the cross-bin sum folds
    in bin order, so the statistic itself is oracle-replayable.
    Returns ``(group…, n_a, n_b, bins_used, chi2)`` for groups
    populated in BOTH snapshots.

    Shape: one `fixed_histogram`-style map-side-combined aggregate
    per snapshot (n_bins rows per group regardless of input size),
    one coalescing outer join on (group, bin), tiny per-group totals
    joined back, one ordered fold. NaN/NULL dropped, out-of-range
    clamped to edge bins — the s05 conventions."""
    gp = [str(c) for c in group_cols]
    if not (float(hi) > float(lo)) or int(n_bins) <= 0:
        raise ValueError("distribution_drift requires hi > lo and n_bins > 0")
    width = (float(hi) - float(lo)) / int(n_bins)

    def hist(df: DataFrame, out: str) -> DataFrame:
        val = F.col(value_col).cast("double")
        b = F.floor((val - F.lit(float(lo))) / F.lit(width)).cast("long")
        b = F.least(F.greatest(b, F.lit(0)), F.lit(int(n_bins) - 1))
        return (
            df.where(val.isNotNull() & ~F.isnan(val))
            .select(*gp, b.alias("bin"))
            .groupBy(*gp, "bin")
            .agg(F.count(F.lit(1)).cast("long").alias(out))
        )

    ha, hb = hist(df_a, "a"), hist(df_b, "b")
    j = (
        ha.join(hb, [*gp, "bin"], "full_outer")
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
    jt = j.join(F.broadcast(totals), gp).where(
        (F.col("n_a") > 0) & (F.col("n_b") > 0)
    )
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


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (round-6 verdict item 7)
# ---------------------------------------------------------------------------


def quantile_sketch(
    df: DataFrame,
    *,
    id_col: str,
    value_col: str = "value",
    key_cols: Sequence[str] = (),
    m: int = 256,
    salt: int = 9001,
) -> DataFrame:
    """MERGEABLE quantile sketch state: per key, the exact count and
    a deterministic uniform sample — the ``m`` rows with the smallest
    seeded row hash (the KMV trick pointed at quantiles instead of
    distinct counts). Returns one row per key:
    ``(keys…, n, hs, ids, vs)`` with the three arrays aligned and
    sorted by (hash, id).

    Why bottom-m-by-hash and not KLL: the hash sample is
    ORDER-INDEPENDENT and its merge is exact set-union-then-cut, so
    (a) any engine replays the state bit-for-bit from the same rows
    (the s09 gate's exact oracle — no compaction schedule to
    replicate), (b) a streaming twin equals the batch sketch across
    any micro-batching and restarts (streaming/monitor.py state
    rule), and (c) merge is associative AND commutative — shard
    states combine in any order. The price is the sampling error
    ε = O(1/√m) on rank queries vs KLL's O(1/m) for the same m —
    monitoring percentiles (p50/p99 latency) at m=256..4096 sits
    comfortably inside it.

    Scale shape: one Arrow pre-reduction cuts each input batch to its
    per-key bottom-m BEFORE the shuffle (the `_grouped_topk` rule),
    so the exchange carries batches × keys × m rows, never the data;
    the exact count is one map-side-combined aggregate. NULL values
    are excluded (standard quantile semantics), and so are NULL KEYS:
    the sample pre-reduction (pandas groupby) and the final
    state-counts equi-join would otherwise disagree on whether a
    null-key group exists — excluding them makes both paths agree by
    construction."""
    kp = [str(k) for k in key_cols]
    mm = int(m)
    v = F.col(value_col).cast("double")
    keep = v.isNotNull()
    for k in kp:
        keep = keep & F.col(k).isNotNull()
    df = df.where(keep)
    base = (
        df.where(v.isNotNull())
        .select(
            *kp,
            F.col(id_col).cast("long").alias("_sid"),
            v.alias("_v"),
        )
        .withColumn("_h", h60(F.col("_sid").cast("string"), salt))
    )
    schema = base.schema

    def prereduce(it):
        for pdf in it:
            if not len(pdf):
                continue
            s = pdf.sort_values([*kp, "_h", "_sid"])
            # dropna=False: Spark's groupBy keeps NULL keys, so the
            # sample path must too or null-key groups lose their
            # samples while the counts aggregate still emits them.
            yield s.groupby(kp, dropna=False).head(mm) if kp else s.head(mm)

    pre = base.mapInPandas(prereduce, schema)
    w = Window.partitionBy(*kp).orderBy("_h", "_sid")
    top = (
        pre.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= mm)
        .drop("_rn")
    )
    counts = (
        df.where(v.isNotNull())
        .groupBy(*kp)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    packed = top.groupBy(*kp).agg(
        F.sort_array(
            F.collect_list(F.struct("_h", "_sid", "_v"))
        ).alias("_s")
    )
    state = packed.select(
        *kp,
        F.transform("_s", lambda x: x["_h"]).alias("hs"),
        F.transform("_s", lambda x: x["_sid"]).alias("ids"),
        F.transform("_s", lambda x: x["_v"]).alias("vs"),
    )
    if kp:
        return state.join(counts, kp)
    return state.crossJoin(counts)


def quantile_sketch_merge(
    states: DataFrame,
    *,
    key_cols: Sequence[str] = (),
    m: int = 256,
) -> DataFrame:
    """Merge MANY sketch-state rows per key (two sketches, shard
    states, or streaming batch dirs) into one: union the samples,
    keep the global bottom-m by (hash, id), sum the counts. Exactly
    the state `quantile_sketch` would have produced over the
    concatenated inputs — set-union semantics make the merge
    associative, commutative, and idempotent-friendly."""
    kp = [str(k) for k in key_cols]
    mm = int(m)
    rows = states.select(
        *kp,
        "n",
        F.explode(F.arrays_zip("hs", "ids", "vs")).alias("_e"),
    ).select(
        *kp,
        "n",
        F.col("_e.hs").alias("_h"),
        F.col("_e.ids").alias("_sid"),
        F.col("_e.vs").alias("_v"),
    )
    w = Window.partitionBy(*kp).orderBy("_h", "_sid")
    top = (
        rows.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= mm)
    )
    counts = states.groupBy(*kp).agg(F.sum("n").cast("long").alias("n"))
    packed = top.groupBy(*kp).agg(
        F.sort_array(
            F.collect_list(F.struct("_h", "_sid", "_v"))
        ).alias("_s")
    )
    merged = packed.select(
        *kp,
        F.transform("_s", lambda x: x["_h"]).alias("hs"),
        F.transform("_s", lambda x: x["_sid"]).alias("ids"),
        F.transform("_s", lambda x: x["_v"]).alias("vs"),
    )
    if kp:
        return merged.join(counts, kp)
    return merged.crossJoin(counts)


def quantile_sketch_query(
    state: DataFrame,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    *,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Percentile estimates from the sketch state: for each q, the
    sample value at rank floor((k−1)·q)+1 of the value-sorted sample
    (k = sample size) — a pure VALUE SELECTION, never interpolation
    arithmetic, so any engine replays the pick exactly (the s06
    rule). Returns ``(keys…, n, sample_n, p50, p90, …)``."""
    kp = [str(k) for k in key_cols]
    sorted_vs = F.array_sort("vs")
    k = F.size("vs")
    cols = [
        F.col("n"),
        k.cast("long").alias("sample_n"),
    ]
    for q in qs:
        qf = float(q)
        rank = (F.floor((k - 1).cast("double") * F.lit(qf)) + 1).cast("int")
        cols.append(
            F.element_at(sorted_vs, rank).alias(f"p{int(round(qf * 100))}")
        )
    return state.select(*kp, *cols)


# ---------------------------------------------------------------------------
# KLL quantile sketch (deterministic-compaction variant)
# ---------------------------------------------------------------------------


def _kll_cap(k: int, level: int, n_levels: int) -> int:
    # capacity schedule (2/3)^depth-from-top, floored at 2 — the KLL
    # paper's geometric decay, which is where the O(1/k) rank error
    # comes from (lower levels hold fewer, heavier items)
    return max(2, int(float(k) * (2.0 / 3.0) ** (n_levels - 1 - level)))


def _kll_compact(levels: list, parities: list, k: int) -> None:
    """Compact the lowest over-capacity level in place: sort, keep
    every other item starting at a DETERMINISTIC alternating offset
    (per-level parity counter — the paper flips a coin; alternation
    keeps the ±w/2 rank shifts cancelling across compactions while
    making the whole sketch replayable bit-for-bit), promote to the
    next level at double weight."""
    while True:
        H = len(levels)
        over = None
        for lvl in range(H):
            if len(levels[lvl]) > _kll_cap(k, lvl, H):
                over = lvl
                break
        if over is None:
            total_cap = sum(_kll_cap(k, i, H) for i in range(H))
            if sum(len(x) for x in levels) <= max(total_cap, k):
                return
            over = max(range(H), key=lambda i: len(levels[i]))
            if len(levels[over]) < 2:
                return
        buf = sorted(levels[over])
        # weight conservation: only an EVEN count compacts (two items
        # at weight w become one at 2w); an odd straggler — the
        # largest, deterministically — stays behind at this level
        carry = []
        if len(buf) % 2:
            carry = [buf[-1]]
            buf = buf[:-1]
        off = parities[over] % 2
        parities[over] += 1
        kept = buf[off::2]
        levels[over] = carry
        if over + 1 == len(levels):
            levels.append([])
            parities.append(0)
        levels[over + 1].extend(kept)


def _kll_feed(values, k: int):
    """One sequential KLL pass over an iterable of floats (caller
    guarantees a deterministic order). Returns (levels, parities, n)."""
    levels: list = [[]]
    parities: list = [0]
    n = 0
    for v in values:
        levels[0].append(float(v))
        n += 1
        if len(levels[0]) > _kll_cap(k, 0, len(levels)):
            _kll_compact(levels, parities, k)
    return levels, parities, n


def _kll_merge(a, b, k: int):
    """Merge two (levels, parities, n) states: levelwise concat, then
    re-compact. Deterministic given the argument order (the driver
    folds shard states in shard order)."""
    la, pa, na = a
    lb, pb, nb = b
    H = max(len(la), len(lb))
    levels = [
        sorted(
            (la[i] if i < len(la) else [])
            + (lb[i] if i < len(lb) else [])
        )
        for i in range(H)
    ]
    parities = [
        (pa[i] if i < len(pa) else 0) + (pb[i] if i < len(pb) else 0)
        for i in range(H)
    ]
    _kll_compact(levels, parities, k)
    return levels, parities, na + nb


def kll_sketch(
    df: DataFrame,
    *,
    id_col: str,
    value_col: str = "value",
    k: int = 200,
    n_shards: int = 32,
    salt: int = 1234,
) -> dict:
    """KLL quantile sketch with DETERMINISTIC compaction — the
    O(1/k)-rank-error companion to `quantile_sketch`'s O(1/√m)
    sample (use this when the stream is huge and the percentile must
    be tight; use the hash sample when the state must replay in SQL
    or merge across arbitrary batchings bit-for-bit).

    Replayability design: rows are assigned to ``n_shards``
    DETERMINISTIC shards by seeded id hash (content independent of
    cluster partitioning), each shard feeds its values in sorted
    (value, id) order through the sequential KLL (Karnin-Lamport-
    Liberty 2016) with alternating-parity compaction instead of coin
    flips, and the driver folds the tiny shard states in shard
    order — so the SAME rows give the SAME sketch on any cluster
    (asserted in tests). The classic randomized offset is what makes
    the estimator unbiased; alternation trades that for determinism
    while the ±w/2 per-compaction rank shifts still cancel
    pairwise — measured error stays well inside the k-budget.

    Returns {'n', 'levels', 'weights'} — query with `kll_quantile`.
    """
    S = int(n_shards)
    v = F.col(value_col).cast("double")
    base = (
        df.where(v.isNotNull())
        .select(F.col(id_col).cast("long").alias("_sid"), v.alias("_v"))
        .withColumn(
            "_shard",
            F.pmod(h60(F.col("_sid").cast("string"), salt), F.lit(S)).cast(
                "int"
            ),
        )
    )
    kk = int(k)

    def shard_state(pdf):
        import json as _json

        import pandas as pd

        s = pdf.sort_values(["_v", "_sid"])
        levels, parities, n = _kll_feed(s["_v"].to_numpy(), kk)
        return pd.DataFrame(
            {
                "shard": [int(pdf["_shard"].iloc[0])],
                "state": [
                    _json.dumps({"l": levels, "p": parities, "n": n})
                ],
            }
        )

    rows = (
        base.groupBy("_shard")
        .applyInPandas(shard_state, "shard int, state string")
        .collect()
    )
    import json as _json

    merged = ([[]], [0], 0)
    for r in sorted(rows, key=lambda r: r["shard"]):
        st = _json.loads(r["state"])
        merged = _kll_merge(merged, (st["l"], st["p"], st["n"]), kk)
    levels, _parities, n = merged
    return {
        "n": int(n),
        "levels": [sorted(x) for x in levels],
        "weights": [2**i for i in range(len(levels))],
    }


def kll_quantile(state: dict, q: float) -> float:
    """Quantile estimate from a `kll_sketch` state: weighted rank
    selection over the (value, 2^level) items."""
    items = [
        (v, w)
        for lvl, w in zip(state["levels"], state["weights"])
        for v in lvl
    ]
    if not items:
        raise ValueError("empty sketch")
    items.sort()
    total = sum(w for _, w in items)
    target = float(q) * (total - 1)
    acc = 0
    for v, w in items:
        acc += w
        if acc > target:
            return v
    return items[-1][0]


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (exact-replay registers)
# ---------------------------------------------------------------------------

_HLL_BITS = 60  # h60 hash width


def hll_registers(
    df: DataFrame,
    *,
    value_col: str,
    key_cols: Sequence[str] = (),
    p: int = 8,
    salt: int = 77,
) -> DataFrame:
    """HyperLogLog register table ``(keys…, bucket, reg)`` — the
    third mergeable sketch tier (KMV s01 estimates distincts from k
    order statistics; this is the constant-memory classic). Fully
    deterministic and SQL-replayable: bucket = low ``p`` bits of the
    seeded value hash, reg = max over items of the leading-zero rank
    of the remaining 60−p bits (computed as bit-LENGTH — Spark
    ``length(bin(w))`` == DuckDB ``length(printf('%b', w))`` — never
    libm log2). Registers are per-key MAXIMA: order-independent,
    idempotent, mergeable by max — the easiest possible streaming
    state. Distinct semantics come from hashing the VALUE (not the
    row), so duplicates land on the same register deterministically."""
    kp = [str(k) for k in key_cols]
    m = 1 << int(p)
    wbits = _HLL_BITS - int(p)
    h = h60(F.col(value_col).cast("string"), salt)
    base = df.where(F.col(value_col).isNotNull()).select(
        *kp, h.alias("_h")
    )
    w = F.expr(f"_h div {m}")
    rho = (
        F.when(w == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits) - F.length(F.bin(w)) + 1)
        .cast("int")
    )
    return (
        base.select(
            *kp,
            F.pmod(F.col("_h"), F.lit(m)).cast("int").alias("bucket"),
            rho.alias("_rho"),
        )
        .groupBy(*kp, "bucket")
        .agg(F.max("_rho").alias("reg"))
    )


def hll_merge(registers: DataFrame, *, key_cols: Sequence[str] = ()) -> DataFrame:
    """Merge register tables (same p, same salt): max per (key,
    bucket). Associative, commutative, idempotent — safe under
    at-least-once redelivery with no batch-dir bookkeeping at all."""
    kp = [str(k) for k in key_cols]
    return registers.groupBy(*kp, "bucket").agg(
        F.max("reg").alias("reg")
    )


def hll_estimate(
    registers: DataFrame,
    *,
    key_cols: Sequence[str] = (),
    p: int = 8,
) -> DataFrame:
    """Raw HLL estimate per key, EXACTLY replayable: the harmonic
    denominator Σ 2^−reg is scaled by 2^60 into a pure INTEGER sum
    (term = 2^(60−reg), a BIGINT; absent buckets contribute 2^60
    each) — order-free exact arithmetic, no float fold to
    synchronize — and the estimate is ONE exact-rounded double
    division α·m²·2^60 / Σ (the constant inlined via repr, the t16
    rule). Returns (keys…, n_buckets_hit, n_zero_regs, denom_scaled
    — the integer sum as a STRING (Spark DECIMAL(38,0) text ==
    DuckDB HUGEINT text, the p07 rule), estimate).

    The RAW estimator is biased low when many registers are zero
    (the classic small-range regime — linear counting m·ln(m/V)
    needs libm ln, so it stays a driver-side helper,
    `hll_linear_count`); the gate pins the replayable arithmetic,
    accuracy is pinned by pytest against exact distinct counts in
    the well-filled regime."""
    kp = [str(k) for k in key_cols]
    m = 1 << int(p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = alpha * m * m * float(1 << _HLL_BITS)
    # SQL expr: PySpark's shiftleft() only takes a Python-int shift
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_BITS} - reg)")
    agg = registers.groupBy(*kp).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets_hit"),
        F.sum(term.cast("decimal(38,0)")).alias("_s"),
    )
    denom = F.col("_s") + (
        (F.lit(m) - F.col("n_buckets_hit")).cast("decimal(38,0)")
        * F.lit(1 << _HLL_BITS).cast("decimal(38,0)")
    )
    return agg.select(
        *kp,
        "n_buckets_hit",
        (F.lit(m) - F.col("n_buckets_hit")).cast("long").alias("n_zero_regs"),
        denom.cast("decimal(38,0)").cast("string").alias("denom_scaled"),
        (F.lit(float(repr(num))) / denom.cast("double")).alias("estimate"),
    )


def hll_linear_count(m: int, n_zero_regs: int) -> float:
    """Driver-side linear-counting correction for the small-range
    regime (uses libm ln — deliberately OUTSIDE the gated path)."""
    import math

    if n_zero_regs <= 0:
        raise ValueError("no zero registers: use the raw estimate")
    return float(m) * math.log(float(m) / float(n_zero_regs))


def hll_sql(
    value_expr: str,
    table: str,
    *,
    key_cols: Sequence[str] = (),
    p: int = 8,
    salt: int = 77,
) -> str:
    """DuckDB replay of `hll_registers` + `hll_estimate` (oracle
    side) — identical hash, bucket split, bit-length rank, integer
    denominator, and single final division."""
    kp = [str(k) for k in key_cols]
    m = 1 << int(p)
    wbits = _HLL_BITS - int(p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = repr(alpha * m * m * float(1 << _HLL_BITS))
    hh = h60_sql(f"CAST({value_expr} AS VARCHAR)", salt)
    keys = ", ".join(kp)
    keys_pre = (keys + ", ") if kp else ""
    return f"""
WITH hh AS (SELECT {keys_pre}{hh} AS h FROM {table}
            WHERE {value_expr} IS NOT NULL),
rr AS (SELECT {keys_pre}(h % {m})::INT AS bucket,
              (CASE WHEN h // {m} = 0 THEN {wbits + 1}
                    ELSE {wbits} - length(printf('%b', h // {m})) + 1
               END)::INT AS rho
       FROM hh),
regs AS (SELECT {keys_pre}bucket, max(rho) AS reg FROM rr
         GROUP BY {keys_pre}bucket),
agg AS (SELECT {keys_pre}count(*)::BIGINT AS n_buckets_hit,
               sum((1::BIGINT << (60 - reg))::HUGEINT) AS s
        FROM regs{f' GROUP BY {keys}' if kp else ''})
SELECT {keys_pre}n_buckets_hit,
       ({m} - n_buckets_hit)::BIGINT AS n_zero_regs,
       (s + ({m} - n_buckets_hit)::HUGEINT
            * (1::BIGINT << 60)::HUGEINT)::VARCHAR AS denom_scaled,
       {num}::DOUBLE
         / (s + ({m} - n_buckets_hit)::HUGEINT
                * (1::BIGINT << 60)::HUGEINT)::DOUBLE AS estimate
FROM agg
"""


# --------------------------------------------------------------------------
# Bloom filter (exact-replay bits, union-mergeable)
# --------------------------------------------------------------------------

BLOOM_LANE_BITS = 32


def bloom_build(
    keys: DataFrame,
    *,
    key_col: str = "key",
    n_bits: int = 16384,
    k: int = 3,
) -> DataFrame:
    """Build a Bloom filter over a key column as ``(lane, bits)``
    rows — ``n_bits`` bits packed into 32-bit BIGINT lanes (the d03
    SWAR/v24 lane rule: headroom makes every value exactly
    representable on any engine). Hash ``i`` of key ``s`` is
    ``h60(f"{i}:{s}") % n_bits`` — the repo's engine-portable
    md5-derived hash — so the ENTIRE filter is exactly replayable in
    ANSI SQL (Spark's built-in ``bloom_filter_agg`` is not
    SQL-exposed and its bit layout is opaque; these bits are the
    spec). Lanes nobody set are absent (sparse representation).

    Mergeable: the union filter of two key sets is ``bit_or`` of
    their lanes — the same shape as every other sketch here, so
    shards/streams build independently and merge losslessly
    (pytest-pinned). One explode (k rows/key) + one
    map-side-combined bit_or aggregate over at most n_bits/32 groups.

    The build GEOMETRY rides the lane table as literal ``n_bits`` /
    ``k`` columns (round-8 ADVICE): probing with a different
    geometry than the build silently yields false negatives, so
    `bloom_probe` reads the carried geometry by default and REFUSES
    a mismatching explicit one. Merges must group by
    (lane, n_bits, k) — constant columns, so the groups are
    unchanged and a geometry mix-up surfaces as duplicate lanes
    instead of silent bit aliasing.
    """
    nb, kk = int(n_bits), int(k)
    if nb % BLOOM_LANE_BITS:
        raise ValueError(f"n_bits must be a multiple of {BLOOM_LANE_BITS}")
    from vector_database_spark.functions.hashing import h60

    s = keys.select(F.col(key_col).cast("string").alias("_s"))
    rows = s.select(
        "_s", F.explode(F.array(*[F.lit(i) for i in range(kk)])).alias("_i")
    ).select(
        F.pmod(
            h60(F.concat(F.col("_i").cast("string"), F.lit(":"), F.col("_s"))),
            F.lit(nb),
        ).alias("_pos")
    )
    return (
        rows.select(
            F.expr(f"_pos div {BLOOM_LANE_BITS}").cast("long").alias("lane"),
            F.expr(
                f"shiftleft(1L, CAST(pmod(_pos, {BLOOM_LANE_BITS}) AS INT))"
            ).alias("_m"),
        )
        .groupBy("lane")
        .agg(F.bit_or("_m").alias("bits"))
        .select(
            "lane",
            "bits",
            F.lit(nb).cast("int").alias("n_bits"),
            F.lit(kk).cast("int").alias("k"),
        )
    )


def bloom_probe(
    filt: DataFrame,
    probes: DataFrame,
    *,
    key_col: str = "key",
    n_bits: int | None = None,
    k: int | None = None,
) -> DataFrame:
    """Membership test against a `bloom_build` filter:
    ``(key, present)`` per probe — ``present`` iff all ``k`` bit
    positions are set (no false negatives by construction; false
    positives at the standard (1-e^(-kn/m))^k rate). The probe side
    explodes to k rows, equi-joins the (tiny, <= n_bits/32 rows)
    filter — broadcast — and one bool_and per key folds the verdict.
    The filter, not the corpus, is the join's small side: probing a
    100 TB candidate stream is one broadcast join + one aggregate.

    Geometry is read from the filter's carried ``n_bits``/``k``
    columns by default (round-8 ADVICE — a mismatched probe geometry
    silently breaks the no-false-negative contract); passing them
    explicitly is validated against the carried values, and a filter
    from several merged builds with MIXED geometry is rejected.
    """
    carried = None
    if {"n_bits", "k"} <= set(filt.columns):
        geos = filt.select("n_bits", "k").distinct().collect()
        if len(geos) != 1:
            raise ValueError(
                "bloom_probe: filter carries mixed geometries "
                f"{sorted((g['n_bits'], g['k']) for g in geos)} — merged "
                "lanes from differently-built filters are not a Bloom "
                "filter"
            )
        carried = (int(geos[0]["n_bits"]), int(geos[0]["k"]))
    if carried is not None:
        if n_bits is not None and int(n_bits) != carried[0]:
            raise ValueError(
                f"bloom_probe: n_bits={n_bits} != the filter's build "
                f"geometry n_bits={carried[0]} — probing would yield "
                "false negatives"
            )
        if k is not None and int(k) != carried[1]:
            raise ValueError(
                f"bloom_probe: k={k} != the filter's build geometry "
                f"k={carried[1]} — probing would yield false negatives"
            )
        nb, kk = carried
    else:
        # legacy lane table without carried geometry: explicit values
        # (or the historical defaults) are the caller's contract
        nb = int(n_bits) if n_bits is not None else 16384
        kk = int(k) if k is not None else 3
    from vector_database_spark.functions.hashing import h60

    p = probes.select(F.col(key_col).alias("_key"))
    rows = p.select(
        "_key",
        F.explode(F.array(*[F.lit(i) for i in range(kk)])).alias("_i"),
    ).select(
        "_key",
        F.pmod(
            h60(
                F.concat(
                    F.col("_i").cast("string"),
                    F.lit(":"),
                    F.col("_key").cast("string"),
                )
            ),
            F.lit(nb),
        ).alias("_pos"),
    ).select(
        "_key",
        F.expr(f"_pos div {BLOOM_LANE_BITS}").cast("long").alias("lane"),
        F.expr(
            f"shiftleft(1L, CAST(pmod(_pos, {BLOOM_LANE_BITS}) AS INT))"
        ).alias("_m"),
    )
    joined = rows.join(F.broadcast(filt), "lane", "left").select(
        "_key",
        (
            F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_m"))
            == F.col("_m")
        ).alias("_hit"),
    )
    return joined.groupBy(F.col("_key").alias(key_col)).agg(
        F.min("_hit").alias("present")
    )
