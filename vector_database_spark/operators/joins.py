"""Join operators beyond Catalyst's built-ins: as-of and range joins.

Spark has no native AS OF join (SURVEY.md §2.2); the distributed
rendering here is the union+window trick: tag both inputs, union them,
sort each key group by (ts, side) and carry the latest right-side
attributes forward with `last(ignorenulls)`. One shuffle on the join
key, no per-row probing, no broadcast requirement — the canonical
scale shape (both sides can be arbitrarily large).

Range joins against a small boundary table stay a broadcast
nested-loop join, which is exactly right when one side is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    right_on: str | None = None,
    direction: str = "backward",
    suffix: str = "_asof",
    tolerance: float | None = None,
) -> DataFrame:
    """For each left row, attach the matching right row in the same
    ``on`` group under ``direction``:

    * ``backward`` — greatest ``right_ts <= left_ts``;
    * ``forward``  — smallest ``right_ts >= left_ts``;
    * ``nearest``  — whichever of the two is closer in time; exact
      ties go backward (the deterministic choice DuckDB's window
      oracle can reproduce).

    Ties on the timestamp WITHIN the right side must be
    pre-deduplicated by the caller for determinism.

    ``tolerance`` (pandas merge_asof semantics): a match further than
    this from the left timestamp is nulled out. Units: SECONDS for
    temporal columns, the column's own units for numeric event
    times. Applied as a post-predicate on the carried match — the
    plan shape (one shuffle + one window pass) is unchanged.

    Returns all left columns + ``<right_value><suffix>`` columns
    (null when no right row qualifies).

    Execution: tag + union + RANGE-framed window carries over the
    key-sorted stream — `last(ignorenulls)` over
    (unboundedPreceding..currentRow) for backward, `first(ignorenulls)`
    over (currentRow..unboundedFollowing) for forward. Range frames
    (not row frames) make equal timestamps land in BOTH directions'
    frames, and the two window specs share partitioning + ordering, so
    even 'nearest' costs one shuffle and one sort.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    right_on = right_on or on

    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in right_values],
    )
    r_tag = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            l_tag.schema["_lrow"].dataType
        ).alias("_lrow"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_values],
    )
    u = l_tag.unionByName(r_tag)
    wb = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc())
        .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried_cols: list = []
    if direction in ("backward", "nearest"):
        carried_cols += [
            F.last(f"_rv_{c}", ignorenulls=True).over(wb).alias(f"_b_{c}")
            for c in right_values
        ]
        carried_cols.append(F.last("_rts", ignorenulls=True).over(wb).alias("_bts"))
    if direction in ("forward", "nearest"):
        carried_cols += [
            F.first(f"_rv_{c}", ignorenulls=True).over(wf).alias(f"_f_{c}")
            for c in right_values
        ]
        carried_cols.append(F.first("_rts", ignorenulls=True).over(wf).alias("_fts"))
    carried = u.select("_lrow", "_side", "_ts", *carried_cols).where(
        F.col("_side") == 1
    )
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    u_schema = {f.name: f.dataType for f in carried.schema.fields}
    temporal = isinstance(
        u_schema["_ts"], (DateType, TimestampType, TimestampNTZType)
    )

    def numeric(name: str) -> F.Column:
        # exact integer microseconds for temporal types (float
        # seconds could flip exact midpoint ties); plain double
        # for numeric event times. TIMESTAMP_NTZ must use the
        # tz-independent timestampdiff form — casting NTZ->TIMESTAMP
        # shifts by the session timezone, and across a DST transition
        # the two sides shift by DIFFERENT offsets, corrupting the
        # distance (the repo's established _epoch_us rule).
        dt = u_schema[name]
        if isinstance(dt, TimestampNTZType):
            return F.expr(
                f"timestampdiff(MICROSECOND, "
                f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {name})"
            )
        if isinstance(dt, DateType):
            # tz-independent: cast-to-timestamp shifts by the session
            # tz, and two DATEs straddling a DST transition shift by
            # DIFFERENT offsets (a 1-day gap measures 25h across
            # fall-back), wrongly nulling whole-day tolerances.
            return F.unix_date(F.col(name)).cast("long") * F.lit(
                86_400_000_000
            )
        if isinstance(dt, TimestampType):
            return F.unix_micros(F.col(name))
        return F.col(name).cast("double")

    # tolerance in the numeric() scale: micros for temporal columns
    tol_q = None
    if tolerance is not None:
        tol_q = F.lit(
            float(tolerance) * 1_000_000 if temporal else float(tolerance)
        )

    def gated(val: F.Column, dist: F.Column) -> F.Column:
        return val if tol_q is None else F.when(dist <= tol_q, val)

    ts_d = numeric("_ts")
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    if direction == "backward":
        dist = ts_d - numeric("_bts")
        out_cols += [
            gated(F.col(f"_b_{c}"), dist).alias(f"{c}{suffix}")
            for c in right_values
        ]
    elif direction == "forward":
        dist = numeric("_fts") - ts_d
        out_cols += [
            gated(F.col(f"_f_{c}"), dist).alias(f"{c}{suffix}")
            for c in right_values
        ]
    else:
        go_back = F.col("_fts").isNull() | (
            F.col("_bts").isNotNull()
            & ((ts_d - numeric("_bts")) <= (numeric("_fts") - ts_d))
        )
        chosen_dist = F.when(
            go_back, ts_d - numeric("_bts")
        ).otherwise(numeric("_fts") - ts_d)
        out_cols += [
            gated(
                F.when(go_back, F.col(f"_b_{c}")).otherwise(
                    F.col(f"_f_{c}")
                ),
                chosen_dist,
            ).alias(f"{c}{suffix}")
            for c in right_values
        ]
    return carried.select(*out_cols)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    *,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with explicit key salting: the skew escape hatch when
    one join key dominates (a hot part, a null-heavy foreign key) and
    AQE's skew splitting isn't available or isn't enough.

    Each big-side row gets a uniform salt in [0, salt_buckets); the
    small side is replicated once per salt value. The join key becomes
    (key, salt), so a hot key's rows spread over ``salt_buckets``
    reducers instead of one straggler task. Results are identical to
    the plain join — salting only changes the shuffle layout. Cost:
    small-side shuffle volume × salt_buckets (keep the small side
    genuinely small, or broadcast and skip salting entirely).

    Supported ``how``: inner / left (semantics preserved because every
    big row keeps exactly its original salt partition).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    # collision-proof temp column: a user column named `_salt` on
    # either side would otherwise be silently overwritten here and
    # dropped from the output
    sc = "_salt"
    while sc in big.columns or sc in small.columns:
        sc = "_" + sc
    salt = (F.rand(seed) * salt_buckets).cast("int")
    b = big.withColumn(sc, salt)
    s = small.withColumn(
        sc, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return b.join(s, [on, sc], how).drop(sc)


def range_join(
    df: DataFrame,
    boundaries: DataFrame,
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Theta-join a fact table to a (small) boundary table on
    ``lo <= value < hi``. Broadcasts the boundary side — with a tiny
    boundary table Catalyst plans a BroadcastNestedLoopJoin, the right
    physical strategy for non-equi conditions."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return df.join(F.broadcast(boundaries), cond, "left")
