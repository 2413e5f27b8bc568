"""Z-order (Morton) data layout: multi-dimensional clustering for
file skipping.

At 100 TB a table is pruned by per-file min/max statistics; a linear
sort gives perfect pruning on ONE key and none on the others.
Interleaving the bits of k rank-bucketed keys gives every key
locality ~2^(bits/k): files become tight bounding boxes in ALL k
dimensions, so selective filters on any clustered column skip most
files (the Delta/Iceberg OPTIMIZE ZORDER shape, done here as plain
repartitionByRange + sortWithinPartitions — no table format needed).

Everything is exact integer arithmetic (scale then interleave), so
the codes are engine-portable and oracle-checkable bit for bit. The
interleave unrolls to bits*k shift/mask terms of PRIMITIVE integer
ops — whole-stage-codegen friendly (unlike array higher-order
lambdas, which run interpreted; the repo's measured 8x lesson applies
to per-element array access, not flat integer expressions).

Reference analog: none (the reference stores rows in insertion
order); this is part of the brief's scale surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _scaled(name: str, lo: int, hi: int, bits: int) -> str:
    """SQL fragment: exact integer min-max scaling of `name` (known
    [lo, hi] bounds) onto [0, 2^bits). The operand is cast to BIGINT
    BEFORE the multiply (an INT column's range x top overflows int32
    under ANSI mode), and the result is CLAMPED to the grid so values
    outside caller-supplied bounds (stale bounds on drifted data)
    land in the edge cells instead of wrapping into arbitrary
    z-ranges."""
    top = (1 << int(bits)) - 1
    if hi <= lo:
        return "CAST(0 AS BIGINT)"
    scaled = (
        f"((CAST({name} AS BIGINT) - {lo}) * {top}) div {hi - lo}"
    )
    return f"greatest(CAST(0 AS BIGINT), least(CAST({top} AS BIGINT), {scaled}))"


def _interleave(scaled: Sequence[str], bits: int) -> str:
    """SQL fragment interleaving the bits of pre-scaled BIGINT
    fragments: bit b of input i lands at position b*k + i. Flat
    integer shift/mask terms — codegen, never interpreted."""
    k = len(scaled)
    terms = []
    for b in range(int(bits)):
        for i, s in enumerate(scaled):
            terms.append(
                f"(shiftleft(shiftright({s}, {b}) & 1, {b * k + i}))"
            )
    return "(" + " | ".join(terms) + ")"


def zorder_code(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bits: int = 10,
    bounds: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Append a BIGINT ``zcode`` column: the Morton interleave of the
    rank-scaled ``cols`` (integer-typed). Column bounds come from
    ``bounds`` or ONE tiny global min/max aggregate (collected: 2k
    values). bits*len(cols) must fit 63 bits."""
    if not cols:
        raise ValueError("zorder_code needs at least one column")
    if int(bits) * len(cols) > 63:
        raise ValueError(
            f"bits={bits} x {len(cols)} cols exceeds a BIGINT"
        )
    if bounds is None:
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
        row = df.agg(*aggs).first()
        bounds = {c: (row[f"_lo_{c}"], row[f"_hi_{c}"]) for c in cols}
        if any(bounds[c][0] is None for c in cols):
            raise ValueError(
                "zorder_code: cannot infer bounds from an empty or "
                "all-null frame — pass bounds= explicitly"
            )
    top = (1 << int(bits)) - 1
    for c in cols:
        lo, hi = int(bounds[c][0]), int(bounds[c][1])
        if hi > lo and (hi - lo) > (2**63 - 1) // top:
            raise ValueError(
                f"zorder_code: bounds span of {c} ({hi - lo}) x grid "
                f"{top} overflows BIGINT — reduce bits or pre-bucket "
                "the column"
            )
    scaled = [
        _scaled(c, int(bounds[c][0]), int(bounds[c][1]), bits)
        for c in cols
    ]
    return df.withColumn(
        "zcode", F.expr(_interleave(scaled, bits)).cast("long")
    )


def cluster_by_zorder(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bits: int = 10,
    num_partitions: int | None = None,
    bounds: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Physically cluster `df` for multi-dimensional file skipping:
    range-partition + sort by the z-code, then drop it. Each output
    partition (= output file on write) covers a contiguous z-range —
    a tight bounding box in every clustered dimension, so min/max
    file stats prune on ANY of the columns. One shuffle (the range
    exchange); the sort is partition-local."""
    z = zorder_code(df, cols, bits=bits, bounds=bounds)
    part = (
        z.repartitionByRange(num_partitions, "zcode")
        if num_partitions
        else z.repartitionByRange("zcode")
    )
    return part.sortWithinPartitions("zcode").drop("zcode")
