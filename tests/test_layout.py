"""Z-order layout contracts: exact interleave values, and the actual
multi-dimensional locality benefit vs a linear sort (tight
per-partition bounding boxes in BOTH dimensions = file skipping on
either filter column)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_database_spark.operators import layout


def test_zorder_known_values(spark):
    """bits=2, two cols with [0,3] bounds: scaling is identity and
    the interleave puts col-0 bits at even positions."""
    rows = [(0, 0), (3, 0), (0, 3), (3, 3), (2, 1)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = {
        (r["a"], r["b"]): r["zcode"]
        for r in layout.zorder_code(
            df, ["a", "b"], bits=2, bounds={"a": (0, 3), "b": (0, 3)}
        ).collect()
    }
    # a=0b10, b=0b01 -> bit0(a)@0, bit0(b)@1, bit1(a)@2, bit1(b)@3
    assert out[(0, 0)] == 0
    assert out[(3, 0)] == 0b0101
    assert out[(0, 3)] == 0b1010
    assert out[(3, 3)] == 0b1111
    assert out[(2, 1)] == 0b0110


def test_zorder_scaling_and_validation(spark):
    df = spark.createDataFrame([(10, 0), (20, 0)], "a long, b long")
    out = {
        r["a"]: r["zcode"]
        for r in layout.zorder_code(df, ["a", "b"], bits=4).collect()
    }
    # bounds inferred: a in [10,20] -> scaled 0 / 15; b degenerate -> 0
    assert out[10] == 0
    assert out[20] == 0b01010101  # 15 interleaved at even positions
    import pytest

    with pytest.raises(ValueError, match="BIGINT"):
        layout.zorder_code(df, ["a", "b"], bits=32)
    with pytest.raises(ValueError, match="at least one"):
        layout.zorder_code(df, [])


def test_cluster_by_zorder_bounds_boxes_both_dims(spark):
    """The point of the layout: after z-order clustering, every
    partition's (min,max) box is tight in BOTH dimensions, so file
    stats prune on either column. A linear sort on `a` leaves the
    `b` extent of every partition at ~full range."""
    n = 64
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("a"), (F.col("id") / n).cast("long").alias("b")
    )

    def spans(df):
        pid = df.withColumn("pid", F.spark_partition_id())
        rows = (
            pid.groupBy("pid")
            .agg(
                (F.max("a") - F.min("a")).alias("sa"),
                (F.max("b") - F.min("b")).alias("sb"),
            )
            .collect()
        )
        return (
            sum(r["sa"] for r in rows) / len(rows),
            sum(r["sb"] for r in rows) / len(rows),
        )

    z = layout.cluster_by_zorder(grid, ["a", "b"], bits=6, num_partitions=16)
    assert "zcode" not in z.columns
    assert z.count() == n * n  # clustering is a permutation
    za, zb = spans(z)
    lin = grid.repartitionByRange(16, "a").sortWithinPartitions("a")
    la, lb = spans(lin)
    # linear sort: perfect on a, useless on b (full extent)
    assert la < n / 4 and lb > n * 0.9
    # z-order: BOTH dims bounded well below the full extent
    assert za < n / 2 and zb < n / 2


def test_zorder_wide_int_range_and_clamping(spark):
    """Regression: an INT column whose range x (2^bits-1) exceeds
    int32 must not ANSI-overflow (cast to BIGINT before multiply);
    values outside caller-supplied bounds clamp into the edge cells
    instead of wrapping into arbitrary z-ranges."""
    import pytest
    from pyspark.sql import functions as F

    wide = spark.range(3).select(
        (F.col("id") * 1_500_000).cast("int").alias("a"),
        F.lit(0).cast("int").alias("b"),
    )
    codes = {r["a"]: r["zcode"]
             for r in layout.zorder_code(wide, ["a", "b"], bits=10).collect()}
    assert codes[0] == 0 and len(codes) == 3  # no ARITHMETIC_OVERFLOW
    # stale bounds: out-of-range values land in edge cells, monotone
    df = spark.createDataFrame([(-5, 0), (0, 0), (3, 0), (99, 0)],
                               "a long, b long")
    out = {r["a"]: r["zcode"] for r in layout.zorder_code(
        df, ["a", "b"], bits=2, bounds={"a": (0, 3), "b": (0, 3)}
    ).collect()}
    assert out[-5] == out[0] == 0
    assert out[99] == out[3]
    # empty frame with inferred bounds: clear error, not TypeError
    empty = spark.createDataFrame([], "a long, b long")
    with pytest.raises(ValueError, match="empty"):
        layout.zorder_code(empty, ["a", "b"])
    # bounds span x grid overflowing BIGINT: clear error
    huge = spark.createDataFrame([(0, 0), (2**62, 0)], "a long, b long")
    with pytest.raises(ValueError, match="overflows"):
        layout.zorder_code(huge, ["a", "b"], bits=10)


def test_write_zordered_file_skipping_both_dims(spark, tmp_path):
    """The turnkey write path: a 2-col clustered write must let
    parquet footer stats skip >= 50% of files for a selective range
    predicate on EITHER column (the round-3 verdict's done-when)."""
    from vector_database_spark.operators.catalog import write_zordered

    n = 128
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("a"), (F.col("id") / n).cast("long").alias("b")
    )
    path = str(tmp_path / "zo")
    report = write_zordered(grid, path, ["a", "b"], bits=7, num_files=64)
    assert report["n_files"] >= 8

    import os

    import pyarrow.parquet as pq

    stats = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        span = {}
        for c in ("a", "b"):
            st = [
                md.row_group(rg).column(idx[c]).statistics
                for rg in range(md.num_row_groups)
            ]
            span[c] = (min(s.min for s in st), max(s.max for s in st))
        stats.append(span)

    # a selective predicate inside one z-cell (not straddling the
    # power-of-2 cell boundary at 64): col in [40, 47]
    q_lo, q_hi = 40, 47
    for c in ("a", "b"):
        skipped = sum(
            1 for s in stats if s[c][1] < q_lo or s[c][0] > q_hi
        )
        assert skipped / len(stats) >= 0.5, (c, skipped, len(stats))
