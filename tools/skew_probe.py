"""Skew probe for the build's routing join (round-4 verdict #5).

The one-hot fixture covers degenerate SPLITS (zero-variance
dimensions); this probe covers hot ROUTING partitions: a corpus where
50% of all rows are copies of ONE vector. Every mean-split puts the
clone block on a single side, so one range stays huge level after
level until the empty-side fallback engages the id-split — the
routing join's shuffle key distribution is maximally skewed the whole
way down (every clone row carries the same range id). AQE skew-join
splitting plus the broadcast routing form must absorb this without
OOM or runaway levels.

Usage: python tools/skew_probe.py [n_rows] [dims] [dup_frac]

Asserts:
- build completes with nodes == 2N-1 and leaves == N (the id-split
  fallback must separate byte-identical vectors),
- level count stays within 2x the balanced-tree depth bound for the
  CLONE block (clones can only be separated by id-splits, which halve
  — depth ~= log2(n*dup_frac) + log2(n) slack),
- wall time within 2x an interleaved uniform-corpus build of the
  same size (run in the SAME process, alternating, so host throttle
  cannot bias the comparison).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_database_spark import get_spark
from vector_database_spark.operators.index_build import build_index
from vector_database_spark.sources.generators import clusters


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    dup_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5

    spark = get_spark(app_name="skew-probe", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    n_dup = int(n * dup_frac)
    base = clusters(spark, n - n_dup, dims, n_clusters=16, seed=5).select(
        "id", "vector"
    )
    hot = [float((i * 7 % 13) / 13.0 - 0.5) for i in range(dims)]
    dups = spark.range(n_dup).select(
        (F.col("id") + (n - n_dup)).alias("id"),
        F.array(*[F.lit(x) for x in hot]).cast("array<double>").alias("vector"),
    )
    skewed = base.unionByName(dups).repartition(32).persist()
    assert skewed.count() == n

    uniform = (
        clusters(spark, n, dims, n_clusters=16, seed=9)
        .select("id", "vector")
        .repartition(32)
        .persist()
    )
    uniform.count()

    # warm plans once, untimed
    build_index(
        clusters(spark, 256, 8, n_clusters=4, seed=1).select("id", "vector"),
        local_threshold=32,
    ).count()

    t_skew, t_uni = [], []
    idx = None
    for i in range(3):
        t0 = time.time()
        idx = build_index(skewed, local_threshold=None).persist()
        n_nodes = idx.count()
        t_skew.append(time.time() - t0)
        n_leaves = idx.where(F.col("id").isNotNull()).count()
        assert n_nodes == 2 * n - 1, n_nodes
        assert n_leaves == n, n_leaves
        if i < 2:
            idx.unpersist()
        t0 = time.time()
        u = build_index(uniform, local_threshold=None)
        assert u.count() == 2 * n - 1
        t_uni.append(time.time() - t0)
        print(
            f"round {i}: skew {t_skew[-1]:.1f}s uniform {t_uni[-1]:.1f}s",
            flush=True,
        )

    # depth bound: the clone block is only divisible by id-splits.
    # range_id is heap-numbered (root 1, children 2r/2r+1), so node
    # depth = floor(log2(range_id)).
    max_rid = idx.agg(F.max("range_id")).first()[0]
    max_level = int(math.floor(math.log2(max_rid)))
    depth_bound = 2 * (math.ceil(math.log2(max(n_dup, 2))) + 4)
    assert max_level <= depth_bound, (max_level, depth_bound)

    ratio = min(t_skew) / min(t_uni)
    print(
        f"VERDICT: nodes=2N-1 OK, max_level={max_level} "
        f"(bound {depth_bound}), skew best {min(t_skew):.1f}s / "
        f"uniform best {min(t_uni):.1f}s = {ratio:.2f}x "
        f"({'PASS' if ratio <= 2.0 else 'FAIL >2x'})"
    )
    assert ratio <= 2.0, ratio
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
