"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop datasource write (full
evaluation, no driver collect overhead). The index build is timed as
its own entry since it is the reference's headline number
(BASELINE.md: ~3 min for 10M x 96 on one node).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_database_spark import get_spark
from vector_database_spark import workload

BENCH_QUERIES = [
    "v01_search_exact",
    "v03_knn_l2",
    "v05_dim_stats",
    "d02_dedup_minhash_lsh",
    "d03_dedup_simhash",
    "d05_embedding_neardup",
    "t04_fingerprint",
    "r01_q1_agg",
    "r02_join_revenue",
    "r03_topk_per_group",
    "e02_sessionize",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")

    spark = get_spark(
        app_name="vds-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Two timed passes per query, keep the min: the rig's effective CPU
    # speed swings 2-4x with host-level throttling (same probe measured
    # 7.2 s and 28 s steady within one hour), so a single sample mostly
    # measures the host's mood. Min-of-2 inside one session is the
    # standard noise floor; both passes run the identical plan.
    timings: dict[str, float] = {}

    def record(name: str, thunk) -> None:
        best = None
        for _ in range(2):
            t0 = time.time()
            thunk()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # headline: BSP-tree index build over the embeddings table
    def _build():
        workload.drop_cached("index")
        workload.embeddings_index(spark, sf_dir)  # builds + materializes

    record("index_build", _build)

    qs = workload.queries()
    # session caches a timed query must NOT ride across its min-of-2
    # passes: d02 is charged the shared shingle pass every pass (the
    # queries after it legitimately share the one it leaves behind)
    pre_hooks = {"d02_dedup_minhash_lsh": lambda: workload.drop_cached("shingles")}
    for name in BENCH_QUERIES:
        def thunk(name=name):
            hook = pre_hooks.get(name)
            if hook:
                hook()
            _force(qs[name](spark, sf_dir))

        record(name, thunk)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline-suite wall time, min of 2 passes (build + search + dedup + relational)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
