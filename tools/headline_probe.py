"""Headline apples-to-apples probe: the reference's own banner
workload — a 10M x 96 single-node index build (~3 min anchor,
reference README.md:100) — run for real, not extrapolated from the
200k scale probe.

Usage: python tools/headline_probe.py [n_rows] [dims] [passes]
       [local_threshold|auto] [local_concurrency|none]

The two trailing args feed `build_index` (round-12 verdict item 1:
task granularity + bounded pool concurrency — see
tools/local_phase_probe.py for the interleaved grid that picks them).

Protocol:
1. stage n x d float vectors as parquet (the reference reads HDF5
   from disk; we read parquet from disk — same I/O shape),
2. timed cold build from the staged file in a fresh session (one-time
   JIT + python-worker bring-up is warmed by the session's standard
   tiny-build warmup, same as every other consumer of get_spark),
3. leaf/node invariants (2N-1 nodes, N leaves),
4. search == brute on a sampled panel.

Prints one JSON line for SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.host_anchor import SCAN_HEALTHY_BAND, host_anchor
from vector_database_spark import get_spark
from vector_database_spark.operators.index_build import build_index
from vector_database_spark.operators.search import brute_force_search, search
from vector_database_spark.sources.generators import clusters


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    thr_arg = sys.argv[4] if len(sys.argv) > 4 else "auto"
    cap_arg = sys.argv[5] if len(sys.argv) > 5 else "none"
    local_threshold = None if thr_arg == "auto" else int(thr_arg)
    local_concurrency = None if cap_arg == "none" else int(cap_arg)

    spark = get_spark(
        app_name="headline-probe", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    stage_dir = os.path.join(
        tempfile.gettempdir(), f"headline_{n}x{dims}.parquet"
    )
    if not os.path.exists(os.path.join(stage_dir, "_SUCCESS")):
        t0 = time.time()
        clusters(spark, n, dims, n_clusters=64, seed=11).select(
            "id", "vector"
        ).repartition(64).write.mode("overwrite").parquet(stage_dir)
        print(f"stage {n}x{dims} parquet: {time.time()-t0:.1f}s", flush=True)

    vecs = spark.read.parquet(stage_dir)

    # round-10 verdict item 1b: a ~30 s host-health anchor runs BESIDE
    # each build pass (scan + shuffle+write microbenches, fixed size)
    # so throttle attribution is a committed ratio: uniform inflation
    # of anchors AND build = host; build moving against flat anchors
    # = code. NOTE: host_anchor clearCache()s, so it must run before
    # each pass (the pass re-persists) and never between build+search.
    host_anchor(spark)  # untimed warmup: the first r01 read in a
    # fresh session pays parquet-footer + codegen costs that would
    # otherwise masquerade as pass-0 throttle (measured 4.1-4.6 s vs
    # 0.4-1.0 s warm in the r11 runs)
    t_build, anchors = [], []
    idx = None
    for i in range(passes):
        if idx is not None:
            idx.unpersist()
        a = host_anchor(spark)
        anchors.append(a)
        print(f"anchor pass {i}: {json.dumps(a)}", flush=True)
        t0 = time.time()
        idx = build_index(
            vecs,
            local_threshold=local_threshold,
            local_concurrency=local_concurrency,
        ).persist()
        n_nodes = idx.count()
        t_build.append(time.time() - t0)
        print(f"build pass {i}: {t_build[-1]:.1f}s", flush=True)
    n_leaves = idx.where(F.col("id").isNotNull()).count()
    assert n_leaves == n, (n_leaves, n)
    assert n_nodes == 2 * n - 1, n_nodes

    panel_ids = [7, 424242, n - 3]
    panel = [
        (int(r.id), [float(x) for x in r.vector])
        for r in vecs.where(F.col("id").isin(panel_ids)).collect()
    ]
    # INTERLEAVE brute and tree-search rounds (brute first): the first
    # scan of the staged parquet pays the cold page-cache read, and
    # search(auto) additionally pays a one-time pilot collect — a
    # single search-then-brute ordering misattributes both to the
    # tree path (round-5 lesson: 48.9 s vs 23.3 s collapsed to parity
    # once interleaved).
    t_search, t_brute = [], []
    got = want = None
    for _ in range(2):
        t0 = time.time()
        want = {
            (r.qid, r.id)
            for r in brute_force_search(vecs, panel, 0.5).collect()
        }
        t_brute.append(time.time() - t0)
        t0 = time.time()
        got = {(r.qid, r.id) for r in search(idx, vecs, panel, 0.5).collect()}
        t_search.append(time.time() - t0)
    t_search, t_brute = min(t_search), min(t_brute)
    assert got == want, (len(got), len(want))

    best = min(t_build)
    print(
        json.dumps(
            {
                "probe": "headline_10m_build",
                "n": n,
                "dims": dims,
                "local_threshold": thr_arg,
                "local_concurrency": cap_arg,
                "build_sec": [round(t, 1) for t in t_build],
                "build_best_sec": round(best, 1),
                "vec_per_sec": round(n / best),
                "nodes": n_nodes,
                "leaves": n_leaves,
                "search_sec": round(t_search, 1),
                "brute_sec": round(t_brute, 1),
                "search_matches_brute": True,
                "hits": len(got),
                "reference_anchor_sec": 180,
                "host_anchors": anchors,
                "scan_anchor_healthy_band": list(SCAN_HEALTHY_BAND),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
