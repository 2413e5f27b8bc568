"""checkpoint_every tail A/B at the round-13 granularity (10M x 96).

With ~40k-row local tasks the build runs 8 distributed levels, so the
route chain hits `checkpoint_every=8` exactly at the LAST level — the
collapse writes + re-reads a ~4.6 GB routed checkpoint whose only
consumer is the final all-local pool job. `checkpoint_every=16` skips
that collapse: the pool's repartition shuffle derives routing straight
off the page-cached source through the 8 chained broadcast joins (the
shuffle write it pays either way), saving one full-data write + read
on a write-throttled host. Interleaved, anchored, invariant-checked;
trees are pytest-pinned identical across checkpoint_every values.

Usage: python tools/ckpt_tail_ab_probe.py [rounds] [n] [dims]
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
from vector_database_spark.sources.generators import clusters


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    dims = int(sys.argv[3]) if len(sys.argv) > 3 else 96

    spark = get_spark(
        app_name="ckpt-tail-ab", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    stage_dir = os.path.join(
        tempfile.gettempdir(), f"headline_{n}x{dims}.parquet"
    )
    if not os.path.exists(os.path.join(stage_dir, "_SUCCESS")):
        clusters(spark, n, dims, n_clusters=64, seed=11).select(
            "id", "vector"
        ).repartition(64).write.mode("overwrite").parquet(stage_dir)
    vecs = spark.read.parquet(stage_dir)

    host_anchor(spark)  # untimed warmup
    res: dict[str, list] = {"ck8": [], "ck16": []}
    anc: dict[str, list] = {"ck8": [], "ck16": []}
    for rnd in range(rounds):
        for label, ck in (("ck8", 8), ("ck16", 16)):
            a = host_anchor(spark)
            anc[label].append(a)
            t0 = time.time()
            idx = build_index(vecs, checkpoint_every=ck).persist()
            n_nodes = idx.count()
            dt = time.time() - t0
            n_leaves = idx.where(F.col("id").isNotNull()).count()
            idx.unpersist()
            assert n_nodes == 2 * n - 1 and n_leaves == n, (label, n_nodes)
            res[label].append(round(dt, 1))
            print(
                json.dumps(
                    {"round": rnd, "config": label,
                     "build_sec": round(dt, 1), "anchor": a}
                ),
                flush=True,
            )
    print(
        json.dumps(
            {
                "probe": "ckpt_tail_ab",
                "n": n,
                "dims": dims,
                "build_sec": res,
                "best": {k: min(v) for k, v in res.items()},
                "anchors": anc,
                "scan_anchor_healthy_band": list(SCAN_HEALTHY_BAND),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
