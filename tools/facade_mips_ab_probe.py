"""facade_search_mips bench-mover attribution (round-11 verdict item
2): BENCH_r11 flagged facade_search_mips at 1.27x anchor-adjusted vs
r10 (1.161 -> 1.617 s min) — the one mover without an A/B ruling.

Protocol (the d05 rule): build the EXACT bench-shape stores (100k x 16
clusters, n_cells=64, local_threshold=65536) for 'mips' and its
unflagged sibling 'bsp', then time the same search INTERLEAVED
min-of-N within one process. The mips/bsp ratio is host-immune; the
committed bench ratios to compare against: r10 1.161/0.741 = 1.57,
r11 1.617/0.777 = 2.08. A probe ratio in the r10 band exonerates the
mover (host noise); a ratio near 2.1 confirms a real serving
regression.

Usage: python tools/facade_mips_ab_probe.py [passes]
Writes one JSON line; commit as data/probes/facade_mips_ab_r{N}.json.
NEVER run anything else on the box beside this probe.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_database_spark import get_spark
from vector_database_spark.api import VectorDatabase
from vector_database_spark.sources.generators import clusters


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark(
        app_name="facade-mips-ab", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="facade_mips_ab_")
    try:
        data = (
            clusters(spark, n=100_000, dims=16, n_clusters=24, seed=3)
            .select(
                (F.col("id") % 8).alias("doc_id"),
                F.col("id").alias("text_id"),
                "vector",
            )
            .localCheckpoint()
        )
        q = [
            float(x)
            for x in data.where(F.col("text_id") == 7).first()["vector"]
        ]
        vdbs = {}
        for t in ("bsp", "mips"):
            vdbs[t] = VectorDatabase(
                spark, f"{root}/{t}", index_type=t, n_cells=64,
                local_threshold=65_536, pq_m=4,
            )
            vdbs[t].add_documents(data)
            vdbs[t].search(q, 0.35).count()  # warm (bench passes 2-3 shape)
        t_by = {"bsp": [], "mips": []}
        hits = {}
        for _ in range(passes):
            for t in ("mips", "bsp"):
                t0 = time.time()
                hits[t] = vdbs[t].search(q, 0.35).count()
                t_by[t].append(round(time.time() - t0, 3))
        rec = {
            "probe": "facade_mips_ab",
            "passes": passes,
            "mips_sec": t_by["mips"],
            "bsp_sec": t_by["bsp"],
            "mips_min": min(t_by["mips"]),
            "bsp_min": min(t_by["bsp"]),
            "ratio_mips_over_bsp": round(
                min(t_by["mips"]) / min(t_by["bsp"]), 3
            ),
            "bench_ratio_r10": round(1.161 / 0.741, 3),
            "bench_ratio_r11": round(1.617 / 0.777, 3),
            "hits": hits,
        }
        print(json.dumps(rec), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
