"""Quantitative host-health anchor (round-10 verdict item 1b).

Two fixed-size microbenches run BESIDE every expensive probe pass so
throttle attribution becomes a committed ratio, not a narrative:

- ``scan``: the bench anchor (r01_q1_agg at sf0.1) — a cache-free
  relational parquet scan + hash aggregate. Healthy band (r8-r10
  committed benches): 0.41-0.47 s.
- ``shuffle``: a fixed 4M-row shuffle + aggregate + parquet WRITE —
  the I/O+shuffle shape that the round-10 throttle hit while scans
  held. Healthy value recorded per-host in the probe artifact's
  first pass; later passes report the ratio against pass 0.

Usage as a module::

    from tools.host_anchor import host_anchor
    h = host_anchor(spark)          # {'scan_sec': ..., 'shuffle_sec': ...}

Standalone: ``python tools/host_anchor.py [reps]`` prints one JSON
line per rep.
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

SCAN_HEALTHY_BAND = (0.41, 0.47)  # r8-r10 committed bench r01 anchor


def host_anchor(spark, sf_dir: str = "/root/testdata/sf0.1") -> dict:
    """One scan anchor + one shuffle+write anchor; both fixed-size."""
    from vector_database_spark import workload

    # scan anchor: the bench's r01_q1_agg — clear its cached input so
    # every invocation pays the same cold parquet read
    spark.catalog.clearCache()
    t0 = time.time()
    workload.REGISTRY["r01_q1_agg"]["spark"](spark, sf_dir).collect()
    scan = time.time() - t0

    # shuffle+write anchor: 4M rows, 64-partition hash shuffle,
    # aggregate, parquet write — data-independent, deterministic size
    out = tempfile.mkdtemp(prefix="host_anchor_")
    try:
        t0 = time.time()
        (
            spark.range(0, 4_000_000, 1, 32)
            .select(
                (F.col("id") % 100_000).alias("k"),
                (F.col("id") * 2654435761 % 1_000_003).alias("v"),
            )
            .groupBy("k")
            .agg(
                F.sum("v").alias("s"),
                F.count("*").alias("c"),
                F.max("v").alias("m"),
            )
            .repartition(16)
            .write.mode("overwrite")
            .parquet(os.path.join(out, "t"))
        )
        shuffle = time.time() - t0
    finally:
        shutil.rmtree(out, ignore_errors=True)

    return {"scan_sec": round(scan, 3), "shuffle_sec": round(shuffle, 3)}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from vector_database_spark import get_spark

    spark = get_spark(
        app_name="host-anchor", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    for i in range(reps):
        h = host_anchor(spark)
        h["rep"] = i
        h["scan_healthy_band"] = list(SCAN_HEALTHY_BAND)
        print(json.dumps(h), flush=True)


if __name__ == "__main__":
    main()
