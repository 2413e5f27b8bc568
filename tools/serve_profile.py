"""Profile the facade serving paths: per-call wall time split into
(plan construction driver-side) vs (execution), plus the number of
Spark jobs each call launches — the serving floor is job-overhead
dominated at bench scale, so job COUNT is the actionable number.

Usage: python tools/serve_profile.py [n] [dims] [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_database_spark import get_spark


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="serve-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    import tempfile

    from vector_database_spark.api import VectorDatabase
    from vector_database_spark.sources.generators import clusters

    # instrument the freshness protocol (round-14 verdict item 4):
    # count epoch-marker stats (_epoch_token) and layout-marker stats
    # (_ann_exists bodies) per serving call — the done-when is ONE
    # marker stat per public search/knn_dot call
    stat_ctr = {"epoch": 0}
    _orig_tok = VectorDatabase._epoch_token

    def _counting_tok(self):
        stat_ctr["epoch"] += 1
        return _orig_tok(self)

    VectorDatabase._epoch_token = _counting_tok

    root = tempfile.mkdtemp(prefix="serve_profile_")
    data = (
        clusters(spark, n=n, dims=dims, n_clusters=24, seed=3)
        .select(
            (F.col("id") % 8).alias("doc_id"),
            F.col("id").alias("text_id"),
            "vector",
        )
        .localCheckpoint()
    )
    q = [float(x) for x in data.where(F.col("text_id") == 7).first()["vector"]]

    out = {}
    for t in ("bsp", "ivf", "ivfadc", "bq", "mips"):
        vdb = VectorDatabase(
            spark, f"{root}/{t}", index_type=t, n_cells=64,
            local_threshold=65_536, pq_m=4,
        )
        vdb.add_documents(data)
        rows = []
        for p in range(passes):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            s0 = stat_ctr["epoch"]
            t0 = time.monotonic()
            df = vdb.search(q, 0.35)
            t1 = time.monotonic()
            _force(df)
            t2 = time.monotonic()
            j1 = len(tracker.getJobIdsForGroup(None) or [])
            rows.append(
                {
                    "construct_s": round(t1 - t0, 3),
                    "exec_s": round(t2 - t1, 3),
                    "jobs": j1 - j0,
                    "epoch_stats": stat_ctr["epoch"] - s0,
                }
            )
        out[f"search_{t}"] = rows
        if t == "mips":
            rows = []
            for p in range(passes):
                j0 = len(tracker.getJobIdsForGroup(None) or [])
                s0 = stat_ctr["epoch"]
                t0 = time.monotonic()
                df = vdb.knn_dot(q, 10, nprobe=8)
                t1 = time.monotonic()
                _force(df)
                t2 = time.monotonic()
                j1 = len(tracker.getJobIdsForGroup(None) or [])
                rows.append(
                    {
                        "construct_s": round(t1 - t0, 3),
                        "exec_s": round(t2 - t1, 3),
                        "jobs": j1 - j0,
                        "epoch_stats": stat_ctr["epoch"] - s0,
                    }
                )
            out["knn_dot_mips"] = rows
    print(json.dumps(out, indent=1))
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
