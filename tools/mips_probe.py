"""MIPS tier probe (round-8 verdict item 3): norm-augmented IVF
(`ann.mips_knn`) vs the exact full-scan dot tier
(`search.knn(metric='dot')`, v25's path) at scale.

The reduction is public textbook material (Neyshabur & Srebro 2015):
append sqrt(M² − ‖x‖²) to corpus rows and 0 to queries, and L2
proximity in the augmented space orders exactly by inner product —
so the existing L2 IVF machinery prunes dot-product search that
neither raw-L2 cells nor angular BQ sign bits can serve for
unnormalized embeddings. The probe times both tiers INTERLEAVED
(min-of-N within one process — the only comparable numbers on this
throttling rig) on clustered data with per-row magnitude spread
(MIPS is only interesting when norms vary), and reports recall@10
of the pruned tier against the exact one.

Usage: python tools/mips_probe.py [n_rows] [dims] [n_cells] [nprobe] [passes]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_database_spark import get_spark
from vector_database_spark.operators.ann import mips_knn
from vector_database_spark.operators.search import knn
from vector_database_spark.sources.generators import clusters


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_cells = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    nprobe = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    passes = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    k = 10
    n_q = 16

    spark = get_spark(
        app_name="mips-probe", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    # magnitude spread: scale row i by (1 + (i % 97) / 32) so inner
    # products do NOT reduce to cosine — the regime MIPS exists for
    vecs = (
        clusters(spark, n, dims, n_clusters=64, seed=7)
        .select(
            "id",
            F.transform(
                F.col("vector"),
                lambda x: x * (1.0 + (F.col("id") % 97) / 32.0),
            ).alias("vector"),
        )
        .repartition(32)
        .persist()
    )
    vecs.count()
    print(f"generate {n}x{dims}: {time.time()-t0:.1f}s", flush=True)

    panel = [
        (int(r["id"]), [float(x) for x in r["vector"]])
        for r in vecs.where(F.col("id") % (n // n_q) == 1).collect()
    ][:n_q]
    qdf = spark.createDataFrame(panel, "qid long, qvec array<double>")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # layout built ONCE (the store-once serving rule: per-call
    # rebuild was measured SLOWER than the exact scan); the timed
    # passes compare SERVING costs
    from vector_database_spark.operators.ann import mips_build

    t0 = time.time()
    assigned, cents, m2 = mips_build(
        vecs, n_cells=n_cells, seed=11
    )
    assigned = assigned.persist()
    assigned.count()
    t_build = time.time() - t0
    print(f"mips_build({n_cells} cells): {t_build:.1f}s", flush=True)

    def serve():
        return mips_knn(
            vecs, qdf, k, nprobe=nprobe,
            assigned=assigned, centroids=cents, m2=m2,
        )

    # warm both plans, untimed
    force(knn(vecs, panel, k, metric="dot"))
    force(serve())

    t_brute, t_mips = [], []
    for i in range(passes):
        t0 = time.time()
        force(knn(vecs, panel, k, metric="dot"))
        t_brute.append(time.time() - t0)
        t0 = time.time()
        force(serve())
        t_mips.append(time.time() - t0)
        print(
            f"pass {i}: brute {t_brute[-1]:.1f}s mips {t_mips[-1]:.1f}s",
            flush=True,
        )

    exact = {}
    for r in knn(vecs, panel, k, metric="dot").collect():
        exact.setdefault(r["qid"], set()).add(r["id"])
    got = {}
    for r in serve().collect():
        got.setdefault(r["qid"], set()).add(r["id"])
    recalls = [
        len(exact[q] & got.get(q, set())) / k for q in exact
    ]
    recall = sum(recalls) / len(recalls)

    out = {
        "metric": "MIPS pruned tier (stored layout) vs exact full-scan dot",
        "build_sec": round(t_build, 2),
        "n": n,
        "dims": dims,
        "n_cells": n_cells,
        "nprobe": nprobe,
        "n_queries": len(panel),
        "k": k,
        "brute_best_sec": round(min(t_brute), 2),
        "mips_best_sec": round(min(t_mips), 2),
        "speedup": round(min(t_brute) / min(t_mips), 2),
        "recall_at_10": round(recall, 3),
        "brute_runs": [round(t, 2) for t in t_brute],
        "mips_runs": [round(t, 2) for t in t_mips],
    }
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
