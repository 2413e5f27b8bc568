"""IVF scale probe: sampled training + BLAS assignment at real cell
counts.

Usage: python tools/ivf_probe.py [n_rows] [dims] [n_cells] [nprobe]

The round-2 IVF trained full-table Lloyd with an interpreted HOF
distance to every centroid per row — fine at 16 cells, minutes at
hundreds. This probe times the scale shape the verdict asked for
(≥1M×64, n_cells≥256): bounded-sample numpy training + one
Arrow-batched dgemm assignment pass, then checks recall@10 of
nprobe-probed search against exact brute-force kNN.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_database_spark import get_spark
from vector_database_spark.operators.ann import ivf_build, ivf_knn
from vector_database_spark.operators.search import knn
from vector_database_spark.sources.generators import clusters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_cells = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    nprobe = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    k = 10

    spark = get_spark(app_name="ivf-probe", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    vecs = clusters(spark, n, dims, n_clusters=64, seed=3).select("id", "vector")
    vecs = vecs.repartition(32).persist()
    vecs.count()
    print(f"generate {n}x{dims}: {time.time()-t0:.1f}s")

    t_build = []
    for i in range(3):
        t0 = time.time()
        assigned, cents = ivf_build(vecs, n_cells=n_cells, iters=4)
        assigned = assigned.persist()
        n_assigned = assigned.count()
        t_build.append(time.time() - t0)
        assert n_assigned == n, (n_assigned, n)
        if i < 2:
            assigned.unpersist()
    n_used_cells = assigned.select("cell").distinct().count()
    print(
        f"ivf_build({n_cells} cells): cold {t_build[0]:.1f}s / "
        f"best {min(t_build):.1f}s "
        f"(runs {' '.join(f'{t:.1f}' for t in t_build)})  "
        f"cells_used={n_used_cells}"
    )

    qids = [5, 777, 123_456 % n]
    qdf = vecs.where(F.col("id").isin(qids)).select(
        F.col("id").alias("qid"), F.col("vector").cast("array<double>").alias("qvec")
    )
    panel = [(r.qid, list(r.qvec)) for r in qdf.collect()]

    t_ivf, t_exact = [], []
    for _ in range(3):
        t0 = time.time()
        ap = {}
        for r in ivf_knn(assigned, cents, qdf, k=k, nprobe=nprobe).collect():
            ap.setdefault(r.qid, set()).add(r.id)
        t_ivf.append(time.time() - t0)
        t0 = time.time()
        ex = {}
        for r in knn(vecs, panel, k=k).collect():
            ex.setdefault(r.qid, set()).add(r.id)
        t_exact.append(time.time() - t0)
    recalls = {q: len(ex[q] & ap.get(q, set())) / k for q in qids}
    print(
        f"ivf_knn(nprobe={nprobe}): best {min(t_ivf):.1f}s "
        f"(runs {' '.join(f'{t:.1f}' for t in t_ivf)})  "
        f"exact knn: best {min(t_exact):.1f}s  "
        f"recall@{k}={recalls}"
    )
    assert all(r >= 0.9 for r in recalls.values()), recalls
    print(f"assign throughput (best): {n/min(t_build):,.0f} vectors/s  RECALL OK")


if __name__ == "__main__":
    main()
