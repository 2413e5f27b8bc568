"""PQ / IVFADC scale probe: compressed-domain ANN at real code sizes.

Usage: python tools/pq_probe.py [n_rows] [dims] [m] [n_centroids] [nprobe]

Times the 100 TB shape: sampled per-subspace codebook training, one
Arrow-batched encode pass (8-byte codes at m=8), ADC scan + exact
refine (plain PQ), and the IVFADC composition (coarse cells + residual
codes, candidates cell-pruned). Checks recall@10 against exact kNN.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_database_spark import get_spark
from vector_database_spark.operators.ann import (
    ivfadc_build,
    ivfadc_knn,
    pq_encode,
    pq_knn,
    pq_train,
)
from vector_database_spark.operators.search import knn
from vector_database_spark.sources.generators import clusters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    ksub = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    nprobe = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    k = 10

    spark = get_spark(app_name="pq-probe", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    vecs = clusters(spark, n, dims, n_clusters=64, seed=3).select("id", "vector")
    vecs = vecs.repartition(32).persist()
    vecs.count()
    print(f"generate {n}x{dims}: {time.time()-t0:.1f}s")

    # --- plain PQ: train + encode + ADC scan ---
    t_build = []
    for i in range(3):
        t0 = time.time()
        books = pq_train(vecs, m=m, n_centroids=ksub, iters=6, seed=5)
        codes = pq_encode(vecs, books).persist()
        n_codes = codes.count()
        t_build.append(time.time() - t0)
        assert n_codes == n, (n_codes, n)
        if i < 2:
            codes.unpersist()
    print(
        f"pq train+encode (m={m}, ksub={ksub}): cold {t_build[0]:.1f}s / "
        f"best {min(t_build):.1f}s "
        f"(runs {' '.join(f'{t:.1f}' for t in t_build)})  "
        f"-> {m} bytes/vec ({8*dims/m:.0f}x compression vs float64)"
    )

    qids = [5, 777, 123_456 % n]
    qdf = vecs.where(F.col("id").isin(qids)).select(
        F.col("id").alias("qid"), F.col("vector").cast("array<double>").alias("qvec")
    )
    panel = [(r.qid, list(r.qvec)) for r in qdf.collect()]

    t_pq, t_exact = [], []
    for _ in range(3):
        t0 = time.time()
        ap = {}
        for r in pq_knn(codes, books, qdf, k=k, refine_factor=8).collect():
            ap.setdefault(r.qid, set()).add(r.id)
        t_pq.append(time.time() - t0)
        t0 = time.time()
        ex = {}
        for r in knn(vecs, panel, k=k).collect():
            ex.setdefault(r.qid, set()).add(r.id)
        t_exact.append(time.time() - t0)
    recalls = {q: len(ex[q] & ap.get(q, set())) / k for q in qids}
    print(
        f"pq_knn (ADC scan + refine): best {min(t_pq):.1f}s "
        f"(runs {' '.join(f'{t:.1f}' for t in t_pq)})  "
        f"exact knn: best {min(t_exact):.1f}s  recall@{k}={recalls}"
    )
    # Plain PQ with GLOBAL codebooks is the known-weak layout on
    # coarse-clustered data: within a tight cluster the quantization
    # error swamps neighbor distances, so its recall is reported but
    # not gated here. Residual encoding (IVFADC, below) is the
    # published fix (Jegou et al. 2011) and carries the hard bar.
    codes.unpersist()

    # --- IVFADC: coarse cells + residual codes, cell-pruned probe ---
    t0 = time.time()
    acodes, cents, abooks = ivfadc_build(
        vecs, n_cells=max(64, nprobe * 4), m=m, n_centroids=ksub, iters=4, seed=5
    )
    acodes = acodes.persist()
    assert acodes.count() == n
    t_adc_build = time.time() - t0
    t_adc = []
    for _ in range(3):
        t0 = time.time()
        ap2 = {}
        res = ivfadc_knn(acodes, cents, abooks, qdf, k=k, nprobe=nprobe,
                         refine_factor=16)
        for r in res.collect():
            ap2.setdefault(r.qid, set()).add(r.id)
        t_adc.append(time.time() - t0)
    recalls2 = {q: len(ex[q] & ap2.get(q, set())) / k for q in qids}
    print(
        f"ivfadc build({max(64, nprobe*4)} cells): {t_adc_build:.1f}s  "
        f"ivfadc_knn(nprobe={nprobe}): best {min(t_adc):.1f}s "
        f"(runs {' '.join(f'{t:.1f}' for t in t_adc)})  recall@{k}={recalls2}"
    )
    assert all(r >= 0.9 for r in recalls2.values()), recalls2
    print(f"encode throughput (best): {n/min(t_build):,.0f} vectors/s  RECALL OK")


if __name__ == "__main__":
    main()
