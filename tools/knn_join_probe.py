"""Distributed kNN-join scale probe.

Usage: python tools/knn_join_probe.py [corpus_n] [query_n] [dims]
                                      [n_cells] [nprobe]

`ann.knn_join` exists for the case `ivf_knn` cannot serve: a
corpus-sized QUERY TABLE. This probe runs 100k queries x 1M corpus —
a 1e11-pair problem brute force cannot touch (the exact scan would be
~2,000x the probed work) — with neither side collected or broadcast,
then checks recall on a sampled query panel against the exact
`search.knn` and verifies every query got exactly k rows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_database_spark import get_spark
from vector_database_spark.operators.ann import knn_join, recall_at_k
from vector_database_spark.operators.search import knn
from vector_database_spark.sources.generators import clusters


def main():
    corpus_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    query_n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    dims = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n_cells = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    nprobe = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    k = 10

    spark = get_spark(app_name="knn-join-probe",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    corpus = clusters(spark, corpus_n, dims, n_clusters=64, seed=3).select(
        "id", "vector"
    ).repartition(32).persist()
    corpus.count()
    queries = clusters(spark, query_n, dims, n_clusters=64, seed=9).select(
        (F.col("id") + 10_000_000).alias("id"), "vector"
    ).repartition(32).persist()
    queries.count()
    print(f"generate {corpus_n}+{query_n} x {dims}: {time.time()-t0:.1f}s")

    times = []
    res = None
    for _ in range(2):
        t0 = time.time()
        res = knn_join(
            queries, corpus, k,
            n_cells=n_cells, nprobe=nprobe, method="dgemm",
        )
        n_out = res.count()
        times.append(time.time() - t0)
    assert n_out == query_n * k, (n_out, query_n * k)
    print(
        f"knn_join({query_n} q x {corpus_n} c, {n_cells} cells, "
        f"nprobe={nprobe}): best {min(times):.1f}s "
        f"(runs {' '.join(f'{t:.1f}' for t in times)}) — "
        f"{query_n * k} edges, every query served k rows"
    )

    # layout-served mode (round-8 verdict item 4): assignment is
    # stored ONCE (ivf_write), every subsequent join skips it
    import tempfile

    from vector_database_spark.operators.ann import ivf_build, ivf_write

    lp = tempfile.mkdtemp() + "/layout"
    t0 = time.time()
    assigned, cents = ivf_build(corpus, n_cells=n_cells, iters=3)
    ivf_write(assigned, cents, lp)
    t_store = time.time() - t0
    lt = []
    for _ in range(2):
        t0 = time.time()
        n_out2 = knn_join(
            queries, None, k, nprobe=nprobe, layout_path=lp
        ).count()
        lt.append(time.time() - t0)
    assert n_out2 == query_n * k, (n_out2, query_n * k)
    print(
        f"layout-served: store-once {t_store:.1f}s, per-join best "
        f"{min(lt):.1f}s (runs {' '.join(f'{t:.1f}' for t in lt)}) "
        f"vs inline {min(times):.1f}s — assignment pass off the hot path"
    )

    # recall on a 16-query sample vs the exact scan
    sample = queries.orderBy(F.md5(F.col("id").cast("string"))).limit(16)
    panel = [(int(r.id), [float(x) for x in r.vector])
             for r in sample.collect()]
    truth = knn(corpus, panel, k)
    got = knn_join(
        sample, corpus, k, n_cells=n_cells, nprobe=nprobe, method="dgemm"
    )
    rec = recall_at_k(
        got.select("qid", "id", "rank"),
        truth.select("qid", "id", "rank"), k=k,
    ).agg(F.avg("recall")).first()[0]
    print(f"recall@{k} vs exact (16-query sample): {rec:.4f}")


if __name__ == "__main__":
    main()
