"""Dump `.explain("formatted")` physical plans for the bench surface
into plans/<tag>/<name>_<suffix>.txt (optimization-round evidence).

Usage: python tools/plan_dump.py <tag> <suffix> [sf_dir] [names...]
  e.g. python tools/plan_dump.py r13 before
       python tools/plan_dump.py r13 after /root/testdata/sf0.1 t16_bm25

Covers the 18 registry bench queries plus the bench-only paths
(knn_graph_blocked, beam_search, mips_knn, facade_search_*,
facade_knn_dot_mips) with the same construction bench.py uses, so the
committed plans are the plans the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_database_spark import get_spark
from vector_database_spark import workload
from tools.explain_audit import formatted_plan


def bench_dataframes(spark, sf_dir):
    """name -> thunk returning the DataFrame the bench forces."""
    import bench as bench_mod
    from pyspark.sql import functions as F

    qs = workload.queries()
    out = {}
    for name in bench_mod.BENCH_QUERIES:
        out[name] = lambda name=name: qs[name](spark, sf_dir)

    from vector_database_spark.operators.graph import (
        graph_beam_search,
        knn_graph_blocked,
    )

    def _g_vecs():
        return workload._embeddings(spark, sf_dir)

    out["knn_graph_blocked"] = lambda: knn_graph_blocked(
        _g_vecs(), 8, n_cells=16, nprobe=4, method="dgemm"
    )

    def _beam():
        edges = (
            knn_graph_blocked(_g_vecs(), 8, n_cells=16, nprobe=4, method="dgemm")
            .select("src", "dst")
            .localCheckpoint()
        )
        vecs = _g_vecs()
        qdf = vecs.where(F.col("id") < 16).select(
            F.col("id").alias("qid"),
            F.col("vector").cast("array<double>").alias("qvec"),
        )
        return graph_beam_search(edges, vecs, qdf, ef=8, hops=4)

    out["beam_search"] = _beam

    def _mips():
        from vector_database_spark.operators.ann import mips_build, mips_knn

        vecs = workload._embeddings(spark, sf_dir)
        assigned, cents, m2 = mips_build(vecs, n_cells=16)
        panel = workload._panel(spark, sf_dir)
        qdf = spark.createDataFrame(panel, "qid long, qvec array<double>")
        return mips_knn(
            vecs, qdf, 10, nprobe=4, assigned=assigned, centroids=cents, m2=m2
        )

    out["mips_knn"] = _mips

    import shutil
    import tempfile

    from vector_database_spark.api import VectorDatabase
    from vector_database_spark.sources.generators import clusters

    root = tempfile.mkdtemp(prefix="plan_dump_facade_")
    state = {}

    def _facade(t):
        if "data" not in state:
            data = (
                clusters(spark, n=20_000, dims=16, n_clusters=24, seed=3)
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
            state["data"], state["q"] = data, q
        if t not in state:
            vdb = VectorDatabase(
                spark, f"{root}/{t}", index_type=t, n_cells=64,
                local_threshold=65_536, pq_m=4,
            )
            vdb.add_documents(state["data"])
            state[t] = vdb
        return state[t]

    for t in ("bsp", "ivf", "ivfadc", "bq", "mips"):
        out[f"facade_search_{t}"] = lambda t=t: _facade(t).search(
            state["q"], 0.35
        )
    out["facade_knn_dot_mips"] = lambda: _facade("mips").knn_dot(
        state["q"], 10, nprobe=8
    )
    state["_cleanup"] = lambda: shutil.rmtree(root, ignore_errors=True)
    out["__cleanup__"] = state
    return out


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    only = set(sys.argv[4:])

    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(dest, exist_ok=True)
    dfs = bench_dataframes(spark, sf_dir)
    cleanup = dfs.pop("__cleanup__")
    for name, thunk in dfs.items():
        if only and name not in only:
            continue
        try:
            plan = formatted_plan(thunk())
        except Exception as e:  # keep going; record the failure
            plan = f"PLAN CAPTURE FAILED: {e!r}"
        path = os.path.join(dest, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    cleanup["_cleanup"]()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
