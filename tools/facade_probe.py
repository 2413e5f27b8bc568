"""Unified-facade probe ABOVE toy size: the index_type='ivf' backend
must stay EXACT (== brute force) at 200k vectors while touching only
the triangle-inequality-pruned cells, and report a candidate_frac
well under 1.0 (the pruning actually prunes). Also times the three
backends' search on the same store contents.

Usage: python tools/facade_probe.py [rows] [dims]
Defaults: 200k x 16, 64 cells.
"""

from __future__ import annotations

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


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    ok = True
    spark = get_spark(
        app_name="facade-probe", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    data = (
        clusters(spark, n=rows, dims=dims, n_clusters=24, seed=3)
        .select(
            (F.col("id") % 8).alias("doc_id"),
            F.col("id").alias("text_id"),
            "vector",
        )
        .localCheckpoint()
    )
    q = [float(x) for x in data.where(F.col("text_id") == 7).first()["vector"]]
    domain = 0.35
    root = tempfile.mkdtemp(prefix="facade_probe_")
    brute = None
    try:
        # 'bq' is the facade's documented APPROXIMATE backend: exact
        # distances on Hamming top-bq_m candidates. The probe asserts
        # the containment contract (hits ⊆ brute with equal values)
        # and reports recall instead of demanding == brute.
        for t in ("bsp", "ivf", "ivfadc", "bq", "mips"):
            vdb = VectorDatabase(
                spark, f"{root}/{t}", index_type=t, n_cells=64,
                local_threshold=65_536, pq_m=4, bq_m=4096,
            )
            t0 = time.time()
            vdb.add_documents(data)
            t_build = time.time() - t0
            t0 = time.time()
            got = {
                (r.text_id, round(r.dist, 9))
                for r in vdb.search(q, domain).collect()
            }
            t_search = time.time() - t0
            if brute is None:
                brute = {
                    (r.text_id, round(r.dist, 9))
                    for r in vdb.brute_force(q, domain).collect()
                }
            if t == "bq":
                # recall is capped at bq_m/|ball| by construction (a
                # 4096-candidate budget cannot cover a 23k-row ball);
                # the contracts to assert are CONTAINMENT (every hit
                # is a true ball member with the exact distance) and
                # BUDGET EFFICIENCY (the Hamming stage spends its m
                # candidates on in-ball rows, not wasted ones)
                contained = got <= brute
                cap = min(4096, len(brute))
                eff = len(got) / max(1, cap)
                print(
                    f"{t}: build+index {t_build:.1f}s, search "
                    f"{t_search:.1f}s, hits {len(got)}/{len(brute)} "
                    f"(budget cap {cap}, efficiency {eff:.3f}), "
                    f"hits ⊆ brute with exact dists: {contained}"
                )
                if not contained:
                    print("FAIL: bq hit outside brute / wrong distance")
                    ok = False
                if eff < 0.5:
                    print("FAIL: bq wasted its Hamming budget")
                    ok = False
                continue
            exact = got == brute
            line = (
                f"{t}: build+index {t_build:.1f}s, search {t_search:.1f}s, "
                f"hits {len(got)}, exact == brute: {exact}"
            )
            if t not in ("bsp", "mips"):
                # 'mips' ball pruning is exact but WEAK by design when
                # m2 >> domain^2 (the augmented bound dominates) — its
                # candidate_frac is not asserted; distance workloads
                # belong on 'ivf', 'mips' exists for knn_dot below
                st = vdb.search_stats(q, domain).first()
                line += (
                    f", candidate_frac {st.candidate_frac:.4f}, "
                    f"selectivity {st.selectivity:.4f}"
                )
                if st.candidate_frac > 0.5:
                    print("FAIL: cell pruning did not prune")
                    ok = False
            print(line)
            if not exact:
                print(f"FAIL: {t} search != brute")
                ok = False
            if t == "mips":
                # the backend's native surface: full-probe knn_dot ==
                # the exact inner-product top-k over the store
                t0 = time.time()
                top = [
                    (int(r.text_id), int(r.rank))
                    for r in vdb.knn_dot(q, 10, nprobe=64).collect()
                ]
                t_dot = time.time() - t0
                want = [
                    (int(r.text_id), i + 1)
                    for i, r in enumerate(
                        vdb.text()
                        .select(
                            "text_id",
                            F.expr(
                                "aggregate(zip_with(vector, "
                                + "array("
                                + ", ".join(repr(float(x)) for x in q)
                                + "), (a, b) -> CAST(a AS DOUBLE) * b), "
                                "0.0D, (s, x) -> s + x)"
                            ).alias("ip"),
                        )
                        .orderBy(F.col("ip").desc(), F.col("text_id").asc())
                        .limit(10)
                        .collect()
                    )
                ]
                dot_ok = sorted(top) == sorted(want)
                print(
                    f"mips knn_dot: {t_dot:.1f}s, full-probe top-10 == "
                    f"exact dot: {dot_ok}"
                )
                if not dot_ok:
                    print("FAIL: mips knn_dot != exact dot top-k")
                    ok = False
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print("PROBE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
