"""Quantile-sketch probe at 10M rows: the mergeable bottom-m sketch
must (1) run with its shuffle bounded to partitions x keys x m rows
(the Arrow pre-reduction), (2) estimate p50/p90/p99 within the
O(1/sqrt(m)) sampling bound against the EXACT two-pass quantile
(`sketch.quantile_two_pass` — itself exact without a global sort),
and (3) merge split states into the identical whole-data state.

Usage: python tools/sketch_probe.py [rows] [m]
Defaults: 10M rows, m=1024.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_database_spark import get_spark
from vector_database_spark.operators import sketch as sk


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    ok = True
    spark = get_spark(
        app_name="sketch-probe", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    # heavy-tailed-ish deterministic values: (id*2654435761 mod 2^31)^2
    df = (
        spark.range(rows)
        .select(
            F.col("id").alias("rid"),
            (
                F.pmod(F.col("id") * F.lit(2654435761), F.lit(2**31))
                .cast("double")
                / F.lit(float(2**31))
            ).alias("u"),
        )
        .select("rid", (F.col("u") * F.col("u") * F.lit(1000.0)).alias("value"))
        .localCheckpoint()
    )
    t0 = time.time()
    st = sk.quantile_sketch(df, id_col="rid", m=m).localCheckpoint()
    q = sk.quantile_sketch_query(st, (0.5, 0.9, 0.99)).first()
    t_sketch = time.time() - t0
    print(
        f"sketch {rows} rows m={m}: {t_sketch:.1f}s  "
        f"n={q.n} sample_n={q.sample_n}"
    )
    if q.n != rows:
        print("FAIL: count mismatch")
        ok = False
    bound = 3.0 / math.sqrt(m)
    for name, qq in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        est = float(q[name])
        t0 = time.time()
        true_rank = df.where(F.col("value") <= est).count() / rows
        err = abs(true_rank - qq)
        print(
            f"{name}: est={est:.3f} true_rank={true_rank:.4f} "
            f"err={err:.4f} bound={bound:.4f} ({time.time() - t0:.1f}s)"
        )
        if err > bound:
            print(f"FAIL: {name} outside sampling bound")
            ok = False
    # split-merge == whole
    a = sk.quantile_sketch(df.where(F.col("rid") % 2 == 0), id_col="rid", m=m)
    b = sk.quantile_sketch(df.where(F.col("rid") % 2 == 1), id_col="rid", m=m)
    merged = sk.quantile_sketch_merge(a.unionByName(b), m=m)
    unpack = lambda d: [  # noqa: E731
        (r.n, list(r.hs), list(r.vs)) for r in d.collect()
    ]
    if unpack(merged) == unpack(st):
        print("split-merge == whole: identical state")
    else:
        print("FAIL: merged state != whole-data state")
        ok = False
    print("PROBE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
