"""IVF incremental-ingest probe (round-5 verdict item 5) ABOVE toy
size: assign-on-append into existing centroids must leave a layout
IDENTICAL to assigning the whole corpus in one shot — same cell for
every row, no loss/duplication, identical filtered/unfiltered kNN —
and a distribution-shifted batch must trip the drift threshold and
(under retrain='auto') rebuild the centroids.

Usage: python tools/ivf_ingest_probe.py [base_rows] [dims] [n_batches] [batch_rows]

Defaults: 96k base + 2 x 16k appends = 128k rows x 32 dims, 64 cells.
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
from vector_database_spark.operators.ann import (
    _assign_cells,
    ivf_append,
    ivf_build,
    ivf_knn,
    ivf_read,
    ivf_write,
)
from vector_database_spark.sources.generators import clusters


def main() -> int:
    base_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 96_000
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    batch_rows = int(sys.argv[4]) if len(sys.argv) > 4 else 16_000
    n_cells = 64

    spark = get_spark(
        app_name="ivf-ingest-probe", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    total = base_rows + n_batches * batch_rows
    allv = clusters(
        spark, n=total, dims=dims, n_clusters=24, seed=7
    ).select("id", "vector").localCheckpoint()
    base = allv.where(F.col("id") < base_rows)

    path = os.path.join(tempfile.mkdtemp(prefix="ivf_probe_"), "ivf")
    t0 = time.time()
    assigned, cents = ivf_build(base, n_cells=n_cells, iters=3)
    ivf_write(assigned, cents, path)
    print(f"build+write {base_rows} rows: {time.time() - t0:.1f}s")

    for b in range(n_batches):
        lo = base_rows + b * batch_rows
        batch = allv.where(
            (F.col("id") >= lo) & (F.col("id") < lo + batch_rows)
        )
        t0 = time.time()
        info = ivf_append(spark, path, batch, retrain="never")
        print(
            f"append batch {b}: {info['appended']} rows in "
            f"{time.time() - t0:.1f}s, drift={info['drift']}"
        )
        assert info["appended"] == batch_rows
        assert not info["retrained"]

    stored, cents2 = ivf_read(spark, path)
    assert cents2 == cents, "append must not touch centroids"
    n_stored = stored.count()
    assert n_stored == total, (n_stored, total)
    # exact layout parity: appended == one-shot assignment of the
    # full corpus under the same centroids (anti-join both ways)
    want = _assign_cells(allv, cents).select("id", "cell")
    diff = (
        stored.select("id", "cell")
        .exceptAll(want)
        .unionAll(want.exceptAll(stored.select("id", "cell")))
        .count()
    )
    assert diff == 0, f"{diff} rows differ from one-shot assignment"

    qdf = allv.where(F.col("id").isin([5, base_rows + 17])).select(
        F.col("id").alias("qid"),
        F.col("vector").cast("array<double>").alias("qvec"),
    )
    got = {
        (r.qid, r.id, r.rank)
        for r in ivf_knn(stored, cents, qdf, k=10, nprobe=8).collect()
    }
    want_k = {
        (r.qid, r.id, r.rank)
        for r in ivf_knn(
            _assign_cells(allv, cents), cents, qdf, k=10, nprobe=8
        ).collect()
    }
    assert got == want_k, "append-then-search != rebuild-then-search"

    # drift: a scaled+shifted batch must trip the threshold + retrain
    shifted = allv.where(F.col("id") < batch_rows).select(
        (F.col("id") + 10_000_000).alias("id"),
        F.transform(
            F.col("vector"), lambda x: x * F.lit(4.0) + F.lit(9.0)
        ).alias("vector"),
    )
    t0 = time.time()
    info = ivf_append(spark, path, shifted, retrain="auto")
    print(
        f"shifted append: drift={info['drift']} retrained="
        f"{info['retrained']} in {time.time() - t0:.1f}s"
    )
    assert info["drift"] > 0.25 and info["retrained"]
    stored3, cents3 = ivf_read(spark, path)
    assert cents3 != cents and stored3.count() == total + batch_rows

    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    print(
        f"OK: {total} rows appended == one-shot layout, kNN identical, "
        "drift retrain fired"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
