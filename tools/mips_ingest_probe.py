"""MIPS incremental-ingest probe (round-9 verdict item 2) above toy
size: assign-on-append under the stored augmented centroids must
leave a layout IDENTICAL to assigning the whole corpus in one shot
(same cell for every row, no loss/duplication, identical served
MIPS top-k), a norm-overflow batch must be REFUSED at the door, and
on_overflow='retrain' must rebuild with a larger m2 and keep serving
exact at full probe.

Usage: python tools/mips_ingest_probe.py [base_rows] [dims] [n_batches] [batch_rows]

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
from vector_database_spark.functions.vector import dot
from vector_database_spark.operators.ann import (
    _assign_cells,
    mips_append,
    mips_augment,
    mips_build,
    mips_knn,
    mips_read,
    mips_write,
)
from vector_database_spark.sources.generators import clusters


def main() -> int:
    base_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 96_000
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    batch_rows = int(sys.argv[4]) if len(sys.argv) > 4 else 16_000
    n_cells = 64

    spark = get_spark(
        app_name="mips-ingest-probe",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    total = base_rows + n_batches * batch_rows
    allv = clusters(
        spark, n=total, dims=dims, n_clusters=24, seed=7
    ).select("id", "vector").localCheckpoint()
    base = allv.where(F.col("id") < base_rows)

    path = os.path.join(tempfile.mkdtemp(prefix="mips_probe_"), "mips")
    t0 = time.time()
    assigned, cents, m2 = mips_build(base, n_cells=n_cells, iters=3)
    mips_write(assigned.localCheckpoint(), cents, m2, path)
    print(f"build+write {base_rows} rows: {time.time() - t0:.1f}s m2={m2:.3f}")

    appended = 0
    for b in range(n_batches):
        lo = base_rows + b * batch_rows
        batch = allv.where(
            (F.col("id") >= lo)
            & (F.col("id") < lo + batch_rows)
            & (dot("vector", "vector") <= F.lit(m2))
        ).localCheckpoint()
        n_b = batch.count()
        t0 = time.time()
        info = mips_append(spark, path, batch)
        print(
            f"append batch {b}: {info['appended']}/{batch_rows} in-bound "
            f"rows in {time.time() - t0:.1f}s "
            f"(batch_m2={info['batch_m2']:.3f})"
        )
        assert info["appended"] == n_b and not info["retrained"]
        appended += n_b

    stored, cents2, m22 = mips_read(spark, path)
    assert cents2 == cents and m22 == m2, "append must not touch the model"
    n_stored = stored.count()
    assert n_stored == base_rows + appended, (n_stored, base_rows + appended)
    # exact layout parity: appended == one-shot augmented assignment of
    # everything stored, under the same centroids + m2
    inbound = allv.where(
        (F.col("id") < base_rows) | (dot("vector", "vector") <= F.lit(m2))
    )
    want = _assign_cells(
        inbound.withColumn("avec", mips_augment("vector", m2)).select(
            "id", F.col("avec").alias("vector")
        ),
        cents,
    ).select("id", "cell")
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
        for r in mips_knn(
            None, qdf, 10, nprobe=8, assigned=stored, centroids=cents,
            m2=m2,
        ).collect()
    }
    want_k = {
        (r.qid, r.id, r.rank)
        for r in mips_knn(
            None, qdf, 10, nprobe=8,
            assigned=_assign_cells(
                inbound.withColumn(
                    "avec", mips_augment("vector", m2)
                ).select(
                    "id",
                    F.col("avec").alias("vector"),
                    F.col("vector").alias("ovec"),
                ),
                cents,
            ).select("id", F.col("ovec").alias("vector"), "cell"),
            centroids=cents,
            m2=m2,
        ).collect()
    }
    assert got == want_k, "append-then-serve != rebuild-then-serve"

    # norm overflow: a scaled batch must be refused, then retrain
    hot = allv.where(F.col("id") < 1000).select(
        (F.col("id") + 10_000_000).alias("id"),
        F.transform(F.col("vector"), lambda x: x * F.lit(8.0)).alias(
            "vector"
        ),
    )
    refused = False
    try:
        mips_append(spark, path, hot)
    except ValueError as e:
        refused = "norm bound" in str(e)
    assert refused, "overflow batch must be refused by default"
    t0 = time.time()
    info = mips_append(spark, path, hot, on_overflow="retrain")
    print(
        f"overflow retrain: m2 {m2:.3f} -> {info['m2']:.3f} in "
        f"{time.time() - t0:.1f}s"
    )
    assert info["retrained"] and info["m2"] > m2
    stored3, _c3, m23 = mips_read(spark, path)
    assert m23 == info["m2"]
    assert stored3.count() == base_rows + appended + 1000

    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    print(
        f"OK: {base_rows + appended} rows appended == one-shot layout, "
        "served MIPS identical, overflow refused then retrained"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
