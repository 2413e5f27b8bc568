"""Text-pipeline throughput probe: chunking, PII scrub, repetition,
quality, SQ8 encode at a given sf dir. Prints docs/s (or vecs/s) per
operator, best of N in-process passes (host throttling makes only
within-process comparisons meaningful — SCALE.md measurement note).

Usage: python tools/text_probe.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_database_spark import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="text-probe",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    from vector_database_spark.operators import text as tx
    from vector_database_spark.operators.ann import sq8_encode, sq8_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    n_vecs = vecs.count()
    lo, hi = sq8_stats(vecs)

    ops = {
        "chunk_documents": (
            lambda: tx.chunk_documents(docs, size=32, stride=24), n_docs),
        "pii_scrub": (lambda: tx.pii_scrub(docs), n_docs),
        "repetition_stats": (lambda: tx.repetition_stats(docs), n_docs),
        "quality_score": (lambda: tx.quality_score(docs), n_docs),
        "sq8_encode": (
            lambda: sq8_encode(vecs, lo, hi).select(
                "id", F.size("codes").alias("n")), n_vecs),
    }
    print(f"{sf_dir}: {n_docs} docs, {n_vecs} vectors; best of {passes}")
    for name, (fn, n) in ops.items():
        best = float("inf")
        n_out = fn().count()
        for _ in range(passes):
            t0 = time.time()
            # noop sink materializes EVERY output column (a count()
            # would let Catalyst prune the expensive projections away)
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        print(f"  {name:>18}: best {best:6.2f} s  "
              f"{n / best:>10,.0f} rows/s in  ({n_out:,} rows out)")

    # bpe_train: one distributed word count + the driver merge loop
    # (incremental pair maintenance — round-3 verdict item 6 wants the
    # merge-loop time on record here)
    t0 = time.time()
    merges = tx.bpe_train(docs, n_merges=200)
    dt = time.time() - t0
    print(f"  {'bpe_train':>18}: {dt:6.2f} s end-to-end "
          f"({len(merges)} merges, n_docs={n_docs:,})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
