"""Interleaved A/B: old bm25 shape (full-token explode + lazy
localCheckpoint + token-level dl shuffle + separate count() job) vs
the r13 reshaped `text.bm25_scores` (narrow dl projection, one stats
job, explode restricted to the query-term set, df derived from tf).

Old shape lives INLINE here (it is no longer in the library); both
run the same terms/k over the sf0.1 documents table, interleaved
best-of-N, noop-forced. Also asserts the two outputs are IDENTICAL
(collected and compared row-for-row, scores bit-exact).

Usage: python tools/bm25_ab_probe.py [sf_dir] [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vector_database_spark import get_spark
from vector_database_spark.operators import text as tx

TERMS = ["filter", "hash", "join", "merge"]
K = 20


def old_bm25(df, query_terms, *, k1=1.2, b=0.75, k=None):
    terms = sorted({str(t) for t in query_terms})
    toks = F.split(F.lower(F.trim(F.col("text"))), "[\\t\\n\\f\\r ]+")
    ex = (
        df.select(F.col("doc_id").cast("long").alias("id"), toks.alias("_t"))
        .select("id", F.explode("_t").alias("term"))
        .where(F.col("term") != "")
    )
    ex = ex.localCheckpoint(eager=False)
    dl = ex.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.sum("dl").alias("s")).first()
    n_docs = df.count()
    total_toks = int(stats["s"] or 0)
    avgdl = total_toks / n_docs if n_docs else 1.0

    qx = ex.where(F.col("term").isin(terms))
    tf = qx.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        qx.select("id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    ) + F.lit(1.0)
    denom = F.col("tf") + F.lit(float(k1)) * (
        F.lit(1.0)
        - F.lit(float(b))
        + F.lit(float(b)) * (F.col("dl") / F.lit(float(avgdl)))
    )
    contrib = idf * ((F.col("tf") * F.lit(float(k1) + 1.0)) / denom)
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "id")
        .withColumn("contrib", contrib)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("term", "contrib"))),
                    lambda s: s["contrib"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("score"),
        )
    )
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    top = scored.orderBy(F.col("score").desc(), F.col("id").asc()).limit(int(k))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "id", "n_matched", "score", "rank"
    )


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark(app_name="bm25-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # identity first: row-for-row, scores bit-exact
    a = sorted(
        (r.id, r.n_matched, r.score, r.rank)
        for r in old_bm25(docs, TERMS, k=K).collect()
    )
    bnew = sorted(
        (r.id, r.n_matched, r.score, r.rank)
        for r in tx.bm25_scores(docs, TERMS, k=K).collect()
    )
    assert a == bnew, (a[:3], bnew[:3])
    print(f"identity OK: {len(a)} rows bit-identical")

    res = {"old": [], "new": []}
    for p in range(passes):
        for name, fn in (
            ("old", lambda: old_bm25(docs, TERMS, k=K)),
            ("new", lambda: tx.bm25_scores(docs, TERMS, k=K)),
        ):
            spark.sparkContext.setJobDescription(f"bm25 {name} pass {p}")
            t0 = time.monotonic()
            _force(fn())
            res[name].append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    out = {
        "sf_dir": sf_dir,
        "samples": res,
        "min_old": min(res["old"]),
        "min_new": min(res["new"]),
        "speedup": round(min(res["old"]) / min(res["new"]), 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
