"""Interleaved A/B for the knn_graph_blocked bench move (round-8
verdict item 2) + attribution for the round-9 collapse path.

BENCH_r07 -> BENCH_r08 moved knn_graph_blocked 1.527 -> 1.697 s raw
while the r01 anchor got ~20% FASTER (0.537 -> 0.430), i.e. ~1.4x
anchor-adjusted — and unlike d03 there was a real code change on the
path (the hot-cell sub-bucket machinery: a members-count aggregate,
two broadcast joins, a union, and a two-key groupBy). Round 9 adds
the exact-duplicate collapse (one corpus-wide window exchange + the
fan-out joins) behind a bounded-sample auto gate. Single-process interleaving is the
only protocol that separates host throttle from plan cost on this
rig (the d03/index_build precedent): per round, run the EXACT bench
thunks back-to-back —

    anchor    r01_q1_agg (the cross-round ruler)
    auto      knn_graph_blocked default (r9 ship shape: bounded-sample
              dup detect -> plain path on this all-distinct data)
    collapse  knn_graph_blocked collapse_dups=True (forced fan-out)
    plain     knn_graph_blocked collapse_dups=False (r8 shape + the
              r9 driver-side fast path when no cell exceeds the cap)

min-of-N each, and compare anchor ratios to the committed artifacts:

    r7 ratio = 1.527/0.537 = 2.84   (pre-cap machinery)
    r8 ratio = 1.697/0.430 = 3.95   (cap machinery)

A `plain` ratio near 3.9 on an idle host confirms the cap machinery
overhead is real at panel scale (it is fixed stage cost — counts
aggregate + broadcast exchanges — not data-proportional, so it
VANISHES at any real corpus size; the trade it buys is bounded task
memory). `collapse - plain` is the round-9 collapse overhead at
panel scale; the scale-side win it buys is the hotcell probe
(2,559 s -> minutes at 1M x 32 with a 500k clone pile,
data/probes/hotcell_1m_r9.json).

Usage: python tools/knn_graph_ab_probe.py [rounds]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_database_spark import get_spark, workload


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    spark = get_spark(
        app_name="knn-graph-ab", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    from vector_database_spark.operators.graph import knn_graph_blocked

    qs = workload.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def anchor():
        force(qs["r01_q1_agg"](spark, sf_dir))

    def build(collapse):
        force(
            knn_graph_blocked(
                workload._embeddings(spark, sf_dir),
                8,
                n_cells=16,
                nprobe=4,
                method="dgemm",
                collapse_dups=collapse,
            )
        )

    # warm all plans once (JIT + python pool), untimed
    anchor()
    build("auto")
    build(True)
    build(False)

    ta, tu, tc, tp = [], [], [], []
    for i in range(rounds):
        t0 = time.time()
        anchor()
        ta.append(time.time() - t0)
        t0 = time.time()
        build("auto")
        tu.append(time.time() - t0)
        t0 = time.time()
        build(True)
        tc.append(time.time() - t0)
        t0 = time.time()
        build(False)
        tp.append(time.time() - t0)
        print(
            f"round {i}: anchor {ta[-1]:.3f}s auto {tu[-1]:.3f}s "
            f"collapse {tc[-1]:.3f}s plain {tp[-1]:.3f}s",
            flush=True,
        )

    ba, bu, bc, bp = min(ta), min(tu), min(tc), min(tp)
    print(
        json.dumps(
            {
                "probe": "knn_graph_ab",
                "rounds": rounds,
                "anchor_best": round(ba, 3),
                "auto_best": round(bu, 3),
                "collapse_best": round(bc, 3),
                "plain_best": round(bp, 3),
                "auto_ratio": round(bu / ba, 2),
                "collapse_ratio": round(bc / ba, 2),
                "plain_ratio": round(bp / ba, 2),
                "r7_ratio": 2.84,
                "r8_ratio": 3.95,
                "anchor_runs": [round(t, 3) for t in ta],
                "auto_runs": [round(t, 3) for t in tu],
                "collapse_runs": [round(t, 3) for t in tc],
                "plain_runs": [round(t, 3) for t in tp],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
