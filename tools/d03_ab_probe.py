"""Interleaved A/B for the d03 bench wobble (round-4 verdict #3).

BENCH_r03 vs BENCH_r04 moved d03_dedup_simhash 1.365 -> 1.705 s with
no code change on its path. Single-process interleaving is the only
protocol that separates host throttle from a real regression on this
rig (the index_build precedent, ROUND4.md §2): run the EXACT bench
thunks for d02 (flat across rounds: 1.714 -> 1.655) and d03
back-to-back per round, 8 rounds, and compare the d03/d02 RATIO to
the recorded artifacts:

    r3 ratio = 1.365/1.714 = 0.796   r4 ratio = 1.705/1.655 = 1.030

A ratio near 0.8 pins round 4's d03 sample on host noise; a ratio
near (or above) 1.0 on an idle host means d03 itself got slower.
Same cache discipline as bench.py: the shared shingle pass is dropped
before every d02 pass (d02 is charged it; d03 legitimately rides the
persisted shingles, in both rounds' benches alike).
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

    spark = get_spark(app_name="d03-ab", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    qs = workload.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    t02, t03 = [], []
    # warm both plans once (JIT + python pool), untimed
    workload.drop_cached("shingles")
    force(qs["d02_dedup_minhash_lsh"](spark, sf_dir))
    force(qs["d03_dedup_simhash"](spark, sf_dir))
    for i in range(rounds):
        workload.drop_cached("shingles")
        t0 = time.time()
        force(qs["d02_dedup_minhash_lsh"](spark, sf_dir))
        t02.append(time.time() - t0)
        t0 = time.time()
        force(qs["d03_dedup_simhash"](spark, sf_dir))
        t03.append(time.time() - t0)
        print(
            f"round {i}: d02 {t02[-1]:.3f}s d03 {t03[-1]:.3f}s "
            f"ratio {t03[-1]/t02[-1]:.3f}",
            flush=True,
        )

    b02, b03 = min(t02), min(t03)
    print(
        json.dumps(
            {
                "probe": "d03_ab",
                "rounds": rounds,
                "d02_best": round(b02, 3),
                "d03_best": round(b03, 3),
                "ratio_best": round(b03 / b02, 3),
                "r3_ratio": 0.796,
                "r4_ratio": 1.030,
                "d02_runs": [round(t, 3) for t in t02],
                "d03_runs": [round(t, 3) for t in t03],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
