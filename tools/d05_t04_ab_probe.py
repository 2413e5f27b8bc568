"""Interleaved A/B for the round-7 bench movers (round-7 verdict
item 3): d05_embedding_neardup (0.576 → 1.040 s, anchor-adjusted
~1.42×) and t04_fingerprint (0.493 → 0.820 s, ~1.31×) moved between
BENCH_r06 and BENCH_r07 with no code change on either path (git log
confirms). Both were measured in DIFFERENT passes than the anchor,
so the anchor adjustment itself is suspect — the d03 precedent
(rounds 4-5) showed this rig's throttle swings 2-4× on a timescale
of seconds and only single-process INTERLEAVED ratios separate host
noise from a real regression.

Protocol (the tools/d03_ab_probe.py one): per round run the EXACT
bench thunks r01 (anchor — fixed, cache-free relational scan), d05,
t04 back-to-back; 8 rounds; compare min-of-8 RATIOS to the recorded
artifacts:

    r6: d05/r01 = 0.576/0.422 = 1.365   t04/r01 = 0.493/0.422 = 1.168
    r7: d05/r01 = 1.040/0.537 = 1.937   t04/r01 = 0.820/0.537 = 1.527

Ratios near the r6 band pin the r7 samples on host noise; ratios at
(or above) the r7 band on an idle host mean the paths genuinely
slowed and need a diff hunt.

Usage: python tools/d05_t04_ab_probe.py [rounds]
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
        app_name="d05-t04-ab", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = workload.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    names = ("r01_q1_agg", "d05_embedding_neardup", "t04_fingerprint")
    times: dict = {n: [] for n in names}
    # warm every plan once (JIT + python pool), untimed
    for n in names:
        force(qs[n](spark, sf_dir))
    for i in range(rounds):
        row = []
        for n in names:
            t0 = time.time()
            force(qs[n](spark, sf_dir))
            times[n].append(time.time() - t0)
            row.append(f"{n.split('_')[0]} {times[n][-1]:.3f}s")
        print(f"round {i}: " + "  ".join(row), flush=True)

    m = {n: min(v) for n, v in times.items()}
    out = {
        "metric": "interleaved min-of-N A/B, d05+t04 vs r01 anchor",
        "rounds": rounds,
        "min": {n: round(v, 3) for n, v in m.items()},
        "samples": {n: [round(x, 3) for x in v] for n, v in times.items()},
        "d05_over_r01": round(m["d05_embedding_neardup"] / m["r01_q1_agg"], 3),
        "t04_over_r01": round(m["t04_fingerprint"] / m["r01_q1_agg"], 3),
        "bands": {
            "r6": {"d05_over_r01": 1.365, "t04_over_r01": 1.168},
            "r7": {"d05_over_r01": 1.937, "t04_over_r01": 1.527},
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
