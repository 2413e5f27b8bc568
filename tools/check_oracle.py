"""Local mirror of the driver's correctness gate.

Runs every `queries()` entry on Spark and its `oracle_sql()` twin on
DuckDB at the given scale factor, then compares row count, sorted
column names, and (order-insensitively) the values themselves.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from vector_database_spark import get_spark
from vector_database_spark.schemas import TESTDATA_TABLES


def _norm_cell(v):
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # canonicalize -0.0 and integral floats
        if v == int(v) and abs(v) < 1e15:
            return str(int(v)) + ".0"
        return repr(round(v, 9))
    if v is None:
        return "<null>"
    # duckdb may hand back Decimal for rounded doubles
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return _norm_cell(float(v))
    except Exception:
        pass
    return str(v)


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    args = [a for a in sys.argv[1:]]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args[1:]) if args and os.path.isdir(args[0]) else set(args)
    results: dict[str, dict] = {}

    from vector_database_spark import workload

    spark = get_spark(
        app_name="oracle-check",
        extra_conf={"spark.ui.enabled": "false"},
    )
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = workload.queries()
    oracles = workload.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            results[name] = {"status": "fail", "err": f"spark: {str(e)[:200]}"}
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(srows)} rows, {t_spark:.1f}s)")
            results[name] = {
                "status": "rows_only",
                "spark_rows": len(srows),
                "spark_s": round(t_spark, 1),
            }
            continue
        t0 = time.time()
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            results[name] = {"status": "fail", "err": f"duckdb: {str(e)[:200]}"}
            n_fail += 1
            continue
        t_duck = time.time() - t0

        sc, sn = _normalize(scols, srows)
        dc, dn = _normalize(dcols, drows)
        ok = True
        msgs = []
        if sc != dc:
            ok = False
            msgs.append(f"schema {sc} vs {dc}")
        if len(sn) != len(dn):
            ok = False
            msgs.append(f"rowcount {len(sn)} vs {len(dn)}")
        if ok and sn != dn:
            ok = False
            diff = [
                (a, b) for a, b in zip(sn, dn) if a != b
            ][:3]
            msgs.append(f"values differ, first diffs: {diff}")
        if ok:
            n_pass += 1
            print(f"PASS {name}: {len(sn)} rows (spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)")
            results[name] = {
                "status": "pass",
                "rows": len(sn),
                "spark_s": round(t_spark, 1),
                "duckdb_s": round(t_duck, 1),
            }
        else:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(msgs))
            results[name] = {"status": "fail", "err": "; ".join(msgs)[:300]}
    print(f"\n{n_pass} passed, {n_fail} failed")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": sum(
                        1 for v in results.values() if v["status"] == "rows_only"
                    ),
                    "queries": results,
                },
                f,
                indent=1,
            )
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
