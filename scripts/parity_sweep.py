"""Full parity sweep at the driver's gate scale (sf0.01 by default).

Runs every registered suite query against its DuckDB oracle through the
pandas-dtype-sensitive canonicalizer (edu_data_pipeline_spark.parity) and
prints one line per query plus a failure summary.  This is the local
replica of the driver's CORRECTNESS_r{N}.json run — pytest covers sf0.001
for speed; this script exists because sf0.01 has more ties/edge values
(user_sessions round 1 passed sf0.001 and failed the driver).

Usage: python scripts/parity_sweep.py [sf_dir] [name ...]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from edu_data_pipeline_spark.parity import compare_query, duck_connection
from edu_data_pipeline_spark.session import get_spark
from edu_data_pipeline_spark.suite import load_all


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark(app_name="parity-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    con = duck_connection(sf_dir)
    failures = []
    for name in sorted(registry):
        if only and name not in only:
            continue
        start = time.perf_counter()
        try:
            res = compare_query(spark, con, registry[name], sf_dir)
        except Exception as exc:  # noqa: BLE001 — surface, don't die
            print(f"FAIL {name}: exception {exc}")
            failures.append(name)
            continue
        elapsed = time.perf_counter() - start
        rows_only = registry[name].oracle is None
        tag = "ok(rows-only)" if rows_only and res.ok else ("ok" if res.ok else "FAIL")
        print(f"{tag:14s} {name:32s} spark={res.spark_rows:>6} "
              f"oracle={res.oracle_rows:>6} {elapsed:6.2f}s")
        if not res.ok:
            failures.append(name)
            for p in res.problems:
                print(f"    {p}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
