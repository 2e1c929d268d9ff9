"""Adversarial-config parity sweep: flush out partition-order sensitivity.

The driver's CORRECTNESS gate runs our queries in ITS OWN session; the
one environmental degree of freedom that can flip a float hash is
physical partitioning (partial-agg order, shuffle fan-in). This script
replays the oracle-parity protocol under deliberately hostile configs —
odd thread/partition counts, AQE disabled, a single shuffle partition,
partition counts far above the data — so any query whose output depends
on partition order fails HERE, not in the driver's sample.

Usage:
    python scripts/stress_sweep.py <master> <shuffle_partitions> <aqe:0|1> \
        [sf_dir] [name ...]

Run the standard battery (see ROUND 4 notes in SCALE.md):
    for cfg in "local[5] 7 1" "local[32] 32 0" "local[3] 1 1" \
               "local[32] 64 1"; do
        python scripts/stress_sweep.py $cfg /root/testdata/sf0.01 || break
    done
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
    master, partitions, aqe = sys.argv[1], int(sys.argv[2]), sys.argv[3] == "1"
    rest = sys.argv[4:]
    sf_dir = rest[0] if rest else "/root/testdata/sf0.01"
    only = set(rest[1:])
    spark = get_spark(
        app_name=f"stress-sweep-{master}-{partitions}-aqe{int(aqe)}",
        master=master,
        shuffle_partitions=partitions,
        extra_conf={"spark.sql.adaptive.enabled": str(aqe).lower()},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    con = duck_connection(sf_dir)
    failures = []
    start_all = time.perf_counter()
    for name in sorted(registry):
        if only and name not in only:
            continue
        try:
            res = compare_query(spark, con, registry[name], sf_dir)
        except Exception as exc:  # noqa: BLE001 — surface, don't die
            print(f"FAIL {name}: exception {exc}")
            failures.append(name)
            continue
        if not res.ok:
            failures.append(name)
            print(f"FAIL {name}:")
            for p in res.problems:
                print(f"    {p}")
    n = len(only) if only else len(registry)
    print(
        f"config master={master} partitions={partitions} aqe={aqe}: "
        f"{n - len(failures)}/{n} ok in {time.perf_counter() - start_all:.1f}s"
        + (f"  FAILURES: {failures}" if failures else "")
    )
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
