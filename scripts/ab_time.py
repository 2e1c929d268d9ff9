"""Interleaved min-of-N wall timing for named suite queries (r15).

Times each named query through the noop sink, interleaving iterations
exactly like bench.py (iteration-major), on $SPARK_GRAFT_SF_DIR
(default sf0.1). Prints per-query min/median plus the bench MT host
mark sampled before each iteration so a noisy window is visible.

Usage: python scripts/ab_time.py [-n N] name [name ...]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os

from edu_data_pipeline_spark.session import get_spark
from edu_data_pipeline_spark.suite import load_all, release_caches


def main() -> None:
    args = sys.argv[1:]
    n = 5
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-time")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import bench  # reuse the host marks

    samples: dict[str, list[float]] = {q: [] for q in names}
    # warmup pass (untimed)
    for q in names:
        registry[q].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_caches()
        spark.catalog.clearCache()
    for i in range(n):
        mt = bench._cpu_mark_mt(reps=2)
        for q in names:
            t0 = time.perf_counter()
            registry[q].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[q].append(time.perf_counter() - t0)
            release_caches()
            spark.catalog.clearCache()
        print(f"iter {i}: mt={mt:.3f} " + " ".join(f"{q}={samples[q][-1]:.3f}" for q in names), flush=True)
    for q in names:
        s = sorted(samples[q])
        print(f"RESULT {q}: min={s[0]:.3f} med={s[len(s)//2]:.3f} all={[round(x,3) for x in samples[q]]}")
    spark.stop()


if __name__ == "__main__":
    main()
