"""Per-stage wall/parallelism profile for suite queries (r14 optimization).

For each named query (default: the bench HEADLINE + CALIBRATION sets) this
runs the query once through the noop sink and then reads the Spark UI REST
API for the stages the run produced: task count, executor run time, input /
shuffle-read / shuffle-write bytes. The point is to attribute wall time to
*stage shape* — a stage with numTasks=1 and most of the executorRunTime is
a serial bottleneck no config can parallelize (the single-row-group scan
problem), while a stage with 32 tasks and high shuffle read is
exchange-bound.

Usage: python scripts/stage_probe.py [sf_dir] [name ...]
Output: one line per stage, grouped per query, plus a per-query summary of
serial-stage share (fraction of executorRunTime spent in 1-task stages).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time
import urllib.request

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from edu_data_pipeline_spark.session import get_spark
from edu_data_pipeline_spark.suite import load_all, release_caches


def _stages(spark) -> dict[int, dict]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url) as fh:
        rows = json.load(fh)
    return {(r["stageId"], r["attemptId"]): r for r in rows}


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    registry = load_all()
    names = argv[1:] or None
    if names is None:
        import bench

        names = [n for n in bench.HEADLINE + bench.CALIBRATION if n in registry]
    spark = get_spark(app_name="stage-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # one untimed warm-up of the first query so JVM/codegen init does not
    # pollute the first profile
    registry[names[0]].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    release_caches()
    spark.catalog.clearCache()
    summary = []
    for name in names:
        before = _stages(spark)
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        release_caches()
        spark.catalog.clearCache()
        after = _stages(spark)
        new = [v for k, v in after.items() if k not in before]
        total_rt = sum(s["executorRunTime"] for s in new) or 1
        serial_rt = sum(
            s["executorRunTime"] for s in new if s["numCompleteTasks"] <= 1
        )
        print(f"\n== {name}  wall={wall:.3f}s  stages={len(new)} "
              f"exec_rt={total_rt/1e3:.2f}s serial_share={serial_rt/total_rt:.0%}")
        for s in sorted(new, key=lambda s: -s["executorRunTime"])[:8]:
            print(
                f"   stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>3} "
                f"rt={s['executorRunTime']/1e3:7.2f}s "
                f"in={s['inputBytes']/1e6:8.2f}MB "
                f"sr={s['shuffleReadBytes']/1e6:7.2f}MB "
                f"sw={s['shuffleWriteBytes']/1e6:7.2f}MB  {s['name'][:60]}"
            )
        summary.append((name, wall, total_rt / 1e3, serial_rt / total_rt))
    print("\n== summary (desc wall) ==")
    for name, wall, rt, share in sorted(summary, key=lambda r: -r[1]):
        print(f"{wall:7.3f}s  rt={rt:7.2f}s serial={share:4.0%}  {name}")
    spark.stop()


if __name__ == "__main__":
    main()
