"""Dump .explain('formatted') for named suite queries to plans/<round>/.

Usage: python scripts/dump_plans.py <suffix> name [name ...]
Writes plans/$SPARK_GRAFT_PLANS_ROUND/<name>_<suffix>.txt (suffix:
before|after; round defaults to r15).
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from edu_data_pipeline_spark.session import get_spark
from edu_data_pipeline_spark.suite import load_all


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
    out_dir = pathlib.Path(__file__).resolve().parent.parent / "plans" / rnd
    out_dir.mkdir(parents=True, exist_ok=True)
    registry = load_all()
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.01"
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({txt.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
