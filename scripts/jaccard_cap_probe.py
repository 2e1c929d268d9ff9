"""Scaling diagnosis for docs_jaccard_top_pairs' measured alpha 1.19 (r8).

Two instruments, because the first hypothesis FAILED and the failure is
the finding:

1. Pinned-threshold fit: rerun the two-point byte fit with the pair-df
   threshold pinned to PAIR_DF_CAP at BOTH scales (floor == cap ⇒
   ``least(greatest(cap, rel), cap)`` == cap everywhere). If the 1.19
   came from the threshold schedule ramping 5 → 32 between sf0.01 and
   sf0.1, the pinned alpha would drop to ~1. MEASURED: identical bytes,
   alpha still 1.19 — the ramp is NOT the cause (no shingle in the
   testdata even has df in (5, 32] at sf0.01).

2. Candidate-volume + df-histogram probe: counts pair candidates and
   the shingle document-frequency histogram at each scale. MEASURED:
   candidates 11,179 → 1,130,536 (~101x for 10x docs — quadratic), and
   the df histogram is NOT sf-invariant: it peaks at df 1–2 (max 7) at
   sf0.01 but at df ~9 (long tail past 32) at sf0.1. The synthetic
   corpus draws text from a bounded template pool, so EVERY shingle's
   df grows ~linearly with corpus size; pairs per shingle grow ~df²/2.

Conclusion: alpha 1.19 is a CORPUS artifact — the exact situation the
capacity plan's documented LSH caveat ("extrapolates only as far as the
duplicate structure is sf-invariant") names. On a corpus with an
sf-invariant df distribution, candidates are linear in vocabulary. The
absolute PAIR_DF_CAP=32 is the defense that holds under ANY df drift:
per-shingle candidates are bounded at C²/2 = 512, so worst-case total
candidates are 512·|vocabulary| — linear — and as df drifts up, the cap
cuts MORE, not less. The pin here is a measurement override only;
shipped query semantics are untouched.

Usage: python scripts/jaccard_cap_probe.py
"""

from __future__ import annotations

import json
import math
import pathlib
import sys
import urllib.request

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from edu_data_pipeline_spark.session import get_spark
from edu_data_pipeline_spark.suite import load_all, release_caches
from edu_data_pipeline_spark.suite import scale_suite


def _shuffle_total(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete"
    ) as resp:
        stages = json.load(resp)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def _input_bytes(sf_dir: str) -> int:
    docs = pathlib.Path(sf_dir, "documents.parquet")
    if docs.is_dir():
        return sum(f.stat().st_size for f in docs.rglob("*") if f.is_file())
    return docs.stat().st_size


def main() -> None:
    spark = get_spark(app_name="jaccard-cap-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    fn = registry["docs_jaccard_top_pairs"].fn
    sfs = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")

    # --- 1. pinned-threshold byte fit -------------------------------
    orig = scale_suite.STOP_DF_FLOOR
    scale_suite.STOP_DF_FLOOR = scale_suite.PAIR_DF_CAP
    try:
        meas = []
        for sf_dir in sfs:
            df = fn(spark, sf_dir)
            sh0 = _shuffle_total(spark)
            df.write.format("noop").mode("overwrite").save()
            release_caches()
            spark.catalog.clearCache()
            in_b = _input_bytes(sf_dir)
            meas.append((in_b, _shuffle_total(spark) - sh0))
            print(f"{sf_dir}: input={in_b/1e6:.2f} MB "
                  f"shuffle={meas[-1][1]/1e6:.2f} MB "
                  f"sh/in={meas[-1][1]/in_b:.3f}")
    finally:
        scale_suite.STOP_DF_FLOOR = orig
    (in_a, sh_a), (in_b, sh_b) = meas
    alpha = math.log(sh_b / sh_a) / math.log(in_b / in_a)
    print(f"pinned-threshold (df <= {scale_suite.PAIR_DF_CAP} at both "
          f"scales) alpha = {alpha:.2f}")

    # --- 2. candidate volume + df histogram -------------------------
    for sf_dir in sfs:
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        kept = scale_suite._pair_shingles(d)
        ka, kb = kept.alias("ka"), kept.alias("kb")
        cand = (
            ka.join(
                kb,
                (F.col("ka.s") == F.col("kb.s"))
                & (F.col("ka.doc_id") < F.col("kb.doc_id")),
            )
            .select(
                F.col("ka.doc_id").alias("a"), F.col("kb.doc_id").alias("b")
            )
            .distinct()
        )
        hist = (
            scale_suite._distinct_shingles(d)
            .groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .groupBy("df")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("df")
            .limit(15)
            .collect()
        )
        print(f"{sf_dir}: pair_shingle_rows={kept.count()} "
              f"candidates={cand.count()}")
        print(f"  df histogram (head): {[(r['df'], r['n']) for r in hist]}")
    spark.stop()


if __name__ == "__main__":
    main()
