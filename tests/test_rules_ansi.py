"""normalize_city is a PUBLIC rules helper (ADVICE r14): it must work on
a raw ANSI-on Spark-4 session, where plain element_at(map, key) throws
MAP_KEY_DOES_NOT_EXIST for any city not in CITY_CORRECTIONS — the
common case. try_element_at is NULL-on-miss under both ANSI settings.
Also pins the correction-map invariant (VERDICT r14 "what's wrong" #6):
the map lookup is single-step, so no correction VALUE may be another
entry's KEY (the old when-chain cascaded; the map must stay collapsed).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from edu_data_pipeline_spark.functions import rules


def test_normalize_city_under_ansi(spark):
    saved = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        df = spark.createDataFrame(
            [("Mumabi",), ("banglore",), ("  pune ",), ("Unknownville",), (None,)],
            ["city"],
        ).select(rules.normalize_city("city").alias("c"))
        got = [r.c for r in df.collect()]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", saved)
    assert got == ["Mumbai", "Bangalore", "Pune", "Unknownville", None]


def test_city_corrections_never_cascade():
    for k, v in rules.CITY_CORRECTIONS.items():
        assert v == k or v not in rules.CITY_CORRECTIONS, (
            f"correction {k!r} -> {v!r} cascades; normalize_city's map "
            "lookup is single-step — collapse the chain"
        )
