from __future__ import annotations

import os

from pyspark.sql import functions as F

from edu_data_pipeline_spark.operators.corpus import (
    connected_components,
    exact_dedup,
    near_dup_edges,
    run_corpus_pipeline,
)
from edu_data_pipeline_spark.sources.testdata import table

SF = "/root/testdata/sf0.001"


def test_connected_components_small(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        ["doc_a", "doc_b"],
    )
    comp = {r.doc_id: r.comp for r in connected_components(edges).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == comp[21] == comp[22] == comp[23] == 20


def test_exact_dedup_keeps_lowest_id(spark):
    docs = spark.createDataFrame(
        [(1, "same text"), (5, "same text"), (3, "other text")],
        ["doc_id", "text"],
    )
    kept = sorted(r.doc_id for r in exact_dedup(docs).collect())
    assert kept == [1, 3]


def test_corpus_pipeline_end_to_end(spark, tmp_path):
    docs = table(spark, SF, "documents").select("doc_id", "text", "lang", "source")
    out = str(tmp_path / "corpus")
    counts = run_corpus_pipeline(spark, docs, out)
    # layers shrink monotonically and nothing vanishes entirely
    assert counts["bronze"] == 500
    assert 0 < counts["silver"] <= counts["after_exact_dedup"] <= counts["quality_pass"] <= counts["bronze"]
    assert counts["gold"] == counts["silver"]
    # near-dup stage really removed something on this templated corpus
    assert counts["silver"] < counts["after_exact_dedup"]
    gold = spark.read.parquet(os.path.join(out, "gold"))
    # split partitioning materialized, every pack non-empty
    assert set(r.split for r in gold.select("split").distinct().collect()) == {
        "train", "val", "test",
    }
    assert gold.where(F.col("pack_id").isNull()).count() == 0
    # deterministic: rerun produces identical layer counts
    assert run_corpus_pipeline(spark, docs, out) == counts
