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


def test_pipeline_quarantine_and_epoch_order(spark, tmp_path):
    """Round-4 optional stages: a doc copying eval shingles is
    quarantined (excluded from silver/gold); the epoch manifest is a
    full permutation per epoch over the gold training split, and
    permutations differ between epochs."""
    def letters(n: int) -> str:  # alpha-only token material (quality
        s = ""                   # gate requires alpha ratio >= 0.4)
        n += 1
        while n:
            s += chr(97 + n % 26)
            n //= 26
        return s

    shared = " ".join("sh" + letters(i) for i in range(30))
    docs = spark.createDataFrame(
        [(i, " ".join("w" + letters(i) + "q" + letters(j) for j in range(30)),
          "en", "srcA", 120)
         for i in range(20)]
        + [(99, shared + " tail words here", "en", "srcA", 120)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    eval_docs = spark.createDataFrame(
        [(1000, shared, "en", "eval", 100)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "corpus")
    counts = run_corpus_pipeline(
        spark, docs, out, eval_docs=eval_docs, epochs=2
    )
    assert counts["quarantined"] == 1
    quar_rows = spark.read.parquet(out + "/quarantine").collect()
    quarantined = {r["doc_id"] for r in quar_rows}
    assert quarantined == {99}
    # ADVICE r4: quarantine carries the audit counts, every quarantined
    # doc has a TRUE exact eval-shingle overlap (Bloom false positives
    # are rehabilitated, none expected in this crafted corpus)
    assert all(r["n_exact_hits"] >= 1 for r in quar_rows)
    assert all(r["n_bloom_hits"] >= r["n_exact_hits"] for r in quar_rows)
    assert counts["bloom_false_positives"] == 0
    silver_ids = {r["doc_id"] for r in
                  spark.read.parquet(out + "/silver").collect()}
    assert 99 not in silver_ids

    # Bloom-false-positive rehabilitation: force EVERY gram to flag
    # positive (worst-case bitmap saturation) — the exact recheck must
    # still quarantine only the true overlap and return the rest to the
    # pipeline.
    import edu_data_pipeline_spark.suite.curation_suite as cur

    real_flags = cur.bloom_gram_flags
    cur.bloom_gram_flags = lambda grams, bloom: grams.withColumn(
        "bloom_pos", F.lit(True)
    )
    try:
        out_fp = str(tmp_path / "corpus_fp")
        counts_fp = run_corpus_pipeline(spark, docs, out_fp, eval_docs=eval_docs)
    finally:
        cur.bloom_gram_flags = real_flags
    assert counts_fp["quarantined"] == 1
    assert counts_fp["bloom_false_positives"] == 20  # all clean docs flagged
    fp_silver = {r["doc_id"] for r in
                 spark.read.parquet(out_fp + "/silver").collect()}
    assert 99 not in fp_silver and len(fp_silver) > 0  # clean docs survive

    order = spark.read.parquet(out + "/epoch_order").collect()
    train_ids = {
        r["doc_id"]
        for r in spark.read.parquet(out + "/gold").collect()
        if r["split"] == "train"
    }
    by_epoch: dict[int, dict[int, int]] = {}
    for r in order:
        by_epoch.setdefault(r["epoch"], {})[r["doc_id"]] = r["position"]
    assert set(by_epoch) == {0, 1}
    for m in by_epoch.values():
        assert set(m) == train_ids
        assert sorted(m.values()) == list(range(1, len(train_ids) + 1))
    if len(train_ids) > 1:
        assert by_epoch[0] != by_epoch[1]
    assert counts["epoch_order"] == 2 * len(train_ids)
