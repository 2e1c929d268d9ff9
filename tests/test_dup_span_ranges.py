"""docs_dup_span_ranges: maximal duplicated-span merge on a crafted corpus.

Four hand-built documents exercise every island case: a shared block in
the middle of unrelated text (one span each side), two shared blocks
separated by more than a gram (two distinct spans), and two shared
blocks back-to-back whose gram coverage touches (merged into ONE
maximal span even though the straddling grams themselves are unique).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from edu_data_pipeline_spark.suite import load_all

COMMON = [f"c{i}" for i in range(1, 13)]   # 12 shared tokens (docs 0,1,2,3)
COMMON2 = [f"e{i}" for i in range(1, 13)]  # 12 shared tokens (docs 2,3)


def _doc(doc_id: int, tokens: list[str]) -> tuple[int, str, str, str, int]:
    text = " ".join(tokens)
    return (doc_id, text, "en", "test", len(text))


def test_dup_span_ranges_crafted(spark, tmp_path):
    docs = [
        _doc(0, [f"a{i}" for i in range(1, 6)] + COMMON + [f"b{i}" for i in range(1, 6)]),
        _doc(1, [f"z{i}" for i in range(1, 4)] + COMMON + ["y1", "y2"]),
        _doc(2, COMMON + [f"u{i}" for i in range(1, 11)] + COMMON2),
        _doc(3, COMMON2 + COMMON),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    out = load_all()["docs_dup_span_ranges"].fn(spark, str(tmp_path))
    rows = {
        (r["doc_id"], r["span_id"], r["start_pos"], r["end_pos"], r["span_len"])
        for r in out.collect()
    }
    assert rows == {
        # doc 0: COMMON at tokens 6..17 -> dup gram starts 6..10, one span
        (0, 1, 6, 18, 12),
        # doc 1: COMMON at tokens 4..15 -> one span
        (1, 1, 4, 16, 12),
        # doc 2: COMMON at 1..12 and COMMON2 at 23..34, gap > gram size
        # -> two distinct spans
        (2, 1, 1, 13, 12),
        (2, 2, 23, 35, 12),
        # doc 3: COMMON2 then COMMON adjacent -> gram coverage touches
        # (gap exactly K), merged into ONE maximal 24-token span
        (3, 1, 1, 25, 24),
    }


def test_dup_span_ranges_consistent_with_profile(spark):
    """On real testdata the per-doc duplicated-gram count from the spans
    query must reconcile with docs_dup_spans' n_dup_grams: every doc with
    a span has dup grams and vice versa."""
    sf = "/root/testdata/sf0.001"
    reg = load_all()
    spans = reg["docs_dup_span_ranges"].fn(spark, sf)
    profile = reg["docs_dup_spans"].fn(spark, sf)
    docs_with_spans = {r["doc_id"] for r in spans.select("doc_id").distinct().collect()}
    docs_with_dups = {
        r["doc_id"]
        for r in profile.where(F.col("n_dup_grams") > 0).select("doc_id").collect()
    }
    assert docs_with_spans == docs_with_dups
