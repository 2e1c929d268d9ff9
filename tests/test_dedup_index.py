"""Durable MinHash band index: build -> screen -> append lifecycle, and
equivalence with the in-query incremental dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from edu_data_pipeline_spark.operators import dedup_index
from edu_data_pipeline_spark.sources.testdata import table
from edu_data_pipeline_spark.suite.scale_suite import INCR_BATCH_MOD

SF = "/root/testdata/sf0.001"


def test_index_lifecycle_matches_inquery(spark, tmp_path):
    """Screening a batch against the materialized corpus index must give
    exactly docs_incremental_dedup's answer (same split, same scheme)."""
    from edu_data_pipeline_spark.suite import load_all

    d = table(spark, SF, "documents")
    is_batch = F.col("doc_id") % INCR_BATCH_MOD == INCR_BATCH_MOD - 1
    corpus, batch = d.where(~is_batch), d.where(is_batch)

    path = str(tmp_path / "band_index")
    n_rows = dedup_index.build_band_index(corpus, path)
    assert n_rows == corpus.count() * 4  # N_BANDS rows per doc

    screened = {
        (r["doc_id"], r["n_corpus_matches"], r["is_dup_candidate"])
        for r in dedup_index.screen_against_index(spark, batch, path).collect()
    }
    want = {
        (r["doc_id"], r["n_corpus_matches"], r["is_dup_candidate"])
        for r in load_all()["docs_incremental_dedup"].fn(spark, SF).collect()
    }
    assert screened == want


def test_append_then_self_screen(spark, tmp_path):
    """After appending a batch, screening the SAME batch again must flag
    nothing new from itself (self-matches excluded) but a verbatim copy
    of an indexed doc must collide."""
    d = table(spark, SF, "documents").limit(20)
    path = str(tmp_path / "band_index")
    dedup_index.build_band_index(d, path)

    # verbatim copy of doc 0 under a new id -> must be a dup candidate
    copy = d.where("doc_id = 0").select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    out = {r["doc_id"]: r["is_dup_candidate"]
           for r in dedup_index.screen_against_index(spark, copy, path).collect()}
    assert out == {100000: True}

    # append the copy; screening it again still reports the corpus match,
    # never a self-match
    dedup_index.append_to_index(copy, path)
    again = dedup_index.screen_against_index(spark, copy, path).collect()[0]
    assert again["is_dup_candidate"] is True
    assert again["n_corpus_matches"] >= 1
