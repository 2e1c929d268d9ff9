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


def test_cdc_chunks_stable_under_insertion(spark):
    """The point of content-defined chunking: inserting tokens near the
    START of a document must leave the chunk fingerprints of the
    document's tail intact (fixed-stride chunking re-addresses every
    downstream chunk). We compare the two variants' surviving-chunk
    counts on the same edit."""
    import random

    from edu_data_pipeline_spark.suite.scale_suite import docs_cdc_chunks

    rng = random.Random(7)
    words = [f"w{rng.randint(0, 500)}" for _ in range(400)]
    original = " ".join(words)
    edited = " ".join(["inserted", "tokens", "here"] + words)

    def chunk_hashes(text):
        d = spark.createDataFrame(
            [(1, text, "en", "s", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        # docs_cdc_chunks reads via table(); run the same logic on this df
        from edu_data_pipeline_spark.suite import scale_suite as ss
        from pyspark.sql import functions as F2, Window as W2

        toks = d.select(
            "doc_id", F2.posexplode(F2.split(F2.trim(F2.col("text")), " ")).alias("pos0", "t")
        ).select("doc_id", (F2.col("pos0") + 1).alias("pos"), "t")
        h = F2.conv(F2.substring(F2.md5(F2.col("t")), 1, 8), 16, 10).cast("long")
        marked = toks.withColumn("is_boundary", (h % ss.CDC_MODULUS == 0).cast("long"))
        w = W2.partitionBy("doc_id").orderBy("pos").rowsBetween(
            W2.unboundedPreceding, W2.currentRow
        )
        seg = marked.withColumn("chunk_id", F2.sum("is_boundary").over(w))
        rows = seg.groupBy("doc_id", "chunk_id").agg(
            F2.md5(
                F2.array_join(
                    F2.transform(
                        F2.array_sort(F2.collect_list(F2.struct("pos", "t"))),
                        lambda p: p["t"],
                    ),
                    " ",
                )
            ).alias("h")
        ).collect()
        return [r["h"] for r in rows]

    base = set(chunk_hashes(original))
    after = set(chunk_hashes(edited))
    cdc_survivors = len(base & after)
    # fixed-stride comparison: 8-token chunks by position
    def strided(text):
        t = text.split(" ")
        return {" ".join(t[i : i + 8]) for i in range(0, len(t), 8)}

    stride_survivors = len(strided(original) & strided(edited))
    # CDC must preserve most tail chunks; the 3-token insert shifts every
    # fixed-stride chunk (survivors ~0)
    assert cdc_survivors >= int(0.8 * len(base)), (cdc_survivors, len(base))
    assert cdc_survivors > stride_survivors


def test_empty_corpus_index_lifecycle(spark, tmp_path):
    """Deterministic regression (r13, found by the index property fuzz):
    a corpus whose every document is shorter than one shingle writes ZERO
    band rows, and a partitionBy write of zero rows leaves only _SUCCESS
    — schema inference on read-back then crashed build/screen/append.
    The index readers now supply the band schema, so an empty index is a
    well-defined state: build returns 0, screening any batch against it
    reports all-clear, and a later append bootstraps it."""
    docs = spark.createDataFrame([(0, ""), (1, "two words")], "doc_id long, text string")
    path = str(tmp_path / "band_index")
    assert dedup_index.build_band_index(docs, path) == 0

    batch = spark.createDataFrame([(5, "alpha beta gamma delta")], "doc_id long, text string")
    out = {r["doc_id"]: (r["n_corpus_matches"], r["is_dup_candidate"])
           for r in dedup_index.screen_against_index(spark, batch, path).collect()}
    assert out == {5: (0, False)}

    # bootstrap-by-append: the first real rows land in the empty index
    assert dedup_index.append_to_index(batch, path) == 4  # N_BANDS rows
    copy = batch.select((F.col("doc_id") + 1).alias("doc_id"), "text")
    again = dedup_index.screen_against_index(spark, copy, path).collect()[0]
    assert (again["n_corpus_matches"], again["is_dup_candidate"]) == (1, True)


def test_index_schema_drift_detected(spark, tmp_path):
    """ADVICE r13: schema-supplied reads of a NON-empty index silently
    null-fill columns an older band layout named differently, corrupting
    screen counts where inference used to fail loudly. _read_index now
    asserts the on-disk footer's column set against the supplied schema
    (footer-only, no data scan) and refuses with a rebuild hint."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    path = str(tmp_path / "band_index")
    assert dedup_index.build_band_index(docs, path) == 4

    # simulate an index written by an older layout: band_key -> bucket
    legacy = spark.read.parquet(path).withColumnRenamed("band_key", "bucket")
    legacy_path = str(tmp_path / "legacy_index")
    legacy.write.partitionBy("band_idx").parquet(legacy_path)

    with pytest.raises(ValueError, match="drifted.*rebuild"):
        dedup_index.screen_against_index(spark, docs, legacy_path).collect()
    with pytest.raises(ValueError, match="drifted.*rebuild"):
        dedup_index.append_to_index(docs, legacy_path)

    # the healthy index still reads fine through the same assert
    hit = dedup_index.screen_against_index(
        spark, docs.select((F.col("doc_id") + 1).alias("doc_id"), "text"), path
    ).collect()[0]
    assert (hit["n_corpus_matches"], hit["is_dup_candidate"]) == (1, True)
