"""Durable MinHash dedup index: the standing artifact an ingest pipeline
screens every new batch against.

The suite query ``docs_incremental_dedup`` models this flow inside one
query (both sides recomputed); here the corpus side is a MATERIALIZED
parquet table of LSH band rows, so screening a batch costs only the
batch's own hashing plus an equi-join against the index — the cost model
a 100 TB corpus actually needs (the corpus is hashed once, ever).

Layout: parquet partitioned by ``band_idx``. The screen join's band_idx
equality prunes to 1/N_BANDS of the index files before any shuffle, and
the remaining join shuffles on band_key only. Appends are new files in
the same partitions (no rewrite); compaction of small appended files is
``operators.layout.compact_sorted`` applied per partition.

No new hashing scheme: signatures and banding are exactly
``suite.scale_suite.minhash_signatures_df`` / ``band_rows`` — index
collisions therefore match the in-query LSH family bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _bands(docs: DataFrame) -> DataFrame:
    from ..suite.scale_suite import band_rows, minhash_signatures_df

    return band_rows(minhash_signatures_df(docs))


def _read_index(spark: SparkSession, path: str, bands: DataFrame) -> DataFrame:
    """Read the standing index WITH the band schema supplied. Inference
    would crash on a legitimately EMPTY index: a corpus (or bootstrap
    slice) whose every document is shorter than one shingle writes zero
    band rows, and a partitionBy write of zero rows leaves only _SUCCESS
    — no footer to infer from (found by the r13 index property fuzz).
    The supplied schema also pins the column ORDER, which partition-
    directory discovery otherwise rotates (band_idx last).

    When the index is NON-empty, the on-disk footer schema is asserted
    against the supplied one (ADVICE r13): a schema-supplied read of an
    index written by an older/newer band layout would otherwise silently
    null-fill renamed columns and produce wrong screen counts, where
    inference used to surface the mismatch as an error. Footer-only
    read, no data scan."""
    try:
        on_disk = {f.name for f in spark.read.parquet(path).schema.fields}
    except Exception:
        on_disk = None  # legitimately empty index: nothing to drift from
    if on_disk is not None:
        want = {f.name for f in bands.schema.fields}
        if on_disk != want:
            raise ValueError(
                "dedup index at %r has drifted from the current band "
                "layout: on-disk columns %s vs expected %s — rebuild the "
                "index with build_band_index" % (path, sorted(on_disk), sorted(want))
            )
    return spark.read.schema(bands.schema).parquet(path)


def build_band_index(docs: DataFrame, path: str) -> int:
    """Hash the corpus once and materialize its band rows. Returns the
    number of band rows written (counted from the written parquet
    footers — re-counting the lineage would hash the corpus twice)."""
    bands = _bands(docs)
    bands.write.mode("overwrite").partitionBy("band_idx").parquet(path)
    return _read_index(docs.sparkSession, path, bands).count()


def append_to_index(new_docs: DataFrame, path: str) -> int:
    """Add an accepted batch's band rows to the standing index (new files
    in the existing band_idx partitions; no rewrite). Returns the rows
    appended (index total after minus before, both footer-cheap)."""
    spark = new_docs.sparkSession
    bands = _bands(new_docs)
    before = _read_index(spark, path, bands).count()
    bands.write.mode("append").partitionBy("band_idx").parquet(path)
    return _read_index(spark, path, bands).count() - before


def screen_against_index(
    spark: SparkSession, new_docs: DataFrame, path: str
) -> DataFrame:
    """Per new doc: how many distinct indexed docs share an LSH band.

    (doc_id, n_corpus_matches, is_dup_candidate) for EVERY batch doc —
    zero-collision docs report 0/false. Candidates then go to the exact
    verify (suite.minhash_verified_pairs shape) before any drop decision;
    band collision alone is the recall-stage signal."""
    batch_bands = _bands(new_docs)
    index = _read_index(spark, path, batch_bands).select(
        F.col("doc_id").alias("corpus_doc_id"), "band_idx", "band_key"
    )
    hits = (
        batch_bands.join(index, ["band_idx", "band_key"])
        .where(F.col("doc_id") != F.col("corpus_doc_id"))
        .groupBy("doc_id")
        .agg(F.count_distinct("corpus_doc_id").alias("n_corpus_matches"))
    )
    return (
        new_docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_corpus_matches"), F.lit(0)).alias("n_corpus_matches"),
            (F.coalesce(F.col("n_corpus_matches"), F.lit(0)) > 0).alias(
                "is_dup_candidate"
            ),
        )
    )
