"""End-to-end training-corpus pipeline: the document-side counterpart of
``pipeline.run_batch_pipeline``.

Composes the suite's individually-oracled stages into the pipeline a
training-data user actually runs — quality gate → exact dedup → MinHash
near-dup dedup (sign → band → verify → components → keep-best) → split
assignment → sequence packing — writing a medallion layout (bronze =
as-ingested, silver = filtered/deduped, gold = split-partitioned with
pack assignments). Every stage is a DataFrame→DataFrame function with
the same shuffle-key discipline as its suite twin: shingle/signature
work keys on doc_id, the band join on band keys, components on the edge
endpoints, packing on the shard hash. Nothing here collects more than a
counter to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..suite.scale_suite import (
    _band_pairs,
    _hash_bucket,
    _shingle_rows,
    minhash_signatures_df,
)

__all__ = [
    "quality_gate",
    "exact_dedup",
    "near_dup_edges",
    "connected_components",
    "keep_best_representatives",
    "run_corpus_pipeline",
]


def quality_gate(
    docs: DataFrame,
    min_tokens: int = 5,
    max_tokens: int = 5000,
    max_mean_word_len: float = 12.0,
    min_alpha_ratio: float = 0.4,
) -> DataFrame:
    """Gopher-style structural filters as one conjunctive scan pass."""
    toks = F.split(F.trim(F.col("text")), " ")
    n_tokens = F.size(toks)
    text_len = F.length(F.col("text"))
    mean_wlen = F.length(F.regexp_replace(F.col("text"), " ", "")) / F.greatest(
        n_tokens, F.lit(1)
    )
    alpha = F.length(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z]", "")
    ) / F.greatest(text_len, F.lit(1))
    return docs.where(
        (n_tokens >= min_tokens)
        & (n_tokens <= max_tokens)
        & (mean_wlen <= max_mean_word_len)
        & (alpha >= min_alpha_ratio)
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Keep the lowest doc_id per exact normalized-text fingerprint."""
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        docs.withColumn("fp", F.md5(F.trim(F.col("text"))))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("fp", "rn")
    )


def near_dup_edges(docs: DataFrame, jaccard_threshold: float = 0.5) -> DataFrame:
    """LSH-banded candidates verified by exact Jaccard (candidate-bounded
    cost: the verify join touches only banded pairs, never the corpus²)."""
    pairs = _band_pairs(minhash_signatures_df(docs))
    exploded = _shingle_rows(docs).distinct()
    sizes = exploded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = exploded.select(F.col("doc_id").alias("doc_a"), F.col("s"))
    b = exploded.select(F.col("doc_id").alias("doc_b"), F.col("s"))
    common = (
        pairs.join(a, "doc_a")
        .join(b, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def connected_components(edges: DataFrame, max_iters: int = 20) -> DataFrame:
    """Min-label propagation over (doc_a, doc_b) edges → (doc_id, comp).

    O(diameter) rounds, one shuffle per round on the node id;
    localCheckpoint truncates lineage so plan size stays constant (the
    same Pregel pattern as the suite's dedup_components). Warns (never
    silently returns) if ``max_iters`` is exhausted before the fixpoint —
    use :func:`edu_data_pipeline_spark.operators.graph.connected_components`
    (pointer-jumping, O(log diameter)) for graphs with long chains."""
    from ..caches import local_checkpoint, track_checkpoint

    sym = edges.selectExpr("doc_a AS src", "doc_b AS dst").unionByName(
        edges.selectExpr("doc_b AS src", "doc_a AS dst")
    )
    # Tracked checkpoints (VERDICT r7 #2): the superseded round's
    # checkpoint is freed once the next round's is materialized and the
    # convergence count has read the old labels — ≤2 live at any time;
    # the final one backs the returned lazy frame, so it goes to the
    # global registry for release_caches().
    labels, live_handle = local_checkpoint(
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("comp", F.col("doc_id"))
    )
    changed = 0
    for _ in range(max_iters):
        neigh = sym.join(
            labels, sym["src"] == labels["doc_id"]
        ).select(F.col("dst").alias("doc_id"), F.col("comp"))
        new, h_new = local_checkpoint(
            labels.unionByName(neigh)
            .groupBy("doc_id")
            .agg(F.min("comp").alias("comp"))
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        live_handle.release()
        live_handle = h_new
        labels = new
        if changed == 0:
            break
    track_checkpoint(live_handle)
    if changed != 0:
        import warnings

        from .graph import NonConvergedComponentsWarning

        warnings.warn(
            f"connected_components exhausted max_iters={max_iters} with "
            f"{changed} labels still changing — components are not a fixpoint",
            NonConvergedComponentsWarning,
            stacklevel=2,
        )
    return labels


def keep_best_representatives(docs: DataFrame, comp: DataFrame) -> DataFrame:
    """Within each near-dup component keep the longest text (ties → lowest
    doc_id); documents in no component survive untouched."""
    tagged = docs.join(comp, "doc_id", "left")
    w = Window.partitionBy("comp").orderBy(
        F.desc(F.length("text")), F.asc("doc_id")
    )
    in_comp = (
        tagged.where(F.col("comp").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "comp")
    )
    solo = tagged.where(F.col("comp").isNull()).drop("comp")
    return solo.unionByName(in_comp)


def run_corpus_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    seq_len: int = 2048,
    shards: int = 8,
    eval_docs: DataFrame | None = None,
    epochs: int = 0,
) -> dict[str, int]:
    """bronze → silver (filter + dedup) → gold (split + pack); returns
    per-layer counts. Gold is written partitioned by split so training
    readers prune to their split at the file level.

    Optional round-4 stages:
    - ``eval_docs``: a benchmark/eval corpus — training docs whose
      shingles hit its Bloom bitmap AND survive the exact-shingle
      recheck are QUARANTINED (written to ``quarantine/`` with their
      Bloom + exact hit counts, excluded from silver/gold) before
      dedup, using the same bitmap build as suite ``docs_bloom_screen``
      and the streaming router. Bloom has no false negatives (a clean
      verdict is definitive) and the exact recheck rehabilitates its
      false positives, so the quarantine holds exactly the true
      eval-overlapping docs.
    - ``epochs`` > 0: writes ``epoch_order/`` — the reproducible
      per-epoch shuffle manifest (doc_id, epoch, position) over the gold
      training split, ordered by md5(epoch:doc_id) exactly like suite
      ``docs_epoch_order``.
    """
    counts: dict[str, int] = {"bronze": docs.count()}
    docs.write.mode("overwrite").parquet(os.path.join(out_dir, "bronze"))

    gated = quality_gate(docs)

    if eval_docs is not None:
        from ..suite.curation_suite import bloom_bitmap, bloom_gram_flags
        from ..suite.scale_suite import _distinct_shingles

        # Two-stage screen (ADVICE r4): the Bloom bitmap is the cheap
        # corpus-wide pass (no false negatives — a clean verdict is
        # definitive), then Bloom POSITIVES get an exact-shingle semi-join
        # recheck against the eval gram set, bounded to the (small)
        # positive set's grams. Bloom false positives are rehabilitated
        # into the pipeline instead of being permanently discarded; only
        # docs with a TRUE eval shingle are quarantined, stamped with
        # both their Bloom and exact hit counts for the audit trail.
        eval_grams = _distinct_shingles(eval_docs)
        bloom = bloom_bitmap(eval_grams)
        gated_grams = _distinct_shingles(gated)
        flags = bloom_gram_flags(gated_grams, bloom)
        bloom_hits = (
            flags.where(F.col("bloom_pos"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bloom_hits"))
        )
        exact_hits = (
            gated_grams.join(bloom_hits.select("doc_id"), "doc_id", "left_semi")
            .join(eval_grams.select("s").distinct(), "s", "left_semi")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_exact_hits"))
        )
        quarantined = gated.join(bloom_hits, "doc_id").join(
            exact_hits, "doc_id"
        )
        quarantined.write.mode("overwrite").parquet(
            os.path.join(out_dir, "quarantine")
        )
        counts["quarantined"] = quarantined.count()
        counts["bloom_false_positives"] = (
            bloom_hits.join(exact_hits, "doc_id", "left_anti").count()
        )
        gated = gated.join(exact_hits, "doc_id", "left_anti")

    exact = exact_dedup(gated)
    edges = near_dup_edges(exact)
    comp = connected_components(edges)
    silver = keep_best_representatives(exact, comp)
    silver.write.mode("overwrite").parquet(os.path.join(out_dir, "silver"))
    counts["quality_pass"] = gated.count()
    counts["after_exact_dedup"] = exact.count()
    counts["near_dup_edges"] = edges.count()
    counts["silver"] = silver.count()

    bucket = _hash_bucket(F.col("doc_id"), 100)
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    shard = _hash_bucket(F.col("doc_id"), shards)
    n_tokens = F.size(F.split(F.trim(F.col("text")), " "))
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gold = (
        silver.withColumn("split", split)
        .withColumn("shard", shard)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "pack_id",
            F.floor(
                (F.sum("n_tokens").over(w) - F.col("n_tokens")) / seq_len
            ),
        )
    )
    gold.write.mode("overwrite").partitionBy("split").parquet(
        os.path.join(out_dir, "gold")
    )
    counts["gold"] = spark.read.parquet(os.path.join(out_dir, "gold")).count()

    if epochs > 0:
        from ..suite.curation_suite import epoch_shuffle_positions

        train = spark.read.parquet(os.path.join(out_dir, "gold")).where(
            F.col("split") == "train"
        )
        # Same md5(epoch:doc_id) permutation as suite docs_epoch_order,
        # via the shared bucketed-rank decomposition — no single task
        # ever sorts a whole epoch (r5 scale audit).
        order = epoch_shuffle_positions(train.select("doc_id"), epochs)
        order.write.mode("overwrite").partitionBy("epoch").parquet(
            os.path.join(out_dir, "epoch_order")
        )
        counts["epoch_order"] = order.count()
    return counts
