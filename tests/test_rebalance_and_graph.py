"""Round-4 fixes: capped language rebalance + CC non-convergence signal.

- docs_lang_rebalance (r3 VERDICT "What's wrong" #1): the replication
  factor is capped at LANG_REBALANCE_MAX_REP so a pathological corpus
  (1 doc in a rare language vs millions of majority docs) cannot explode
  a single input row into a corpus-scale replica count inside one task.
- connected_components (r3 ADVICE): exhausting the round cap while
  labels still change must never be silent.
"""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from edu_data_pipeline_spark.operators.graph import (
    NonConvergedComponentsWarning,
    connected_components,
    symmetrize_edges,
)
from edu_data_pipeline_spark.suite import load_all
from edu_data_pipeline_spark.suite.analytics_suite import LANG_REBALANCE_MAX_REP

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_lang_rebalance_cap(spark, tmp_path):
    """1-doc-language fixture: uncapped rep would be 500; every doc must
    emit at most LANG_REBALANCE_MAX_REP replicas."""
    majority = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        F.lit("t").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.lit(1).alias("n_chars"),
    )
    rare = spark.createDataFrame([(999, "t", "zz", "web", 1)], DOC_SCHEMA)
    majority.unionByName(rare).write.parquet(str(tmp_path / "documents.parquet"))

    out = load_all()["docs_lang_rebalance"].fn(spark, str(tmp_path))
    per_doc = out.groupBy("doc_id", "lang").agg(F.count(F.lit(1)).alias("n"))
    rows = {(r["lang"], r["n"]) for r in per_doc.collect()}
    assert ("zz", LANG_REBALANCE_MAX_REP) in rows  # capped, not 500
    assert all(n == 1 for lang, n in rows if lang == "en")  # majority untouched
    # the global bound the cap buys: output <= MAX_REP x input, always
    assert out.count() <= 501 * LANG_REBALANCE_MAX_REP


def test_cc_warns_when_round_cap_exhausted(spark):
    """Plain min-label on a chain longer than max_rounds: warn, or raise
    under strict=True — never a silent wrong answer."""
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    verts = spark.range(0, n).select(F.col("id").alias("doc_id"))
    sym = symmetrize_edges(edges)

    with pytest.warns(NonConvergedComponentsWarning):
        _, rounds = connected_components(
            verts, sym, pointer_jump=False, max_rounds=3
        )
    assert rounds == 3

    with pytest.raises(RuntimeError, match="max_rounds=3"):
        connected_components(
            verts, sym, pointer_jump=False, max_rounds=3, strict=True
        )

    # pointer-jumping converges on the same chain well inside the default
    # cap — and a converged run must NOT warn
    with warnings.catch_warnings():
        warnings.simplefilter("error", NonConvergedComponentsWarning)
        labels, _ = connected_components(verts, sym, pointer_jump=True)
    assert {r["component"] for r in labels.collect()} == {0}
