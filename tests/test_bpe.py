"""BPE merge learning: golden hand-computed merges, fold semantics,
segmentation round trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from edu_data_pipeline_spark.operators.bpe import (
    apply_merge,
    learn_bpe,
    segment_words,
    top_pair,
    word_types,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_types_symbols(spark):
    types = {r["word"]: (r["n"], r["syms"]) for r in
             word_types(_docs(spark, ["ab ab c"])).collect()}
    assert types["ab"] == (2, ["a", "b", "</w>"])
    assert types["c"] == (1, ["c", "</w>"])


def test_top_pair_weighted_and_deterministic(spark):
    # "ab" x3 -> pair (a,b) weight 3 beats (b,</w>) weight 3? tie ->
    # lexicographic: (a,b) < (b,</w>) so (a,b) wins the tie.
    types = word_types(_docs(spark, ["ab ab ab"]))
    assert top_pair(types) == ("a", "b", 3)


def test_apply_merge_overlap_semantics(spark):
    """'aaa' with merge (a,a): greedy leftmost -> ['aa', 'a', '</w>']."""
    df = spark.createDataFrame([(1,)], "x int").select(
        apply_merge(F.expr("array('a','a','a','</w>')"), "a", "a").alias("s")
    )
    assert df.first()["s"] == ["aa", "a", "</w>"]


def test_learn_bpe_golden(spark):
    """Hand-computed: corpus 'low' x5, 'lower' x2.
    Pairs r1: (l,o)=7, (o,w)=7, (w,</w>)=5, (w,e)=2, (e,r)=2, (r,</w>)=2.
    Tie 7 vs 7 -> (l,o) lexicographically first. After merge (l,o):
    (lo,w)=7 wins r2; then (low,</w>)=5 r3; then (low,e)=2 ties with
    (e,r),(r,</w>) -> (e,r) first lexicographically."""
    docs = _docs(spark, ["low low low low low", "lower lower"])
    merges = learn_bpe(docs, 4)
    got = [(m["left"], m["right"], m["pair_count"]) for m in merges]
    assert got == [
        ("l", "o", 7),
        ("lo", "w", 7),
        ("low", "</w>", 5),
        ("e", "r", 2),
    ]


def test_segment_words_roundtrip(spark):
    docs = _docs(spark, ["low low low low low", "lower lower"])
    merges = learn_bpe(docs, 4)
    seg = {r["word"]: r["syms"] for r in
           segment_words(word_types(docs), merges).collect()}
    assert seg["low"] == ["low</w>"]
    assert seg["lower"] == ["low", "er", "</w>"]


def test_registry_entry_runs(spark):
    from edu_data_pipeline_spark.suite import load_all

    out = load_all()["docs_bpe_merges"].fn(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert 1 <= len(rows) <= 8
    assert [r["merge_rank"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["merged"] == r["left"] + r["right"]
