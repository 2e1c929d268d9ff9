"""The r11 map-side run-length counting machinery, pinned on crafted
and fuzzed corpora.

_doc_elem_counts (VERDICT r10 #3) replaced docs_tfidf_top_terms' three
full doc-term exchanges and docs_bigram_freq's window+count_distinct
with in-row run-length encoding of the sorted element array. The parity
sweep checks both queries end-to-end against DuckDB; these tests pin
the helper itself: (1) per-doc token counts equal a pure-Python
collections.Counter over the same split, on crafted edge docs and 200
seeded random docs; (2) the bigram builder path equals the
explode+groupBy shape it replaced; (3) min_toks filters short docs
(the sequence(0,-1) descent guard).
"""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from edu_data_pipeline_spark.suite.scale_suite import (
    _doc_elem_counts,
    gram_rows,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )


CRAFTED = [
    "a b c a b c a b c",            # heavy repetition, runs of 3
    "solo",                          # single token
    "x x x x x",                     # one run spanning the whole array
    " lead and trail spaces  ok ",   # trim + empty token from "  "
    "z y x w v u",                   # all-distinct, reverse-sorted input
    "same same",                     # exactly one duplicated pair
]


def _py_counts(text: str) -> Counter:
    """The Python twin of split(trim(text), ' ') + per-doc counting."""
    return Counter(text.strip().split(" "))


def test_token_counts_match_python_counter(spark):
    texts = list(CRAFTED)
    rng = random.Random(11)
    vocab = ["a", "b", "ab", "ba", "xyz", "q", ""]
    texts += [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 40)))
        for _ in range(200)
    ]
    d = _docs(spark, texts)
    got: dict[int, Counter] = {}
    for r in _doc_elem_counts(d, lambda t: t, out="term").collect():
        got.setdefault(r["doc_id"], Counter())[r["term"]] = r["cnt"]
    want = {i: _py_counts(t) for i, t in enumerate(texts)}
    assert got == want


def test_bigram_counts_match_explode_groupby(spark):
    d = _docs(spark, CRAFTED)
    build = lambda t: (  # noqa: E731
        f"transform(sequence(1, size({t}) - 1), "
        f"bi -> array_join(slice({t}, bi, 2), ' '))"
    )
    got = {
        (r["doc_id"], r["bigram"]): r["cnt"]
        for r in _doc_elem_counts(d, build, out="bigram", min_toks=2).collect()
    }
    want = {
        (r["doc_id"], r["bigram"]): r["n"]
        for r in gram_rows(d, 2, out="bigram")
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_min_toks_filters_short_docs(spark):
    d = _docs(spark, ["only", "two words"])
    rows = _doc_elem_counts(
        d,
        lambda t: (
            f"transform(sequence(1, size({t}) - 1), "
            f"bi -> array_join(slice({t}, bi, 2), ' '))"
        ),
        out="bigram",
        min_toks=2,
    ).collect()
    assert {(r["doc_id"], r["bigram"], r["cnt"]) for r in rows} == {
        (1, "two words", 1)
    }
