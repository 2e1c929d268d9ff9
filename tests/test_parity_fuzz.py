"""Hostile-corpus ORACLE-parity fuzz (r14, hypothesis).

The registry sweep proves Spark == DuckDB on the generated testdata —
whose documents are all non-NULL, single-spaced ASCII prose. This
module points the sweep's own comparator (``parity.compare_query``,
canonical type-prefixed cells, dtype-class check — the driver's hash
semantics) at hypothesis-generated corpora that stress what the
testdata never contains: NULL text, NULL lang, empty / all-space text,
multi-space runs (empty inner tokens), multi-byte + astral unicode, CDC
boundary-dense vocabularies, and stopword/long-token mixes.

This is the instrument that caught the r14 ansi-off ``size(NULL) = -1``
class (see ``scale_suite._n_tokens``): seven registered text queries
packed / scored / bucketed NULL-text documents with token count -1
while their oracles carried NULL. A pure-Python twin per query would
re-derive what the oracles already state — running the ORACLE on the
hostile corpus is strictly stronger and covers every output column.

Scope: the stateless document-table queries (no persist_tracked caches,
no standing artifacts keyed by sf_dir — those have dedicated lifecycle
fuzzes). Each example is one parquet round-trip, exactly the sweep's
path, compared across all queries before the tmpdir is reclaimed.
"""

from __future__ import annotations

import shutil
import tempfile

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from edu_data_pipeline_spark.parity import compare_query
from edu_data_pipeline_spark.suite import load_all

SETTLE = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

REG = load_all()

# Stateless documents-only queries: one scan in, no cross-run artifacts.
QUERIES = [
    "docs_text_stats",
    "docs_token_counts",
    "docs_length_buckets",
    "docs_pack_sequences",
    "docs_cdc_chunks",
    "docs_token_budget_mix",
    "docs_tokenizer_fertility",
    "docs_quality_classifier",
    "docs_split_assign",
    "docs_hash_sample",
    "docs_filter_funnel",
    "docs_repetition",
]

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

# stopwords ("the", "a") for stat ratios, a >=6-char token for
# long_token_ratio, CDC-boundary words ("beta", "c", "<" are md5 bucket
# 0 of 8), multi-byte + astral unicode, and "  " separators that forge
# empty inner tokens
WORD = st.sampled_from(
    ["the", "a", "beta", "c", "alpha", "wordiness", "é", "𝕏", "<"]
)
TEXT = st.one_of(
    st.none(),
    st.just(""),
    st.just("   "),
    st.lists(
        st.tuples(WORD, st.sampled_from([" ", "  "])), min_size=1, max_size=40
    ).map(lambda ws: "".join(w + sep for w, sep in ws)),
)
LANG = st.sampled_from(["en", "de", None])
DOC = st.tuples(TEXT, LANG, st.sampled_from(["s1", "s2"]))
corpora = st.dictionaries(st.integers(0, 19), DOC, min_size=1, max_size=8)


@SETTLE
@given(corpora)
def test_stateless_doc_queries_match_oracles_on_hostile_corpus(spark, docs):
    tmp = tempfile.mkdtemp(prefix="parity_fuzz_")
    try:
        rows = [
            (i, t, lang, src, None if t is None else len(t))
            for i, (t, lang, src) in sorted(docs.items())
        ]
        spark.createDataFrame(rows, DOC_SCHEMA).write.parquet(
            tmp + "/documents.parquet"
        )
        con = duckdb.connect()
        # Spark writes a parquet DIRECTORY (the testdata are single
        # files, so the sweep's duck_connection can read them bare)
        con.execute(
            "CREATE OR REPLACE VIEW documents AS "
            f"SELECT * FROM '{tmp}/documents.parquet/*.parquet'"
        )
        problems = []
        for name in QUERIES:
            res = compare_query(spark, con, REG[name], tmp)
            if not res.ok:
                problems.append(f"{name}: {res.problems}")
        assert not problems, "\n".join(problems)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
