"""Randomized durable-dedup-index properties (VERDICT r12 #4, hypothesis).

``operators.dedup_index`` is INDEX MACHINERY — build / screen / append
over a standing parquet artifact — layered on the suite's frozen MinHash
scheme. The property therefore fuzzes the machinery against a pure-Python
band-index TWIN that consumes the very band rows Spark computes
(``_bands`` collected once per frame): the hashing is pinned elsewhere
(tests/test_curation.py and the registry oracles); what example tests
under-sample here is the lifecycle — append batches whose bands collide
with standing bands, batches that reuse an indexed doc_id (self-match
exclusion), short documents that produce NO band rows at all, and
repeated append rounds against the same files.

Texts are drawn from a 4-word vocabulary so 3-gram shingles collide
organically; every screen answer (n_corpus_matches AND the candidate
flag, for EVERY batch doc including zero-banders) plus every build/append
row count must equal the twin's.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from edu_data_pipeline_spark.operators import dedup_index
from edu_data_pipeline_spark.operators.dedup_index import _bands

SETTLE = settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny vocabulary -> dense collision space; 0-2 word texts -> no shingles
WORD = st.sampled_from(["alpha", "beta", "gamma", "delta"])
TEXT = st.lists(WORD, max_size=8).map(" ".join)

# corpus: ids 0..4; batches: ids 3..9 (overlap 3-4 exercises the
# self-match exclusion when a batch reuses an indexed doc id)
corpus_docs = st.dictionaries(st.integers(0, 4), TEXT, min_size=1, max_size=5)
batch_docs = st.dictionaries(st.integers(3, 9), TEXT, min_size=1, max_size=4)

DOC_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


class _TwinIndex:
    """Pure-Python band index: {(band_idx, band_key): {doc_id}}."""

    def __init__(self):
        self.buckets: dict = {}
        self.n_rows = 0

    def add(self, band_rows: list) -> int:
        for doc_id, band_idx, band_key in band_rows:
            self.buckets.setdefault((band_idx, band_key), set()).add(doc_id)
        self.n_rows += len(band_rows)
        return len(band_rows)

    def screen(self, doc_ids: list, band_rows: list) -> dict:
        """{doc_id: (n_corpus_matches, is_dup_candidate)} for EVERY id."""
        matches: dict = {d: set() for d in doc_ids}
        for doc_id, band_idx, band_key in band_rows:
            hits = self.buckets.get((band_idx, band_key), set())
            matches[doc_id] |= {h for h in hits if h != doc_id}
        return {d: (len(m), len(m) > 0) for d, m in matches.items()}


def _collect_bands(df) -> list:
    return [(r.doc_id, r.band_idx, r.band_key) for r in _bands(df).collect()]


@SETTLE
@given(corpus_docs, st.lists(batch_docs, min_size=1, max_size=2))
def test_index_lifecycle_matches_python_twin(spark, corpus, batches):
    corpus_df = spark.createDataFrame(sorted(corpus.items()), DOC_SCHEMA)
    twin = _TwinIndex()
    tmp = tempfile.mkdtemp(prefix="dedup_index_prop_")
    try:
        path = f"{tmp}/band_index"
        n_built = dedup_index.build_band_index(corpus_df, path)
        assert n_built == twin.add(_collect_bands(corpus_df))

        for batch in batches:
            batch_df = spark.createDataFrame(sorted(batch.items()), DOC_SCHEMA)
            batch_bands = _collect_bands(batch_df)

            got = {
                r.doc_id: (r.n_corpus_matches, r.is_dup_candidate)
                for r in dedup_index.screen_against_index(
                    spark, batch_df, path
                ).collect()
            }
            want = twin.screen(sorted(batch), batch_bands)
            assert got == want

            n_appended = dedup_index.append_to_index(batch_df, path)
            assert n_appended == len(batch_bands)
            twin.add(batch_bands)

        # standing index total survived every append (footer count ==
        # twin row count, duplicates preserved: appends never rewrite).
        # Read via the operator's schema-safe reader: a legitimately
        # all-empty index has no footers for inference (the r13 bug).
        assert (
            dedup_index._read_index(spark, path, _bands(corpus_df)).count()
            == twin.n_rows
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
