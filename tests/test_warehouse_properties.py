"""Randomized warehouse-layer properties (r12, hypothesis).

The CDC fold and the SCD2 merge are the two operators whose semantics
live in edge cases (NULL keys, NULL tracked values, delete-then-reopen,
keys absent from a batch) rather than in the happy path — exactly where
example-based tests under-sample. These properties drive them with
adversarial generated scenarios against pure-Python oracles:

- ``apply_cdc`` over many independent feeds in ONE Spark job (the feeds
  are multiplexed through a composite ``(feed_id, k)`` key, so hypothesis
  examples stay cheap) must equal a dict fold per feed. NULL keys and
  NULL payloads are in the strategy — the plain-equality anti-join bug
  this property was written against duplicated NULL-key rows and ignored
  NULL-key deletes (fixed in operators/cdc.py, r12).
- ``scd2_apply`` over a random batch sequence must keep the version-table
  invariants: exactly one open version per live key, open value == the
  last-write-wins fold, version count per key == the consecutive-distinct
  change count (null-safe), and an unbroken valid_from -> valid_to chain.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from edu_data_pipeline_spark.operators.cdc import apply_cdc
from edu_data_pipeline_spark.operators.warehouse import scd2_apply

SETTLE = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

KEYS = st.sampled_from([0, 1, 2, 3, None])
VALS = st.sampled_from(["a", "b", "c", None])

# one feed: (snapshot dict, list of (k, v, op) changes — seqs assigned
# positionally so they are unique within the feed and later wins)
feed = st.tuples(
    st.dictionaries(KEYS, VALS, max_size=5),
    st.lists(st.tuples(KEYS, VALS, st.sampled_from("IUD")), max_size=10),
)

CH_SCHEMA = T.StructType(
    [
        T.StructField("feed_id", T.IntegerType()),
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.StringType()),
        T.StructField("_op", T.StringType()),
        T.StructField("seq", T.IntegerType()),
    ]
)
SNAP_SCHEMA = T.StructType(CH_SCHEMA.fields[:3])


def _fold(snap: dict, changes: list[tuple]) -> dict:
    """The reference fold: last change per key wins; D drops the key."""
    latest: dict = {}
    for seq, (k, v, op) in enumerate(changes):
        latest[k] = (v, op, seq)  # later enumeration index == higher seq
    out = dict(snap)
    for k, (v, op, _) in latest.items():
        if op == "D":
            out.pop(k, None)
        else:
            out[k] = v
    return out


@SETTLE
@given(st.lists(feed, min_size=1, max_size=6))
def test_apply_cdc_matches_python_fold(spark, feeds):
    snap_rows = [
        (i, k, v) for i, (snap, _) in enumerate(feeds) for k, v in snap.items()
    ]
    ch_rows = [
        (i, k, v, op, seq)
        for i, (_, changes) in enumerate(feeds)
        for seq, (k, v, op) in enumerate(changes)
    ]
    snap_df = spark.createDataFrame(snap_rows, SNAP_SCHEMA)
    ch_df = spark.createDataFrame(ch_rows, CH_SCHEMA)
    out = apply_cdc(snap_df, ch_df, ["feed_id", "k"], "seq")
    got = sorted(((r.feed_id, r.k, r.v) for r in out.collect()), key=str)
    want = sorted(
        (
            (i, k, v)
            for i, (snap, changes) in enumerate(feeds)
            for k, v in _fold(snap, changes).items()
        ),
        key=str,
    )
    assert got == want


batches = st.lists(st.dictionaries(KEYS, VALS, max_size=4), min_size=1, max_size=4)


@SETTLE
@given(batches)
def test_scd2_invariants_under_random_batches(spark, seq):
    far = "9999-12-31 00:00:00"
    ts = [f"2024-{i + 1:02d}-01 00:00:00" for i in range(len(seq))]
    dim = None
    for batch, t in zip(seq, ts):
        upd = spark.createDataFrame(
            [(k, v) for k, v in batch.items()],
            T.StructType(
                [
                    T.StructField("k", T.IntegerType()),
                    T.StructField("v", T.StringType()),
                ]
            ),
        )
        dim = scd2_apply(dim, upd, ["k"], ["v"], F.lit(t).cast("timestamp"))
    rows = dim.collect() if dim is not None else []

    # Python oracle: per-key consecutive-distinct version list
    history: dict = {}
    for batch, t in zip(seq, ts):
        for k, v in batch.items():
            vers = history.setdefault(k, [])
            if not vers or vers[-1][0] != v:  # null-safe: None != "a", None == None
                vers.append((v, t))

    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)

    assert set(by_key) == set(history)
    for k, vers in history.items():
        got = sorted(by_key[k], key=lambda r: str(r.valid_from))
        # version count == consecutive-distinct change count
        assert [(r.v, str(r.valid_from)[:19]) for r in got] == vers
        # exactly one open version, and it is the last one
        assert [bool(r.is_current) for r in got] == [False] * (len(got) - 1) + [True]
        assert str(got[-1].valid_to)[:19] == far
        # unbroken handoff chain
        for a, b in zip(got, got[1:]):
            assert str(a.valid_to) == str(b.valid_from)
