"""Tied-timestamp regression fixture for ``user_sessions`` (VERDICT r1 #1).

The driver testdata has no tied (user_id, ts) pairs at any sf, so the
window tie-break can silently regress. This fixture builds an events table
where EVERY ordering decision is contested — duplicate timestamps around a
session boundary, plus a gap of exactly 1800s and one just over — and runs
the real suite query against the real oracle through the parity comparer.
"""

from __future__ import annotations

import datetime

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from edu_data_pipeline_spark.parity import compare_query, duck_connection
from edu_data_pipeline_spark.suite import load_all

REGISTRY = load_all()

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _events_with_ties(tmpdir: str) -> str:
    rows = []

    def ev(event_id, user_id, seconds, micros=0, value=1.0):
        rows.append(
            {
                "event_id": event_id,
                "ts": T0 + datetime.timedelta(seconds=seconds, microseconds=micros),
                "user_id": user_id,
                "event_type": "click",
                "value": value,
                "props": "{}",
            }
        )

    # User 1: three events at the SAME timestamp, then a >30min gap to a
    # pair that is tied again. Which tied row carries is_new=1 is decided
    # solely by the event_id tie-break.
    ev(5, 1, 0)
    ev(3, 1, 0)
    ev(4, 1, 0)
    ev(2, 1, 4000)
    ev(1, 1, 4000)
    # User 2: gap of exactly 1800s (same session on both engines) and
    # 1800s + 1us (split on both engines) — the sub-second granularity
    # class from ADVICE r1 (second-truncated longs vs exact intervals).
    ev(10, 2, 0)
    ev(11, 2, 1800)
    ev(12, 2, 3600, micros=1)
    path = f"{tmpdir}/events.parquet"
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False), path
    )
    return tmpdir


@pytest.fixture(scope="module")
def tie_dir(tmp_path_factory):
    return _events_with_ties(str(tmp_path_factory.mktemp("ties")))


def test_user_sessions_deterministic_on_ties(spark, tie_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tie_dir}/events.parquet'"
    )
    res = compare_query(spark, con, REGISTRY["user_sessions"], tie_dir)
    assert res.ok, res.problems


def test_user_sessions_boundary_semantics(spark, tie_dir):
    """1800s gap stays one session; 1800s+1us splits."""
    df = REGISTRY["user_sessions"].fn(spark, tie_dir)
    u2 = {
        (r["session_id"], r["n_events"])
        for r in df.where("user_id = 2").collect()
    }
    assert u2 == {(1, 2), (2, 1)}
