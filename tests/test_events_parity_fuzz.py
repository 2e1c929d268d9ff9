"""Hostile-events ORACLE-parity fuzz (r14, hypothesis).

Companion of test_parity_fuzz.py for the EVENTS table: every stateless
events-only registered query runs against hypothesis-generated logs
through the sweep's own comparator (`parity.compare_query`). The
generator stresses what the driver's synthetic events never contain:

- NULL user_id / event_type / ts / value / props;
- timestamp TIES within a user (session + transition tie-breaks) and
  gaps straddling the 1800 s session threshold (1800 vs 1801);
- events crossing day / week boundaries (daily metrics, retention);
- unknown ('', 'é') event types outside the pivot vocabulary;
- malformed ('{', ''), non-object ('123', '[1,2]') and non-integer-k
  ('{"k": "abc"}', '{"k": null}') props.

First contact found five real divergences plus one oracle crash, all
fixed and pinned by the crafted regression below:

1. Spark window ASC default is NULLS FIRST, DuckDB's is NULLS LAST — a
   NULL-ts event stitched to OPPOSITE ends of a user's session/
   transition/as-of sequence (user_sessions, event_transition_matrix,
   asof_purchase_attribution now order by asc_nulls_last("ts")).
2. events_type_unpivot: a static pivot cannot represent types outside
   its closed vocabulary; the oracle now filters to the same list.
3. events_value_psi: the oracle's internal equi-join dropped NULL
   event_type where the engine's window kept it (IS NOT DISTINCT FROM).
4. events_lc_distinct: DuckDB VARCHAR->DECIMAL rounds '7.6e-06' at
   scale 4 to 0.0001 (first-significant-digit quirk); sql_dround now
   half-ulp-snaps to 0 before the string trip.
5. events_props_json: DuckDB json_extract ERRORS on malformed JSON and
   CAST('abc' AS BIGINT) errors where Spark's get_json_object / ansi-
   off cast are graceful NULLs (oracle: json_valid guard + TRY_CAST).

Out of contract (documented engine difference, excluded from the
generator): Jackson's lenient JSON (single-quoted keys, trailing
garbage — Spark extracts, DuckDB rejects) and non-integer k values
(DuckDB TRY_CAST('1.9' AS BIGINT) rounds to 2, Spark's ansi-off string
cast yields NULL).
"""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime, timedelta

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from edu_data_pipeline_spark.parity import compare_query
from edu_data_pipeline_spark.suite import load_all

SETTLE = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

REG = load_all()

# every events-only stateless registered query
QUERIES = [
    "events_dow_hour_heatmap",
    "clean_datetimes",
    "dedup_flag_all",
    "dedup_keep_last",
    "duplicate_rate",
    "events_user_summary",
    "event_type_summary",
    "user_anomaly",
    "daily_metrics",
    "events_hourly",
    "user_sessions",
    "value_percentiles",
    "events_type_pivot",
    "asof_purchase_attribution",
    "approx_user_stats",
    "user_stats_exact",
    "events_cube",
    "events_range_join",
    "user_value_ranks",
    "events_winsorized",
    "events_props_json",
    "daily_event_anomalies",
    "events_grouping_sets",
    "events_multiset_ops",
    "events_type_unpivot",
    "user_funnel",
    "weekly_retention",
    "events_gap_fill",
    "events_value_histogram",
    "events_pit_features",
    "events_value_psi",
    "events_ks_test",
    "events_key_skew",
    "events_lateness_profile",
    "events_lc_distinct",
    "event_transition_matrix",
    "events_daily_autocorr",
    "events_burst_minutes",
]

EVENT_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)

BASE = datetime(2024, 1, 1, 23, 50, 0)

# tie-prone second offsets: duplicates are common; 1800/1801 straddle
# the session gap; 86400+/7d cross day and retention-week boundaries
OFFSET = st.sampled_from(
    [0, 0, 30, 60, 600, 1200, 1800, 1801, 3600, 86400, 90000, 7 * 86400]
)
TS = st.one_of(st.none(), OFFSET.map(lambda s: BASE + timedelta(seconds=s)))
UID = st.one_of(st.none(), st.integers(0, 4))
ETYPE = st.sampled_from(
    ["view", "click", "purchase", "signup", "error", None, "", "é"]
)
VALUE = st.one_of(st.none(), st.integers(-200, 20000).map(lambda c: c / 100))
PROPS = st.sampled_from(
    [
        '{"k": 1}',
        '{"k": 42}',
        '{"k": -3}',
        '{"k": "abc"}',
        '{"k": null}',
        ' {"k": 3} ',
        "{}",
        "{",
        "",
        None,
        "123",
        "[1,2]",
    ]
)
events = st.lists(
    st.tuples(TS, UID, ETYPE, VALUE, PROPS), min_size=1, max_size=12
)


def _run_all(spark, rows):
    tmp = tempfile.mkdtemp(prefix="events_parity_fuzz_")
    try:
        spark.createDataFrame(rows, EVENT_SCHEMA).write.parquet(
            tmp + "/events.parquet"
        )
        con = duckdb.connect()
        con.execute(
            "CREATE OR REPLACE VIEW events AS "
            f"SELECT * FROM '{tmp}/events.parquet/*.parquet'"
        )
        problems = []
        for name in QUERIES:
            res = compare_query(spark, con, REG[name], tmp)
            if not res.ok and res.problems != ["rows-only check (no oracle)"]:
                problems.append(f"{name}: {res.problems}")
        assert not problems, "\n".join(problems)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@SETTLE
@given(events)
def test_events_queries_match_oracles_on_hostile_log(spark, evs):
    rows = [(i, *e) for i, e in enumerate(evs)]
    _run_all(spark, rows)


def test_events_queries_match_oracles_crafted_regression(spark):
    """The deterministic corpus that exposed all five r14 finds: ties,
    the midnight-crossing session, NULL user/type/ts/value, unknown
    types, malformed props, and the non-integer-k JSON edge."""
    rows = []

    def ev(ts, uid, et, val, props='{"k": 1}'):
        rows.append((len(rows), ts, uid, et, val, props))

    for off in [0, 0, 0, 600, 1200, 1200, 90000]:
        ev(BASE + timedelta(seconds=off), 1, "view", 1.25)
    ev(BASE + timedelta(seconds=1300), 1, "click", 2.50)
    ev(BASE + timedelta(seconds=1400), 1, "purchase", 99.99)
    ev(BASE, 2, "signup", None)
    ev(BASE + timedelta(seconds=30), None, "view", 3.00)
    ev(BASE + timedelta(seconds=60), None, "error", -1.50)
    ev(BASE + timedelta(seconds=90), 3, None, 4.00)
    ev(None, 3, "view", 5.00)
    ev(BASE + timedelta(days=8), 4, "", 6.00, "")
    ev(BASE + timedelta(days=8, seconds=10), 4, "é", 7.00, None)
    ev(BASE + timedelta(seconds=45), 5, "purchase", 10.00, '{"k": "abc"}')
    ev(None, 5, "click", 1.00, "{")
    _run_all(spark, rows)
