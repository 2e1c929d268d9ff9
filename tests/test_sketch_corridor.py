"""Quantified error corridors for the one permanently oracle-less driver
row (`approx_user_stats`, CORRECTNESS err="no_oracle" every round).

The driver can only ever rows-check this query — sketch layouts differ
across engines, so no DuckDB hash can exist. VERDICT r5 #5: replace the
loose "within 5% at sf0.001" smoke with corridors derived from the
sketches' published guarantees, at BOTH gate scales (sf0.01 = the
driver's draw, sf0.1 = the bench scale), so the rows-only entry carries
quantified accuracy evidence:

- HLL (`approx_count_distinct(rsd=0.02)`): rsd is the standard deviation
  of the relative error, not a hard bound — the corridor is 4·rsd = 8%
  (≥4σ; a correct implementation exceeds it with probability < 1e-4 per
  group, and any implementation bug lands far outside).
- KLL/GK quantiles (`percentile_approx(q, accuracy=10000)`): the contract
  is RANK error ≤ 1/accuracy = 1e-4 — the returned value's exact rank
  must lie in [(q-ε)·n - 1, (q+ε)·n + 1] (±1 for tie/boundary
  semantics). Checked by counting rows ≤/< the returned value, never by
  comparing values (value error is unbounded for heavy-tailed data; rank
  error is what the sketch guarantees).

Bounds recorded in COVERAGE.md next to the rows-only entry.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from edu_data_pipeline_spark.sources.testdata import table
from edu_data_pipeline_spark.suite.analytics_suite import approx_user_stats

HLL_RSD = 0.02           # rsd passed in the query
HLL_CORRIDOR = 4 * HLL_RSD  # 4-sigma acceptance band
QUANTILE_EPS = 1.0 / 10000  # rank error bound at accuracy=10000


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_sketch_error_corridors(spark, sf_dir):
    approx = approx_user_stats(spark, sf_dir)
    events = table(spark, sf_dir, "events")
    # One distributed pass computes, per event_type: the group size and
    # the exact rank (rows <= / rows <) of each returned quantile value.
    # The 5-row approx frame broadcasts; nothing collects the raw events.
    checked = (
        events.join(F.broadcast(approx), "event_type")
        .groupBy("event_type", "approx_users", "exact_users")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("value") <= F.col("approx_p50")).cast("long")).alias("le50"),
            F.sum((F.col("value") < F.col("approx_p50")).cast("long")).alias("lt50"),
            F.sum((F.col("value") <= F.col("approx_p90")).cast("long")).alias("le90"),
            F.sum((F.col("value") < F.col("approx_p90")).cast("long")).alias("lt90"),
        )
        .collect()
    )
    assert len(checked) == 5  # the 5 event types of the generator
    for r in checked:
        rel_err = abs(r.approx_users - r.exact_users) / r.exact_users
        assert rel_err <= HLL_CORRIDOR, (
            f"{r.event_type}: HLL error {rel_err:.4f} outside 4·rsd "
            f"corridor {HLL_CORRIDOR} (approx={r.approx_users}, "
            f"exact={r.exact_users})"
        )
        for q, le, lt in ((0.5, r.le50, r.lt50), (0.9, r.le90, r.lt90)):
            lo = (q - QUANTILE_EPS) * r.n - 1
            hi = (q + QUANTILE_EPS) * r.n + 1
            # the returned value occupies ranks (lt, le]; the corridor
            # must intersect that range
            assert lt <= hi and le >= lo, (
                f"{r.event_type} q={q}: exact rank range ({lt}, {le}] "
                f"misses corridor [{lo:.1f}, {hi:.1f}] of n={r.n}"
            )
