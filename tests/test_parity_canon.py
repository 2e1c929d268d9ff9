"""Unit vectors for the parity canonicalizer — each locks a driver-hash
divergence class that bit round 1 (see VERDICT.md / ADVICE.md):

- DuckDB HUGEINT window sums arrive as float64 while Spark bigint arrives
  as int64; values compare equal as Python numbers but the driver's
  dtype-sensitive hash mismatches (``user_sessions`` r1).
- List-valued cells crash the driver's pandas canonicalizer
  (``approx_user_stats`` r1).
- DATE columns arrive as midnight datetime64 from DuckDB but as
  datetime.date objects from Spark, and the driver hash-matches those
  (``dim_date`` r1 green) — so the canonicalizer must too.
"""

from __future__ import annotations

import datetime
import decimal

import numpy as np
import pandas as pd
import pytest

from edu_data_pipeline_spark.parity import UnhashableCell, _canon_frame


def test_int64_vs_float64_mismatch():
    """The user_sessions r1 bug class: 1 (int64) must NOT equal 1.0 (float64)."""
    _, int_rows = _canon_frame(pd.DataFrame({"session_id": np.array([1, 2], "int64")}))
    _, flt_rows = _canon_frame(
        pd.DataFrame({"session_id": np.array([1.0, 2.0], "float64")})
    )
    assert int_rows != flt_rows


def test_date_equals_midnight_timestamp():
    """The dim_date evidence: DuckDB DATE->datetime64 midnight hashes equal
    to Spark's datetime.date objects in the driver."""
    _, spark_rows = _canon_frame(
        pd.DataFrame({"d": [datetime.date(2020, 1, 3)]}, dtype="object")
    )
    _, duck_rows = _canon_frame(
        pd.DataFrame({"d": pd.to_datetime(["2020-01-03"]).astype("datetime64[us]")})
    )
    assert spark_rows == duck_rows


def test_timestamp_units_equal():
    """datetime64[ns] (Spark toPandas) vs datetime64[us] (DuckDB .df())."""
    ts = "2024-01-01 00:09:58.778549"
    _, a = _canon_frame(pd.DataFrame({"t": pd.to_datetime([ts]).astype("datetime64[ns]")}))
    _, b = _canon_frame(pd.DataFrame({"t": pd.to_datetime([ts]).astype("datetime64[us]")}))
    assert a == b


def test_nan_and_none_are_null():
    """Nullable BIGINT lands as float64-with-NaN on both engines."""
    _, a = _canon_frame(pd.DataFrame({"v": [np.nan]}))
    _, b = _canon_frame(pd.DataFrame({"v": [None]}, dtype="object"))
    assert a == b == [(None,)]


def test_list_cell_raises():
    """The approx_user_stats r1 crash class."""
    with pytest.raises(UnhashableCell):
        _canon_frame(pd.DataFrame({"p": [[0.5, 0.9]]}))


def test_ndarray_cell_raises():
    with pytest.raises(UnhashableCell):
        _canon_frame(pd.DataFrame({"p": [np.array([1.0])]}))


def test_decimal_cell_raises():
    """Spark DecimalType -> object-of-Decimal vs DuckDB decimal -> float64
    would hash-mismatch in the driver; surface it locally."""
    with pytest.raises(UnhashableCell):
        _canon_frame(pd.DataFrame({"v": [decimal.Decimal("1.50")]}))


def test_row_order_insensitive():
    _, a = _canon_frame(pd.DataFrame({"k": ["b", "a"], "v": [2, 1]}))
    _, b = _canon_frame(pd.DataFrame({"k": ["a", "b"], "v": [1, 2]}))
    assert a == b


def test_column_order_insensitive():
    _, a = _canon_frame(pd.DataFrame({"b": [1], "a": [2]}))
    _, b = _canon_frame(pd.DataFrame({"a": [2], "b": [1]}))
    assert a == b


def test_bool_not_int():
    _, a = _canon_frame(pd.DataFrame({"v": np.array([1], "int64")}))
    _, b = _canon_frame(pd.DataFrame({"v": np.array([True])}))
    assert a != b
