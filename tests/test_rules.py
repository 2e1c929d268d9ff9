"""Unit vectors for the cleaning-rule Column builders.

Ports the reference's 8 pytest vectors (tests/test_cleaning_rules.py,
tests/test_transformations.py) plus the FIXTURES.md dirty variants.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from edu_data_pipeline_spark.functions import dates, rules

def REF_DATE():
    return F.lit("2026-08-13").cast("date")


def REF_TS():
    return F.lit("2026-08-13 00:00:00").cast("timestamp")


def apply_rule(spark, rule_fn, values, **kwargs):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    out = rule_fn(F.col("raw"), **kwargs)
    rows = df.select(
        out.value.alias("value"), out.is_valid.alias("is_valid"), out.note.alias("note")
    ).collect()
    return [(r.value, r.is_valid, r.note) for r in rows]


# --- C1 ---------------------------------------------------------------------


def test_standardize_student_id(spark):
    got = apply_rule(
        spark,
        rules.standardize_student_id,
        ["stu-002", "STU001", "STU_003", "stu004", "stu-1234", "nodigits", None, "007x"],
    )
    assert got[0] == ("STU002", True, "standardized")  # reference unit vector
    assert got[1] == ("STU001", True, "standardized")
    assert got[2] == ("STU003", True, "standardized")
    assert got[3] == ("STU004", True, "standardized")
    assert got[4] == ("STU1234", True, "standardized")  # zfill keeps >3 digits
    assert got[5] == (None, False, "no-digits")
    assert got[6] == (None, False, "missing")
    assert got[7] == ("STU007", True, "standardized")


# --- C2 ---------------------------------------------------------------------


def test_clean_name(spark):
    df = spark.createDataFrame(
        [("JOHN DOE",), ("jane smith",), ("  Bob  Wilson  ",), ("john123 doe",),
         ("john 123 doe",), ("123",), (None,), ("Single",)],
        "raw string",
    )
    res, first, last = rules.clean_name(F.col("raw"))
    rows = df.select(
        res.value.alias("full"), res.is_valid.alias("ok"), res.note.alias("note"),
        first.alias("first"), last.alias("last"),
    ).collect()
    assert (rows[0].full, rows[0].first, rows[0].last) == ("John Doe", "John", "Doe")
    assert (rows[1].full, rows[1].first, rows[1].last) == ("Jane Smith", "Jane", "Smith")
    assert (rows[2].full, rows[2].first, rows[2].last) == ("Bob Wilson", "Bob", "Wilson")
    assert (rows[3].full, rows[3].first, rows[3].last) == ("John Doe", "John", "Doe")
    # digits removed AFTER collapse -> double space survives (reference quirk)
    assert (rows[4].full, rows[4].first, rows[4].last) == ("John  Doe", "John", " Doe")
    assert (rows[5].full, rows[5].ok, rows[5].note) == (None, False, "empty")
    assert (rows[6].full, rows[6].ok, rows[6].note) == (None, False, "missing")
    assert (rows[7].full, rows[7].first, rows[7].last) == ("Single", "Single", "")


# --- C3 ---------------------------------------------------------------------


def test_validate_email(spark):
    got = apply_rule(
        spark,
        rules.validate_email,
        ["John@Example.com", "bad@email", "a.b@company.co.in", "thomas@invalid_email",
         "", None],
    )
    assert got[0] == ("john@example.com", True, "valid")  # reference unit vector
    assert got[1] == (None, False, "invalid-format")  # reference unit vector
    assert got[2] == ("a.b@company.co.in", True, "valid")
    assert got[3] == (None, False, "invalid-format")
    assert got[4] == (None, False, "invalid-format")
    assert got[5] == (None, False, "missing")


# --- C4 ---------------------------------------------------------------------


def test_standardize_phone(spark):
    got = apply_rule(
        spark,
        rules.standardize_phone,
        ["9876543210", "123", "+91-9876543211", "98765-43212", "+919876543213",
         "98765 43217", "+91 9876543222", None],
    )
    assert got[0] == ("+91-9876543210", True, "normalized-10")  # reference vector
    assert got[1] == (None, False, "invalid-length")  # reference vector
    assert got[2] == ("+91-9876543211", True, "normalized-12")
    assert got[3] == ("+91-9876543212", True, "normalized-10")
    assert got[4] == ("+91-9876543213", True, "normalized-12")
    assert got[5] == ("+91-9876543217", True, "normalized-10")
    assert got[6] == ("+91-9876543222", True, "normalized-12")
    assert got[7] == (None, False, "missing")


# --- C5 ---------------------------------------------------------------------


def test_parse_date(spark):
    got = apply_rule(
        spark,
        rules.parse_date,
        ["1999-05-15", "15/05/1999", "May 15, 1999", "20-12-1998", "Dec 20, 1998",
         "18-Jan-24", "15-Jan-2024", "2024/01/16", "1940-01-01", "2030-01-01",
         "01-Jan-69", None],
        ref_date=REF_DATE(),
    )
    d = datetime.date
    assert got[0] == (d(1999, 5, 15), True, "%Y-%m-%d")
    assert got[1] == (d(1999, 5, 15), True, "%d/%m/%Y")  # day-first! reference vector
    assert got[2] == (d(1999, 5, 15), True, "%B %d, %Y")
    assert got[3] == (d(1998, 12, 20), True, "%d-%m-%Y")
    # Python %B requires the FULL month name -> "Dec 20, 1998" is unparsed
    assert got[4] == (None, False, "unparsed")
    assert got[5] == (d(2024, 1, 18), True, "%d-%b-%y")
    assert got[6] == (None, False, "unparsed")  # 15-Jan-2024 matches no format
    assert got[7] == (None, False, "unparsed")  # slashes-ymd not in format list
    assert got[8] == (None, False, "too-old")
    assert got[9] == (None, False, "future-date")
    # Python %y pivot: 69 -> 1969 (Spark would say 2069); then too-old passes 1950
    assert got[10] == (d(1969, 1, 1), True, "%d-%b-%y")
    assert got[11] == (None, False, "missing")


# --- C6 ---------------------------------------------------------------------


def test_parse_date_time(spark):
    got = apply_rule(
        spark,
        rules.parse_date_time,
        ["2024-02-01T10:30:00Z", "2024-02-01T10:30:00", "2024-02-01 10:30:00",
         "2024-12-01T10:00:00+05:30", "2030-12-01T10:00:00Z", "garbage", None],
        ref_ts=REF_TS(),
    )
    dt = datetime.datetime
    assert got[0] == (dt(2024, 2, 1, 10, 30), True, "%Y-%m-%dT%H:%M:%S%z")
    assert got[1] == (dt(2024, 2, 1, 10, 30), True, "%Y-%m-%dT%H:%M:%S")
    assert got[2] == (dt(2024, 2, 1, 10, 30), True, "%Y-%m-%d %H:%M:%S")
    assert got[3] == (dt(2024, 12, 1, 4, 30), True, "%Y-%m-%dT%H:%M:%S%z")  # -> UTC
    assert got[4] == (None, False, "future-date")
    assert got[5] == (None, False, "unparsed")
    assert got[6] == (None, False, "missing")


# --- C7 ---------------------------------------------------------------------


def test_standardize_gender(spark):
    got = apply_rule(
        spark, rules.standardize_gender,
        ["Male", "F", "m", "MALE", "female", "FEMALE", "x", "", None],
    )
    assert got[0] == ("Male", True, "mapped")
    assert got[1] == ("Female", True, "mapped")
    assert got[2] == ("Male", True, "mapped")
    assert got[3] == ("Male", True, "mapped")
    assert got[4] == ("Female", True, "mapped")
    assert got[5] == ("Female", True, "mapped")
    assert got[6] == ("Other", False, "defaulted")
    assert got[7] == ("Other", False, "defaulted")
    assert got[8] == ("Other", False, "missing")


# --- C8a similarity ---------------------------------------------------------


def test_positional_similarity(spark):
    df = spark.createDataFrame(
        [("Mumabi", "Mumbai"), ("mumbai", "Mumbai"), ("Dehli", "Delhi"),
         ("", "Mumbai"), ("Pune", "Pune")],
        "a string, b string",
    )
    rows = df.select(rules.positional_similarity("a", "b").alias("sim")).collect()
    assert rows[0].sim == pytest.approx(4 / 6)  # NOT Levenshtein (would be 5/6-ish)
    assert rows[1].sim == pytest.approx(1.0)
    assert rows[2].sim == pytest.approx(3 / 5)  # d,e,i match positionally
    assert rows[3].sim == pytest.approx(0.0)
    assert rows[4].sim == pytest.approx(1.0)


# --- C9 ---------------------------------------------------------------------


def test_clean_state(spark):
    got = apply_rule(spark, rules.clean_state, ["Maharashtra", "MH", "maharashtra ", None])
    assert got[0] == ("Maharashtra", True, "normalized")
    assert got[1] == ("Mh", True, "normalized")  # titlecase of abbreviation
    assert got[2] == ("Maharashtra", True, "normalized")
    assert got[3] == (None, False, "missing")


# --- C10 --------------------------------------------------------------------


def test_clean_numeric(spark):
    got = apply_rule(
        spark, rules.clean_numeric,
        ["50000", "50,000", "₹50000", "50000.00", "-50000", "", None, "abc", "1.2.3"],
    )
    assert got[0] == (50000.0, True, "normalized")
    assert got[1] == (50000.0, True, "normalized")
    assert got[2] == (50000.0, True, "normalized")
    assert got[3] == (50000.0, True, "normalized")
    assert got[4] == (50000.0, False, "abs")
    assert got[5] == (0.0, False, "empty")
    assert got[6] == (0.0, False, "empty")
    assert got[7] == (None, False, "not-a-number")
    assert got[8] == (None, False, "not-a-number")


# --- C11 --------------------------------------------------------------------


def test_validate_score(spark):
    got = apply_rule(
        spark, rules.validate_score,
        ["105", "-10", "93.456", "NULL", "150.0", "0", "100", None],
    )
    assert got[0] == (100.0, False, "capped")  # reference unit vector
    assert got[1] == (0.0, False, "capped")  # reference unit vector
    assert got[2] == (93.46, True, "valid")
    assert got[3] == (None, False, "invalid")  # literal "NULL" string
    assert got[4] == (100.0, False, "capped")
    assert got[5] == (0.0, True, "valid")
    assert got[6] == (100.0, True, "valid")
    assert got[7] == (None, False, "missing")


# --- C12 / C13 --------------------------------------------------------------


def test_payment_status(spark):
    df = spark.createDataFrame(
        [("paid",), ("PAID",), ("pending",), ("partial",), ("refunded",), ("failed",),
         ("",), ("unknown",), (None,)],
        "raw string",
    )
    rows = df.select(
        rules.map_payment_status("raw").alias("std"),
        rules.payment_status_raw("raw").alias("title"),
    ).collect()
    assert [r.std for r in rows] == [
        "COMPLETED", "COMPLETED", "PENDING", "PARTIAL", "REFUNDED", "FAILED",
        "UNKNOWN", "UNKNOWN", "UNKNOWN",
    ]
    assert [r.title for r in rows] == [
        "Paid", "Paid", "Pending", "Partial", "Refunded", "Failed",
        "Unknown", "Unknown", "Unknown",
    ]


def test_normalize_program_id(spark):
    got = spark.createDataFrame(
        [("prog001",), ("PROG001",), ("",), (None,)], "raw string"
    ).select(rules.normalize_program_id("raw").alias("v")).collect()
    assert [r.v for r in got] == ["PROG001", "PROG001", None, None]


# --- Q ----------------------------------------------------------------------


def test_quality_score(spark):
    df = spark.createDataFrame(
        [(True, True, True), (True, False, True), (False, False, False), (None, True, True)],
        "f1 boolean, f2 boolean, f3 boolean",
    )
    rows = df.select(
        rules.quality_score(F.col("f1"), F.col("f2"), F.col("f3")).alias("q")
    ).collect()
    assert [r.q for r in rows] == [100, 90, 70, 90]


def test_quality_score_floor(spark):
    flags = [F.lit(False)] * 12
    row = spark.range(1).select(rules.quality_score(*flags).alias("q")).collect()
    assert row[0].q == 0


# --- date/transform derivations ---------------------------------------------


def test_age_and_groups(spark):
    df = spark.createDataFrame(
        [("2006-08-14",), ("2006-08-13",), ("1999-05-15",), ("2030-01-01",), (None,)],
        "dob string",
    ).select(F.col("dob").cast("date").alias("dob"))
    rows = df.select(
        dates.derive_age("dob", ref_date=REF_DATE()).alias("age")
    ).collect()
    assert [r.age for r in rows] == [19, 20, 27, 0, None]  # future dob floors at 0

    groups = spark.createDataFrame(
        [(20,), (24,), (33,), (40,), (22,), (27,), (35,), (None,)], "age int"
    ).select(dates.age_group("age").alias("g")).collect()
    assert [r.g for r in groups] == [
        "18-22", "23-27", "28-35", "35+", "18-22", "23-27", "28-35", None,
    ]  # reference unit vector: 20/24/33/40


def test_enrollment_fields_and_date_key(spark):
    df = spark.createDataFrame([("2023-05-10",)], "d string").select(
        F.col("d").cast("date").alias("d")
    )
    fields = dates.enrollment_fields("d")
    row = df.select(
        fields["enrollment_month"].alias("m"),
        fields["enrollment_year"].alias("y"),
        fields["enrollment_quarter"].alias("q"),
        dates.date_key("d").alias("dk"),
    ).collect()[0]
    assert (row.m, row.y, row.q, row.dk) == (5, 2023, 2, 20230510)  # May -> Q2


def test_derive_enrollment_status(spark):
    df = spark.createDataFrame(
        [
            ("COMPLETED", True, "2026-08-10 00:00:00"),
            ("PENDING", False, None),
            ("COMPLETED", False, None),
            ("COMPLETED", False, "2026-04-01 00:00:00"),  # 134d -> CHURNED
            ("COMPLETED", False, "2026-07-01 00:00:00"),  # 43d -> INACTIVE
            ("PENDING", False, "2026-08-10 00:00:00"),  # recent but unpaid
            ("COMPLETED", False, "2026-08-10 00:00:00"),  # recent + paid
        ],
        "status string, recent boolean, last string",
    ).withColumn("last", F.col("last").cast("timestamp"))
    rows = df.select(
        dates.derive_enrollment_status(
            "status", F.col("recent"), F.col("last"), ref_ts=REF_TS()
        ).alias("s")
    ).collect()
    assert [r.s for r in rows] == [
        "ACTIVE", "PENDING", "INACTIVE", "CHURNED", "INACTIVE", "PENDING", "ACTIVE",
    ]
