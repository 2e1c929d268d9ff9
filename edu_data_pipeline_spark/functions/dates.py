"""Date/derivation scalar functions (reference dags/utils/transformations.py
and dags/utils/db.py:68-112 / init_db/init_schema.sql:598-624).

All "today"-dependent logic takes an injectable reference date so results
are deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def derive_age(dob: Column | str, ref_date: Column | None = None) -> Column:
    """Whole-year age, floored at 0 (transformations.py:9-14).

    Python computes ``today.year - dob.year - ((today.month, today.day) <
    (dob.month, dob.day))``; replicated with explicit month/day compares.
    """
    d = F.col(dob) if isinstance(dob, str) else dob
    today = ref_date if ref_date is not None else F.current_date()
    not_yet = (
        (F.month(today) < F.month(d))
        | ((F.month(today) == F.month(d)) & (F.dayofmonth(today) < F.dayofmonth(d)))
    ).cast("int")
    years = F.year(today) - F.year(d) - not_yet
    return F.when(d.isNotNull(), F.greatest(years, F.lit(0)))


def age_group(age: Column | str) -> Column:
    """Buckets <=22, <=27, <=35, 35+ (transformations.py:17-26)."""
    a = F.col(age) if isinstance(age, str) else age
    return (
        F.when(a.isNull(), F.lit(None).cast("string"))
        .when(a <= 22, "18-22")
        .when(a <= 27, "23-27")
        .when(a <= 35, "28-35")
        .otherwise("35+")
    )


def enrollment_fields(enrollment_date: Column | str) -> dict[str, Column]:
    """month / year / quarter=ceil(m/3) (transformations.py:29-37)."""
    d = F.col(enrollment_date) if isinstance(enrollment_date, str) else enrollment_date
    return {
        "enrollment_month": F.month(d),
        "enrollment_year": F.year(d),
        "enrollment_quarter": F.quarter(d),
    }


def date_key(d: Column | str) -> Column:
    """``y*10000 + m*100 + d`` integer key (db.py:68-69, init_schema.sql:619-624)."""
    c = F.col(d) if isinstance(d, str) else d
    return (
        F.year(c) * 10000 + F.month(c) * 100 + F.dayofmonth(c)
    ).cast("int")


def derive_enrollment_status(
    payment_status: Column | str,
    has_recent_activity: Column,
    last_activity: Column,
    ref_ts: Column | None = None,
) -> Column:
    """ACTIVE / PENDING / INACTIVE / CHURNED (transformations.py:45-57).

    Caller quirk preserved at the pipeline level (the reference DAG passes
    ``has_recent_activity=True, last_activity=now`` so output collapses to
    ACTIVE/PENDING — dags/data_transformation_pipeline.py:42-45); this
    function implements the full branch structure.
    """
    p = F.col(payment_status) if isinstance(payment_status, str) else payment_status
    now = ref_ts if ref_ts is not None else F.current_timestamp()
    days_since = F.datediff(now.cast("date"), last_activity.cast("date"))
    completed = p == "COMPLETED"
    return (
        F.when(completed & has_recent_activity, "ACTIVE")
        .when(last_activity.isNull() & ~completed, "PENDING")
        .when(last_activity.isNull(), "INACTIVE")
        .when(days_since >= 90, "CHURNED")
        .when(days_since >= 30, "INACTIVE")
        .when(~completed, "PENDING")
        .otherwise("ACTIVE")
    )
