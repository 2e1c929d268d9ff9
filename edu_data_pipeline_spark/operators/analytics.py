"""Analytics layer: the reference's 4 views + the daily-metrics gold job.

Views from init_db/init_schema.sql:445-534, re-expressed as DataFrame
builders. The correlated scalar subqueries in v_student_360
(init_schema.sql:468-469) are de-correlated into one grouped aggregate +
broadcastable left join — exactly the plan Catalyst's subquery
decorrelation would produce (SURVEY §2.4 J7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.dates import date_key


def v_student_360(dim_students: DataFrame, fact_tickets: DataFrame) -> DataFrame:
    """analytics.v_student_360 (init_schema.sql:450-470)."""
    ticket_counts = fact_tickets.groupBy("student_sk").agg(
        F.count(F.lit(1)).alias("total_tickets"),
        F.count(F.when(F.col("status") == "Open", 1)).alias("open_tickets"),
    )
    passthrough = [
        "student_id", "full_name", "email", "phone", "age", "age_group", "city",
        "state", "enrollment_date", "enrollment_status", "payment_status",
        "fee_paid", "total_courses_enrolled", "total_time_spent_hours",
        "avg_score", "last_activity_date", "days_since_last_activity",
        "ai_risk_score", "ai_risk_category", "quality_score",
    ]
    joined = dim_students.join(ticket_counts, "student_sk", "left")
    return joined.select(
        *passthrough,
        F.coalesce(F.col("total_tickets"), F.lit(0)).alias("total_tickets"),
        F.coalesce(F.col("open_tickets"), F.lit(0)).alias("open_tickets"),
    )


def v_course_performance(
    dim_courses: DataFrame, fact_enrollments: DataFrame
) -> DataFrame:
    """analytics.v_course_performance (init_schema.sql:473-487)."""
    joined = dim_courses.join(fact_enrollments, "course_sk", "left")
    return joined.groupBy(
        "course_sk", "course_id", "course_name", "category", "difficulty", "price"
    ).agg(
        F.count_distinct(F.col("student_sk")).alias("total_enrollments"),
        F.sum(F.col("fee_paid")).alias("total_revenue"),
        F.avg(F.col("completion_percentage")).alias("avg_completion_rate"),
        F.avg(F.col("avg_score")).alias("avg_student_score"),
        (F.sum(F.col("total_time_spent_minutes")) / 60.0).alias("total_hours_spent"),
    ).drop("course_sk")


def v_daily_dashboard(fact_daily_metrics: DataFrame, dim_date: DataFrame) -> DataFrame:
    """analytics.v_daily_dashboard (init_schema.sql:490-507)."""
    return (
        fact_daily_metrics.join(dim_date, "date_key")
        .select(
            "full_date", "day_name", "month_name", "year",
            "total_active_students", "new_enrollments", "students_at_risk",
            "total_events", "total_time_spent_hours", "new_tickets",
            "resolved_tickets", "negative_sentiment_count", "avg_data_quality_score",
        )
        .orderBy(F.desc("full_date"))
    )


def v_ai_insights(dim_students: DataFrame, fact_tickets: DataFrame) -> DataFrame:
    """analytics.v_ai_insights (init_schema.sql:510-534): three labelled
    conditional counts glued by UNION ALL."""
    high_risk = dim_students.where(F.col("ai_risk_score") > 70).agg(
        F.lit("High Risk Students").alias("metric_name"),
        F.count(F.lit(1)).alias("metric_value"),
        F.lit("Students with risk score > 70").alias("description"),
    )
    negative = fact_tickets.where(
        F.col("ai_sentiment").isin("Negative", "Very Negative")
    ).agg(
        F.lit("Negative Sentiment Tickets").alias("metric_name"),
        F.count(F.lit(1)).alias("metric_value"),
        F.lit("Tickets with negative sentiment").alias("description"),
    )
    low_quality = dim_students.where(F.col("quality_score") < 60).agg(
        F.lit("Low Quality Records").alias("metric_name"),
        F.count(F.lit(1)).alias("metric_value"),
        F.lit("Student records with quality score < 60").alias("description"),
    )
    return high_risk.unionByName(negative).unionByName(low_quality)


def fact_daily_metrics(
    fact_progress: DataFrame,
    fact_enrollments: DataFrame,
    fact_tickets: DataFrame,
) -> DataFrame:
    """A6 gold job — the reference DECLARES fact_daily_metrics
    (init_schema.sql:409-437) but never populates it; this is the
    declared-capability build (SURVEY §2.5 A6). Grain: date_key.
    """
    progress_daily = fact_progress.groupBy("date_key").agg(
        F.count_distinct("student_sk").alias("total_active_students"),
        F.count(F.lit(1)).alias("total_events"),
        (F.sum(F.coalesce(F.col("duration_seconds"), F.lit(0))) / 3600.0).alias(
            "total_time_spent_hours"
        ),
        F.avg(F.col("quality_score").cast("double")).alias("avg_data_quality_score"),
    )
    enroll_daily = fact_enrollments.groupBy("date_key").agg(
        F.count(F.lit(1)).alias("new_enrollments")
    )
    tickets_daily = fact_tickets.groupBy("date_key").agg(
        F.count(F.lit(1)).alias("new_tickets"),
        F.count(F.when(F.col("status").isin("Resolved", "Closed"), 1)).alias(
            "resolved_tickets"
        ),
        F.count(F.when(F.col("ai_sentiment") == "Negative", 1)).alias(
            "negative_sentiment_count"
        ),
    )
    return (
        progress_daily.join(enroll_daily, "date_key", "full_outer")
        .join(tickets_daily, "date_key", "full_outer")
        .na.fill(
            0,
            [
                "total_active_students", "total_events", "new_enrollments",
                "new_tickets", "resolved_tickets", "negative_sentiment_count",
            ],
        )
        # the reference schema declares students_at_risk but nothing in the
        # reference computes it; populated by a dim join in callers that
        # have risk scores, defaulted here
        .withColumn("students_at_risk", F.lit(0))
    )
