"""Warehouse layer: date dimension, surrogate keys, dims/facts, merge-upsert.

Mirrors the reference's star schema (init_db/init_schema.sql:236-437) and
the transformation DAG (dags/data_transformation_pipeline.py), Spark-first:

- dim_date is generated with ``sequence()`` + ``explode`` using the SQL
  seed's semantics (init_schema.sql:598-613) — Postgres ``EXTRACT(DOW)``
  numbering (0=Sunday), ISO week, weekend = DOW in (0,6). The reference's
  Python path (db.py:79-92) disagrees on numbering; the SQL-seeded table is
  what actually populates the warehouse, so it is canonical (SURVEY §2.7).
- Surrogate keys: the reference uses Postgres SERIAL. At 100 TB a global
  ``row_number()`` is a single-partition bottleneck, so the default SK is
  ``xxhash64(natural key)`` (deterministic, shuffle-free, join-colocatable);
  ``dense=True`` gives contiguous SKs for small-dim parity tests.
- Upserts: the reference's ``INSERT .. ON CONFLICT DO UPDATE``
  (db.py:45-65) becomes a key-based merge: in-batch last-write-wins dedup,
  then target-minus-updates anti-join + union. With Delta available this
  would be ``MERGE INTO``; the parquet fallback is semantically identical.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.dates import date_key


def build_dim_date(
    spark: SparkSession, start: str = "2020-01-01", end: str = "2026-12-31"
) -> DataFrame:
    """Generate the date dimension (init_schema.sql:598-613; 2557 rows default)."""
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"), F.lit(end).cast("date"), F.expr("interval 1 day")
            )
        ).alias("full_date")
    )
    dow = F.dayofweek("full_date") - 1  # Postgres DOW: 0=Sunday..6
    return days.select(
        date_key("full_date").alias("date_key"),
        F.col("full_date"),
        dow.alias("day_of_week"),
        F.date_format("full_date", "EEEE").alias("day_name"),
        F.dayofmonth("full_date").alias("day_of_month"),
        F.weekofyear("full_date").alias("week_of_year"),
        F.month("full_date").alias("month_number"),
        F.date_format("full_date", "MMMM").alias("month_name"),
        F.quarter("full_date").alias("quarter"),
        F.year("full_date").alias("year"),
        dow.isin(0, 6).alias("is_weekend"),
    )


def with_surrogate_key(
    df: DataFrame, natural_key: str, sk_name: str, dense: bool = False
) -> DataFrame:
    """Assign a surrogate key for ``natural_key``.

    Default: ``xxhash64`` of the natural key — deterministic and fully
    parallel (the scale path). ``dense=True``: ``row_number()`` ordered by
    the natural key — contiguous like SERIAL, but serializes one window
    (fine for dimension tables, wrong for facts).
    """
    if dense:
        w = Window.orderBy(natural_key)
        return df.withColumn(sk_name, F.row_number().over(w).cast("long"))
    return df.withColumn(sk_name, F.xxhash64(F.col(natural_key)))


def sk_lookup(dim: DataFrame, natural_key: str, sk_name: str) -> DataFrame:
    """J1/J2 (dags/data_transformation_pipeline.py:132-139): broadcastable
    ``{natural_key -> sk}`` mapping."""
    return dim.select(natural_key, sk_name)


def attach_sk(
    fact: DataFrame, dim: DataFrame, natural_key: str, sk_name: str
) -> DataFrame:
    """Left broadcast join replicating the reference's dict ``.get()``
    (miss -> NULL sk)."""
    return fact.join(
        F.broadcast(sk_lookup(dim, natural_key, sk_name)), natural_key, "left"
    )


def merge_upsert(
    target: DataFrame | None,
    updates: DataFrame,
    keys: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """Keyed upsert semantics of db.py:45-65.

    In-batch dedup on the conflict keys (LAST write wins, matching the
    dict-overwrite at db.py:49-57), then replace matching target rows.
    NULLs in conflict keys use null-safe equality (``<=>``) — the
    documented fix for the reference's degenerate NULL-key upsert
    (SURVEY §7 hard-part 6).
    """
    # MATERIALIZED struct partition key (r14, the bucketed_running_sum
    # precedent): a struct of the key columns is never NULL at the top
    # level and struct equality compares NULL fields as equal, so
    # partitioning on it groups rows exactly like the <=> conjunction
    # (the documented NULL-key upsert fix). The row-order path is
    # unaffected: monotonically_increasing_id is projected below the
    # single window exchange, so each row's id (and therefore the
    # per-key winner among update rows) is fixed before any
    # partitioning decision; unioning the target in only shifts every
    # update partition's id by a constant, preserving relative order.
    kc = "_mu_k"
    cc = "_mu_c"  # 1 = update row, 0 = target row
    reserved = {kc, cc, "__rn", "__hc"}
    cols = set(updates.columns) | (set(target.columns) if target is not None else set())
    clash = sorted(reserved & cols)
    if clash:
        raise ValueError(
            f"merge_upsert: input columns collide with reserved internal "
            f"name(s) {clash}; rename before calling"
        )
    order_expr = (
        F.desc(order_col) if order_col else F.monotonically_increasing_id().desc()
    )
    tagged = updates.withColumn(kc, F.struct(*keys))
    if target is None:
        w = Window.partitionBy(kc).orderBy(order_expr)
        return (
            tagged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", kc)
        )
    # SINGLE-EXCHANGE union fold (r15, VERDICT r14 #4; see apply_cdc for
    # the full rationale): the r14 shape consumed the deduped feed twice
    # (anti-join probe + survivor union) with divergent column pruning,
    # so the updates subtree was evaluated and shuffled twice. Target
    # rows sort below every update row (cc descending first), so per
    # key the row_number-1 row is the winning update when one exists
    # and the per-key max(cc) marker says whether target rows survive —
    # duplicate-key targets keep ALL rows, exactly like the anti-join.
    t_rows = target.withColumn(kc, F.struct(*keys)).withColumn(cc, F.lit(0))
    # NULL-pad update-only columns (e.g. order_col) on the target side so
    # the union carries the full update schema through the window
    for f in updates.schema.fields:
        if f.name not in target.columns:
            t_rows = t_rows.withColumn(f.name, F.lit(None).cast(f.dataType))
    all_rows = t_rows.unionByName(tagged.withColumn(cc, F.lit(1)))
    wk = Window.partitionBy(kc)
    w = wk.orderBy(F.desc(cc), order_expr)
    flagged = all_rows.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__hc", F.max(cc).over(wk)
    )
    kept = flagged.where(
        ((F.col(cc) == 1) & (F.col("__rn") == 1))
        | ((F.col(cc) == 0) & (F.col("__hc") == 0))
    )
    return kept.select(*target.columns)


class ParquetMergeWriter:
    """MERGE-style writer over a parquet directory (Delta-less fallback).

    Write path: read current target (if any) -> merge_upsert -> write to a
    staging dir -> atomic-ish swap. Good enough for single-writer batch
    jobs; a real deployment swaps this class for Delta ``MERGE INTO``
    without touching callers.
    """

    def __init__(self, spark: SparkSession, path: str, keys: list[str]):
        self.spark = spark
        self.path = path
        self.keys = keys

    def read(self) -> DataFrame | None:
        if not os.path.exists(self.path):
            return None
        return self.spark.read.parquet(self.path)

    def merge(self, updates: DataFrame, order_col: str | None = None) -> int:
        # The merged plan reads the current target lazily; writing to the
        # staging dir executes that read BEFORE the old dir is removed, so
        # no driver-side materialization is needed.
        merged = merge_upsert(self.read(), updates, self.keys, order_col=order_col)
        tmp = f"{self.path}__tmp_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(self.path):
            shutil.rmtree(self.path)
        os.rename(tmp, self.path)
        return self.spark.read.parquet(self.path).count()


def build_fact_progress(
    stg_progress: DataFrame, dim_students: DataFrame, dim_courses: DataFrame
) -> DataFrame:
    """fact_student_progress (dags/data_transformation_pipeline.py:142-181)."""
    fact = attach_sk(stg_progress, dim_students, "student_id", "student_sk")
    fact = attach_sk(fact, dim_courses, "course_id", "course_sk")
    return fact.select(
        "student_sk",
        "course_sk",
        date_key(F.col("event_timestamp").cast("date")).alias("date_key"),
        "event_id",
        "event_type",
        "module_id",
        F.col("duration_seconds"),
        F.col("score"),
        F.col("completion_percentage"),
        F.col("event_timestamp"),
        F.col("quality_score"),
    )


def build_fact_tickets(stg_tickets: DataFrame, dim_students: DataFrame) -> DataFrame:
    """fact_support_tickets (dags/data_transformation_pipeline.py:184-227);
    resolution_time_hours left NULL exactly like the reference (:218)."""
    fact = attach_sk(stg_tickets, dim_students, "student_id", "student_sk")
    return fact.select(
        "student_sk",
        date_key(F.col("created_date")).alias("date_key"),
        "ticket_id",
        "subject",
        "description",
        "priority",
        "status",
        "category",
        "created_date",
        "resolved_date",
        F.lit(None).cast("double").alias("resolution_time_hours"),
        "quality_score",
    )


def build_fact_enrollments(
    stg_students: DataFrame, dim_students: DataFrame, dim_courses: DataFrame | None = None
) -> DataFrame:
    """fact_enrollments (dags/data_transformation_pipeline.py:239-279).

    The reference zeroes the progress measures and has no course linkage
    (course_sk NULL — which degrades its Postgres upsert to a single row;
    BASELINE.md). We keep course_sk NULL for parity but merge with
    null-safe keys so every student row survives.
    """
    fact = attach_sk(stg_students, dim_students, "student_id", "student_sk")
    return fact.select(
        "student_sk",
        F.lit(None).cast("long").alias("course_sk"),
        date_key(F.col("enrollment_date")).alias("date_key"),
        F.col("enrollment_date"),
        F.col("fee_paid"),
        F.col("payment_status"),
        F.lit(0.0).alias("completion_percentage"),
        F.lit(None).cast("double").alias("avg_score"),
        F.lit(0).alias("total_time_spent_minutes"),
    )


def scd2_apply(
    current: DataFrame | None,
    updates: DataFrame,
    keys: list[str],
    tracked_cols: list[str],
    batch_ts: Column,
    far_future: str = "9999-12-31 00:00:00",
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge (history-keeping upsert).

    Extends the reference's last-write-wins upsert (db.py:45-65) with
    version history: instead of overwriting a changed dimension row, the
    open version is CLOSED (``valid_to`` = batch_ts, ``is_current`` =
    false) and a new open version is appended. Unchanged rows pass
    through untouched; brand-new keys open their first version.

    Columns added/managed: ``valid_from``, ``valid_to``, ``is_current``.
    Change detection compares ``tracked_cols`` null-safely.

    Scale: one co-partitioned join of open versions against the update
    batch (both keyed on the natural key) plus a union — the same
    shuffle family as merge_upsert; history rows (is_current = false)
    are never read by the join, so the working set stays at one row per
    live key regardless of history depth. On Delta this maps to the
    two-action MERGE (update-close + insert) with identical semantics.
    """
    far = F.lit(far_future).cast("timestamp")
    fresh = updates.withColumn("valid_from", batch_ts).withColumn(
        "valid_to", far
    ).withColumn("is_current", F.lit(True))
    if current is None:
        return fresh

    open_rows = current.where(F.col("is_current"))
    closed_rows = current.where(~F.col("is_current"))

    # Side-presence after the full-outer join is probed through columns
    # that are never NULL on their own side — is_current (always true on
    # an open row) and a literal marker on the update side. Probing
    # through keys[0] IS NOT NULL (the pre-r12 shape) misread every
    # legitimately-NULL key as "side absent": a NULL-key update could
    # never open a version and an existing NULL-key open version was
    # silently dropped by the next load, even though the join condition
    # itself was already null-safe. Found by the r12 randomized
    # warehouse properties (tests/test_warehouse_properties.py).
    # The marker name is derived to be absent from the caller's columns:
    # a fixed "__upd_present" would silently overwrite (and then drop) a
    # caller column of the same name, corrupting the opened versions'
    # payload (ADVICE r12 #4).
    marker = "__upd_present"
    while marker in updates.columns:
        marker = "_" + marker
    upd_marked = updates.withColumn(marker, F.lit(True))

    cond = None
    for k in keys:
        clause = open_rows[k].eqNullSafe(upd_marked[k])
        cond = clause if cond is None else (cond & clause)

    changed = None
    for c in tracked_cols:
        diff = ~open_rows[c].eqNullSafe(upd_marked[c])
        changed = diff if changed is None else (changed | diff)

    joined = open_rows.alias("cur").join(upd_marked.alias("upd"), cond, "full_outer")
    upd_key_present = F.col(f"upd.{marker}").isNotNull()
    cur_key_present = F.col("cur.is_current").isNotNull()

    # 1. open rows whose key is absent from the batch, or matched-unchanged
    untouched = joined.where(
        cur_key_present & (~upd_key_present | ~F.coalesce(changed, F.lit(False)))
    ).select("cur.*")
    # 2. matched-and-changed open rows -> closed
    closed_now = (
        joined.where(cur_key_present & upd_key_present & F.coalesce(changed, F.lit(False)))
        .select("cur.*")
        .withColumn("valid_to", batch_ts)
        .withColumn("is_current", F.lit(False))
    )
    # 3. new versions: changed keys + brand-new keys
    opened = (
        joined.where(
            upd_key_present & (~cur_key_present | F.coalesce(changed, F.lit(False)))
        )
        .select("upd.*")
        .drop(marker)
        .withColumn("valid_from", batch_ts)
        .withColumn("valid_to", far)
        .withColumn("is_current", F.lit(True))
    )
    cols = closed_rows.columns
    return (
        closed_rows.unionByName(untouched.select(*cols))
        .unionByName(closed_now.select(*cols))
        .unionByName(opened.select(*cols))
    )


class DeltaMergeWriter:
    """Delta Lake MERGE writer — the production swap-in for
    ParquetMergeWriter (reference upsert semantics db.py:45-65 as a real
    ``MERGE INTO``).

    The sandbox has no delta-spark package, so construction degrades to
    unavailable rather than failing the import; callers check
    ``available`` (mirrors kafka_io.kafka_available). The merge body is
    the exact call-site shape a Delta deployment runs — in-batch
    last-write-wins dedup first (MERGE requires unique source keys),
    then update-all/insert-all with null-safe key equality.
    """

    def __init__(self, spark: SparkSession, path: str, keys: list[str]):
        self.spark = spark
        self.path = path
        self.keys = keys
        try:  # pragma: no cover - package absent in this environment
            from delta.tables import DeltaTable  # noqa: F401

            self._delta_table_cls = DeltaTable
        except ImportError:
            self._delta_table_cls = None

    @property
    def available(self) -> bool:
        return self._delta_table_cls is not None

    def merge(self, updates: DataFrame, order_col: str | None = None) -> None:
        """MERGE INTO target USING deduped-updates ON null-safe keys."""
        if not self.available:
            raise RuntimeError(
                "delta-spark is not installed; use ParquetMergeWriter "
                "(identical merge semantics over parquet)"
            )
        # pragma: no cover start - exercised only on Delta deployments
        DeltaTable = self._delta_table_cls
        w = Window.partitionBy(*self.keys).orderBy(
            F.desc(order_col) if order_col else F.monotonically_increasing_id().desc()
        )
        deduped = (
            updates.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        if not DeltaTable.isDeltaTable(self.spark, self.path):
            deduped.write.format("delta").mode("overwrite").save(self.path)
            return
        target = DeltaTable.forPath(self.spark, self.path)
        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in self.keys)
        (
            target.alias("t")
            .merge(deduped.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        # pragma: no cover end
