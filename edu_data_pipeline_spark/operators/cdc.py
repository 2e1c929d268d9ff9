"""CDC application: fold an insert/update/delete change feed into a
snapshot.

The reference's upserts (``dags/utils/db.py:45-65``) cover I and U;
real change feeds (Debezium-style) also carry deletes and multiple
changes per key per batch. ``apply_cdc`` is the full fold, Spark-first:

1. last-change-wins per key — one window over (key, change order), the
   same in-batch rule as the reference's dict-overwrite dedup;
2. delete wins by being the last op, not by a separate pass;
3. one anti-join + union against the snapshot — identical shuffle shape
   to ``merge_upsert``, so swapping in Delta ``MERGE ... WHEN MATCHED
   DELETE`` changes the writer, not the plan shape.

Idempotent per batch: applying the same change feed twice yields the
same snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["apply_cdc"]

OP_COL = "_op"  # 'I' | 'U' | 'D'


def apply_cdc(
    snapshot: DataFrame | None,
    changes: DataFrame,
    keys: list[str],
    order_col: str,
) -> DataFrame:
    """Return the new snapshot after applying ``changes``.

    ``changes`` carries the payload columns plus ``_op`` and
    ``order_col`` (change sequence — LSN, offset, or timestamp).
    ``snapshot`` may be None (initial load from a feed that starts with
    inserts)."""
    # MATERIALIZED struct partition/join key (r14, the
    # bucketed_running_sum precedent): the dedup window and the snapshot
    # anti-join cluster on the same logical key, but an eqNullSafe join
    # re-keys the SMJ on coalesce/isnull pairs that never match the
    # window exchange's hashpartitioning — the change feed shuffled
    # TWICE on the forced-SMJ (production) path. A struct of the key
    # columns is never NULL at the top level and struct equality
    # compares NULL fields as equal (probed in-tree), so it is exactly
    # as null-safe as the <=> conjunction it replaces; materializing it
    # as a named column and name-joining on it (rather than joining on
    # a fresh struct expression) is what lets EnsureRequirements see
    # both sides hash the SAME attribute and skip the re-shuffle
    # (plan evidence: plans/r14/cdc_snapshot_fold_*).
    kc = "_cdc_k"
    if kc in changes.columns or (snapshot is not None and kc in snapshot.columns):
        raise ValueError(
            f"apply_cdc: input columns collide with reserved internal "
            f"name {kc!r}; rename before calling"
        )
    tagged = changes.withColumn(kc, F.struct(*keys))
    w = Window.partitionBy(kc).orderBy(F.desc(order_col))
    latest = (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    survivors = latest.where(F.col(OP_COL) != "D").drop(OP_COL, order_col, kc)
    if snapshot is None:
        return survivors
    touched = latest.select(kc)
    # Null-safe anti-join via the materialized struct key, matching
    # merge_upsert: with plain per-column name-equality a NULL key never
    # matches, so a NULL-key update DUPLICATED the row (old snapshot row
    # survived the anti-join AND the survivor was unioned in) and a
    # NULL-key delete was silently ignored — the degenerate NULL-key
    # upsert documented and fixed for merge_upsert (SURVEY §7 hard-part
    # 6), found here by the r12 randomized warehouse properties.
    untouched = (
        snapshot.withColumn(kc, F.struct(*keys))
        .join(touched, on=[kc], how="left_anti")
        .drop(kc)
    )
    return untouched.unionByName(survivors)
