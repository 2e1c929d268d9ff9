"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads),
but every setting here is chosen so the same logical plans survive a
1000-executor cluster: AQE handles runtime re-planning / skew, shuffle
partitions are sized for the local box but overridable, session timezone
is pinned to UTC so timestamp semantics are environment-independent, and
ANSI mode is off so casts return NULL on failure (the reference engine's
cleaning semantics — see dags/utils/cleaning_rules.py:179-208 — treat
unparseable values as NULL/flagged, never as job failures).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "edu-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session with engine defaults.

    Defaults hold at scale: AQE coalesces the post-shuffle partition
    count at runtime, so the static ``spark.sql.shuffle.partitions``
    value only needs to be an upper bound; skew-join splitting is on so
    hot keys in big joins/aggregations re-plan instead of straggling.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        # --- planner / runtime ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Broadcast threshold: dims in this engine are small (city
        # master ≤ 21 rows, dim_courses ~10s, nation/region 25/5);
        # 64 MB keeps even sf-scaled dims broadcastable.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- semantics ---
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.timestampType", "TIMESTAMP_LTZ")
        # --- python interop: Arrow for every pandas_udf/applyInPandas ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Parquet scans: vectorized reader + pushdown are defaults, but
        # pin them so the bench environment can't silently regress.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        # The driver testdata stores events.ts as TIMESTAMP(NANOS), which
        # Spark cannot read natively; read as long and convert in the
        # source layer (sources/testdata.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
