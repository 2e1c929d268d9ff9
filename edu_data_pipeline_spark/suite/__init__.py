"""Query suite: every SURVEY §2 operator as a named (spark_fn, oracle_sql) pair.

The driver contract (``__spark_entry__.py``) exposes ``queries()`` and
``oracle_sql()`` from this registry. Each entry:

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation.
- ``oracle`` — equivalent ANSI SQL for DuckDB over the same parquet tables
  (views pre-registered by the driver), or ``None`` for genuinely
  non-SQL-expressible operators (weaker rows-only check).

Column names are aligned on both sides (the driver sorts columns by name
before value-hashing); float aggregates are rounded identically on both
sides to keep the hash stable.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class SuiteEntry:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


REGISTRY: dict[str, SuiteEntry] = {}

# Runtime confs the queries depend on, applied defensively because the
# DRIVER calls queries() with its own SparkSession (which may have Spark 4
# defaults: ANSI on, local timezone, no nanos support):
# - nanosAsLong: events.ts is TIMESTAMP(NANOS) parquet
# - UTC session tz: deterministic timestamp/date semantics
# - ansi off: cleaning rules rely on NULL-on-bad-cast (reference behavior)
REQUIRED_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
    # keep bare cast('timestamp') = TIMESTAMP_LTZ even if a caller session
    # flipped the default timestamp type (ADVICE r2)
    "spark.sql.timestampType": "TIMESTAMP_LTZ",
}


def ensure_session_confs(spark: SparkSession) -> None:
    for key, value in REQUIRED_RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # conf not recognized on some builds: proceed


# ---------------------------------------------------------------------------
# Cache lifecycle (VERDICT r4 #2/#6, r7 #2): the registries and the
# tracked-checkpoint machinery live in edu_data_pipeline_spark.caches
# (operators need them too, and operators must not import the suite);
# re-exported here because every harness and suite module imports them
# from this package.
# ---------------------------------------------------------------------------

from ..caches import (  # noqa: F401,E402
    _TRACKED_CACHES,
    local_checkpoint,
    persist_tracked,
    release_caches,
    track_checkpoint,
)


def register(name: str, oracle: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str):
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = SuiteEntry(name, wrapped, oracle)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Deterministic float aggregates.
#
# Two divergence sources are closed here:
# 1. A sum of doubles is order-dependent (Spark partial aggregation vs
#    DuckDB's sequential scan) -> both engines sum exact DECIMAL(28,10).
# 2. A DIRECT double->decimal cast itself diverges by 1 ULP for some
#    doubles (DuckDB rounds the decimal string, Spark rounds the binary
#    value), which resurfaces in averages that land exactly on a rounding
#    boundary. So quantization goes through the STRING repr: both engines
#    print identical shortest reprs for this value range (verified over
#    every testdata float column) and both round string->decimal half-up.
# ---------------------------------------------------------------------------

DEC = "decimal(28,10)"


def _dec(col, exact2: bool = False):
    """String-route quantization; ``exact2`` takes the direct (cheaper)
    cast at scale 2, valid ONLY for columns whose values are exactly
    k/100 (raw money columns). At scale 2 the rounding increment is
    0.005, far above the double's half-ulp for any |value| < ~2^45, so
    both engines land on exactly k/100 with no tie. (A scale-10 direct
    cast is NOT safe: above 2^19 the half-ulp exceeds 0.5e-10 and Spark
    — which rounds the shortest string repr — diverges from DuckDB —
    which rounds the binary value — e.g. 524288.07.) Products/derived
    doubles must stay on the string route."""
    if exact2:
        return col.cast("decimal(28,2)")
    return col.cast("string").cast(DEC)


def dround(col, scale: int):
    """Deterministic rounding of a double: engines disagree on round()
    itself at exact half boundaries (Spark rounds the shortest decimal
    repr half-up, DuckDB rounds the scaled binary value), so rounding also
    goes string -> decimal(38,scale) -> double."""
    return col.cast("string").cast(f"decimal(38,{scale})").cast("double")


def dsum(col, scale: int = 2, exact2: bool = False):
    """Deterministic rounded sum of a double column (Spark side)."""
    from pyspark.sql import functions as F

    return dround(F.sum(_dec(col, exact2)).cast("double"), scale)


def davg(col, scale: int = 4, exact2: bool = False):
    """Deterministic rounded average (exact decimal sum / non-null count)."""
    from pyspark.sql import functions as F

    return dround(F.sum(_dec(col, exact2)).cast("double") / F.count(col), scale)


def cents(col, prec: int = 12):
    """Exact decimal view of a double holding k/100 money values (same
    scale-2 validity argument as ``_dec(exact2=True)``: tie-free for
    |value| < ~2^45). Products of such decimals
    stay exact while total precision fits 38, so derived amounts like
    ``price * (1 - disc)`` can sum without the string-route quantization —
    and the decimal accumulator cannot overflow at any realistic scale
    (vs scaled-long sums, which wrap past ~2^63)."""
    return col.cast(f"decimal({prec},2)")


def dsum_exact(dec_col, scale: int = 2):
    """Rounded sum of an already-exact decimal expression (Spark side)."""
    from pyspark.sql import functions as F

    return dround(F.sum(dec_col).cast("double"), scale)


def davg_exact(dec_col, count_col, scale: int = 4):
    """Rounded mean of an already-exact decimal expression (Spark side)."""
    from pyspark.sql import functions as F

    return dround(F.sum(dec_col).cast("double") / F.count(count_col), scale)


def sql_cents(expr: str, prec: int = 12) -> str:
    """DuckDB twin of :func:`cents`."""
    return f"CAST({expr} AS DECIMAL({prec},2))"


def sql_dsum_exact(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`dsum_exact`."""
    return sql_dround(f"CAST(sum({expr}) AS DOUBLE)", scale)


def sql_davg_exact(expr: str, count_expr: str, scale: int = 4) -> str:
    """DuckDB twin of :func:`davg_exact`."""
    return sql_dround(f"CAST(sum({expr}) AS DOUBLE) / count({count_expr})", scale)


def _sql_dec(expr: str, exact2: bool = False) -> str:
    if exact2:
        return f"CAST({expr} AS DECIMAL(28,2))"
    return f"CAST(CAST({expr} AS VARCHAR) AS DECIMAL(28,10))"


def sql_dround(expr: str, scale: int) -> str:
    """DuckDB twin of :func:`dround`.

    The half-ulp guard (r14 parity-fuzz find) works around a DuckDB
    VARCHAR→DECIMAL quirk: for |x| < 10^-scale DuckDB's parser rounds by
    the first SIGNIFICANT digit regardless of exponent, so e.g.
    '7.6e-06' → DECIMAL(38,4) gives 0.0001 where the correct half-up
    answer (and Spark's BigDecimal route) is 0.0000 — probed: 5e-06 and
    9.9e-08 round UP while the larger 4.9e-05 rounds down. Anything
    strictly below half an output ulp must round to zero, so snap it
    before the string trip; NULL and the exact-boundary doubles keep the
    ELSE path (shortest-repr tie semantics unchanged — Spark agrees
    there). A no-op wherever the sweep was already green. The same quirk
    exists inside the per-row DECIMAL(28,10) sum casts at |x| < 1e-10,
    bounded at a half-ulp of scale 10 per row — invisible at the output
    scales for any realistic row count, so left alone.
    """
    return (
        f"CASE WHEN abs(({expr})) < 0.5e-{scale} THEN 0.0 "
        f"ELSE CAST(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,{scale})) "
        f"AS DOUBLE) END"
    )


def sql_dsum(expr: str, scale: int = 2, exact2: bool = False) -> str:
    """DuckDB twin of :func:`dsum`."""
    return sql_dround(f"CAST(sum({_sql_dec(expr, exact2)}) AS DOUBLE)", scale)


def sql_davg(expr: str, scale: int = 4, exact2: bool = False) -> str:
    """DuckDB twin of :func:`davg`."""
    return sql_dround(
        f"CAST(sum({_sql_dec(expr, exact2)}) AS DOUBLE) / count({expr})", scale
    )


def load_all() -> dict[str, SuiteEntry]:
    """Import every suite module so registrations run, then return the registry."""
    from . import analytics_suite  # noqa: F401
    from . import cleaning_suite  # noqa: F401
    from . import curation_suite  # noqa: F401
    from . import scale_suite  # noqa: F401

    return REGISTRY
