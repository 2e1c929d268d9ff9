"""Local replica of the driver's DuckDB-oracle correctness check.

For each suite entry: run the Spark query and the oracle SQL on the same
parquet tables, sort columns by name, canonicalize values, sort rows, and
compare (exact for ints/strings/dates, tolerant for floats). Used by
tests/test_oracle_parity.py and scripts during development so hash
mismatches are caught before the driver runs.
"""

from __future__ import annotations

import datetime
import math
from dataclasses import dataclass, field

import duckdb

from .sources.testdata import TABLES


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    problems: list[str] = field(default_factory=list)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, int):
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if hasattr(v, "as_tuple"):  # Decimal
        return float(v)
    return str(v)


def _rows_to_canonical(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append(tuple(_canon(row[i]) for i in order))
    return [columns[i] for i in order], out


def _sort_key(row):
    return tuple(
        (v is None, str(type(v).__name__), str(v)) for v in row
    )


def _values_equal(a, b, float_tol=1e-6):
    if a is None or b is None:
        return a is b or a == b
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if math.isnan(af) and math.isnan(bf):
            return True
        return abs(af - bf) <= float_tol * max(1.0, abs(af), abs(bf))
    return a == b


def compare_query(spark, con, entry, sf_dir: str, limit_detail: int = 5) -> ParityResult:
    sdf = entry.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = ParityResult(entry.name, True, len(spark_rows), -1)
    if entry.oracle is None:
        res.oracle_rows = -1
        res.problems.append("rows-only check (no oracle)")
        res.ok = len(spark_rows) >= 0
        return res
    duck = con.execute(entry.oracle)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()
    res.oracle_rows = len(duck_rows)
    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
        res.ok = False
        res.problems.append(
            f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(duck_cols)}"
        )
        return res
    if len(spark_rows) != len(duck_rows):
        res.ok = False
        res.problems.append(f"row count: spark={len(spark_rows)} oracle={len(duck_rows)}")
    _, s_canon = _rows_to_canonical([c.lower() for c in spark_cols], spark_rows)
    _, d_canon = _rows_to_canonical([c.lower() for c in duck_cols], duck_rows)
    s_sorted = sorted(s_canon, key=_sort_key)
    d_sorted = sorted(d_canon, key=_sort_key)
    mismatches = 0
    for i, (srow, drow) in enumerate(zip(s_sorted, d_sorted)):
        if all(_values_equal(a, b) for a, b in zip(srow, drow)):
            continue
        mismatches += 1
        if mismatches <= limit_detail:
            res.problems.append(f"row {i}: spark={srow} oracle={drow}")
    if mismatches:
        res.ok = False
        res.problems.append(f"{mismatches} mismatched rows")
    return res


def run_parity(spark, sf_dir: str, names: list[str] | None = None) -> list[ParityResult]:
    from .suite import load_all

    registry = load_all()
    con = duck_connection(sf_dir)
    results = []
    for name, entry in registry.items():
        if names and name not in names:
            continue
        try:
            results.append(compare_query(spark, con, entry, sf_dir))
        except Exception as exc:  # surface, don't die
            results.append(ParityResult(name, False, -1, -1, [f"exception: {exc}"]))
    return results
