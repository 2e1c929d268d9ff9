"""Measure the dup-span Bloom path at an ORGANIC activation scale.

Why this exists (VERDICT r9 next-round #1): the Bloom pre-filter
(`_dup_span_sides`) activates on the parquet footer row count at
DUP_BLOOM_MIN_DOCS, but the driver testdata tops out at 5,000 docs
(sf0.1) — so through r9 the machinery only ever ran force-activated in
tests and forced-path byte measurements, and the claimed crossover
(fixed filter cost vs the avoided semi-join exchange) was an
extrapolation. This script builds corpora around the gate and measures
BOTH paths at each tier (the shipped gate's organic pick is tagged in
the output): wall clock, shuffle-write bytes (Spark UI REST deltas —
the capacity-plan protocol), and scanned input bytes. It also runs the
unchanged DuckDB oracles at the organically-activating tier through
the exact driver-protocol canonicalizer, so "both oracles green at an
activating scale" is an observation, not an inference from sf0.01.

The r10 run of this script is what RE-DERIVED the gate (SCALE.md r10c):
the r9 value of 100k activated measurably early — at 150k docs the
plain path won both currencies (bytes 171 vs 209 MB, wall 11.3 vs
23.4 s) because the dup side still broadcast, while by 600k the plain
semi-join had dropped to sort-merge (sh/in 2.78 -> 6.32, alpha ~1.6)
and the Bloom path held sh/in flat at 3.4 (alpha 1.00). The byte
crossover log-interpolates to ~240k docs on this duplication-heavy
(adverse) corpus -> DUP_BLOOM_MIN_DOCS = 250k, the measured floor.

Corpus: the df-STATIONARY generator (scripts/df_stationary_fit.py) at
150k and 600k docs — dup structure is sf-invariant by construction
(df in {1, 2}; ~20% of docs are near-copy pairs sharing ~85% of their
tokens => ~9.5 dup 8-gram keys/doc, ~2x the sizing assumption's 5/doc,
which only makes the Bloom's job HARDER — an honest stress). 4x
between tiers gives the organic Bloom path a real two-point exponent
to set against the forced-path alpha 0.96/0.97 (SCALE.md r9b).

Usage:
    python scripts/dup_span_organic.py            # both tiers
    python scripts/dup_span_organic.py sf150000  # one tier

Writes tiers to $DUPSPAN_ROOT (default /tmp/dupspan_organic); prints
one markdown row per (tier, path, query) plus the oracle verdicts.
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import df_stationary_fit as dfs  # noqa: E402  (scripts/ sibling)
from capacity_plan import _scanned_bytes, _shuffle_total  # noqa: E402

from edu_data_pipeline_spark.parity import compare_query  # noqa: E402
from edu_data_pipeline_spark.session import get_spark  # noqa: E402
from edu_data_pipeline_spark.suite import load_all, release_caches  # noqa: E402
from edu_data_pipeline_spark.suite import scale_suite  # noqa: E402

import os  # noqa: E402

ROOT = os.environ.get("DUPSPAN_ROOT", "/tmp/dupspan_organic")
TIERS = {"sf150000": 150_000, "sf600000": 600_000, "sf4500000": 4_500_000}
# sfNNN: _scanned_bytes parses /sf<digits>/ paths. The 4.5M tier crosses
# the SHARD bound organically too (4.5M docs x 64 bits = 288M > 2^28,
# _dup_bloom_plan -> 2 shards) — the r10a sharded screen executing with
# nothing forced; run it with DUPSPAN_REPS=1 (plain-path walls are
# ~10 min/run there).
QUERIES = ("docs_dup_spans", "docs_dup_span_ranges")
REPS = int(os.environ.get("DUPSPAN_REPS", "2"))
ORACLE_TIER = "sf600000"  # the tier the shipped gate organically activates at
# One write_table call = one parquet ROW GROUP, and Spark can only
# split a file at row-group boundaries — a first cut at 50k rows/group
# gave the 150k tier THREE effective splits and 3 straggler tasks on a
# 32-core local run (measured: ~10% CPU, stages pinned at 12/15 done).
# 5k rows/group ≈ 3.5 MB gives every tier >= 30 real splits.
CHUNK = 5_000


def _ensure_corpus(tier: str, n_docs: int) -> str:
    """Write the tier with the df-stationary generator, chunked so the
    600k tier never holds the whole corpus in driver memory."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = pathlib.Path(ROOT) / tier
    path = sf_dir / "documents.parquet"
    if path.exists():
        return str(sf_dir)
    sf_dir.mkdir(parents=True, exist_ok=True)
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    t0 = time.perf_counter()
    with pq.ParquetWriter(path, schema) as writer:
        batch: list[tuple] = []
        for d, text in dfs._texts(n_docs):
            batch.append((d, text, "en", f"src{d % 5}", len(text)))
            if len(batch) >= CHUNK:
                writer.write_table(
                    pa.Table.from_pylist(
                        [dict(zip(schema.names, r)) for r in batch],
                        schema=schema,
                    )
                )
                batch = []
        if batch:
            writer.write_table(
                pa.Table.from_pylist(
                    [dict(zip(schema.names, r)) for r in batch],
                    schema=schema,
                )
            )
    print(
        f"wrote {path} ({n_docs} docs, "
        f"{time.perf_counter() - t0:.1f}s)",
        flush=True,
    )
    return str(sf_dir)


def _run(spark, registry, name: str, sf_dir: str) -> tuple[float, int, int]:
    """(wall s, shuffle-write bytes, scanned bytes) for one execution
    through the capacity-plan protocol (noop sink, cache-released)."""
    df = registry[name].fn(spark, sf_dir)
    scanned = _scanned_bytes(df, sf_dir)
    sh0 = _shuffle_total(spark)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    sh = _shuffle_total(spark) - sh0
    release_caches()
    spark.catalog.clearCache()
    return wall, sh, scanned


def main() -> None:
    only = set(sys.argv[1:])
    tiers = {t: n for t, n in TIERS.items() if not only or t in only}
    dirs = {t: _ensure_corpus(t, n) for t, n in tiers.items()}

    # 150k-600k docs x ~120 tokens is 17M-68M gram instances — far past
    # what the library default heap (local-mode 1g) is sized for; this
    # is a measurement harness, so size the driver like the executor a
    # cluster would give the job (must be set before the first session
    # launches the JVM).
    spark = get_spark(
        app_name="dup-span-organic",
        extra_conf={"spark.driver.memory": "64g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    plain_off = 1 << 60
    bloom_on = 0
    organic_gate = scale_suite.DUP_BLOOM_MIN_DOCS

    # one unmeasured warmup through the same write path
    registry[QUERIES[0]].fn(spark, next(iter(dirs.values()))).write.format(
        "noop"
    ).mode("overwrite").save()
    release_caches()
    spark.catalog.clearCache()

    print(
        "| tier | docs | path | query | wall s (min of reps) | shuffle MB "
        "| scanned MB | sh/in |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for tier, sf_dir in dirs.items():
        n_docs = tiers[tier]
        # Measure BOTH paths at every tier by forcing the gate each
        # way; tag which one the shipped gate picks organically (the
        # r10 re-derived gate sits BETWEEN the tiers by design, so the
        # table shows one organic-plain and one organic-bloom tier).
        organic = "bloom" if n_docs >= organic_gate else "plain"
        for path in ("bloom", "plain"):
            path_tag = path + (
                "(organic)" if path == organic else "(forced)"
            )
            scale_suite.DUP_BLOOM_MIN_DOCS = (
                bloom_on if path == "bloom" else plain_off
            )
            for name in QUERIES:
                walls, shs, scans = [], [], []
                for _ in range(REPS):
                    w, s, i = _run(spark, registry, name, sf_dir)
                    walls.append(w)
                    shs.append(s)
                    scans.append(i)
                print(
                    f"| {tier} | {n_docs} | {path_tag} | {name} "
                    f"| {min(walls):.2f} | {max(shs) / 1e6:.1f} "
                    f"| {scans[0] / 1e6:.1f} "
                    f"| {max(shs) / scans[0]:.3f} |",
                    flush=True,
                )
    scale_suite.DUP_BLOOM_MIN_DOCS = organic_gate

    # oracle parity at the first organic tier — the driver protocol's
    # own canonicalizer, gate flipped by the footer count alone
    import duckdb

    sf_dir = dirs.get(ORACLE_TIER)
    if sf_dir:
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'"
        )
        for name in QUERIES:
            t0 = time.perf_counter()
            res = compare_query(spark, con, registry[name], sf_dir)
            print(
                f"oracle@{ORACLE_TIER} {name}: ok={res.ok} "
                f"spark={res.spark_rows} oracle={res.oracle_rows} "
                f"problems={res.problems} "
                f"({time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
            release_caches()
    spark.stop()


if __name__ == "__main__":
    main()
