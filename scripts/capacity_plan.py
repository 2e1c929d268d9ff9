"""100 TB shuffle-capacity plan from measured stage metrics.

For each flagship/headline query, runs the shipped registry code at
sf0.01 and sf0.1 and collects the per-query deltas of the Spark UI REST
metrics (inputBytes, shuffleWriteBytes — deterministic byte counters,
immune to wall-clock noise). From the two scales it fits the scaling
exponent

    alpha = ln(shuffle_B / shuffle_A) / ln(input_B / input_A)

(alpha == 1 -> shuffle grows exactly with input; alpha > 1 ->
superlinear, a scale red flag) and projects the query's total shuffle
volume at a 100 TB input under the measured exponent, plus the
per-executor share on the 1000-executor reference cluster
(`cluster_profile.cluster_conf`: 4 cores / 28 GB executors, 192 MB AQE
advisory partitions — shuffle is streamed through disk, so the bound
that matters is per-TASK partition size, which AQE pins at ~192 MB;
the per-executor column sizes DISK, not memory).

A two-point fit extrapolated 6 orders of magnitude is a MODEL, not a
measurement — its value is the per-query exponent and shuffle/input
fraction (both measured), which say WHICH plans stay shuffle-
proportional. Candidate-volume-dependent stages (LSH joins) are honest
here only to the extent the synthetic corpus's duplicate structure is
sf-invariant; the gram-linearity probes in SCALE.md carry that caveat.

Usage: python scripts/capacity_plan.py  (prints a markdown table)
"""

from __future__ import annotations

import json
import math
import pathlib
import sys
import urllib.request

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from edu_data_pipeline_spark.session import get_spark
from edu_data_pipeline_spark.suite import load_all, release_caches

# Every bench headline + calibration query (VERDICT r7 #3: the full
# bench set gets a measured alpha, not just the 23 flagships), plus
# docs_token_budget_mix (flagship not in the bench set).
QUERIES = [
    # warehouse / analytics
    "pricing_summary", "region_revenue", "customer_360",
    "supplier_late_blame", "events_user_summary", "user_sessions",
    "top_orders", "top_customer_per_nation", "daily_metrics",
    "events_hourly", "risk_scores", "revenue_rollup", "user_value_ranks",
    "large_orders", "daily_revenue_rolling", "events_grouping_sets",
    "nation_trade_volume", "user_funnel", "events_range_join",
    "returned_revenue_customers", "customer_rfm_segments",
    "event_transition_matrix", "events_ks_test",
    "events_lateness_profile", "user_stats_exact",
    # cleaning + exact dedup
    "clean_dates", "clean_student_ids", "clean_cities",
    "dedup_keep_last", "docs_exact_dedup", "docs_incremental_dedup",
    # near-dup flagships
    "minhash_lsh_pairs", "minhash_verified_pairs",
    "minhash_lsh_stopfiltered", "minhash_band_sweep",
    "docs_jaccard_top_pairs", "docs_simhash",
    "simhash_near_pairs", "dedup_graph_triangles", "docs_dup_spans",
    "docs_dup_span_ranges",
    # decontamination / curation / ANN
    "docs_decontamination", "docs_bloom_screen",
    "embedding_semantic_dedup", "knn_bruteforce", "knn_batch_ivf",
    "knn_ivf_multiprobe", "docs_epoch_order", "docs_token_budget_mix",
    "docs_contamination_frac", "source_minhash_overlap",
    "docs_cms_term_freq", "docs_continuation_pairs",
    "docs_unigram_logprob", "docs_cdc_chunks", "docs_length_buckets",
    "docs_pack_sequences",
    # r10 (VERDICT r9 #3): the heaviest NON-bench registry queries —
    # the ones that move candidate-pair, gram, or token volume through
    # an exchange; the other ~94 are output-bounded aggregations.
    "split_leakage_pairs", "docs_cross_source_leakage",
    "dedup_components", "dedup_keep_best",
    "dedup_quality_by_cluster_size", "embedding_lsh_buckets",
    "embedding_verified_topk", "docs_chunk_overlap",
    "minhash_estimate_accuracy", "docs_ngram_novelty",
    "docs_tfidf_top_terms", "docs_bpe_pair_stats",
    # r11: window->map-side-RLE rewrite (the former full-token-volume
    # sort+exchange deserves a standing scaling row)
    "docs_bigram_freq",
    # r13 (VERDICT r12 #1): the warehouse change-data rows — one window +
    # null-safe anti-join (cdc) and a full-outer merge per load (scd2)
    "cdc_snapshot_fold", "scd2_dim_history",
]

TARGET_INPUT_BYTES = 100e12  # 100 TB
EXECUTORS = 1000


def _shuffle_total(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete"
    ) as resp:
        stages = json.load(resp)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def _scanned_bytes(df, sf_dir: str) -> int:
    """On-disk bytes of the parquet tables the plan scans (stage-level
    ``inputBytes`` does not account file:// parquet reads in local mode,
    so the honest denominator is the size of the scanned tables —
    column pruning makes actual reads smaller, stated in the caveats)."""
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    names = set(re.findall(r"/sf[0-9.]+/(\w+)\.parquet", plan))
    if not names:
        # Spark elided/truncated Location paths in the formatted plan —
        # fall back to the files the plan actually reads so the
        # denominator never silently collapses to 0.
        names = {
            m.group(1)
            for f in df.inputFiles()
            if (m := re.search(r"/sf[0-9.]+/(\w+)\.parquet", f))
        }
        if not names:
            print("    [capacity_plan] WARNING: no scanned tables found in plan")
    total = 0
    for n in names:
        p = pathlib.Path(sf_dir) / f"{n}.parquet"
        total += (
            sum(f.stat().st_size for f in p.rglob("*") if f.is_file())
            if p.is_dir()
            else p.stat().st_size
        )
    return total


def main() -> None:
    only = set(sys.argv[1:])  # optional query-name filter for re-measurement
    queries = [q for q in QUERIES if not only or q in only]
    spark = get_spark(app_name="capacity-plan")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    sfs = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    # JVM/codegen warm-up through the same write path, untimed/unmeasured
    registry[QUERIES[0]].fn(spark, sfs[0]).write.format("noop").mode(
        "overwrite"
    ).save()
    release_caches()
    rows = []
    for name in queries:
        if name not in registry:
            continue
        meas = []
        for sf_dir in sfs:
            df = registry[name].fn(spark, sf_dir)
            scanned = _scanned_bytes(df, sf_dir)
            sh0 = _shuffle_total(spark)
            df.write.format("noop").mode("overwrite").save()
            release_caches()
            spark.catalog.clearCache()
            meas.append((scanned, _shuffle_total(spark) - sh0))
        (in_a, sh_a), (in_b, sh_b) = meas
        frac_a = sh_a / in_a if in_a else 0.0
        frac_b = sh_b / in_b if in_b else 0.0
        if sh_a > 0 and sh_b > 0 and in_b > in_a > 0:
            alpha = math.log(sh_b / sh_a) / math.log(in_b / in_a)
            # log-space projection; a two-point exponent on a tiny
            # sf0.01 shuffle can be arbitrarily large — flag, don't crash
            log10_proj_tb = (
                math.log10(sh_b)
                + alpha * math.log10(TARGET_INPUT_BYTES / in_b)
                - 12.0
            )
            if log10_proj_tb > 6:  # > 10^6 TB: exponent is noise-driven
                proj = f">10^{log10_proj_tb:.0f} (!)"
                per_exec_gb = "—"
            else:
                proj_tb = 10 ** log10_proj_tb
                proj = f"{proj_tb:,.1f}"
                per_exec_gb = f"{proj_tb * 1e3 / EXECUTORS:,.1f}"
            alpha_s = f"{alpha:.2f}"
        else:
            alpha_s, proj, per_exec_gb = "—", "0", "0"
        rows.append(
            f"| {name} | {in_b/1e6:,.0f} | {sh_b/1e6:,.1f} | {frac_a:.3f} | "
            f"{frac_b:.3f} | {alpha_s} | {proj} | {per_exec_gb} |"
        )
        print(rows[-1], file=sys.stderr)  # progress
    print("| query | input@sf0.1 MB | shuffle@sf0.1 MB | sh/in @sf0.01 | "
          "sh/in @sf0.1 | alpha | shuffle @100TB (TB) | per-executor GB |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(r)
    spark.stop()


if __name__ == "__main__":
    main()
