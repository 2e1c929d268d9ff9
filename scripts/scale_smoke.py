"""Scale-linearity smoke: run headline aggregates on 1x and 8x self-unioned
lineitem/events and report the scaling ratio (expect ~linear; sub-linear
means fixed overhead still dominates at sf0.1).

Run: python scripts/scale_smoke.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from edu_data_pipeline_spark.session import get_spark
from edu_data_pipeline_spark.sources.testdata import table
from pyspark.sql import functions as F


def timed(df):
    from edu_data_pipeline_spark.suite import release_caches

    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    elapsed = round(time.perf_counter() - t0, 2)
    release_caches()  # cache lifecycle: VERDICT r4 #2
    return elapsed


def main():
    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    l1 = table(spark, sf, "lineitem")
    l8 = l1
    for _ in range(3):
        l8 = l8.unionByName(l8)  # 8x

    def q1(l):
        # the shipped exact-cents decimal path (see suite.cents)
        one = F.lit(1).cast("decimal(1,0)")
        disc = l.l_extendedprice.cast("decimal(12,2)") * (
            one - l.l_discount.cast("decimal(3,2)")
        )
        return l.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(disc).alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )

    timed(q1(l1))  # warm
    t1 = timed(q1(l1))
    t8 = timed(q1(l8))
    rows1, rows8 = l1.count(), l8.count()
    print(f"lineitem agg: {rows1} rows in {t1}s; {rows8} rows in {t8}s; "
          f"8x data -> {round(t8 / max(t1, 1e-9), 1)}x time")

    # dedup-pipeline stage: MinHash signature aggregation (shingle ->
    # md5 -> min per permutation), the map-heavy half of near-dup
    d1 = table(spark, sf, "documents")
    d8 = d1
    for _ in range(3):
        d8 = d8.unionByName(d8)

    from edu_data_pipeline_spark.suite.scale_suite import minhash_signatures_df

    sigs = minhash_signatures_df

    timed(sigs(d1))  # warm
    s1 = timed(sigs(d1))
    s8 = timed(sigs(d8))
    print(f"minhash signatures: {d1.count()} docs in {s1}s; "
          f"{d8.count()} doc-rows in {s8}s; "
          f"8x data -> {round(s8 / max(s1, 1e-9), 1)}x time")

    # bucketed range join: both sides scale together, so candidate volume
    # grows ~64x on 8x-by-8x (each purchase sees 8x clicks per bucket) —
    # the probe reports against that quadratic-in-density expectation
    from edu_data_pipeline_spark.suite.analytics_suite import range_join_core

    e1 = table(spark, sf, "events")
    e8 = e1
    for _ in range(3):
        e8 = e8.unionByName(e8)
    timed(range_join_core(e1))  # warm
    r1 = timed(range_join_core(e1))
    r8 = timed(range_join_core(e8))
    print(f"range join: {e1.count()} events in {r1}s; {e8.count()} in {r8}s; "
          f"8x BOTH sides (64x pair density) -> {round(r8 / max(r1, 1e-9), 1)}x time")

    # sequence packing: one shuffle on shard + an ordered running-sum
    # window per shard — probes the window operator's scaling (expect
    # ~linear; the per-shard sort is n log n on 1/8th of the data each)
    from pyspark.sql import Window

    def pack(d):
        bucket = (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 8
        ).alias("shard")
        wt = d.select(
            "doc_id", bucket,
            F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tokens"),
        )
        w = (
            Window.partitionBy("shard").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        laid = wt.select("shard", "n_tokens", F.sum("n_tokens").over(w).alias("cum"))
        return (
            laid.select(
                "shard", "n_tokens",
                F.floor((F.col("cum") - F.col("n_tokens")) / 2048).alias("pack_id"),
            )
            .groupBy("shard", "pack_id")
            .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
        )

    timed(pack(d1))  # warm
    p1 = timed(pack(d1))
    p8 = timed(pack(d8))
    print(f"sequence packing: {d1.count()} docs in {p1}s; {d8.count()} in {p8}s; "
          f"8x data -> {round(p8 / max(p1, 1e-9), 1)}x time")

    # Gram-pipeline linearity (VERDICT r3 #5): the three round-3 gram
    # queries at 1x vs 8x documents, run through the EXACT shipped
    # registry code by materializing the 8x corpus as a documents.parquet
    # the suite fns can read. The self-union keeps doc_ids identical, so
    # the gram-df distribution is unchanged and volume is the only
    # variable: gram-table rows must scale exactly 8x (linear in corpus
    # size — these pipelines are never a doc-pair join), wall-clock and
    # shuffle volume ~linear. Shuffle bytes come from the UI REST API
    # (sum of completed stages' shuffle writes, deltas around each run).
    import json as _json
    import shutil
    import tempfile
    import urllib.request

    from edu_data_pipeline_spark.suite import load_all
    from edu_data_pipeline_spark.suite.scale_suite import (
        DUP_SPAN_K, _distinct_shingles, gram_rows,
    )

    def shuffle_write_bytes():
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete"
        ) as resp:
            stages = _json.load(resp)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)

    reg = load_all()
    tmp8 = tempfile.mkdtemp(prefix="gram8x-")
    d8.write.mode("overwrite").parquet(os.path.join(tmp8, "documents.parquet"))
    try:
        for name in ("docs_dup_spans", "docs_ngram_novelty", "docs_cdc_chunks"):
            fn = reg[name].fn
            timed(fn(spark, sf))  # warm
            sb0 = shuffle_write_bytes()
            g1 = timed(fn(spark, sf))
            sb1 = shuffle_write_bytes()
            g8 = timed(fn(spark, tmp8))
            sb8 = shuffle_write_bytes()
            mb1, mb8 = (sb1 - sb0) / 1e6, (sb8 - sb1) / 1e6
            print(f"{name}: 1x {g1}s / {mb1:.1f} MB shuffle; "
                  f"8x {g8}s / {mb8:.1f} MB shuffle; "
                  f"time {round(g8 / max(g1, 1e-9), 1)}x, "
                  f"shuffle {round(mb8 / max(mb1, 1e-9), 1)}x")
        d8r = spark.read.parquet(os.path.join(tmp8, "documents.parquet"))

        # Bucketed epoch-shuffle decomposition (r5 window audit): wall
        # clock must track corpus volume ~linearly, and the quantity
        # that bounds every sort task — rows per (epoch, 16-bit md5
        # prefix bucket) — must stay corpus/65,536-ish, NOT corpus-sized
        # (the pre-r5 per-epoch window sorted the whole corpus in one
        # task; the decomposition is the fix being evidenced here).
        from edu_data_pipeline_spark.suite.curation_suite import (
            epoch_shuffle_positions,
        )

        def max_bucket_rows(dd):
            k = F.md5(F.concat(F.lit("0:"), F.col("doc_id").cast("string")))
            b = F.conv(F.substring(k, 1, 4), 16, 10).cast("long")
            return (
                dd.select(b.alias("b"))
                .groupBy("b")
                .agg(F.count(F.lit(1)).alias("n"))
                .agg(F.max("n"))
                .first()[0]
            )

        timed(epoch_shuffle_positions(d1.select("doc_id"), 3))  # warm
        e1 = timed(epoch_shuffle_positions(d1.select("doc_id"), 3))
        e8 = timed(epoch_shuffle_positions(d8r.select("doc_id"), 3))
        print(
            f"epoch shuffle order: 1x {e1}s (max sort task "
            f"{max_bucket_rows(d1)} rows of {d1.count()}); 8x {e8}s (max "
            f"{max_bucket_rows(d8r)} of {d8r.count()}); "
            f"time {round(e8 / max(e1, 1e-9), 1)}x"
        )

        n1 = gram_rows(d1, DUP_SPAN_K, out="g").count()
        n8 = gram_rows(d8r, DUP_SPAN_K, out="g").count()
        s1 = _distinct_shingles(d1).count()
        s8 = _distinct_shingles(d8r).count()
        print(f"gram-table rows k={DUP_SPAN_K} (with dups): 1x {n1}; 8x {n8}; "
              f"{round(n8 / max(n1, 1), 2)}x")
        print(f"distinct 3-shingle rows: 1x {s1}; 8x {s8}; "
              f"{round(s8 / max(s1, 1), 2)}x "
              f"(identical doc_ids -> distinct set collapses back to 1x)")
    finally:
        shutil.rmtree(tmp8, ignore_errors=True)

    # connected components: round count vs topology (VERDICT r2 #7).
    # Worst case for plain min-label propagation is one long CHAIN —
    # the min label creeps one hop per round, so rounds == chain length.
    # The shipped pointer-jumping variant contracts label chains
    # exponentially: rounds ~ log2(L). Probe both on synthetic chains.
    from edu_data_pipeline_spark.operators.graph import (
        connected_components, symmetrize_edges,
    )

    for n in (64, 256, 1024):
        verts = spark.range(n).select(F.col("id").alias("doc_id"))
        chain = verts.where("doc_id > 0").select(
            (F.col("doc_id") - 1).alias("doc_a"), F.col("doc_id").alias("doc_b")
        )
        sym = symmetrize_edges(chain)
        t0 = time.perf_counter()
        labels, r_jump = connected_components(verts, sym, pointer_jump=True)
        n_comp = labels.select("component").distinct().count()
        t_jump = round(time.perf_counter() - t0, 2)
        assert n_comp == 1, f"chain must collapse to 1 component, got {n_comp}"
        # plain propagation, capped so the worst case can't run away
        cap = 40
        _, r_plain = connected_components(
            verts, sym, pointer_jump=False, max_rounds=cap
        )
        plain = f"{r_plain}" if r_plain < cap else f">={cap} (capped)"
        print(f"connected components, chain L={n}: pointer_jump={r_jump} "
              f"rounds ({t_jump}s); plain min-label={plain} rounds")

    # connected components: giant-component guard (VERDICT r5 #4). A
    # boilerplate-heavy crawl's near-dup megacluster makes both per-round
    # join keys hot: hub degree on dst, and — once the megacluster's
    # label coalesces — the component id on the jump join. Probe on a
    # star hub (degree K) plus a background of small pairs: (a) the
    # boundedness invariant — after hot-key removal no key entering a
    # SHUFFLED join exceeds the threshold, the hot slice is one row per
    # key so it broadcasts; (b) wall + component-histogram equality with
    # the guard on vs off.
    from edu_data_pipeline_spark.operators.graph import _hot_keys

    K, THRESHOLD = 500_000, 10_000
    verts = spark.range(K + 2_000).select(F.col("id").alias("doc_id"))
    star = spark.range(1, K + 1).select(
        F.lit(0).alias("doc_a"), F.col("id").alias("doc_b")
    )
    pairs = spark.range(K + 2, K + 2_000, 2).select(
        (F.col("id") - 1).alias("doc_a"), F.col("id").alias("doc_b")
    )
    sym = symmetrize_edges(star.unionByName(pairs))
    hot = _hot_keys(sym, "dst", THRESHOLD)
    n_hot = hot.count()
    cold_max = (
        sym.join(F.broadcast(hot), F.col("dst") == F.col("hot_key"), "left_anti")
        .groupBy("dst").count().select(F.max("count")).first()[0]
    )
    assert n_hot >= 1, "hub must be detected hot"
    assert cold_max <= THRESHOLD, (
        f"cold-tier key multiplicity {cold_max} exceeds threshold {THRESHOLD}"
    )
    results = {}
    for thr in (None, THRESHOLD):
        t0 = time.perf_counter()
        labels, r_used = connected_components(verts, sym, skew_threshold=thr)
        hist = sorted(
            (r["n"], r["c"]) for r in labels.groupBy(
                F.col("component").alias("c")
            ).agg(F.count(F.lit(1)).alias("n")).collect()
        )
        results[thr] = (round(time.perf_counter() - t0, 2), r_used, hist)
    assert results[None][2] == results[THRESHOLD][2], "guard changed labels!"
    print(
        f"cc giant-component guard, star K={K} thr={THRESHOLD}: hot_keys={n_hot}, "
        f"cold-tier max key multiplicity={cold_max} (<= threshold by "
        f"construction); wall guard-off={results[None][0]}s "
        f"rounds={results[None][1]}, guard-on={results[THRESHOLD][0]}s "
        f"rounds={results[THRESHOLD][1]}; component histograms identical"
    )

    # ---- sketch-state boundedness (SCALE.md round-4 table) -------------
    # Bloom bitmap words and CMS counter counts vs input volume: inputs
    # grow ~10x across sf dirs while sketch state stays capped.
    from edu_data_pipeline_spark.sources.testdata import table as _table
    from edu_data_pipeline_spark.suite.curation_suite import (
        bloom_bitmap, cms_sketch,
    )
    from edu_data_pipeline_spark.suite.scale_suite import (
        DECON_EVAL_SOURCE, _distinct_shingles,
    )

    for sf in ("0.001", "0.01", "0.1"):
        p = f"/root/testdata/sf{sf}"
        d = _table(spark, p, "documents")
        grams = _distinct_shingles(d.where(F.col("source") == DECON_EVAL_SOURCE))
        n_grams = grams.count()
        bm = bloom_bitmap(grams)
        n_words = bm.count()
        set_bits = bm.select(F.sum(F.bit_count("word"))).first()[0]
        toks = d.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("t"))
        n_toks = toks.count()
        n_counters = cms_sketch(toks).count()
        print(f"sketches sf{sf}: eval_grams={n_grams} bloom_words={n_words} "
              f"set_bits={set_bits} tokens={n_toks} cms_counters={n_counters}")
    spark.stop()


if __name__ == "__main__":
    main()
