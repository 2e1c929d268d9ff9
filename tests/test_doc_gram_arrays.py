"""The r8c map-side per-doc gram machinery, pinned on crafted corpora.

_doc_distinct_gram_arrays deleted the gram family's distinct exchanges
(SCALE.md r8c note); these tests pin the two claims the parity sweep
can't isolate: (1) the array builder is element-for-element equivalent
to the collect_set / .distinct() shapes it replaced, for both string
and fingerprint elements and for k=3 and k=8 grams; (2) the zero-
shuffle CDC rewrite reproduces the window/groupBy chunk numbering on
every boundary edge case (boundary at position 1, no boundaries,
consecutive boundaries, boundary at the last position).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from edu_data_pipeline_spark.suite import load_all, release_caches
from edu_data_pipeline_spark.suite.scale_suite import (
    CDC_MODULUS,
    _doc_distinct_gram_arrays,
    _gram_key64,
    _gram_key64_sql,
    _sk_from_halves,
    _tokens,
    gram_rows,
)

REGISTRY = load_all()


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )


CRAFTED = [
    "a b c a b c a b c",          # heavy within-doc repetition
    "x y z",                       # exactly one 3-gram
    "p q",                         # too short for 3-grams
    " lead and trail spaces  ok ", # trim behavior
    "one two three four five six seven eight nine ten",  # 8-gram capable
]


def test_array_builder_matches_distinct_strings(spark):
    d = _docs(spark, CRAFTED)
    via_arrays = {
        r["doc_id"]: sorted(r["arr"])
        for r in _doc_distinct_gram_arrays(d, lambda g: g).collect()
    }
    via_distinct = {
        r["doc_id"]: sorted(x["s"] for x in r["ss"])
        for r in gram_rows(d, 3)
        .distinct()
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s")).alias("ss"))
        .collect()
    }
    assert via_arrays == via_distinct
    assert 2 not in via_arrays  # the 2-token doc yields no grams


def test_array_builder_matches_collect_set_fingerprints(spark):
    d = _docs(spark, CRAFTED)
    for k in (3, 8):
        via_arrays = {
            r["doc_id"]: sorted(r["arr"])
            for r in _doc_distinct_gram_arrays(d, _gram_key64_sql, k=k).collect()
        }
        via_set = {
            r["doc_id"]: sorted(r["sks"])
            for r in gram_rows(d, k)
            .select("doc_id", _gram_key64(F.col("s")).alias("sk"))
            .groupBy("doc_id")
            .agg(F.collect_set("sk").alias("sks"))
            .collect()
        }
        assert via_arrays == via_set, f"k={k}"


def test_sk_from_halves_matches_gram_key64(spark):
    """The arithmetic 60-bit key (h1 << 28) + (h2 >> 4) must equal the
    md5-substring key for every gram — the stopfiltered anti-join
    depends on the two derivations being bit-identical."""
    d = _docs(spark, CRAFTED)
    g = gram_rows(d, 3)
    m = F.md5(F.col("s"))
    both = g.select(
        _gram_key64(F.col("s")).alias("direct"),
        F.conv(F.substring(m, 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(m, 9, 8), 16, 10).cast("long").alias("h2"),
    ).withColumn("derived", _sk_from_halves())
    assert both.where(F.col("direct") != F.col("derived")).count() == 0


def _window_cdc(spark, d):
    """The pre-r8c window/groupBy CDC shape, kept here as the test
    reference implementation."""
    from pyspark.sql import Window

    toks = d.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos0", "t")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "t")
    h = F.conv(F.substring(F.md5(F.col("t")), 1, 8), 16, 10).cast("long")
    marked = toks.withColumn("is_boundary", (h % CDC_MODULUS == 0).cast("long"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = marked.withColumn("chunk_id", F.sum("is_boundary").over(w))
    return seg.groupBy("doc_id", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "t"))),
                    lambda p: p["t"],
                ),
                " ",
            )
        ).alias("chunk_md5"),
    )


def test_cdc_array_rewrite_matches_window_form(spark, tmp_path):
    """Crafted tokens hitting every boundary case: the md5-derived
    boundary predicate is data-dependent, so build a corpus large and
    varied enough that boundaries land at position 1, mid-doc,
    back-to-back, and at the last position, then assert the zero-
    shuffle rewrite equals the window reference row-for-row."""
    import itertools

    vocab = [f"t{i}" for i in range(40)]
    texts = [
        " ".join(itertools.islice(itertools.cycle(vocab[j:]), 1, 25 + j))
        for j in range(12)
    ] + ["solo", "two words"]
    d = _docs(spark, texts)

    # sanity: the corpus actually exercises boundary-at-1 and
    # consecutive boundaries somewhere
    h = F.conv(F.substring(F.md5(F.col("t")), 1, 8), 16, 10).cast("long")
    toks = d.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos0", "t")
    )
    bpos = toks.where(h % CDC_MODULUS == 0).select("doc_id", "pos0")
    assert bpos.count() > 0, "corpus never hits a boundary — vocab too small"

    sf_dir = str(tmp_path)
    d.write.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        map(tuple, REGISTRY["docs_cdc_chunks"].fn(spark, sf_dir).collect())
    )
    want = sorted(map(tuple, _window_cdc(spark, d).collect()))
    assert got == want


SEED = 0x5CA1E


def _random_texts(n: int) -> list[str]:
    """Seeded dirty corpus: repeated tokens, runs of spaces (which the
    shared _tokens split turns into empty-string tokens — both shapes
    must agree on those too), leading/trailing space, empty and tiny
    docs, long templated docs."""
    rng = random.Random(SEED)
    vocab = [f"w{i}" for i in range(25)] + ["UPPER", "123", "a-b", "x_y"]
    out = []
    for _ in range(n):
        k = rng.choice([0, 1, 2, 3, 5, 8, 15, 40])
        toks = [rng.choice(vocab) for _ in range(k)]
        if toks and rng.random() < 0.3:  # force within-doc repetition
            toks = toks + toks[: rng.randrange(1, len(toks) + 1)]
        sep = "  " if rng.random() < 0.2 else " "
        text = sep.join(toks)
        if rng.random() < 0.2:
            text = " " + text + "  "
        out.append(text)
    return out


def test_fuzz_array_builder_and_cdc_against_references(spark):
    """200 seeded random documents: the map-side array builder must
    equal the exchange-based distinct shapes, and the zero-shuffle CDC
    must equal the window reference, on every document at once."""
    d = _docs(spark, _random_texts(200))

    via_arrays = {
        r["doc_id"]: sorted(r["arr"])
        for r in _doc_distinct_gram_arrays(d, lambda g: g).collect()
    }
    via_distinct = {
        r["doc_id"]: sorted(x["s"] for x in r["ss"])
        for r in gram_rows(d, 3)
        .distinct()
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s")).alias("ss"))
        .collect()
    }
    assert via_arrays == via_distinct

    via_sk = {
        r["doc_id"]: sorted(r["arr"])
        for r in _doc_distinct_gram_arrays(d, _gram_key64_sql, k=8).collect()
    }
    via_set = {
        r["doc_id"]: sorted(r["sks"])
        for r in gram_rows(d, 8)
        .select("doc_id", _gram_key64(F.col("s")).alias("sk"))
        .groupBy("doc_id")
        .agg(F.collect_set("sk").alias("sks"))
        .collect()
    }
    assert via_sk == via_set

    got = sorted(map(tuple, _cdc_on_frame(spark, d).collect()))
    want = sorted(map(tuple, _window_cdc(spark, d).collect()))
    assert got == want


def _cdc_on_frame(spark, d):
    """Run the registry CDC query against an in-memory frame by writing
    it to a temp dir once per call."""
    import tempfile

    sf_dir = tempfile.mkdtemp(prefix="cdcfuzz")
    d.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return REGISTRY["docs_cdc_chunks"].fn(spark, sf_dir)


# ---------------------------------------------------------------------------
# r9: map-side SimHash words vs the r1-r8 exploded/grouped reference shape
# ---------------------------------------------------------------------------


def test_simhash_mapside_matches_grouped(spark):
    """The zero-exchange SimHash variant (aggregate over the token
    array, sign test 2*ones - n) equals the registry's exploded/grouped
    +1/-1 sum shape word-for-word — including sign ties (even token
    counts where the bit sum is exactly 0), within-doc repetition, and
    1-token docs. The variant is a measured NEGATIVE result (kept off
    the registry path: interpreted lambdas cost ~2x wall vs codegen,
    see _simhash_words' docstring / SCALE.md r9a); this pin is what
    makes the recorded measurement a comparison of equals."""
    from edu_data_pipeline_spark.suite.scale_suite import (
        _simhash_words_df,
        _simhash_words_mapside,
    )

    rng = random.Random(909)
    vocab = ["a", "b", "cc", "ddd", "the", "zz", "q1", "w2"]
    fuzz = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 40)))
        for _ in range(150)
    ]
    # tie-prone docs: even counts of identical tokens force bit sums of 0
    crafted = ["a a", "a a a a", "a b a b", "", "x", " padded "]
    d = _docs(spark, CRAFTED + crafted + fuzz)
    got = {tuple(r) for r in _simhash_words_mapside(d).collect()}
    want = {tuple(r) for r in _simhash_words_df(d).collect()}
    assert got == want


def test_simhash_mapside_plan_has_no_exchange(spark):
    """The variant's defining property — per-document expressions, no
    Exchange anywhere in the executed plan (what it buys; its wall cost
    is why it is not the registry path)."""
    from edu_data_pipeline_spark.suite.scale_suite import (
        _simhash_words_mapside,
    )

    d = _docs(spark, CRAFTED)
    plan = (
        _simhash_words_mapside(d)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# r9: dup-fingerprint Bloom pre-filter (docs_dup_spans / _ranges)
# ---------------------------------------------------------------------------


def test_dup_gram_prefilter_no_false_negatives(spark):
    """The Bloom pre-filter may only DROP non-duplicated instances:
    after the exact semi-join, per-doc dup counts must equal the
    unfiltered reference exactly — on a corpus with real cross-doc
    dup spans, unique docs, and short docs."""
    from edu_data_pipeline_spark.suite.scale_suite import (
        DUP_SPAN_K,
        _distinct_sk_rows,
        _dup_gram_prefilter,
    )

    rng = random.Random(911)
    vocab = [f"t{i}" for i in range(60)]
    shared = " ".join(vocab[i % 60] for i in range(12))  # a 12-token span
    texts = []
    for i in range(40):
        salt = " ".join(f"u{i}x{k}" for k in range(rng.randrange(6, 20)))
        # half the docs embed the shared span -> its 8-grams have df >= 2
        texts.append(f"{shared} {salt}" if i % 2 == 0 else salt)
    texts += ["a b c", ""]  # too short for 8-grams
    d = _docs(spark, texts)

    grams = gram_rows(d, DUP_SPAN_K, out="g").select(
        "doc_id", _gram_key64(F.col("g")).alias("gk")
    )
    gdf = (
        _distinct_sk_rows(d, k=DUP_SPAN_K)
        .groupBy("sk")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    dup_keys = gdf.where(F.col("df") >= 2).select(F.col("sk").alias("gk"))

    def counts(left):
        return {
            r["doc_id"]: r["n"]
            for r in left.join(dup_keys, "gk", "semi")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    filtered = _dup_gram_prefilter(grams, dup_keys)
    got = counts(filtered)
    want = counts(grams)
    assert want  # the crafted corpus must actually contain dup spans
    assert got == want
    # and the filter genuinely cuts: the surviving instance stream must
    # be smaller than the full gram stream (salted docs are unique)
    assert filtered.count() < grams.count()
    # the prefilter tracked-persists its bitmap — release it so this
    # test's caches never squeeze later tests in the shared session
    release_caches()


def test_dup_span_bloom_path_equals_plain_path(spark, tmp_path, monkeypatch):
    """The DUP_BLOOM_MIN_DOCS conditional must be invisible in results:
    forcing the Bloom path (threshold 0) and forcing the plain path
    (threshold infinity) on the same corpus yields identical rows for
    both registry queries — the end-to-end pin of the activation
    wiring, complementing the filter-level no-false-negative test."""
    from edu_data_pipeline_spark.suite import scale_suite

    rng = random.Random(913)
    vocab = [f"t{i}" for i in range(40)]
    shared = " ".join(vocab[i % 40] for i in range(15))
    texts = []
    for i in range(30):
        salt = " ".join(f"u{i}x{k}" for k in range(rng.randrange(8, 24)))
        texts.append(f"{salt} {shared}" if i % 3 == 0 else salt)
    d = _docs(spark, texts)
    sf_dir = str(tmp_path / "dupcond")
    d.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    out = {}
    for tag, threshold in (("bloom", 0), ("plain", 1 << 60)):
        monkeypatch.setattr(scale_suite, "DUP_BLOOM_MIN_DOCS", threshold)
        out[tag] = {
            name: sorted(
                map(tuple, REGISTRY[name].fn(spark, sf_dir).collect())
            )
            for name in ("docs_dup_spans", "docs_dup_span_ranges")
        }
    assert out["bloom"] == out["plain"]
    assert out["bloom"]["docs_dup_spans"]  # corpus actually has dup spans
    # the bloom-path runs tracked-persisted dup_keys + bitmaps — release
    # them so this test's caches never squeeze later tests
    release_caches()


def test_dup_bloom_plan_sizing():
    """The screen is sized from the activation gate's own row count —
    the r9 self-review found a fixed 2^20 bitmap saturated (FP ~ 100%)
    at every corpus size that activates the filter, and r10 sharding
    (ADVICE r9) bounds EVERY shard's bitmap inside the probe's 2^32
    addressable hash range AND practical broadcast size. Pin the
    floor, the per-shard bound, 32-alignment, that total designed bits
    are always delivered (bits/key scale-invariant), and that at the
    activation threshold the fill stays in the useful regime under the
    documented density assumption (~5 dup keys/doc)."""
    import math

    from edu_data_pipeline_spark.suite.scale_suite import (
        DUP_BLOOM_BITS_PER_DOC,
        DUP_BLOOM_MIN_DOCS,
        DUP_BLOOM_MIN_M_BITS,
        DUP_BLOOM_SHARD_M_BITS,
        _dup_bloom_plan,
    )

    assert _dup_bloom_plan(0) == (1, DUP_BLOOM_MIN_M_BITS)
    for n in (1, 999, 10**5, 10**6, 10**8, 10**10, 10**12):
        shards, m = _dup_bloom_plan(n)
        assert m % 32 == 0
        # every shard addressable by (h1 + j*h2) % m (h1 spans 2^32)
        # and broadcast-bounded — the two ADVICE r9 defects
        assert m <= DUP_BLOOM_SHARD_M_BITS < 1 << 32
        # designed total bits always delivered (no capped saturation)
        assert shards * m >= DUP_BLOOM_BITS_PER_DOC * n
    # single shard through the organic activation regime (no scan
    # multiplication until ~4.2M docs)
    assert _dup_bloom_plan(DUP_BLOOM_MIN_DOCS)[0] == 1
    assert _dup_bloom_plan(4_000_000)[0] == 1
    assert _dup_bloom_plan(10**9)[0] > 1
    # at the activation threshold: ~5 dup keys/doc, k=3 hash functions
    shards, m = _dup_bloom_plan(DUP_BLOOM_MIN_DOCS)
    keys = 5 * DUP_BLOOM_MIN_DOCS / shards
    fill = 1.0 - math.exp(-3.0 * keys / m)
    assert fill < 0.35 and fill**3 < 0.05, (m, fill)
    # ... and the SAME fill bound holds at 1e9 docs, where the r9
    # capped bitmap had saturated: sharding keeps bits/key constant
    shards, m = _dup_bloom_plan(10**9)
    fill = 1.0 - math.exp(-3.0 * (5 * 10**9 / shards) / m)
    assert fill < 0.35 and fill**3 < 0.05, (shards, m, fill)


def test_dup_gram_prefilter_sharded_equals_single(spark):
    """Forced-shard equivalence (VERDICT r9 next-round #4): the
    sharded screen must keep EXACTLY the rows the single-bitmap screen
    keeps after the exact semi-join — and, because sharding partitions
    the fingerprint domain, the pre-semi-join survivor sets must agree
    up to (shard-local) Bloom false positives, never dropping a true
    dup instance."""
    from edu_data_pipeline_spark.suite.scale_suite import (
        DUP_SPAN_K,
        _distinct_sk_rows,
        _dup_gram_prefilter,
    )

    rng = random.Random(917)
    vocab = [f"t{i}" for i in range(50)]
    shared = " ".join(vocab[i % 50] for i in range(14))
    texts = []
    for i in range(36):
        salt = " ".join(f"u{i}x{k}" for k in range(rng.randrange(6, 18)))
        texts.append(f"{shared} {salt}" if i % 2 == 0 else salt)
    d = _docs(spark, texts)

    grams = gram_rows(d, DUP_SPAN_K, out="g").select(
        "doc_id", _gram_key64(F.col("g")).alias("gk")
    )
    gdf = (
        _distinct_sk_rows(d, k=DUP_SPAN_K)
        .groupBy("sk")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    dup_keys = gdf.where(F.col("df") >= 2).select(F.col("sk").alias("gk"))

    def semi_counts(left):
        return {
            r["doc_id"]: r["n"]
            for r in left.join(dup_keys, "gk", "semi")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    single = _dup_gram_prefilter(grams, dup_keys, m_bits=1 << 12)
    sharded = _dup_gram_prefilter(
        grams, dup_keys, m_bits=1 << 12, n_shards=4
    )
    want = semi_counts(grams)
    assert want  # the crafted corpus must actually contain dup spans
    assert semi_counts(single) == want
    assert semi_counts(sharded) == want
    # both screens genuinely cut the instance stream
    n_all = grams.count()
    assert sharded.count() < n_all and single.count() < n_all
    release_caches()


def test_dup_span_sharded_path_end_to_end(spark, tmp_path, monkeypatch):
    """Force the registry queries through a MULTI-shard Bloom path
    (threshold 0 + a tiny per-shard bound so _dup_bloom_plan yields
    n_shards > 1) and pin byte-identical results vs the plain path —
    the end-to-end pin that the sharding wiring, not just the filter
    in isolation, is invisible in results."""
    from edu_data_pipeline_spark.suite import scale_suite

    rng = random.Random(919)
    vocab = [f"t{i}" for i in range(40)]
    shared = " ".join(vocab[i % 40] for i in range(15))
    texts = []
    for i in range(30):
        salt = " ".join(f"u{i}x{k}" for k in range(rng.randrange(8, 24)))
        texts.append(f"{salt} {shared}" if i % 3 == 0 else salt)
    d = _docs(spark, texts)
    sf_dir = str(tmp_path / "dupshard")
    d.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    out = {}
    for tag, threshold, floor_m, shard_m in (
        ("sharded", 0, 1 << 12, 1 << 10),
        (
            "plain",
            1 << 60,
            scale_suite.DUP_BLOOM_MIN_M_BITS,
            scale_suite.DUP_BLOOM_SHARD_M_BITS,
        ),
    ):
        monkeypatch.setattr(scale_suite, "DUP_BLOOM_MIN_DOCS", threshold)
        monkeypatch.setattr(scale_suite, "DUP_BLOOM_MIN_M_BITS", floor_m)
        monkeypatch.setattr(scale_suite, "DUP_BLOOM_SHARD_M_BITS", shard_m)
        if tag == "sharded":
            # the tiny floor/bound must actually force multiple shards
            assert scale_suite._dup_bloom_plan(d.count())[0] == 4
        out[tag] = {
            name: sorted(
                map(tuple, REGISTRY[name].fn(spark, sf_dir).collect())
            )
            for name in ("docs_dup_spans", "docs_dup_span_ranges")
        }
    assert out["sharded"] == out["plain"]
    assert out["sharded"]["docs_dup_spans"]
    release_caches()
