"""Corpus-curation operators, round 4: sketch algebra, semantic dedup,
model-based quality filtering, contamination verdicts, Bloom screening.

These close out the curation toolchain around the existing dedup/ANN
stack (scale_suite): every operator here is the production companion of
one already-shipped primitive —

- ``source_minhash_overlap``: corpus-level MERGEABLE sketch algebra. The
  per-document MinHash family (scale_suite) becomes a per-source union
  sketch via the same min-aggregation, so source-vs-source vocabulary
  overlap costs one linear agg + a sources^2 join (independent of corpus
  size). This is the panel a curator reads before weighting sources.
- ``embedding_semantic_dedup``: SemDeDup-style drop LIST (Abbas et al.,
  arXiv:2303.09540's keep-one-per-semantic-cluster rule) on top of the
  hyperplane-LSH buckets — the decision output, where
  ``embedding_verified_topk`` only reports the top pairs.
- ``docs_quality_classifier``: a fixed-weight linear quality model over
  extracted features (the model-based filter slot in a FineWeb-style
  funnel). Deliberately exp()-free: the score is a rational-arithmetic
  combination bucketed on its ROUNDED value, so both engines compute
  bit-identical verdicts (libm exp is not cross-engine stable).
- ``docs_contamination_frac``: the published overlap-FRACTION
  decontamination rule (GPT-3 appendix-C style): a training doc is
  contaminated when >10% of its distinct 8-grams appear in the eval
  source, not merely when any one does (docs_decontamination's
  any-overlap count is the recall-first screen next to this).
- ``docs_bloom_screen``: a DISTRIBUTED Bloom filter built entirely in
  DataFrame algebra — explode k bit positions, ``bit_or`` the 32-bit
  words, broadcast the O(m)-word bitmap — then a probe pass with
  false-positive accounting against the exact set. At 100 TB this is the
  decontamination screen when the eval gram set outgrows an exact
  broadcast: the bitmap stays m/32 words no matter how many grams enter.

All five are deterministic (md5-keyed, no rand) and oracle-checked
against DuckDB; reference parity: the reference has no curation layer at
all (its dedup is a single SQL DISTINCT — cleaning_pipeline.py:121), so
this entire module is beyond-reference surface in the BASELINE.md sense.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import table
from . import dround, register, sql_dround
from .scale_suite import (
    DECON_EVAL_SOURCE,
    N_HASHES,
    STOPWORDS,
    _SQL_COS_AB,
    _SQL_LSH_BUCKETS_CTE,
    _SQL_SHINGLES,
    _cosine,
    _distinct_shingles,
    _tokens,
    embedding_lsh_buckets,
    gram_rows,
)

# ---------------------------------------------------------------------------
# 1. Cross-source MinHash overlap matrix (mergeable sketch algebra)
# ---------------------------------------------------------------------------

_SQL_SRC_HALVES = """
      SELECT d.source,
             CAST(CAST('0x' || substr(md5(e.s), 1, 8) AS UINTEGER) AS BIGINT) AS h1,
             CAST(CAST('0x' || substr(md5(e.s), 9, 8) AS UINTEGER) AS BIGINT) AS h2
      FROM exploded e JOIN documents d ON d.doc_id = e.doc_id
"""

_SQL_SRC_MINHASH_AGGS = ",\n".join(
    f"             min(h1 + {i} * h2) AS sig_{i}" for i in range(N_HASHES)
)

_SQL_SIG_MATCHES = " + ".join(
    f"CASE WHEN a.sig_{i} = b.sig_{i} THEN 1 ELSE 0 END" for i in range(N_HASHES)
)


@register(
    "source_minhash_overlap",
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES}),
    exploded AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh
    ), halves AS ({_SQL_SRC_HALVES}),
    sigs AS (
      SELECT source,
{_SQL_SRC_MINHASH_AGGS}
      FROM halves GROUP BY source
    )
    SELECT a.source AS src_a, b.source AS src_b,
           CAST({_SQL_SIG_MATCHES} AS BIGINT) AS n_matches,
           {sql_dround(f'({_SQL_SIG_MATCHES}) * 1.0 / {N_HASHES}', 4)}
             AS est_jaccard
    FROM sigs a JOIN sigs b ON a.source < b.source
    """,
)
def source_minhash_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-vs-source vocabulary overlap from MERGED MinHash sketches.

    The per-source sketch is the min over every member document's shingle
    hashes — MinHash minima are union-mergeable, so the per-source
    signature is ONE map-side-combinable groupBy(source) over the shingle
    stream (the same Carter-Wegman h1 + i*h2 family scale_suite's
    per-document signatures use). The pairwise estimate then joins
    |sources|^2 signature rows — constant work no matter the corpus size.
    est_jaccard = matching-component fraction, the standard unbiased
    MinHash estimator. At 100 TB: sketch agg is linear and mergeable
    (combiner-friendly), the join is trivially broadcast.
    """
    d = table(spark, sf_dir, "documents")
    sh = _distinct_shingles(d).join(d.select("doc_id", "source"), "doc_id")
    m = F.md5(F.col("s"))
    halves = sh.select(
        "source",
        F.conv(F.substring(m, 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(m, 9, 8), 16, 10).cast("long").alias("h2"),
    )
    sigs = halves.groupBy("source").agg(
        *[
            F.min(F.col("h1") + i * F.col("h2")).alias(f"sig_{i}")
            for i in range(N_HASHES)
        ]
    )
    # The non-equi pairing join is bounded by |sources|^2; the limit is a
    # no-op at any real source cardinality that doubles as the plan-lint
    # boundedness certificate for the broadcast NLJ side.
    a, b = sigs.alias("a"), sigs.limit(100_000).alias("b")
    matches = None
    for i in range(N_HASHES):
        term = F.when(F.col(f"a.sig_{i}") == F.col(f"b.sig_{i}"), 1).otherwise(0)
        matches = term if matches is None else matches + term
    return (
        a.join(F.broadcast(b), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
            matches.cast("long").alias("n_matches"),
            dround(matches * 1.0 / N_HASHES, 4).alias("est_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# 2. SemDeDup-style semantic drop list over hyperplane-LSH buckets
# ---------------------------------------------------------------------------

SEMDEDUP_TAU = 0.32  # cosine threshold for "semantic duplicate"
# Greedy keep-lowest-id rule: a vector is DROPPED when any LSH-candidate
# partner with a smaller vec_id sits within tau. Chains (a~b, b~c, a!~c)
# drop both b and c — the same greedy order-scan semantics SemDeDup's
# per-cluster keep-one rule yields under an id-ordered scan.


@register(
    "embedding_semantic_dedup",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
    buckets AS (
{_SQL_LSH_BUCKETS_CTE}
    ), cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM buckets a JOIN buckets b
        ON a.table_idx = b.table_idx AND a.bucket = b.bucket
           AND a.vec_id < b.vec_id
    ), close AS (
      SELECT c.vec_a, c.vec_b, {_SQL_COS_AB} AS cos
      FROM cand c
      JOIN e ea ON ea.vec_id = c.vec_a
      JOIN e eb ON eb.vec_id = c.vec_b
      WHERE {sql_dround(_SQL_COS_AB, 6)} >= {SEMDEDUP_TAU}
    )
    SELECT vec_b AS dropped_vec, min(vec_a) AS kept_vec,
           CAST(count(*) AS BIGINT) AS n_close,
           {sql_dround('max(cos)', 6)} AS max_cosine
    FROM close GROUP BY vec_b
    """,
)
def embedding_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-duplicate DROP LIST: every vector within cosine
    SEMDEDUP_TAU of a lower-id LSH-candidate partner, with the kept
    representative (lowest such partner) and the tightest cosine.

    Candidates come from the shared hyperplane-LSH buckets — never an
    all-pairs scan — so the cosine verify is candidate-bounded exactly
    like minhash_verified_pairs' Jaccard verify. The threshold compares
    the ROUNDED cosine (dround 6) so the keep/drop verdict is
    bit-identical across engines even for pairs landing on the boundary.
    Reference parity: none (reference has no embedding surface at all);
    rule follows the public SemDeDup recipe.
    """
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    buckets = embedding_lsh_buckets(spark, sf_dir)
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table_idx") == F.col("b.table_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    ea, eb = e.alias("ea"), e.alias("eb")
    close = (
        cand.join(ea, F.col("vec_a") == F.col("ea.vec_id"))
        .join(eb, F.col("vec_b") == F.col("eb.vec_id"))
        .withColumn("cos", _cosine(F.col("ea.emb"), F.col("eb.emb")))
        .where(dround(F.col("cos"), 6) >= SEMDEDUP_TAU)
    )
    return close.groupBy(F.col("vec_b").alias("dropped_vec")).agg(
        F.min("vec_a").alias("kept_vec"),
        F.count(F.lit(1)).alias("n_close"),
        dround(F.max("cos"), 6).alias("max_cosine"),
    )


# ---------------------------------------------------------------------------
# 3. Fixed-weight linear quality classifier (model-based filter slot)
# ---------------------------------------------------------------------------

# Public-heuristic feature weights (FineWeb/Gopher-flavored): length,
# lexical diversity, stopword density, mean token length. The score is a
# convex combination in [0, 1]; verdicts bucket the ROUNDED score so both
# engines agree bitwise at the thresholds. exp()/logistic deliberately
# avoided: libm differs across engines; a monotone linear score buckets
# identically.
QC_KEEP_T = 0.55
QC_HIGH_T = 0.65


@register(
    "docs_quality_classifier",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, n_chars,
             len(string_split(trim(text), ' ')) AS n_tokens,
             len(list_distinct(string_split(trim(text), ' '))) AS n_unique,
             len(list_filter(string_split(trim(text), ' '),
                 t -> t IN ('the', 'a'))) AS n_stop
      FROM documents
    ), scored AS (
      SELECT doc_id, n_tokens,
             {sql_dround(
                 "0.30 * (least(n_tokens, 200) * 1.0 / 200)"
                 " + 0.35 * (n_unique * 1.0 / greatest(n_tokens, 1))"
                 " + 0.20 * (1.0 - least(n_stop * 4.0 / greatest(n_tokens, 1), 1.0))"
                 " + 0.15 * least((n_chars * 1.0 / greatest(n_tokens, 1)) / 8.0, 1.0)",
                 4,
             )} AS quality_score
      FROM feats
    )
    SELECT doc_id, n_tokens, quality_score,
           CASE WHEN quality_score >= {QC_HIGH_T} THEN 'high'
                WHEN quality_score >= {QC_KEEP_T} THEN 'mid'
                ELSE 'low' END AS quality_label,
           quality_score >= {QC_KEEP_T} AS keep
    FROM scored
    """,
)
def docs_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter: a fixed-weight linear scorer over four
    extracted features (length, unique-token ratio, stopword density,
    mean token length), bucketed into keep/label verdicts on the rounded
    score. One narrow projection — no shuffle, no UDF; at 100 TB this is
    a map-only pass fused into whatever scan precedes it. The weight
    vector is a stand-in for a trained model's coefficients; swapping in
    learned weights changes literals, not the plan.
    """
    d = table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    feats = d.select(
        "doc_id",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).alias("n_stop"),
    )
    nt = F.greatest(F.col("n_tokens"), F.lit(1))
    score = (
        0.30 * (F.least(F.col("n_tokens"), F.lit(200)) * 1.0 / 200)
        + 0.35 * (F.col("n_unique") * 1.0 / nt)
        + 0.20 * (1.0 - F.least(F.col("n_stop") * 4.0 / nt, F.lit(1.0)))
        + 0.15 * F.least((F.col("n_chars") * 1.0 / nt) / 8.0, F.lit(1.0))
    )
    scored = feats.select(
        "doc_id", "n_tokens", dround(score, 4).alias("quality_score")
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "quality_score",
        F.when(F.col("quality_score") >= QC_HIGH_T, "high")
        .when(F.col("quality_score") >= QC_KEEP_T, "mid")
        .otherwise("low")
        .alias("quality_label"),
        (F.col("quality_score") >= QC_KEEP_T).alias("keep"),
    )


# ---------------------------------------------------------------------------
# 4. Contamination FRACTION verdict (published-threshold rule)
# ---------------------------------------------------------------------------

CONTAM_GRAM_K = 8  # published decontamination rules use 8-13 token grams
CONTAM_FRAC_T = 0.10  # >10% of a doc's grams in eval => contaminated


@register(
    "docs_contamination_frac",
    oracle=f"""
    WITH toks AS (
      SELECT d.doc_id, d.source, string_split(trim(d.text), ' ') AS t
      FROM documents d
    ), grams_raw AS (
      SELECT doc_id, source,
             unnest(list_transform(
               range(1, greatest(len(t) - {CONTAM_GRAM_K - 2}, 1)),
               i -> array_to_string(t[i : i + {CONTAM_GRAM_K - 1}], ' '))) AS g
      FROM toks
      WHERE len(t) >= {CONTAM_GRAM_K}
    ), grams AS (
      SELECT DISTINCT doc_id, source, g FROM grams_raw
    ), eval_g AS (
      SELECT DISTINCT g FROM grams WHERE source = '{DECON_EVAL_SOURCE}'
    ), probe AS (
      SELECT gr.doc_id, gr.g, ev.g IS NOT NULL AS hit
      FROM grams gr LEFT JOIN eval_g ev ON gr.g = ev.g
      WHERE gr.source <> '{DECON_EVAL_SOURCE}'
    ), frac AS (
      SELECT doc_id,
             count(*) AS n_grams,
             CAST(count(CASE WHEN hit THEN 1 END) AS BIGINT) AS n_overlap,
             {sql_dround('count(CASE WHEN hit THEN 1 END) * 1.0 / count(*)', 4)}
               AS overlap_frac
      FROM probe GROUP BY doc_id
    )
    SELECT doc_id, n_grams, n_overlap, overlap_frac,
           overlap_frac > {CONTAM_FRAC_T} AS contaminated
    FROM frac
    """,
)
def docs_contamination_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-training-doc eval-overlap FRACTION with the published >10%
    verdict (GPT-3-style dirty-document rule), over distinct 8-token
    grams. Zero-overlap docs are INCLUDED (left join against the
    broadcast eval set), because the downstream mix needs the clean
    verdict rows too — docs_decontamination's inner-join count is the
    flag-only twin. Scale shape identical to every gram screen here:
    shuffle-free gram generation, tiny broadcast eval side, one hash agg.
    """
    d = table(spark, sf_dir, "documents")
    # gram_rows already filters docs shorter than the gram length
    grams = (
        gram_rows(d, CONTAM_GRAM_K, out="g")
        .distinct()
        .join(d.select("doc_id", "source"), "doc_id")
    )
    eval_g = (
        grams.where(F.col("source") == DECON_EVAL_SOURCE)
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    probe = (
        grams.where(F.col("source") != DECON_EVAL_SOURCE)
        .join(F.broadcast(eval_g), "g", "left")
    )
    frac = probe.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count(F.when(F.col("hit"), 1)).alias("n_overlap"),
        dround(F.count(F.when(F.col("hit"), 1)) * 1.0 / F.count(F.lit(1)), 4)
        .alias("overlap_frac"),
    )
    return frac.select(
        "doc_id",
        "n_grams",
        "n_overlap",
        "overlap_frac",
        (F.col("overlap_frac") > CONTAM_FRAC_T).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# 5. Distributed Bloom-filter decontamination screen with FP accounting
# ---------------------------------------------------------------------------

BLOOM_M_BITS = 131072  # 2^17 bits = 4096 x 32-bit words (~16 KiB bitmap)
BLOOM_K = 3  # hash functions: pos_j = (h1 + j*h2) mod m, j in 0..2
# 32-bit words (bit index < 32) so masks never touch a BIGINT sign bit on
# either engine; the bitmap broadcasts at m/32 = 4096 rows regardless of
# how many grams were inserted — THE property that makes a Bloom screen
# viable when the exact eval gram set outgrows a broadcast.

_SQL_BLOOM_HALVES = """
      SELECT doc_id, source, s,
             CAST(CAST('0x' || substr(md5(s), 1, 8) AS UINTEGER) AS BIGINT) AS h1,
             CAST(CAST('0x' || substr(md5(s), 9, 8) AS UINTEGER) AS BIGINT) AS h2
      FROM tagged
"""

_SQL_BLOOM_POSITIONS = "\n      UNION ALL\n".join(
    f"      SELECT doc_id, source, s, ((h1 + {j} * h2) % {BLOOM_M_BITS}) AS pos"
    f" FROM halves"
    for j in range(BLOOM_K)
)


@register(
    "docs_bloom_screen",
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES}),
    exploded AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh
    ), tagged AS (
      SELECT e.doc_id, d.source, e.s FROM exploded e
      JOIN documents d ON d.doc_id = e.doc_id
    ), halves AS ({_SQL_BLOOM_HALVES}),
    positions AS (
{_SQL_BLOOM_POSITIONS}
    ), bloom AS (
      SELECT pos // 32 AS word_idx,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS word
      FROM positions WHERE source = '{DECON_EVAL_SOURCE}'
      GROUP BY pos // 32
    ), probe AS (
      SELECT p.doc_id, p.s,
             CASE WHEN (coalesce(b.word, 0)
                        & (CAST(1 AS BIGINT) << CAST(p.pos % 32 AS INTEGER)))
                  <> 0 THEN 1 ELSE 0 END AS bit_set
      FROM positions p LEFT JOIN bloom b ON b.word_idx = p.pos // 32
      WHERE p.source <> '{DECON_EVAL_SOURCE}'
    ), per_gram AS (
      SELECT doc_id, s, min(bit_set) = 1 AS bloom_pos
      FROM probe GROUP BY doc_id, s
    ), eval_s AS (
      SELECT DISTINCT s FROM tagged WHERE source = '{DECON_EVAL_SOURCE}'
    ), flagged AS (
      SELECT g.doc_id, g.bloom_pos, ev.s IS NOT NULL AS exact_hit
      FROM per_gram g LEFT JOIN eval_s ev ON g.s = ev.s
    )
    SELECT doc_id,
           count(*) AS n_grams,
           CAST(count(CASE WHEN bloom_pos THEN 1 END) AS BIGINT) AS n_bloom_hits,
           CAST(count(CASE WHEN exact_hit THEN 1 END) AS BIGINT) AS n_exact_hits,
           CAST(count(CASE WHEN bloom_pos AND NOT coalesce(exact_hit, FALSE)
                      THEN 1 END) AS BIGINT) AS n_false_pos
    FROM flagged GROUP BY doc_id
    """,
)
def docs_bloom_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Bloom-filter decontamination screen, built and probed
    entirely in DataFrame algebra, with per-doc false-positive accounting
    against the exact set.

    BUILD: the eval source's distinct shingles each set BLOOM_K bit
    positions (Carter-Wegman h1 + j*h2 from one md5 — the same family as
    the MinHash permutations); a groupBy(word_idx) ``bit_or`` folds them
    into <=4096 32-bit words. The agg is map-side combinable, so the
    build is one linear pass however large the eval set.

    PROBE: training shingles re-derive their positions map-side and
    left-join the BROADCAST bitmap; a gram is bloom-positive iff all K
    bits are set (min over bit flags). Bloom-positive is a strict
    superset of exact membership (no false negatives — locked by pytest);
    n_false_pos measures the m/n-dependent FP mass. At 100 TB the exact
    join here is replaced by sampling; the screen itself stays O(m)
    memory — the reason production decontamination uses Bloom filters at
    all.
    """
    d = table(spark, sf_dir, "documents")
    tagged = _distinct_shingles(d).join(d.select("doc_id", "source"), "doc_id")
    m = F.md5(F.col("s"))
    halves = tagged.select(
        "doc_id",
        "source",
        "s",
        F.conv(F.substring(m, 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(m, 9, 8), 16, 10).cast("long").alias("h2"),
    )
    positions = halves.select(
        "doc_id",
        "source",
        "s",
        F.explode(
            F.array(
                *[
                    ((F.col("h1") + j * F.col("h2")) % BLOOM_M_BITS)
                    for j in range(BLOOM_K)
                ]
            )
        ).alias("pos"),
    )
    word_idx = F.expr("pos div 32")
    # SQL shiftleft accepts a column shift amount (the PySpark wrapper
    # only takes a literal int)
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
    bloom = (
        positions.where(F.col("source") == DECON_EVAL_SOURCE)
        .select(word_idx.alias("word_idx"), mask.alias("mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )
    probe = (
        positions.where(F.col("source") != DECON_EVAL_SOURCE)
        .select("doc_id", "s", word_idx.alias("word_idx"), mask.alias("mask"))
        .join(F.broadcast(bloom), "word_idx", "left")
        .select(
            "doc_id",
            "s",
            F.when(
                (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask")))
                != 0,
                1,
            )
            .otherwise(0)
            .alias("bit_set"),
        )
    )
    per_gram = probe.groupBy("doc_id", "s").agg(
        (F.min("bit_set") == 1).alias("bloom_pos")
    )
    eval_s = (
        tagged.where(F.col("source") == DECON_EVAL_SOURCE)
        .select("s")
        .distinct()
        .withColumn("exact_hit", F.lit(True))
    )
    flagged = per_gram.join(F.broadcast(eval_s), "s", "left")
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count(F.when(F.col("bloom_pos"), 1)).alias("n_bloom_hits"),
        F.count(F.when(F.col("exact_hit"), 1)).alias("n_exact_hits"),
        F.count(F.when(F.col("bloom_pos") & ~F.coalesce(F.col("exact_hit"), F.lit(False)), 1))
        .alias("n_false_pos"),
    )
