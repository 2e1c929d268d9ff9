"""Re-fit the candidate-volume capacity rows on a df-STATIONARY corpus.

Why this exists (VERDICT r8 "what's wrong" #2 / next-round #3): the
driver testdata's duplicate structure is not sf-invariant — the
generator draws from a bounded template pool, so every shingle's
document frequency grows ~ proportionally with corpus size, and
pair-candidate volume grows ~ df^2/2 (measured 101x candidates for 10x
docs, `scripts/jaccard_cap_probe.py`). The two-point alpha fit for
`docs_jaccard_top_pairs` (1.54) and `minhash_band_sweep` (1.24)
therefore extrapolates a CORPUS artifact, not the engine: on a corpus
whose dup structure is scale-free, candidates are linear in corpus
size. This script builds that corpus and re-runs the identical
stage-byte measurement protocol on it.

Corpus construction (deterministic, seeded):
- every base token is salted with its document's id (``g{d}w{k}``), so
  a shingle NEVER collides across unrelated documents — unique-doc
  shingle df is exactly 1 at ANY corpus size;
- a FIXED 20% of documents participate in duplication, as pairs: each
  doc with id % 10 == 1 is a near-copy of id-1 (shared prefix, its own
  salted suffix) — shared-shingle df is exactly 2 at ANY corpus size;
- lengths 60-180 tokens, drawn per-doc from a doc-id-seeded rng, so
  the two tiers differ ONLY in document count (10x).

So df ∈ {1, 2} with fixed proportions — the dup structure is
sf-invariant by construction, which is the regime the LSH-caveat in
SCALE.md says the projection applies to.

Usage:
    python scripts/df_stationary_fit.py [query ...]
        (default: docs_jaccard_top_pairs minhash_band_sweep)

Writes tiers to $DFSTAT_ROOT (default /tmp/dfstat) as sf1/ (2,000
docs) and sf10/ (20,000 docs) on first run; prints one markdown row
per query with the re-fitted alpha.
"""

from __future__ import annotations

import math
import os
import pathlib
import random
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from capacity_plan import _scanned_bytes, _shuffle_total  # noqa: E402

from edu_data_pipeline_spark.session import get_spark  # noqa: E402
from edu_data_pipeline_spark.suite import load_all, release_caches  # noqa: E402

ROOT = os.environ.get("DFSTAT_ROOT", "/tmp/dfstat")
TIERS = {"sf1": 2_000, "sf10": 20_000}
SEED = 20260815
DUP_SUFFIX_FRAC = 0.15  # tail share replaced in the near-copy


def _doc_tokens(d: int) -> list[str]:
    rng = random.Random(f"{SEED}:{d}")
    n = rng.randrange(60, 180)
    return [f"g{d}w{k}" for k in range(n)]


def _texts(n_docs: int):
    for d in range(n_docs):
        if d % 10 == 1:
            src = _doc_tokens(d - 1)
            keep = max(8, int(len(src) * (1.0 - DUP_SUFFIX_FRAC)))
            toks = src[:keep] + [f"g{d}u{k}" for k in range(len(src) - keep)]
        else:
            toks = _doc_tokens(d)
        yield d, " ".join(toks)


def _ensure_corpus() -> None:
    import pandas as pd

    for tier, n_docs in TIERS.items():
        path = pathlib.Path(ROOT) / tier / "documents.parquet"
        if path.exists():
            continue
        path.parent.mkdir(parents=True, exist_ok=True)
        rows = [
            (d, t, "en", f"src{d % 5}", len(t)) for d, t in _texts(n_docs)
        ]
        pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        ).to_parquet(path, index=False)
        print(f"wrote {path} ({n_docs} docs)")


def main() -> None:
    queries = sys.argv[1:] or ["docs_jaccard_top_pairs", "minhash_band_sweep"]
    _ensure_corpus()
    spark = get_spark(app_name="df-stationary-fit")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    tiers = [f"{ROOT}/{t}" for t in TIERS]
    # warm-up through the same write path, unmeasured
    registry[queries[0]].fn(spark, tiers[0]).write.format("noop").mode(
        "overwrite"
    ).save()
    release_caches()
    print("| query | input@sf10 MB | shuffle@sf10 MB | sh/in @sf1 | "
          "sh/in @sf10 | alpha (df-stationary) |")
    print("|---|---|---|---|---|---|")
    for name in queries:
        meas = []
        for sf_dir in tiers:
            df = registry[name].fn(spark, sf_dir)
            scanned = _scanned_bytes(df, sf_dir)
            sh0 = _shuffle_total(spark)
            df.write.format("noop").mode("overwrite").save()
            release_caches()
            spark.catalog.clearCache()
            meas.append((scanned, _shuffle_total(spark) - sh0))
        (in_a, sh_a), (in_b, sh_b) = meas
        alpha = (
            math.log(sh_b / sh_a) / math.log(in_b / in_a)
            if sh_a > 0 and sh_b > 0 and in_b > in_a > 0
            else float("nan")
        )
        print(
            f"| {name} | {in_b / 1e6:.1f} | {sh_b / 1e6:.1f} "
            f"| {sh_a / in_a:.3f} | {sh_b / in_b:.3f} | {alpha:.2f} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
