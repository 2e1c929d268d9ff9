"""Cache-lifecycle convention (VERDICT r4 #2/#6).

Registry queries return lazy DataFrames, so intermediates they persist
must outlive the function call — the convention is: suite code persists
ONLY via suite.persist_tracked(), and every consuming harness calls
suite.release_caches() afterwards. Two guards here:

1. Lint: no direct ``.persist(`` / ``.cache(`` call anywhere under
   ``suite/`` (the tracked helper in ``suite/__init__.py`` is the single
   allowed site). A new persist that bypasses tracking would leak cached
   partitions across a 50+-query bench run — exactly the r4 regression.
2. Function: running the heaviest persist-using query and releasing
   leaves ZERO persistent RDDs in the session.
"""

from __future__ import annotations

import pathlib
import re

import edu_data_pipeline_spark.suite as suite_pkg
from edu_data_pipeline_spark.suite import load_all, release_caches

SUITE_DIR = pathlib.Path(suite_pkg.__file__).parent
SF = "/root/testdata/sf0.001"


def test_no_untracked_persist_in_suite():
    pat = re.compile(r"\.(persist|cache)\(")
    offenders = []
    for path in sorted(SUITE_DIR.glob("*.py")):
        if path.name == "__init__.py":
            continue  # persist_tracked's own df.persist() lives here
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if pat.search(line):
                offenders.append(f"{path.name}:{i}: {line.strip()}")
    assert not offenders, (
        "direct persist/cache in suite code — use suite.persist_tracked() "
        "so harnesses can release it:\n" + "\n".join(offenders)
    )


def test_tracked_persists_release_cleanly(spark):
    registry = load_all()
    # Earlier tests in the shared session may hold their own (ingest)
    # caches or un-released tracked frames — flush the tracked ones,
    # then the invariant is that THIS query's tracked persists all come
    # and go, i.e. the persistent-RDD count returns to baseline.
    release_caches()
    baseline = spark.sparkContext._jsc.getPersistentRDDs().size()
    # embedding_semantic_dedup persists its cluster-assignment frame;
    # brand_basket_lift persists its basket frame. Run both, consume,
    # release.
    for name in ("embedding_semantic_dedup", "brand_basket_lift"):
        registry[name].fn(spark, SF).count()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() > baseline, (
        "expected tracked persists to be live before release"
    )
    release_caches()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == baseline, (
        "release_caches() left cached partitions behind"
    )


def test_release_is_idempotent_and_safe_when_empty():
    release_caches()
    release_caches()
