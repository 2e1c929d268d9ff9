"""CLI + atomic-corpus-write contract for scripts/lsh_adaptive_probe.py
(ADVICE r11 #1/#2).

The hand-rolled ``--dim`` parsing raised IndexError on a missing value,
accepted non-positive widths, and silently ignored ``--dim`` without
``--uniform``; corpus generation reused any existing embeddings.parquet,
including one truncated by an interrupted run. Parsing and the
materialize helper are testable without a SparkSession.
"""

from __future__ import annotations

import pathlib
import sys

import pytest

sys.path.insert(
    0, str(pathlib.Path(__file__).resolve().parent.parent / "scripts")
)
import lsh_adaptive_probe as probe  # noqa: E402


def test_parse_defaults():
    args = probe.parse_args([])
    assert not args.uniform and args.dim is None


def test_parse_uniform_dim():
    args = probe.parse_args(["--uniform", "--dim", "64"])
    assert args.uniform and args.dim == 64


def test_dim_requires_value():
    with pytest.raises(SystemExit) as exc:
        probe.parse_args(["--uniform", "--dim"])
    assert exc.value.code == 2


def test_dim_must_be_positive():
    for bad in ("0", "-3"):
        with pytest.raises(SystemExit) as exc:
            probe.parse_args(["--uniform", "--dim", bad])
        assert exc.value.code == 2


def test_dim_without_uniform_rejected():
    # not silently ignored: the standard corpus dim is pinned (recorded
    # exponents depend on it), so a lone --dim is a usage error
    with pytest.raises(SystemExit) as exc:
        probe.parse_args(["--dim", "64"])
    assert exc.value.code == 2


def test_materialize_is_atomic(tmp_path):
    target = tmp_path / "embeddings.parquet"

    def interrupted_writer(p: pathlib.Path, payload: str) -> None:
        p.write_text("partial")
        raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        probe._materialize(target, interrupted_writer, "x")
    # neither a truncated target nor a leftover temp file survives
    assert not target.exists()
    assert list(tmp_path.iterdir()) == []

    def good_writer(p: pathlib.Path, payload: str) -> None:
        p.write_text(payload)

    probe._materialize(target, good_writer, "complete")
    assert target.read_text() == "complete"

    # existing complete file is reused, not rewritten
    def exploding_writer(p: pathlib.Path, payload: str) -> None:
        raise AssertionError("must not be called for an existing corpus")

    probe._materialize(target, exploding_writer, "y")
    assert target.read_text() == "complete"
