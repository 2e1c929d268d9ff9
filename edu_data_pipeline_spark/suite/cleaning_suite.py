"""Cleaning-rule queries over the testdata (C1-C13, D1/D2, Q).

Pattern: derive a deterministic DIRTY frame from the synthetic tables with
the SAME expressions on both engines, then clean it with the rule library.
This proves the rule semantics end-to-end against the DuckDB oracle on
driver data (the reference's own CSV corpus is covered by pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import table
from . import register

# (entries added as operators land)
