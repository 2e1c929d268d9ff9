"""Large-scale training-data-pipeline operators: dedup, ANN, text analysis.

These extend the reference surface per the BASELINE north star; each is a
first-class queries() entry on the documents/embeddings tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import table
from . import register

# (entries added as operators land)
