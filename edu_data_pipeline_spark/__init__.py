"""edu_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference `Mat-hack/edu-data-pipeline` ("EduFlow AI"):
CSV ingestion, deterministic cleaning/validation (the 10 cleaning rules),
a dimensional star-schema warehouse, analytics views, streaming analytics,
plus large-scale training-data-pipeline operators (deduplication,
similarity search, text analysis, multimodal columns).

Everything is expressed with the DataFrame/SQL API so Catalyst + Tungsten
pick the physical strategy; Python UDFs appear only where the semantics
genuinely cannot be expressed natively (see functions.similarity).
"""

__version__ = "0.1.0"
