"""Sources & sinks: validated CSV ingestion, testdata parquet, merge writers."""
