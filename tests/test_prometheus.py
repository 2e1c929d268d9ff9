"""Prometheus export bridge tests (VERDICT r1 #6): counter values after a
real cleaning run, exposition format, streaming-listener bridge, and the
stdlib /metrics endpoint."""

from __future__ import annotations

import urllib.request

import pytest
from pyspark.sql import functions as F

from edu_data_pipeline_spark.operators.metrics import observe_cleaning
from edu_data_pipeline_spark.operators.prometheus import (
    CLEANING_DUP_RATE,
    CLEANING_FAILED,
    CLEANING_PROCESSED,
    PromRegistry,
    export_cleaning_observation,
    export_stream_progress,
    serve_metrics,
)


def test_exposition_format():
    reg = PromRegistry()
    reg.counter("a_total", "help a").inc(3)
    reg.gauge("b", "help b").set(0.25)
    reg.histogram("c_seconds", "help c", buckets=(1.0, float("inf"))).observe(0.5)
    text = reg.exposition()
    assert "# TYPE a_total counter\na_total 3\n" in text
    assert "# TYPE b gauge\nb 0.25\n" in text
    assert 'c_seconds_bucket{le="1"} 1' in text
    assert 'c_seconds_bucket{le="+Inf"} 1' in text
    assert "c_seconds_sum 0.5" in text
    assert "c_seconds_count 1" in text


def test_reregistration_returns_same_collector():
    reg = PromRegistry()
    c1 = reg.counter("x_total")
    c1.inc(2)
    c2 = reg.counter("x_total")
    assert c2.value == 2
    with pytest.raises(ValueError):
        reg.gauge("x_total")
    with pytest.raises(ValueError):
        c1.inc(-1)


def test_export_after_cleaning_run(spark):
    df = spark.createDataFrame(
        [("STU001", 100, False), ("STU002", 80, True), ("STU003", 90, False)],
        "student_id string, quality_score int, is_duplicate boolean",
    )
    obs = observe_cleaning(df)
    obs.df.write.format("noop").mode("overwrite").save()  # action triggers observe
    reg = PromRegistry()
    export_cleaning_observation(reg, obs, duration_seconds=1.2)
    assert reg.counter(CLEANING_PROCESSED).value == 3
    assert reg.counter(CLEANING_FAILED).value == 2  # quality < 100
    assert reg.gauge(CLEANING_DUP_RATE).value == pytest.approx(1 / 3)
    text = reg.exposition()
    assert "cleaning_records_processed_total 3" in text
    assert "cleaning_processing_seconds_count 1" in text


def test_stream_progress_bridge_idempotent():
    class FakeListener:
        batches = [
            {"batch_id": 0, "num_input_rows": 10, "batch_duration_seconds": 0.2},
            {"batch_id": 1, "num_input_rows": 5, "batch_duration_seconds": None},
        ]

    lis = FakeListener()
    reg = PromRegistry()
    export_stream_progress(reg, lis)
    export_stream_progress(reg, lis)  # second call must not double-count
    assert reg.counter("kafka_events_consumed_total").value == 15
    lis.batches.append({"batch_id": 2, "num_input_rows": 1, "batch_duration_seconds": 0.1})
    export_stream_progress(reg, lis)
    assert reg.counter("kafka_events_consumed_total").value == 16


def test_metrics_http_endpoint():
    reg = PromRegistry()
    reg.counter("served_total", "served").inc(7)
    server = serve_metrics(reg, port=18901)
    try:
        body = urllib.request.urlopen(
            "http://127.0.0.1:18901/metrics", timeout=5
        ).read().decode()
        assert "served_total 7" in body
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen("http://127.0.0.1:18901/nope", timeout=5)
    finally:
        server.shutdown()
