"""Kafka source/sink wiring (reference kafka/streaming.py:25-131).

The reference runs a hand-rolled kafka-python producer/consumer pair over
five topics (docx Part 2):

- ``raw.student.events``        — producer replays CSV rows as JSON
- ``processed.cleaned.events``  — consumer republishes cleaned events
- ``processed.enriched.events`` — enriched events
- ``alerts.anomalies``          — anomalous events (error_rate > 0.2)
- ``dlq.failed.events``         — per-event failures

Here the same topology is Structured Streaming's Kafka connector: ONE
``readStream.format("kafka")`` source and per-topic ``writeStream`` sinks,
each with its own checkpoint directory (exactly-once per sink). The
sandbox has no broker and no spark-sql-kafka jar, so construction is
split in two layers:

1. Pure option/record plumbing — option dicts, ``from_json`` value
   parsing, topic routing, JSON record encoding. All unit-tested on
   static DataFrames shaped exactly like the connector's output schema
   (key/value binary + topic/partition/offset/timestamp).
2. The thin ``format("kafka")`` reader/writer construction, used only
   when ``kafka_available(spark)`` (i.e. on a real cluster with the
   connector jar); everything above it is broker-independent.

Scale: the source parallelism follows Kafka partitions (one Spark task
per partition slice); sinks are per-topic so alert volume (tiny) does not
checkpoint-couple with the cleaned firehose.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .jobs import PROGRESS_EVENT_SCHEMA

RAW_TOPIC = "raw.student.events"
CLEANED_TOPIC = "processed.cleaned.events"
ENRICHED_TOPIC = "processed.enriched.events"
ALERTS_TOPIC = "alerts.anomalies"
DLQ_TOPIC = "dlq.failed.events"


@dataclass
class KafkaConfig:
    """Connection + topology config (reference: KAFKA_BOOTAP_SERVERS env +
    hardcoded topic names, kafka/streaming.py:16-23)."""

    bootstrap_servers: str = "localhost:9092"
    raw_topic: str = RAW_TOPIC
    cleaned_topic: str = CLEANED_TOPIC
    enriched_topic: str = ENRICHED_TOPIC
    alerts_topic: str = ALERTS_TOPIC
    dlq_topic: str = DLQ_TOPIC
    starting_offsets: str = "latest"
    max_offsets_per_trigger: int | None = 10_000
    checkpoint_root: str = "/tmp/eduflow-checkpoints"
    fail_on_data_loss: bool = False
    # security/client passthrough, e.g. {"kafka.security.protocol": "SASL_SSL"}
    extra_options: dict[str, str] = field(default_factory=dict)

    def checkpoint_for(self, sink_name: str) -> str:
        return f"{self.checkpoint_root}/{sink_name}"


def kafka_source_options(cfg: KafkaConfig) -> dict[str, str]:
    """Reader options for the raw-events subscription."""
    opts = {
        "kafka.bootstrap.servers": cfg.bootstrap_servers,
        "subscribe": cfg.raw_topic,
        "startingOffsets": cfg.starting_offsets,
        "failOnDataLoss": str(cfg.fail_on_data_loss).lower(),
    }
    if cfg.max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(cfg.max_offsets_per_trigger)
    opts.update(cfg.extra_options)
    return opts


def kafka_sink_options(cfg: KafkaConfig, topic: str, sink_name: str) -> dict[str, str]:
    """Writer options for one output topic (checkpoint per sink)."""
    opts = {
        "kafka.bootstrap.servers": cfg.bootstrap_servers,
        "topic": topic,
        "checkpointLocation": cfg.checkpoint_for(sink_name),
    }
    opts.update(cfg.extra_options)
    return opts


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Value plumbing (broker-independent, unit-tested)
# ---------------------------------------------------------------------------


def parse_kafka_events(raw: DataFrame) -> DataFrame:
    """Kafka record batch -> typed event rows.

    ``raw`` has the connector's fixed schema (key/value binary, topic,
    partition, offset, timestamp, timestampType). JSON decode failures do
    NOT kill the query (the reference's per-event try/except,
    kafka/streaming.py:97-114): ``parse_ok=false`` rows carry the raw
    payload for the DLQ.
    """
    # PERMISSIVE from_json returns an all-null struct (not a NULL struct)
    # for malformed payloads, so failure detection uses the standard
    # _corrupt_record column instead of a null check.
    # (build a NEW StructType: .add() would mutate the shared schema)
    corrupt_schema = T.StructType(
        list(PROGRESS_EVENT_SCHEMA.fields)
        + [T.StructField("_corrupt_record", T.StringType())]
    )
    parsed = raw.select(
        F.col("key").cast("string").alias("kafka_key"),
        F.col("value").cast("string").alias("raw_value"),
        F.col("topic").alias("kafka_topic"),
        F.col("partition").alias("kafka_partition"),
        F.col("offset").alias("kafka_offset"),
        F.col("timestamp").alias("kafka_timestamp"),
        F.from_json(
            F.col("value").cast("string"),
            corrupt_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("event"),
    )
    event_fields = [f.name for f in PROGRESS_EVENT_SCHEMA.fields]
    return parsed.select(
        "kafka_key",
        "raw_value",
        "kafka_topic",
        "kafka_partition",
        "kafka_offset",
        "kafka_timestamp",
        *[F.col(f"event.{name}").alias(name) for name in event_fields],
        (F.col("event").isNotNull() & F.col("event._corrupt_record").isNull()).alias(
            "parse_ok"
        ),
    )


def to_kafka_records(df: DataFrame, key_col: str | None = "event_id") -> DataFrame:
    """Typed rows -> (key, value) Kafka records; value is the full row as
    JSON (the reference publishes whole event dicts)."""
    payload_cols = [c for c in df.columns if c != key_col]
    key = (
        F.col(key_col).cast("string").alias("key")
        if key_col and key_col in df.columns
        else F.lit(None).cast("string").alias("key")
    )
    return df.select(
        key,
        F.to_json(F.struct(*[F.col(c) for c in payload_cols])).alias("value"),
    )


def dlq_records(parsed: DataFrame, error: Column | None = None) -> DataFrame:
    """Failed rows -> DLQ payload ``{event, error}`` like the reference
    (kafka/streaming.py:112-114: json.dumps({"event": ..., "error": ...}))."""
    err = error if error is not None else F.lit("json-decode-failed")
    bad = parsed.where(~F.col("parse_ok"))
    return bad.select(
        F.col("kafka_key").alias("key"),
        F.to_json(
            F.struct(
                F.col("raw_value").alias("event"),
                err.alias("error"),
            )
        ).alias("value"),
    )


# ---------------------------------------------------------------------------
# Reader / writer construction (needs the connector jar at .load()/start())
# ---------------------------------------------------------------------------


def read_kafka_events(spark: SparkSession, cfg: KafkaConfig) -> DataFrame:
    """The raw-events source: subscribe + parse. Requires the connector."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(cfg).items():
        reader = reader.option(k, v)
    return parse_kafka_events(reader.load())


def kafka_topic_writer(
    records: DataFrame,
    cfg: KafkaConfig,
    topic: str,
    sink_name: str,
    output_mode: str = "append",
):
    """A configured (unstarted) writeStream to one topic."""
    writer = records.writeStream.format("kafka").outputMode(output_mode).queryName(
        sink_name
    )
    for k, v in kafka_sink_options(cfg, topic, sink_name).items():
        writer = writer.option(k, v)
    return writer


def build_topic_routing(
    cleaned: DataFrame,
    dlq: DataFrame,
    alerts: DataFrame,
    cfg: KafkaConfig,
    enriched: DataFrame | None = None,
) -> list[tuple[str, str, DataFrame]]:
    """The reference's consumer fan-out as (sink_name, topic, records):
    cleaned -> processed.cleaned.events, enriched ->
    processed.enriched.events, anomalies -> alerts.anomalies, failures ->
    dlq.failed.events (kafka/streaming.py:104-114)."""
    routes = [
        ("cleaned-events", cfg.cleaned_topic, to_kafka_records(cleaned, "event_id")),
        ("anomaly-alerts", cfg.alerts_topic, to_kafka_records(alerts, "student_id")),
        ("dlq-events", cfg.dlq_topic, dlq),
    ]
    if enriched is not None:
        routes.insert(
            1,
            (
                "enriched-events",
                cfg.enriched_topic,
                to_kafka_records(enriched, "event_id"),
            ),
        )
    return routes


def start_kafka_pipeline(spark: SparkSession, cfg: KafkaConfig):
    """End-to-end wiring for a real cluster: source -> shared cleaning ->
    routed topic sinks. Returns the started StreamingQuery handles.

    Kept thin on purpose: every transformation inside is the
    broker-independent, unit-tested layer; this function only glues the
    connector on both ends.
    """
    from .jobs import (
        clean_event_stream,
        enrich_event_stream,
        route_streams,
        windowed_student_metrics,
    )

    parsed = read_kafka_events(spark, cfg)
    bad = dlq_records(parsed)
    cleaned = clean_event_stream(parsed.where(F.col("parse_ok")))
    good, invalid = route_streams(cleaned)
    enriched = enrich_event_stream(good)
    metrics = windowed_student_metrics(good)
    alerts = metrics.where(F.col("anomaly"))
    queries = []
    for sink_name, topic, records in build_topic_routing(
        good, bad, alerts, cfg, enriched=enriched
    ):
        queries.append(
            kafka_topic_writer(records, cfg, topic, sink_name).start()
        )
    # validation failures also go to the DLQ topic (distinct checkpoint)
    invalid_records = to_kafka_records(
        invalid.withColumn("error", F.lit("failed-validation")), "event_id"
    )
    queries.append(
        kafka_topic_writer(invalid_records, cfg, cfg.dlq_topic, "dlq-invalid").start()
    )
    return queries
