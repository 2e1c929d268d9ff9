"""Structured Streaming tests: shared cleaning, windows, DLQ routing,
foreachBatch upsert. Uses a JSON file source + memory sinks."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from edu_data_pipeline_spark.operators.warehouse import ParquetMergeWriter
from edu_data_pipeline_spark.streaming import jobs

EVENTS_BATCH_1 = [
    {"event_id": "evt-001", "student_id": "STU001", "course_id": "CRS001",
     "event_type": "video_watched", "event_timestamp": "2024-02-01T10:00:00",
     "duration_seconds": "600", "score": "80.0", "module_id": "MOD001",
     "completion_percentage": "50.0"},
    {"event_id": "evt-002", "student_id": "stu-2", "course_id": "CRS001",
     "event_type": "quiz_completed", "event_timestamp": "2024-02-01T10:02:00",
     "duration_seconds": "300", "score": "150.0", "module_id": "MOD001",
     "completion_percentage": "100.0"},
    {"event_id": "evt-003", "student_id": "STU001", "course_id": "CRS002",
     "event_type": "quiz_completed", "event_timestamp": "2024-02-01T10:03:00",
     "duration_seconds": "x", "score": "not-a-score", "module_id": "MOD002",
     "completion_percentage": "10.0"},
]

EVENTS_BATCH_2 = [
    # same key as evt-001 -> upsert overwrite
    {"event_id": "evt-001", "student_id": "STU001", "course_id": "CRS001",
     "event_type": "video_watched", "event_timestamp": "2024-02-01T10:10:00",
     "duration_seconds": "900", "score": "90.0", "module_id": "MOD001",
     "completion_percentage": "75.0"},
    {"event_id": "evt-004", "student_id": "STU003", "course_id": "CRS003",
     "event_type": "assignment_submitted", "event_timestamp": "2024-02-01T10:11:00",
     "duration_seconds": "100", "score": "70.0", "module_id": "MOD003",
     "completion_percentage": "20.0"},
]


def write_events(path: str, events: list[dict], name: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def ref_ts():
    return F.lit("2026-08-13 00:00:00").cast("timestamp")


def test_stream_clean_and_route(spark, tmp_path):
    src = str(tmp_path / "events")
    write_events(src, EVENTS_BATCH_1, "b1.json")
    stream = jobs.read_event_stream_json(spark, src)
    assert stream.isStreaming
    cleaned = jobs.clean_event_stream(stream, ref_ts=ref_ts())
    good, dlq = jobs.route_streams(cleaned)

    q1 = good.writeStream.format("memory").queryName("good_sink").outputMode("append").start()
    q2 = dlq.writeStream.format("memory").queryName("dlq_sink").outputMode("append").start()
    q1.processAllAvailable()
    q2.processAllAvailable()
    q1.stop(); q2.stop()

    good_rows = {r.event_id: r for r in spark.sql("SELECT * FROM good_sink").collect()}
    dlq_rows = {r.event_id: r for r in spark.sql("SELECT * FROM dlq_sink").collect()}
    assert set(good_rows) == {"evt-001"}
    # evt-002: score 150 capped -> is_score_valid False -> routed to DLQ
    assert set(dlq_rows) == {"evt-002", "evt-003"}
    assert float(dlq_rows["evt-002"].score) == 100.0
    assert dlq_rows["evt-002"].student_id == "STU002"  # shared C1 rule applied
    assert dlq_rows["evt-003"].score is None
    assert good_rows["evt-001"].quality_score == 100


def test_stream_windowed_metrics(spark, tmp_path):
    src = str(tmp_path / "events")
    write_events(src, EVENTS_BATCH_1 + EVENTS_BATCH_2, "all.json")
    stream = jobs.read_event_stream_json(spark, src)
    cleaned = jobs.clean_event_stream(stream, ref_ts=ref_ts())
    metrics = jobs.windowed_student_metrics(
        cleaned, window_duration="5 minutes", slide="5 minutes"
    )
    q = (
        metrics.writeStream.format("memory")
        .queryName("win_sink")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM win_sink").collect()
    by_key = {(str(r.window_start), r.student_id): r for r in rows}
    # STU001: evt-001+evt-003 in 10:00 window, evt-001b in 10:10 window
    r1 = by_key[("2024-02-01 10:00:00", "STU001")]
    assert (r1["count"], r1.duration, r1.errors) == (2, 600, 1)
    assert bool(r1.anomaly) is True  # 1/2 error rate > 0.2
    assert r1.avg_score == 80.0  # evt-003's unparseable score is ignored
    r2 = by_key[("2024-02-01 10:10:00", "STU001")]
    assert (r2["count"], r2.errors, bool(r2.anomaly)) == (1, 0, False)
    assert r2.avg_score == 90.0
    # STU002's capped score -> error in its window
    r3 = by_key[("2024-02-01 10:00:00", "STU002")]
    assert (r3["count"], r3.errors) == (1, 1)


def test_stream_active_students(spark, tmp_path):
    """Docx "active students in last 5 min": global sliding-window distinct
    count (HLL; exact at these cardinalities)."""
    src = str(tmp_path / "events")
    write_events(src, EVENTS_BATCH_1 + EVENTS_BATCH_2, "all.json")
    stream = jobs.read_event_stream_json(spark, src)
    cleaned = jobs.clean_event_stream(stream, ref_ts=ref_ts())
    active = jobs.active_students_window(cleaned, slide=None)
    q = (
        active.writeStream.format("memory")
        .queryName("active_sink")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM active_sink").collect()
    by_win = {str(r.window_start): r for r in rows}
    # 10:00 window: STU001 (x2) + STU002 -> 2 distinct, 3 events
    assert (by_win["2024-02-01 10:00:00"].active_students,
            by_win["2024-02-01 10:00:00"].n_events) == (2, 3)
    # 10:10 window: STU001 + STU003 -> 2 distinct, 2 events
    assert (by_win["2024-02-01 10:10:00"].active_students,
            by_win["2024-02-01 10:10:00"].n_events) == (2, 2)


def test_stream_foreach_batch_upsert(spark, tmp_path):
    src = str(tmp_path / "events")
    target = str(tmp_path / "stg_progress")
    ckpt = str(tmp_path / "ckpt")
    write_events(src, EVENTS_BATCH_1, "b1.json")

    writer = ParquetMergeWriter(spark, target, keys=["event_id"])
    stream = jobs.read_event_stream_json(spark, src)
    cleaned = jobs.clean_event_stream(stream, ref_ts=ref_ts())
    q = (
        cleaned.writeStream.foreachBatch(jobs.foreach_batch_upsert(writer))
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    write_events(src, EVENTS_BATCH_2, "b2.json")
    q.processAllAvailable()
    q.stop()

    final = {r.event_id: r for r in spark.read.parquet(target).collect()}
    assert set(final) == {"evt-001", "evt-002", "evt-003", "evt-004"}
    # evt-001 overwritten by batch 2 (upsert on event_id)
    assert final["evt-001"].duration_seconds == 900
    assert float(final["evt-001"].score) == 90.0


def test_simulated_stream_shape(spark):
    stream = jobs.simulated_event_stream(spark, rows_per_second=5)
    assert stream.isStreaming
    assert set(jobs.PROGRESS_EVENT_SCHEMA.fieldNames()) <= set(stream.columns)


def test_count_bounded_stateful_metrics(spark, tmp_path):
    src = str(tmp_path / "events_state")
    write_events(src, EVENTS_BATCH_1, "b1.json")
    stream = jobs.read_event_stream_json(spark, src)
    cleaned = jobs.clean_event_stream(stream, ref_ts=ref_ts())
    metrics = jobs.count_bounded_metrics(cleaned, max_events=1000)
    q = (
        metrics.writeStream.format("memory")
        .queryName("state_sink")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    # second batch updates existing state
    write_events(src, EVENTS_BATCH_2, "b2.json")
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM state_sink").collect()
    latest = {}
    for r in rows:  # update mode: last emit per student wins
        latest[r.student_id] = r
    s1 = latest["STU001"]
    # batch1: evt-001 (valid) + evt-003 (invalid); batch2: evt-001b valid
    assert s1["count"] == 3
    assert s1.errors == 1
    assert bool(s1.anomaly) is True  # 1/3 > 0.2
    s2 = latest["STU002"]
    assert (s2["count"], s2.errors) == (1, 1)


def test_late_data_dropped_by_watermark(spark, tmp_path):
    """Late-data policy (documented in jobs.py): events older than the
    watermark are dropped. Append-mode windows finalize once the watermark
    passes window end; a subsequent too-late event never re-opens them."""
    src = str(tmp_path / "late_events")

    def ev(eid, sid, ts):
        return {"event_id": eid, "student_id": sid, "course_id": "C1",
                "event_type": "x", "event_timestamp": ts,
                "duration_seconds": "60", "score": "50", "module_id": "M",
                "completion_percentage": "10"}

    # batch 1: two events in the 10:00 5-min window
    write_events(src, [ev("e1", "STU001", "2024-02-01T10:00:30"),
                       ev("e2", "STU001", "2024-02-01T10:02:00")], "b1.json")
    stream = jobs.read_event_stream_json(spark, src)
    cleaned = jobs.clean_event_stream(stream, ref_ts=ref_ts())
    metrics = jobs.windowed_student_metrics(
        cleaned, window_duration="5 minutes", slide="5 minutes", watermark="10 minutes"
    )
    q = (metrics.writeStream.format("memory").queryName("late_sink")
         .outputMode("append").start())
    q.processAllAvailable()
    # batch 2: event far in the future -> advances watermark beyond 10:05
    write_events(src, [ev("e3", "STU002", "2024-02-01T12:00:00")], "b2.json")
    q.processAllAvailable()
    # batch 3: too-late event for the (finalized) 10:00 window
    write_events(src, [ev("e4", "STU001", "2024-02-01T10:01:00")], "b3.json")
    q.processAllAvailable()
    q.stop()

    rows = spark.sql(
        "SELECT * FROM late_sink WHERE student_id = 'STU001'"
    ).collect()
    assert len(rows) == 1  # the 10:00 window emitted exactly once
    assert rows[0]["count"] == 2  # e4 (late) was dropped, not merged


def test_stream_session_windows(spark, tmp_path):
    """Gap-based streaming sessions (session_window): events 2-3 min apart
    coalesce into one session per student; the 10-min-later event opens a
    second session only if beyond the gap (here gap=5 min splits 10:00-03
    from 10:10-11)."""
    src = str(tmp_path / "events")
    write_events(src, EVENTS_BATCH_1 + EVENTS_BATCH_2, "all.json")
    stream = jobs.read_event_stream_json(spark, src)
    cleaned = jobs.clean_event_stream(stream, ref_ts=ref_ts())
    sessions = jobs.session_metrics_stream(cleaned, gap="5 minutes")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM sess_sink").collect()
    by_key = {(r.student_id, str(r.session_start)): r for r in rows}
    # STU001: 10:00 + 10:03 merge (3-min gap < 5), 10:10 is a new session
    s1 = by_key[("STU001", "2024-02-01 10:00:00")]
    assert s1.n_events == 2
    assert str(s1.session_end) == "2024-02-01 10:08:00"  # last event + gap
    s2 = by_key[("STU001", "2024-02-01 10:10:00")]
    assert s2.n_events == 1
    assert s2.avg_score == 90.0


def test_stream_enrichment_columns(spark, tmp_path):
    src = str(tmp_path / "events")
    write_events(src, EVENTS_BATCH_1, "b1.json")
    stream = jobs.read_event_stream_json(spark, src)
    cleaned = jobs.clean_event_stream(stream, ref_ts=ref_ts())
    enriched = jobs.enrich_event_stream(cleaned)
    q = (
        enriched.writeStream.format("memory")
        .queryName("enr_sink")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r.event_id: r for r in spark.sql("SELECT * FROM enr_sink").collect()}
    # evt-001: completion 50 -> risk 0/Low; evt-003: completion 10 -> +25 Medium
    assert (rows["evt-001"].ai_risk_score, rows["evt-001"].ai_risk_category) == (0.0, "Low")
    assert (rows["evt-003"].ai_risk_score, rows["evt-003"].ai_risk_category) == (25.0, "Medium")


def test_stream_stream_attribution(spark, tmp_path):
    """Stream-stream interval join: completions attribute to same-student
    watches within the preceding 30 min; outside-window and cross-student
    watches do not match."""
    src = str(tmp_path / "events")

    def ev(eid, sid, etype, ts):
        return {"event_id": eid, "student_id": sid, "course_id": "C1",
                "event_type": etype, "event_timestamp": ts,
                "duration_seconds": "60", "score": "50", "module_id": "M",
                "completion_percentage": "10"}

    write_events(src, [
        ev("w1", "STU001", "video_watched", "2024-02-01T10:00:00"),
        ev("w2", "STU001", "video_watched", "2024-02-01T09:00:00"),  # > 30 min before
        ev("w3", "STU002", "video_watched", "2024-02-01T10:05:00"),  # other student
        ev("q1", "STU001", "quiz_completed", "2024-02-01T10:10:00"),
    ], "b1.json")
    stream = jobs.read_event_stream_json(spark, src)
    cleaned = jobs.clean_event_stream(stream, ref_ts=ref_ts())
    watched = cleaned.where("event_type = 'video_watched'")
    completed = cleaned.where("event_type = 'quiz_completed'")
    joined = jobs.stream_stream_attribution(watched, completed)
    q = (
        joined.writeStream.format("memory")
        .queryName("attr_sink")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM attr_sink").collect()
    assert [(r.completion_event_id, r.watch_event_id) for r in rows] == [("q1", "w1")]


def test_stream_static_dim_enrichment(spark, tmp_path):
    src = str(tmp_path / "events_in")
    write_events(src, EVENTS_BATCH_1, "b1.jsonl")
    events = jobs.read_event_stream_json(spark, src)
    cleaned = jobs.clean_event_stream(events, ref_ts=ref_ts())
    dim = spark.createDataFrame(
        [("STU001", "Mumbai", "gold"), ("STU002", "Delhi", "silver")],
        ["student_id", "city", "tier"],
    )
    enriched = jobs.enrich_stream_with_dim(cleaned, dim)
    q = (
        enriched.writeStream.format("memory")
        .queryName("dim_enriched_sink")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {
        r.event_id: (r.city, r.tier)
        for r in spark.table("dim_enriched_sink").collect()
    }
    # STU001 events decorated; the cleaned stu-2 -> STU002 row matches the
    # dim (shared cleaning normalizes the key before the join)
    assert rows["evt-001"] == ("Mumbai", "gold")
    assert rows["evt-003"] == ("Mumbai", "gold")
    assert rows["evt-002"] == ("Delhi", "silver")


def test_available_now_incremental_runs(spark, tmp_path):
    src = str(tmp_path / "backlog_in")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    write_events(src, EVENTS_BATCH_1, "b1.jsonl")
    events = jobs.read_event_stream_json(spark, src)
    cleaned = jobs.clean_event_stream(events, ref_ts=ref_ts())
    jobs.run_available_now(cleaned, sink, ckpt)
    assert spark.read.parquet(sink).count() == 3
    # second run with no new data: no-op (checkpoint remembers the files)
    jobs.run_available_now(
        jobs.clean_event_stream(
            jobs.read_event_stream_json(spark, src), ref_ts=ref_ts()
        ),
        sink,
        ckpt,
    )
    assert spark.read.parquet(sink).count() == 3
    # new backlog file: only its rows are appended
    write_events(src, EVENTS_BATCH_2, "b2.jsonl")
    jobs.run_available_now(
        jobs.clean_event_stream(
            jobs.read_event_stream_json(spark, src), ref_ts=ref_ts()
        ),
        sink,
        ckpt,
    )
    assert spark.read.parquet(sink).count() == 5


def test_foreach_batch_fanout_three_sinks(spark, tmp_path):
    src = str(tmp_path / "fan_in")
    good_p, dlq_p, alert_p = (
        str(tmp_path / d) for d in ("fan_good", "fan_dlq", "fan_alerts")
    )
    errors = [
        {"event_id": f"err-{i}", "student_id": "STU009", "course_id": "CRS001",
         "event_type": "error_occurred", "event_timestamp": f"2024-02-01T11:0{i}:00",
         "duration_seconds": "10", "score": "50.0", "module_id": "MOD001",
         "completion_percentage": "10.0"}
        for i in range(3)
    ]
    write_events(src, EVENTS_BATCH_1 + errors, "b1.jsonl")
    events = jobs.read_event_stream_json(spark, src)
    cleaned = jobs.clean_event_stream(events, ref_ts=ref_ts())
    q = (
        cleaned.writeStream.foreachBatch(
            jobs.foreach_batch_fanout(good_p, dlq_p, alert_p)
        )
        .option("checkpointLocation", str(tmp_path / "fan_ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    good = spark.read.parquet(good_p)
    # evt-002 (capped score) and evt-003 (unparseable score) -> DLQ
    assert good.count() == 4
    assert spark.read.parquet(dlq_p).count() == 2
    alerts = spark.read.parquet(alert_p).collect()
    # STU009 is 100% errors -> alerted; others below threshold
    assert [r.student_id for r in alerts] == ["STU009"]
    assert alerts[0].n_errors == 3


def test_dedup_state_survives_restart(spark, tmp_path):
    """The dedup state store is part of the checkpoint: a NEW query
    started from the same checkpoint must still suppress an event_id
    seen before the restart (exactly-once across restarts, not just
    within one query lifetime)."""
    src = str(tmp_path / "restart_in")
    sink = str(tmp_path / "restart_sink")
    ckpt = str(tmp_path / "restart_ckpt")
    write_events(src, EVENTS_BATCH_1, "b1.jsonl")

    def start_query():
        cleaned = jobs.clean_event_stream(
            jobs.read_event_stream_json(spark, src), ref_ts=ref_ts()
        )
        deduped = jobs.dedup_event_stream(cleaned)
        return (
            deduped.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = start_query()
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(sink).count() == 3

    # restart: replay evt-001 (dup, different payload) + one new event
    write_events(src, EVENTS_BATCH_2, "b2.jsonl")
    q = start_query()
    q.processAllAvailable()
    q.stop()
    out = spark.read.parquet(sink)
    assert out.count() == 4  # only evt-004 got through
    assert out.where(out.event_id == "evt-001").count() == 1


def test_stream_stream_left_outer_emits_unmatched(spark, tmp_path):
    """left_outer interval join: a completion with no qualifying watch is
    emitted with NULL watch columns — but only after the watermark
    passes, which a later batch must advance."""
    watch_dir = str(tmp_path / "so_watch")
    done_dir = str(tmp_path / "so_done")
    # batch 1: a completion with NO prior watch for that student
    write_events(done_dir, [
        {"event_id": "done-1", "student_id": "STU077", "course_id": "C1",
         "event_type": "quiz_completed", "event_timestamp": "2024-02-01T10:00:00",
         "duration_seconds": "60", "score": "90", "module_id": "M1",
         "completion_percentage": "100"}], "b1.jsonl")
    write_events(watch_dir, [
        {"event_id": "watch-x", "student_id": "STU001", "course_id": "C1",
         "event_type": "video_watched", "event_timestamp": "2024-02-01T09:50:00",
         "duration_seconds": "60", "score": "10", "module_id": "M1",
         "completion_percentage": "5"}], "b1.jsonl")

    def cleaned(path):
        return jobs.clean_event_stream(
            jobs.read_event_stream_json(spark, path), ref_ts=ref_ts()
        )

    joined = jobs.stream_stream_attribution(
        cleaned(watch_dir), cleaned(done_dir),
        window="30 minutes", watermark="10 minutes", how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("so_sink")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    # advance the watermark far past done-1's window on BOTH sides
    late = {"event_id": "late", "student_id": "STU099", "course_id": "C1",
            "event_type": "video_watched", "event_timestamp": "2024-02-01T13:00:00",
            "duration_seconds": "1", "score": "1", "module_id": "M1",
            "completion_percentage": "1"}
    write_events(watch_dir, [late], "b2.jsonl")
    write_events(done_dir, [dict(late, event_id="late-d",
                                 event_type="quiz_completed")], "b2.jsonl")
    q.processAllAvailable()
    q.processAllAvailable()
    q.stop()
    rows = {r.completion_event_id: r for r in spark.table("so_sink").collect()}
    assert "done-1" in rows
    assert rows["done-1"].watch_event_id is None  # unmatched, NULL-joined


def test_stream_incremental_dedup_screen(spark, tmp_path):
    """Streaming twin of docs_incremental_dedup: an incoming doc that
    shares a distinctive 3-gram with the corpus must produce collision
    rows; a novel doc must not. Doc-level rollup happens per micro-batch
    in foreachBatch."""
    import json as _json

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    index = jobs.corpus_shingle_index(corpus)

    src = tmp_path / "docs"
    src.mkdir()
    rows = [
        {"doc_id": 100, "text": "alpha beta gamma delta NEW TAIL HERE"},  # dup of 1
        {"doc_id": 101, "text": "totally novel words with no overlap at all"},
    ]
    (src / "batch0.json").write_text("\n".join(_json.dumps(r) for r in rows))

    stream = jobs.read_doc_stream_json(spark, str(src))
    hits = jobs.screen_docs_stream(stream, index)

    rollups = []
    q = (
        hits.writeStream.foreachBatch(
            lambda b, _id: rollups.extend(jobs.collision_rollup(b).collect())
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    by_doc = {r["doc_id"]: r["n_corpus_matches"] for r in rollups}
    assert by_doc.get(100) == 1, by_doc  # collided with corpus doc 1 only
    assert 101 not in by_doc  # novel doc produced no collision rows


def test_streaming_shingles_match_batch(spark):
    """The streaming (explode+slice) shingler must produce the same
    (doc_id, shingle) multiset as the batch (window+lead) one."""
    from edu_data_pipeline_spark.suite.scale_suite import _shingle_rows

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y"), (3, "p q r")],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, jobs.streaming_shingle_rows(docs).collect()))
    b = sorted(map(tuple, _shingle_rows(docs).collect()))
    assert a == b


def test_streaming_drift_monitor(spark, tmp_path):
    """Stream twin of events_value_psi: a live window whose value
    distribution matches the baseline stays quiet; a shifted window
    raises the drift alarm."""
    import json as _json

    baseline_rows = [("click", float(v)) for v in range(0, 400, 4)]
    baseline = jobs.baseline_value_shares(
        spark.createDataFrame(baseline_rows, "event_type string, value double")
    )

    src = tmp_path / "drift_events"
    src.mkdir()

    def ev(i, ts, value):
        return {
            "event_id": f"evt-{i}", "student_id": "STU001", "course_id": "C1",
            "event_type": "click", "event_timestamp": ts,
            "duration_seconds": "1", "score": "50", "module_id": "M1",
            "completion_percentage": str(value),
        }

    # window A (10:00): same uniform 0..400 distribution as baseline
    rows = [ev(i, "2024-01-01T10:00:05", 0) for i in range(50)]
    # window B (11:00): all mass in one far bucket -> drift
    rows += [ev(100 + i, "2024-01-01T11:00:05", 0) for i in range(50)]
    (src / "b.json").write_text("\n".join(_json.dumps(r) for r in rows))

    stream = jobs.read_event_stream_json(spark, str(src)).select(
        F.col("event_type"),
        F.to_timestamp("event_timestamp").alias("event_timestamp"),
        # window A values mirror the baseline (derived from the event id,
        # stream-legal and deterministic); window B sits at 900+
        F.when(
            F.hour(F.to_timestamp("event_timestamp")) == 10,
            (
                F.regexp_extract("event_id", r"evt-(\d+)", 1).cast("long") % 50
            ) * 8.0,
        ).otherwise(F.lit(950.0)).alias("value"),
    )
    counts = jobs.windowed_bucket_counts(stream)
    out = []
    q = (
        counts.writeStream.outputMode("append")
        .foreachBatch(
            lambda b, _id: out.extend(
                jobs.psi_against_baseline(b, baseline).collect()
            )
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # append mode only emits CLOSED windows; the watermark from the max
    # event (11:00) closes window A but keeps B open -> drive a second
    # batch far in the future to flush B
    (src / "c.json").write_text(_json.dumps(ev(999, "2024-01-02T00:00:00", 0)))
    q2 = (
        counts.writeStream.outputMode("append")
        .foreachBatch(
            lambda b, _id: out.extend(
                jobs.psi_against_baseline(b, baseline).collect()
            )
        )
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    alarms = {r["w"]["start"].hour: r["drift_alarm"] for r in out}
    assert alarms.get(10) is False, alarms  # matches baseline -> quiet
    assert alarms.get(11) is True, alarms   # shifted mass -> alarm


def test_psi_counts_vanished_buckets(spark):
    """Regression: a window that LOSES half the baseline's buckets (mass
    vanished, no novel buckets) must still alarm — the baseline buckets
    missing from the live window contribute (0 - p_base)*ln terms."""
    import datetime

    baseline = spark.createDataFrame(
        [("click", b, 0.1) for b in range(10)],
        "event_type string, bucket long, p_base double",
    )
    w = (datetime.datetime(2024, 1, 1, 10, 0), datetime.datetime(2024, 1, 1, 10, 10))
    live = spark.createDataFrame(
        [(w, "click", b, 20) for b in range(5)],  # buckets 5..9 vanished
        "w struct<start:timestamp,end:timestamp>, event_type string, bucket long, count long",
    )
    out = jobs.psi_against_baseline(live, baseline).collect()
    assert len(out) == 1
    assert out[0]["psi"] > 0.2 and out[0]["drift_alarm"] is True, out


def test_stream_bloom_quarantine_routes(spark, tmp_path):
    """Streaming twin of docs_bloom_screen: a doc sharing a shingle with
    the eval set must land in quarantine with its hit count; a novel doc
    (and one too short to shingle) must land clean. No false negatives:
    the clean sink can never contain a true eval overlap."""
    import json as _json

    from edu_data_pipeline_spark.suite.curation_suite import bloom_bitmap
    from edu_data_pipeline_spark.suite.scale_suite import _distinct_shingles

    eval_docs = spark.createDataFrame(
        [(0, "secret eval answer tokens here now")],
        "doc_id long, text string",
    )
    bloom = bloom_bitmap(_distinct_shingles(eval_docs))

    src = tmp_path / "docs"
    src.mkdir()
    rows = [
        {"doc_id": 10, "text": "leading words then secret eval answer copied"},
        {"doc_id": 11, "text": "completely unrelated clean document words"},
        {"doc_id": 12, "text": "too short"},
    ]
    (src / "b0.json").write_text("\n".join(_json.dumps(r) for r in rows))

    clean_p = str(tmp_path / "clean")
    quar_p = str(tmp_path / "quarantine")
    q = jobs.start_bloom_quarantine_stream(
        jobs.read_doc_stream_json(spark, str(src)),
        bloom,
        clean_p,
        quar_p,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    quar = {r["doc_id"]: r for r in spark.read.parquet(quar_p).collect()}
    clean = {r["doc_id"]: r for r in spark.read.parquet(clean_p).collect()}
    assert set(quar) == {10} and set(clean) == {11, 12}
    assert quar[10]["n_bloom_hits"] >= 1
    assert clean[12]["n_bloom_hits"] == 0  # shingle-less doc routes clean


def test_router_sinks_idempotent_under_batch_replay(spark, tmp_path):
    """ADVICE r4: a checkpoint-replayed micro-batch must REPLACE its own
    sink output, not double-append — both routers write batch_id-keyed
    dynamic partition overwrites. Re-invoking the foreachBatch body with
    the same batch_id (what a post-crash replay does) leaves exactly one
    copy of every row."""
    from edu_data_pipeline_spark.suite.curation_suite import bloom_bitmap
    from edu_data_pipeline_spark.suite.scale_suite import _distinct_shingles

    eval_docs = spark.createDataFrame(
        [(0, "secret eval answer tokens here now")], "doc_id long, text string"
    )
    bloom = bloom_bitmap(_distinct_shingles(eval_docs))
    batch = spark.createDataFrame(
        [
            (10, "leading words then secret eval answer copied"),
            (11, "completely unrelated clean document words"),
        ],
        "doc_id long, text string",
    )
    clean_p = str(tmp_path / "clean")
    quar_p = str(tmp_path / "quarantine")
    writer = jobs.foreach_batch_bloom_quarantine(bloom, clean_p, quar_p)
    writer(batch, 7)
    writer(batch, 7)  # replay of the SAME batch
    assert spark.read.parquet(quar_p).count() == 1
    assert spark.read.parquet(clean_p).count() == 1

    # semantic screen router: replay the same vector batch
    corpus = spark.createDataFrame(
        [(1, [1.0] * 8 + [0.0] * 56)], "vec_id long, embedding array<double>"
    )
    buckets, vecs = jobs.embedding_index(corpus, 64)
    vbatch = spark.createDataFrame(
        [(100, [1.0] * 8 + [0.0] * 56), (101, [0.0] * 56 + [1.0] * 8)],
        "vec_id long, embedding array<double>",
    )
    novel_p = str(tmp_path / "novel")
    dup_p = str(tmp_path / "dup")
    swriter = jobs.foreach_batch_semantic_screen(buckets, vecs, 64, novel_p, dup_p)
    swriter(vbatch, 3)
    swriter(vbatch, 3)
    assert spark.read.parquet(dup_p).count() == 1
    assert spark.read.parquet(novel_p).count() == 1


def test_bloom_verdicts_match_batch_screen(spark):
    """The streaming router's verdict core must agree with the batch
    suite query on the same corpus: per-doc bloom-hit counts identical."""
    from edu_data_pipeline_spark.sources.testdata import table
    from edu_data_pipeline_spark.suite import load_all
    from edu_data_pipeline_spark.suite.curation_suite import bloom_bitmap
    from edu_data_pipeline_spark.suite.scale_suite import (
        DECON_EVAL_SOURCE,
        _distinct_shingles,
    )

    sf = "/root/testdata/sf0.001"
    d = table(spark, sf, "documents")
    eval_docs = d.where(F.col("source") == DECON_EVAL_SOURCE)
    train_docs = d.where(F.col("source") != DECON_EVAL_SOURCE)
    bloom = bloom_bitmap(_distinct_shingles(eval_docs))
    stream_side = {
        r["doc_id"]: (r["n_grams"], r["n_bloom_hits"])
        for r in jobs.bloom_doc_verdicts(train_docs, bloom).collect()
    }
    batch_side = {
        r["doc_id"]: (r["n_grams"], r["n_bloom_hits"])
        for r in load_all()["docs_bloom_screen"].fn(spark, sf).collect()
    }
    assert stream_side == batch_side


def test_stream_cms_merges_to_batch_sketch(spark, tmp_path):
    """CMS mergeability across micro-batches: streaming the corpus in
    two files and summing the per-batch deltas must yield EXACTLY the
    sketch a single batch build produces over the union — and point
    estimates through the merged sketch still never undercount."""
    import json as _json

    from edu_data_pipeline_spark.suite.curation_suite import (
        cms_lookup,
        cms_sketch,
    )

    docs_a = [{"doc_id": 1, "text": "x x x y z common words"}]
    docs_b = [{"doc_id": 2, "text": "x y y q r common words"}]
    src = tmp_path / "docs"
    src.mkdir()
    (src / "a.json").write_text("\n".join(_json.dumps(r) for r in docs_a))
    (src / "b.json").write_text("\n".join(_json.dumps(r) for r in docs_b))

    sketch_p = str(tmp_path / "sketch")
    q = jobs.start_cms_monitor_stream(
        jobs.read_doc_stream_json(spark, str(src)),
        sketch_p,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    merged = {
        (r["row_j"], r["bucket"]): r["cnt"]
        for r in jobs.read_cms(spark, sketch_p).collect()
    }
    all_docs = spark.createDataFrame(
        [(1, docs_a[0]["text"]), (2, docs_b[0]["text"])],
        "doc_id long, text string",
    )
    batch = {
        (r["row_j"], r["bucket"]): r["cnt"]
        for r in cms_sketch(jobs.doc_token_rows(all_docs)).collect()
    }
    assert merged == batch

    terms = spark.createDataFrame([("x",), ("y",), ("absent",)], "t string")
    est = {
        r["t"]: r["cms_estimate"]
        for r in cms_lookup(jobs.read_cms(spark, sketch_p), terms).collect()
    }
    assert est["x"] >= 4 and est["y"] >= 3  # true counts: 4, 3
    assert est["absent"] >= 0


def test_stream_semantic_screen_routes(spark, tmp_path):
    """Streaming embedding screen: an incoming vector identical to a
    corpus vector is routed duplicate with cosine 1.0 against that
    vector; an opposite-direction vector shares no sign bucket and
    routes novel."""
    import json as _json

    base = [1.0, 0.5, -0.25, 2.0] * 16
    other = [0.1 * ((i % 7) - 3) for i in range(64)]
    corpus = spark.createDataFrame(
        [(100, base), (101, other)], "vec_id long, embedding array<double>"
    )
    buckets, vecs = jobs.embedding_index(corpus, dim=64)

    src = tmp_path / "vecs"
    src.mkdir()
    rows = [
        {"vec_id": 1, "embedding": base},                 # dup of 100
        {"vec_id": 2, "embedding": [-v for v in base]},   # novel (cos -1)
    ]
    (src / "b0.json").write_text("\n".join(_json.dumps(r) for r in rows))

    novel_p, dup_p = str(tmp_path / "novel"), str(tmp_path / "dup")
    q = jobs.start_semantic_screen_stream(
        jobs.read_vec_stream_json(spark, str(src)),
        buckets, vecs, 64, novel_p, dup_p, str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    dup = {r["vec_id"]: r for r in spark.read.parquet(dup_p).collect()}
    novel = {r["vec_id"] for r in spark.read.parquet(novel_p).collect()}
    assert set(dup) == {1} and novel == {2}
    assert dup[1]["matched_corpus_vec"] == 100
    assert dup[1]["best_cosine"] == 1.0


def test_semantic_screen_self_retrieval(spark):
    """ANN-index sanity: screening the corpus against its own index must
    find every vector (identical vectors share all sign buckets), with
    best cosine 1.0 and the match id <= own id (exact-duplicate ties
    break to the lowest corpus id)."""
    from pyspark.sql import functions as SF

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(sf + "/embeddings.parquet").select(
        "vec_id", SF.col("embedding").cast("array<double>").alias("embedding")
    )
    buckets, vecs = jobs.embedding_index(emb, dim=64)
    out = jobs.semantic_screen_batch(emb, buckets, vecs, 64, tau=0.32).collect()
    assert len(out) == emb.count()
    for r in out:
        assert r["matched_corpus_vec"] is not None
        assert r["best_cosine"] == 1.0
        assert r["matched_corpus_vec"] <= r["vec_id"]


def test_semantic_screen_derives_index_bits(spark):
    """ADVICE r10: an index built at a non-default hyperplane width must
    be probed at that SAME width even when the caller passes nothing —
    the screen derives bits from the index's metadata stamp. Before the
    fix, a wide index probed at the default N_LSH_BITS=4 collapsed
    candidate generation (bucket p = t*bits+b vs t*4+b never lines up
    past table 0) and streamed near-duplicates to the novel sink."""
    import pytest as _pytest
    from pyspark.sql import functions as SF

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(sf + "/embeddings.parquet").select(
        "vec_id", SF.col("embedding").cast("array<double>").alias("embedding")
    )
    buckets, vecs = jobs.embedding_index(emb, dim=64, bits=7)
    # default call: derives 7 from the stamp; self-retrieval must be total
    out = jobs.semantic_screen_batch(emb, buckets, vecs, 64, tau=0.32)
    assert out.where(SF.col("matched_corpus_vec").isNull()).count() == 0
    # explicit matching bits: accepted
    jobs.semantic_screen_batch(emb, buckets, vecs, 64, tau=0.32, bits=7)
    # explicit contradicting bits: hard error, not silent noise
    with _pytest.raises(ValueError, match="probe bits"):
        jobs.semantic_screen_batch(emb, buckets, vecs, 64, tau=0.32, bits=4)


def test_batch_partitioned_sink_layout_guard(spark, tmp_path):
    """Pointing a batch_id-partitioned router at a directory holding the
    old APPEND layout (flat files, stream_batch_id as a data column)
    must fail at wiring time, not corrupt reads later; empty and
    already-partitioned directories are accepted."""
    import pytest as _pytest

    from edu_data_pipeline_spark.suite.curation_suite import bloom_bitmap
    from edu_data_pipeline_spark.suite.scale_suite import _distinct_shingles

    docs = spark.createDataFrame([(0, "a b c d e f g h i j")],
                                 "doc_id long, text string")
    bloom = bloom_bitmap(_distinct_shingles(docs))

    old_layout = str(tmp_path / "old_sink")
    spark.createDataFrame([(1, 0)], "doc_id long, stream_batch_id long")\
        .write.parquet(old_layout)
    with _pytest.raises(ValueError, match="append layout"):
        jobs.foreach_batch_bloom_quarantine(bloom, old_layout,
                                            str(tmp_path / "q1"))
    with _pytest.raises(ValueError, match="append layout"):
        jobs.foreach_batch_cms_delta(old_layout)
    # fresh + missing dirs pass; a partitioned dir written by the writer
    # itself passes on re-wiring (resume)
    clean_p, quar_p = str(tmp_path / "clean"), str(tmp_path / "quar")
    writer = jobs.foreach_batch_bloom_quarantine(bloom, clean_p, quar_p)
    writer(docs, 0)
    jobs.foreach_batch_bloom_quarantine(bloom, clean_p, quar_p)  # resume ok
