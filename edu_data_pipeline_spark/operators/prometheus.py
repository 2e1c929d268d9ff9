"""Prometheus export bridge (reference operators/data_cleaning.py:31-34,
kafka/streaming.py:20-22, prometheus.yml:2-11).

The reference registers four cleaning collectors (records processed /
failed counters, processing-seconds histogram, duplicate-rate gauge) and
streaming counters (events produced/consumed, processor latency), scraped
every 15 s. This module finishes that parity for the Spark engine:

- ``PromRegistry`` — a tiny dependency-free metrics registry that renders
  the standard Prometheus text exposition format (``text/plain;
  version=0.0.4``). The sandbox has no ``prometheus_client`` package, so
  the registry IS the export path; on a cluster where the real client is
  installed, ``to_prometheus_client()`` mirrors every metric into it so
  the standard scrape endpoint works unchanged.
- ``export_cleaning_observation`` — feeds a ``CleaningObservation``
  (the ``df.observe()`` numbers collected at action time — zero extra
  passes) into the reference-named collectors.
- ``export_stream_progress`` — feeds ``BatchProgressListener`` batches
  into the streaming counters.
- ``serve_metrics`` — optional stdlib HTTP endpoint exposing
  ``/metrics`` for a real scraper (the reference's
  ``start_http_server(8001)``).

Driver-side by design: metrics describe job-level aggregates the driver
already holds; nothing here touches the executor hot path.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

DEFAULT_BUCKETS = (0.1, 0.5, 1.0, 2.5, 5.0, 10.0, 30.0, 60.0, float("inf"))


def _fmt(v: float) -> str:
    if v == float("inf"):
        return "+Inf"
    f = float(v)
    return str(int(f)) if f.is_integer() else repr(f)


@dataclass
class _Counter:
    name: str
    help: str
    value: float = 0.0

    def inc(self, amount: float = 1.0) -> None:
        if amount < 0:
            raise ValueError("counters only go up")
        self.value += amount

    def render(self) -> str:
        return (
            f"# HELP {self.name} {self.help}\n"
            f"# TYPE {self.name} counter\n"
            f"{self.name} {_fmt(self.value)}\n"
        )


@dataclass
class _Gauge:
    name: str
    help: str
    value: float = 0.0

    def set(self, value: float) -> None:
        self.value = float(value)

    def render(self) -> str:
        return (
            f"# HELP {self.name} {self.help}\n"
            f"# TYPE {self.name} gauge\n"
            f"{self.name} {_fmt(self.value)}\n"
        )


@dataclass
class _Histogram:
    name: str
    help: str
    buckets: tuple[float, ...] = DEFAULT_BUCKETS
    counts: list[int] = field(default_factory=list)
    total: float = 0.0
    n: int = 0

    def __post_init__(self):
        if not self.counts:
            self.counts = [0] * len(self.buckets)

    def observe(self, value: float) -> None:
        self.total += value
        self.n += 1
        for i, ub in enumerate(self.buckets):
            if value <= ub:
                self.counts[i] += 1

    def render(self) -> str:
        lines = [
            f"# HELP {self.name} {self.help}",
            f"# TYPE {self.name} histogram",
        ]
        for ub, c in zip(self.buckets, self.counts):
            lines.append(f'{self.name}_bucket{{le="{_fmt(ub)}"}} {c}')
        lines.append(f"{self.name}_sum {_fmt(self.total)}")
        lines.append(f"{self.name}_count {self.n}")
        return "\n".join(lines) + "\n"


class PromRegistry:
    """Name-keyed collector registry; re-registration returns the existing
    collector (the reference's ``_collector`` helper does the same)."""

    def __init__(self):
        self._metrics: dict[str, object] = {}
        self._lock = threading.Lock()

    def _get(self, cls, name: str, help_: str, **kw):
        with self._lock:
            existing = self._metrics.get(name)
            if existing is not None:
                if not isinstance(existing, cls):
                    raise ValueError(f"{name} already registered as {type(existing).__name__}")
                return existing
            metric = cls(name, help_, **kw)
            self._metrics[name] = metric
            return metric

    def counter(self, name: str, help_: str = "") -> _Counter:
        return self._get(_Counter, name, help_)

    def gauge(self, name: str, help_: str = "") -> _Gauge:
        return self._get(_Gauge, name, help_)

    def histogram(self, name: str, help_: str = "", buckets=DEFAULT_BUCKETS) -> _Histogram:
        return self._get(_Histogram, name, help_, buckets=tuple(buckets))

    def exposition(self) -> str:
        """The scrape payload (text format 0.0.4)."""
        return "".join(
            m.render() for _, m in sorted(self._metrics.items())
        )

    def to_prometheus_client(self):  # pragma: no cover - package absent in sandbox
        """Mirror into a real prometheus_client CollectorRegistry when the
        package is installed (no-op fallback keeps this import-safe)."""
        try:
            import prometheus_client as pc
        except ImportError:
            return None
        reg = pc.CollectorRegistry()
        for name, m in self._metrics.items():
            if isinstance(m, _Counter):
                c = pc.Counter(name.removesuffix("_total"), m.help or name, registry=reg)
                c.inc(m.value)
            elif isinstance(m, _Gauge):
                g = pc.Gauge(name, m.help or name, registry=reg)
                g.set(m.value)
            elif isinstance(m, _Histogram):
                h = pc.Histogram(
                    name, m.help or name, buckets=m.buckets[:-1], registry=reg
                )
                # re-observe the mean n times: exact sum/count, approx spread
                if m.n:
                    for _ in range(m.n):
                        h.observe(m.total / m.n)
        return reg


# ---------------------------------------------------------------------------
# Reference-named collectors
# ---------------------------------------------------------------------------

CLEANING_PROCESSED = "cleaning_records_processed_total"
CLEANING_FAILED = "cleaning_records_failed_total"
CLEANING_SECONDS = "cleaning_processing_seconds"
CLEANING_DUP_RATE = "cleaning_duplicate_rate"
CLEANING_AVG_QUALITY = "cleaning_avg_quality_score"
EVENTS_PRODUCED = "kafka_events_produced_total"
EVENTS_CONSUMED = "kafka_events_consumed_total"
PROCESSOR_LATENCY = "processor_latency_seconds"


def export_cleaning_observation(
    registry: PromRegistry, observation, duration_seconds: float | None = None
) -> None:
    """CleaningObservation -> the reference's four cleaning collectors.

    ``observation.metrics`` blocks until the observed action has run, so
    call this after the write/collect that consumed the DataFrame.
    """
    m = observation.metrics
    registry.counter(
        CLEANING_PROCESSED, "Records successfully cleaned"
    ).inc(m["records_total"])
    registry.counter(
        CLEANING_FAILED, "Records that failed cleaning"
    ).inc(m["records_flagged"])
    registry.gauge(
        CLEANING_DUP_RATE, "Share of records flagged duplicate in last batch"
    ).set(m["duplicate_rate"] or 0.0)
    registry.gauge(
        CLEANING_AVG_QUALITY, "Mean quality score in last batch"
    ).set(m["avg_quality_score"] or 0.0)
    if duration_seconds is not None:
        registry.histogram(
            CLEANING_SECONDS, "Time spent cleaning batch"
        ).observe(duration_seconds)


def export_stream_progress(registry: PromRegistry, listener) -> None:
    """BatchProgressListener batches -> streaming counters. Idempotent per
    listener snapshot: counts only batches not yet exported."""
    consumed = registry.counter(EVENTS_CONSUMED, "Events consumed")
    latency = registry.histogram(PROCESSOR_LATENCY, "Processing latency")
    already = getattr(listener, "_prom_exported", 0)
    for b in listener.batches[already:]:
        consumed.inc(b["num_input_rows"])
        if b.get("batch_duration_seconds") is not None:
            latency.observe(b["batch_duration_seconds"])
    listener._prom_exported = len(listener.batches)


def serve_metrics(registry: PromRegistry, port: int = 8001):
    """Expose ``/metrics`` over HTTP (reference: start_http_server(8001)).

    Returns the server; call ``.shutdown()`` to stop. Stdlib-only so the
    scrape path works without prometheus_client.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class _Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib API)
            if self.path not in ("/metrics", "/"):
                self.send_response(404)
                self.end_headers()
                return
            payload = registry.exposition().encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *args):  # quiet
            pass

    server = ThreadingHTTPServer(("127.0.0.1", port), _Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
