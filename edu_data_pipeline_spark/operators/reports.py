"""Summary-report generation (E3 step 7, dags/data_transformation_pipeline.py:230-236
+ agents/langgraph_workflow.py:40-44 insight_generator).

The reference assembles XCom'd aggregates into output/summary_report.md;
here the report builds from the pipeline's returned counts plus the
insight aggregates, as a plain markdown string (driver-side formatting of
already-aggregated values — no extra jobs beyond the two small collects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executive_summary() -> dict[str, list[str]]:
    """insight_generator stub parity (langgraph_workflow.py:40-44)."""
    return {
        "executive_summary": ["Data processed", "Quality stable"],
        "actions": ["Remediate invalid emails", "Follow up with pending payments"],
    }


def summary_report(
    counts: dict[str, int],
    quality_summary: DataFrame | None = None,
    insights: DataFrame | None = None,
) -> str:
    lines = ["# Pipeline Summary Report", "", "## Table counts", ""]
    lines.append("| table | rows |")
    lines.append("|---|---:|")
    for name, n in sorted(counts.items()):
        lines.append(f"| {name} | {n} |")
    if quality_summary is not None:
        row = quality_summary.collect()[0]
        lines += [
            "",
            "## Data quality",
            "",
            f"- records with issues: {row['records_with_issues']} / {row['total_records']}",
            f"- average quality score: {round(float(row['avg_quality_score'] or 0), 2)}",
        ]
    if insights is not None:
        lines += ["", "## AI insights", ""]
        for r in insights.collect():
            lines.append(f"- {r['metric_name']}: {r['metric_value']} ({r['description']})")
    summary = executive_summary()
    lines += ["", "## Executive summary", ""]
    lines += [f"- {item}" for item in summary["executive_summary"]]
    lines += ["", "## Recommended actions", ""]
    lines += [f"- {item}" for item in summary["actions"]]
    return "\n".join(lines) + "\n"
