"""Driver-side HTML report sink (S23).

The reference renders findings + analyzer tables into a self-contained
HTML file (/root/reference/src/audit/reporting/html_report.py:54-108).
Here the aggregation happens in Spark (severity/domain rollups, ranked
top-N) and only the already-small results are collected and rendered —
the report layer never pulls raw rows to the driver.
"""

from __future__ import annotations

import html
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from filesystemagent_spark.operators.relational import rank_by_map

SEVERITY_RANK = {"critical": 0, "high": 1, "medium": 2, "low": 3, "info": 4}


def _table(rows: list[dict], columns: list[str]) -> str:
    head = "".join(f"<th>{html.escape(c)}</th>" for c in columns)
    body = "".join(
        "<tr>"
        + "".join(f"<td>{html.escape(str(r.get(c, '')))}</td>" for c in columns)
        + "</tr>"
        for r in rows
    )
    return f"<table><thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"


def html_report(
    findings: DataFrame,
    *,
    title: str = "Findings report",
    top_n: int = 50,
    generated_at: str | None = None,
) -> str:
    """Render a self-contained HTML report from the findings table.

    Three Spark queries run (severity rollup, domain rollup, ranked
    top-N); each returns at most `top_n` + a handful of rows before
    `.collect()`. Returns the HTML string; callers own file IO.
    """
    sev = (
        findings.groupBy("severity").count().withColumnRenamed("count", "n").collect()
    )
    dom = findings.groupBy("domain").count().withColumnRenamed("count", "n").collect()
    ranked = (
        rank_by_map(findings, "severity", SEVERITY_RANK, rank_col="_rank")
        .orderBy("_rank", F.col("tool_name").asc(), F.col("title").asc())
        .limit(top_n)
        .drop("_rank")
        .collect()
    )
    ts = generated_at or datetime.now(timezone.utc).isoformat(timespec="seconds")
    sev_rows = sorted(
        (r.asDict() for r in sev),
        key=lambda r: SEVERITY_RANK.get(str(r["severity"]).lower(), 99),
    )
    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{html.escape(title)}</title>",
        "<style>body{font-family:sans-serif;margin:2em}table{border-collapse:collapse}"
        "td,th{border:1px solid #999;padding:4px 8px;text-align:left}</style>",
        "</head><body>",
        f"<h1>{html.escape(title)}</h1>",
        f"<p>Generated {html.escape(ts)} · {findings.count()} findings</p>",
        "<h2>By severity</h2>",
        _table(sev_rows, ["severity", "n"]),
        "<h2>By domain</h2>",
        _table(sorted((r.asDict() for r in dom), key=lambda r: str(r["domain"])), ["domain", "n"]),
        f"<h2>Top {top_n} findings</h2>",
        _table(
            [r.asDict() for r in ranked],
            ["severity", "tool_name", "domain", "title", "target"],
        ),
        "</body></html>",
    ]
    return "".join(parts)
