"""Driver-gate queries for the findings pipeline (SURVEY.md §2.1
S13-S20, §2.2 P18, §2.4 A5, §2.5 W3, §2.6 SO2).

These run the tool-output normalizers over the repo's golden fixtures
(tests/fixtures/) — the oracle side reads the SAME raw files with
DuckDB's read_csv, so the full normalize logic (severity maps, info
drops, VT-ratio parse, stateful listdlls window) is cross-engine
checked, not just the relational tail.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filesystemagent_spark.queries import register
from filesystemagent_spark.sources import normalizers as N

FIX = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "fixtures",
)

_HAYABUSA = os.path.join(FIX, "hayabusa_timeline.csv")
_SIGCHECK = os.path.join(FIX, "sigcheck_scan.csv")
_AUTORUNSC = os.path.join(FIX, "autorunsc_scan.csv")
_CLAMSCAN = os.path.join(FIX, "clamscan_scan.log")
_LISTDLLS = os.path.join(FIX, "listdlls_dump.txt")

# DuckDB fragment: severity from a hayabusa level (result_parser.py:157-170)
_SQL_HAYABUSA_SEV = """
CASE lower(trim({c}))
    WHEN 'critical' THEN 'critical' WHEN 'crit' THEN 'critical'
    WHEN 'high' THEN 'high'
    WHEN 'medium' THEN 'medium' WHEN 'med' THEN 'medium'
    WHEN 'low' THEN 'low'
    ELSE 'info' END
"""

# read a text file as ordered lines (tab delim never occurs; quote off)
_SQL_LINES = (
    "read_csv('{path}', header=false, delim='\\t', quote='', "
    "columns={{'line': 'VARCHAR'}})"
)


@register(
    "findings_hayabusa",
    tags=("source", "normalize", "findings"),
    oracle=f"""
WITH raw AS (
    SELECT * FROM read_csv('{_HAYABUSA}', header=true, all_varchar=true)
), norm AS (
    SELECT {_SQL_HAYABUSA_SEV.format(c='Level')} AS severity,
           'Hayabusa: ' || coalesce(RuleTitle, 'Unknown rule') AS title,
           concat_ws(':', Computer, Channel) AS target,
           printf('[%s] %s on %s (Channel: %s) — %s',
                  coalesce(Level, ''), coalesce(RuleTitle, 'Unknown rule'),
                  coalesce(Computer, ''), coalesce(Channel, ''),
                  coalesce(Details, '')) AS description
    FROM raw
)
SELECT sha256(concat_ws(chr(31), 'hayabusa', title, target, description)) AS finding_id,
       severity, title, target, description
FROM norm WHERE severity <> 'info'
ORDER BY title
""",
)
def findings_hayabusa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full hayabusa normalization cross-checked value-by-value,
    including the deterministic finding_id hash."""
    return (
        N.hayabusa_findings(spark, _HAYABUSA)
        .select("finding_id", "severity", "title", "target", "description")
        .orderBy("title")
    )


@register(
    "findings_severity_rollup",
    tags=("agg", "findings", "union"),
    oracle=f"""
WITH sevs AS (
    SELECT {_SQL_HAYABUSA_SEV.format(c='Level')} AS severity
    FROM read_csv('{_HAYABUSA}', header=true, all_varchar=true)
    UNION ALL
    SELECT 'high' FROM {_SQL_LINES.format(path=_CLAMSCAN)} WHERE line LIKE '% FOUND'
    UNION ALL
    SELECT 'medium' FROM read_csv('{_SIGCHECK}', header=true, all_varchar=true)
    WHERE lower(Verified) = 'unsigned'
    UNION ALL
    SELECT 'high' FROM read_csv('{_AUTORUNSC}', header=true, all_varchar=true)
    WHERE lower(Verified) LIKE '%not verified%'
    UNION ALL
    SELECT 'critical' FROM read_csv('{_AUTORUNSC}', header=true, all_varchar=true)
    WHERE "VT detection" IS NOT NULL AND "VT detection" NOT IN ('', '0|0', 'Unknown')
      AND len(string_split("VT detection", '|')) = 2
      AND TRY_CAST(string_split("VT detection", '|')[1] AS INT) > 0
)
SELECT severity, COUNT(*) AS n_findings,
       CASE severity WHEN 'critical' THEN 0 WHEN 'high' THEN 1
                     WHEN 'medium' THEN 2 WHEN 'low' THEN 3 ELSE 4 END AS rnk
FROM sevs WHERE severity <> 'info'
GROUP BY severity ORDER BY rnk
""",
)
def findings_severity_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 severity rollup over the SO2 union of four normalizers,
    ordered by the custom severity rank (W3) — the pipeline's summary
    query (/root/reference/src/audit/reporting/html_report.py:481-495)."""
    from filesystemagent_spark.operators.relational import rank_by_map
    from filesystemagent_spark.schemas import SEVERITY_RANK

    findings = N.union_findings(
        N.hayabusa_findings(spark, _HAYABUSA),
        N.clamscan_findings(spark, _CLAMSCAN),
        N.sigcheck_findings(spark, _SIGCHECK),
        N.autorunsc_findings(spark, _AUTORUNSC),
    )
    rolled = findings.groupBy("severity").agg(F.count("*").alias("n_findings"))
    return rank_by_map(rolled, "severity", SEVERITY_RANK, rank_col="rnk").orderBy("rnk")


@register(
    "findings_clamscan",
    tags=("source", "normalize", "text"),
    oracle=f"""
WITH det AS (
    SELECT regexp_extract(line, '^(.*?): (.*) FOUND$', 1) AS file,
           regexp_extract(line, '^(.*?): (.*) FOUND$', 2) AS malware
    FROM {_SQL_LINES.format(path=_CLAMSCAN)}
    WHERE line LIKE '% FOUND'
)
SELECT 'ClamAV: ' || malware AS title,
       file AS target,
       printf('ClamAV detected known malware signature ''%s'' in file: %s',
              malware, file) AS description
FROM det ORDER BY target
""",
)
def findings_clamscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13: regex text-log extraction cross-checked."""
    return (
        N.clamscan_findings(spark, _CLAMSCAN)
        .select("title", "target", "description")
        .orderBy("target")
    )


@register(
    "listdlls_parse",
    tags=("source", "normalize", "stateful", "window"),
    oracle=f"""
WITH lines AS (
    SELECT trim(line) AS line, row_number() OVER () AS pos
    FROM {_SQL_LINES.format(path=_LISTDLLS)}
), tagged AS (
    SELECT line, pos,
           last_value(CASE WHEN regexp_matches(line, '(?i)^.*\\bpid:\\s*\\d+')
                THEN trim(regexp_extract(line, '(?i)^(.*?)\\s*pid:', 1)) END IGNORE NULLS)
               OVER w AS process,
           last_value(CASE WHEN regexp_matches(line, '(?i)^.*\\bpid:\\s*\\d+')
                THEN trim(regexp_extract(line, '(?i)pid:\\s*(\\d+)', 1)) END IGNORE NULLS)
               OVER w AS pid
    FROM lines
    WINDOW w AS (ORDER BY pos ROWS UNBOUNDED PRECEDING)
)
SELECT process, pid,
       regexp_extract(line, '^(0x\\S+)', 1) AS base,
       regexp_extract(line, '^0x\\S+\\s+(0x\\S+)', 1) AS size,
       regexp_extract(line, '^0x\\S+\\s+0x\\S+\\s+(\\S+)', 1) AS version,
       regexp_extract(line, '^0x\\S+\\s+0x\\S+\\s+\\S+\\s+(.*)$', 1) AS dll_path
FROM tagged
WHERE line LIKE '0x%' AND process IS NOT NULL
  AND regexp_extract(line, '^0x\\S+\\s+0x\\S+\\s+\\S+\\s+(.*)$', 1) <> ''
ORDER BY dll_path
""",
)
def listdlls_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S19: the stateful text parse (propagate-last-header window)
    cross-checked against the identical window in DuckDB."""
    return N.listdlls_modules(spark, _LISTDLLS).orderBy("dll_path")
