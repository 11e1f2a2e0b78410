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


_CHAINSAW = os.path.join(FIX, "chainsaw_detections.json")
_HOLLOWS = os.path.join(FIX, "hollows_hunter_report.json")

# severity from a sigma level (result_parser.py:172-183; default info)
_SQL_SIGMA_SEV = """
CASE lower(trim({c}))
    WHEN 'critical' THEN 'critical' WHEN 'high' THEN 'high'
    WHEN 'medium' THEN 'medium' WHEN 'low' THEN 'low'
    ELSE 'info' END
"""


@register(
    "findings_chainsaw",
    tags=("source", "normalize", "json", "findings"),
    oracle=f"""
WITH raw AS (
    SELECT * FROM read_json('{_CHAINSAW}', columns={{
        'name': 'VARCHAR', 'level': 'VARCHAR', 'timestamp': 'VARCHAR',
        'source': 'VARCHAR', 'authors': 'VARCHAR', 'title': 'VARCHAR',
        'severity': 'VARCHAR', 'document': 'STRUCT(path VARCHAR)'}})
), norm AS (
    SELECT coalesce(name, title, 'Unknown detection') AS nm,
           {_SQL_SIGMA_SEV.format(c="coalesce(level, severity, 'medium')")} AS sev,
           coalesce(source, document.path, '') AS src,
           "timestamp" AS ts
    FROM raw
), built AS (
    SELECT sev AS severity,
           'Chainsaw: ' || nm AS title,
           src AS target,
           concat_ws(' ', nm,
               CASE WHEN nullif(ts, '') IS NOT NULL THEN 'at ' || ts END,
               CASE WHEN nullif(src, '') IS NOT NULL THEN 'in ' || src END
           ) AS description
    FROM norm WHERE sev <> 'info'
)
SELECT sha256(concat_ws(chr(31), 'chainsaw', title, target, description)) AS finding_id,
       severity, title, target, description
FROM built ORDER BY title
""",
)
def findings_chainsaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S17: sigma-detection JSON normalization (field fallbacks
    name|title, level|severity, source|document.path; info dropped)
    cross-checked value-by-value including the finding_id hash."""
    return (
        N.chainsaw_findings(spark, _CHAINSAW)
        .select("finding_id", "severity", "title", "target", "description")
        .orderBy("title")
    )


@register(
    "findings_autorunsc",
    tags=("source", "normalize", "findings", "predicate"),
    oracle=f"""
WITH raw AS (
    SELECT *,
           coalesce(nullif(Entry, ''), "Entry Location") AS entry,
           coalesce(nullif("Image Path", ''), coalesce(nullif(Entry, ''), "Entry Location")) AS target
    FROM read_csv('{_AUTORUNSC}', header=true, all_varchar=true)
), unsigned AS (
    SELECT 'high' AS severity,
           'Autoruns: unsigned entry at ' || entry AS title,
           target,
           printf('Unsigned autostart entry: %s. Image: %s. Launch: %s',
                  entry, "Image Path", "Launch String") AS description
    FROM raw WHERE lower(Verified) LIKE '%not verified%'
), vt AS (
    SELECT 'critical' AS severity,
           'Autoruns: VT hit on ' || entry AS title,
           target,
           printf('VirusTotal detection %s for autostart entry: %s. Image: %s',
                  "VT detection", entry, "Image Path") AS description
    FROM raw
    WHERE "VT detection" IS NOT NULL AND "VT detection" NOT IN ('', '0|0', 'Unknown')
      AND len(string_split("VT detection", '|')) = 2
      AND TRY_CAST(string_split("VT detection", '|')[1] AS INT) > 0
), built AS (
    SELECT * FROM unsigned UNION ALL SELECT * FROM vt
)
SELECT sha256(concat_ws(chr(31), 'autorunsc', title, target, description)) AS finding_id,
       severity, title, target, description,
       'T1547' AS mitre_attack
FROM built ORDER BY title
""",
)
def findings_autorunsc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S18 + P6/P7: both autorunsc finding kinds — unsigned autostart
    entries ('not verified' substring, HIGH) and VirusTotal ratio hits
    (n|m with n>0, CRITICAL) — union-normalized and cross-checked."""
    return (
        N.autorunsc_findings(spark, _AUTORUNSC)
        .select("finding_id", "severity", "title", "target", "description", "mitre_attack")
        .orderBy("title")
    )


@register(
    "findings_hollows",
    tags=("source", "normalize", "json", "map-explode"),
    oracle=f"""
WITH rep AS (
    SELECT unnest(map_keys(scanned)) AS pid, unnest(map_values(scanned)) AS p
    FROM read_json('{_HOLLOWS}', columns={{'scanned':
        'MAP(VARCHAR, STRUCT(name VARCHAR, replaced BIGINT, implanted BIGINT,
         hdr_modified BIGINT, patched BIGINT, iat_hooked BIGINT,
         unreachable_file BIGINT, "other" BIGINT))'}})
), long AS (
    SELECT pid, p.name AS name, a.atype, a.sev, a.mitre, a.d0,
           CASE a.atype
               WHEN 'replaced' THEN coalesce(p.replaced, 0)
               WHEN 'implanted' THEN coalesce(p.implanted, 0)
               WHEN 'hdr_modified' THEN coalesce(p.hdr_modified, 0)
               WHEN 'patched' THEN coalesce(p.patched, 0)
               WHEN 'iat_hooked' THEN coalesce(p.iat_hooked, 0)
               WHEN 'unreachable_file' THEN coalesce(p.unreachable_file, 0)
               ELSE coalesce(p."other", 0) END AS n
    FROM rep CROSS JOIN (VALUES
        ('replaced', 'critical', 'T1055.012',
         'Process hollowing — entire module replaced in memory'),
        ('implanted', 'critical', 'T1055',
         'Code injection — foreign code implanted into process'),
        ('hdr_modified', 'high', 'T1055',
         'PE header modification — headers tampered in memory'),
        ('patched', 'medium', 'T1574',
         'Inline patching — code bytes modified (possible hook)'),
        ('iat_hooked', 'high', 'T1574.009',
         'IAT hooking — import table redirected'),
        ('unreachable_file', 'high', 'T1055.012',
         'Module not backed by a reachable file on disk'),
        ('other', 'medium', 'T1055',
         'Unclassified in-memory anomaly')
    ) AS a(atype, sev, mitre, d0)
), built AS (
    SELECT sev AS severity,
           printf('HollowsHunter: %s in %s (PID %s)', atype, name, pid) AS title,
           'PID:' || pid AS target,
           printf('%s. Found %s %s anomal%s in process %s (PID %s).',
                  d0, CAST(n AS VARCHAR), atype,
                  CASE WHEN n > 1 THEN 'ies' ELSE 'y' END, name, pid) AS description,
           mitre AS mitre_attack
    FROM long WHERE n > 0
)
SELECT sha256(concat_ws(chr(31), 'hollows_hunter', title, target, description)) AS finding_id,
       severity, title, target, description, mitre_attack
FROM built ORDER BY title
""",
)
def findings_hollows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15: nested report JSON with a dynamic-pid object read as
    MAP<pid, struct> and exploded to one finding per (pid, anomaly
    type) with count>0 — the map-explode source shape cross-checked
    against DuckDB's map unnest."""
    return (
        N.hollows_hunter_findings(spark, _HOLLOWS)
        .select("finding_id", "severity", "title", "target", "description", "mitre_attack")
        .orderBy("title")
    )


_YARA = os.path.join(FIX, "yara_matches.json")


@register(
    "findings_yara",
    tags=("source", "normalize", "json", "dual-shape"),
    oracle=f"""
WITH raw AS (
    SELECT unnest(matches) AS m
    FROM read_json('{_YARA}', columns={{'matches':
        'STRUCT(rule VARCHAR, file VARCHAR, metadata STRUCT(severity VARCHAR,
         description VARCHAR, mitre_attack VARCHAR), path VARCHAR,
         rules STRUCT(identifier VARCHAR, metadata STRUCT(severity VARCHAR,
         description VARCHAR, mitre_attack VARCHAR))[])[]'}})
), modern AS (
    SELECT m.rule AS rule, coalesce(m.file, 'unknown') AS file,
           m.metadata AS meta
    FROM raw WHERE m.rule IS NOT NULL
), legacy AS (
    SELECT coalesce(r.identifier, 'unknown_rule') AS rule,
           coalesce(m.path, 'unknown') AS file,
           r.metadata AS meta
    FROM raw, UNNEST(m.rules) AS t(r)
    WHERE m.rule IS NULL AND m.rules IS NOT NULL
), rows_ AS (
    SELECT rule, file,
           CASE lower(trim(coalesce(meta.severity, 'high')))
               WHEN 'critical' THEN 'critical' WHEN 'high' THEN 'high'
               WHEN 'medium' THEN 'medium' WHEN 'low' THEN 'low'
               WHEN 'informational' THEN 'info' WHEN 'info' THEN 'info'
               ELSE 'high' END AS severity,
           printf('%s — matched in %s',
                  coalesce(meta.description, printf('YARA rule ''%s'' matched', rule)),
                  file) AS description,
           meta.mitre_attack AS mitre_attack
    FROM (SELECT rule, file, meta FROM modern UNION ALL SELECT * FROM legacy)
)
SELECT sha256(concat_ws(chr(31), 'yara_x', 'YARA: ' || rule, file, description))
           AS finding_id,
       severity, 'YARA: ' || rule AS title, file AS target, description,
       mitre_attack
FROM rows_ ORDER BY title
""",
)
def findings_yara(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S20-adjacent YARA source: both report shapes (v1.x {rule,file}
    and legacy {path,rules:[...]}) normalized in one pass, severity
    from rule metadata with the reference's HIGH default
    (yara_scanner.py:102-179) — cross-checked value-by-value including
    the dual-shape union."""
    return (
        N.yara_findings(spark, _YARA)
        .select("finding_id", "severity", "title", "target", "description", "mitre_attack")
        .orderBy("title")
    )


@register(
    "findings_clamscan_pyds",
    tags=("source", "python-datasource", "normalize"),
    oracle=f"""
WITH det AS (
    SELECT regexp_extract(line, '^(.*?): (.*) FOUND$', 1) AS file,
           regexp_extract(line, '^(.*?): (.*) FOUND$', 2) AS malware
    FROM {_SQL_LINES.format(path=_CLAMSCAN)}
    WHERE line LIKE '% FOUND'
)
SELECT file, malware FROM det ORDER BY file
""",
)
def findings_clamscan_pyds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 through the registered-format surface: the same clamscan
    fixture read via the custom Python DataSource
    (`spark.read.format("toollog")`, sources/pydatasource.py) instead
    of text+regex — proving tool logs work as a first-class source
    format with source-owned schema and per-file splits. Oracle reads
    the identical raw file."""
    from filesystemagent_spark.sources.pydatasource import register_toollog

    register_toollog(spark)
    return (
        spark.read.format("toollog")
        .option("kind", "clamscan")
        .option("path", _CLAMSCAN)
        .load()
        .orderBy("file")
    )


@register(
    "findings_pipeline_ranked",
    tags=("pipeline", "union", "rank", "findings"),
    oracle=f"""
WITH hay AS (
    SELECT 'hayabusa' AS tool_name,
           {_SQL_HAYABUSA_SEV.format(c='Level')} AS severity,
           'Hayabusa: ' || coalesce(RuleTitle, 'Unknown rule') AS title,
           concat_ws(':', Computer, Channel) AS target,
           printf('[%s] %s on %s (Channel: %s) — %s',
                  coalesce(Level, ''), coalesce(RuleTitle, 'Unknown rule'),
                  coalesce(Computer, ''), coalesce(Channel, ''),
                  coalesce(Details, '')) AS description
    FROM read_csv('{_HAYABUSA}', header=true, all_varchar=true)
), clam AS (
    SELECT 'clamav', 'high', 'ClamAV: ' || malware, file,
           printf('ClamAV detected known malware signature ''%s'' in file: %s',
                  malware, file)
    FROM (
        SELECT regexp_extract(line, '^(.*?): (.*) FOUND$', 1) AS file,
               regexp_extract(line, '^(.*?): (.*) FOUND$', 2) AS malware
        FROM {_SQL_LINES.format(path=_CLAMSCAN)} WHERE line LIKE '% FOUND'
    )
), sig AS (
    SELECT 'sigcheck', 'medium',
           'Sigcheck: unsigned binary ' ||
               regexp_split_to_array(Path, '[\\\\/]')[-1],
           Path,
           printf('Unsigned executable found: %s. Publisher: %s', Path,
                  coalesce(nullif(Publisher, ''), 'unknown'))
    FROM read_csv('{_SIGCHECK}', header=true, all_varchar=true)
    WHERE lower(Verified) = 'unsigned'
), auto_raw AS (
    SELECT *,
           coalesce(nullif(Entry, ''), "Entry Location") AS entry,
           coalesce(nullif("Image Path", ''),
                    coalesce(nullif(Entry, ''), "Entry Location")) AS tgt
    FROM read_csv('{_AUTORUNSC}', header=true, all_varchar=true)
), auto AS (
    SELECT 'autorunsc', 'high',
           'Autoruns: unsigned entry at ' || entry, tgt,
           printf('Unsigned autostart entry: %s. Image: %s. Launch: %s',
                  entry, "Image Path", "Launch String")
    FROM auto_raw WHERE lower(Verified) LIKE '%not verified%'
    UNION ALL
    SELECT 'autorunsc', 'critical',
           'Autoruns: VT hit on ' || entry, tgt,
           printf('VirusTotal detection %s for autostart entry: %s. Image: %s',
                  "VT detection", entry, "Image Path")
    FROM auto_raw
    WHERE "VT detection" IS NOT NULL
      AND "VT detection" NOT IN ('', '0|0', 'Unknown')
      AND len(string_split("VT detection", '|')) = 2
      AND TRY_CAST(string_split("VT detection", '|')[1] AS INT) > 0
), chain AS (
    SELECT 'chainsaw',
           sev,
           'Chainsaw: ' || nm,
           src,
           concat_ws(' ', nm,
               CASE WHEN nullif(ts, '') IS NOT NULL THEN 'at ' || ts END,
               CASE WHEN nullif(src, '') IS NOT NULL THEN 'in ' || src END)
    FROM (
        SELECT coalesce(name, title, 'Unknown detection') AS nm,
               {_SQL_SIGMA_SEV.format(c="coalesce(level, severity, 'medium')")} AS sev,
               coalesce(source, document.path, '') AS src,
               "timestamp" AS ts
        FROM read_json('{_CHAINSAW}', columns={{
            'name': 'VARCHAR', 'level': 'VARCHAR', 'timestamp': 'VARCHAR',
            'source': 'VARCHAR', 'authors': 'VARCHAR', 'title': 'VARCHAR',
            'severity': 'VARCHAR', 'document': 'STRUCT(path VARCHAR)'}})
    )
), hol AS (
    SELECT 'hollows_hunter', sev,
           printf('HollowsHunter: %s in %s (PID %s)', atype, name, pid),
           'PID:' || pid,
           printf('%s. Found %s %s anomal%s in process %s (PID %s).',
                  d0, CAST(n AS VARCHAR), atype,
                  CASE WHEN n > 1 THEN 'ies' ELSE 'y' END, name, pid)
    FROM (
        SELECT pid, p.name AS name, a.atype, a.sev, a.d0,
               CASE a.atype
                   WHEN 'replaced' THEN coalesce(p.replaced, 0)
                   WHEN 'implanted' THEN coalesce(p.implanted, 0)
                   WHEN 'hdr_modified' THEN coalesce(p.hdr_modified, 0)
                   WHEN 'patched' THEN coalesce(p.patched, 0)
                   WHEN 'iat_hooked' THEN coalesce(p.iat_hooked, 0)
                   WHEN 'unreachable_file' THEN coalesce(p.unreachable_file, 0)
                   ELSE coalesce(p."other", 0) END AS n
        FROM (
            SELECT unnest(map_keys(scanned)) AS pid,
                   unnest(map_values(scanned)) AS p
            FROM read_json('{_HOLLOWS}', columns={{'scanned':
                'MAP(VARCHAR, STRUCT(name VARCHAR, replaced BIGINT,
                 implanted BIGINT, hdr_modified BIGINT, patched BIGINT,
                 iat_hooked BIGINT, unreachable_file BIGINT, "other" BIGINT))'}})
        ) CROSS JOIN (VALUES
            ('replaced', 'critical',
             'Process hollowing — entire module replaced in memory'),
            ('implanted', 'critical',
             'Code injection — foreign code implanted into process'),
            ('hdr_modified', 'high',
             'PE header modification — headers tampered in memory'),
            ('patched', 'medium',
             'Inline patching — code bytes modified (possible hook)'),
            ('iat_hooked', 'high',
             'IAT hooking — import table redirected'),
            ('unreachable_file', 'high',
             'Module not backed by a reachable file on disk'),
            ('other', 'medium', 'Unclassified in-memory anomaly')
        ) AS a(atype, sev, d0)
    ) WHERE n > 0
), yara AS (
    SELECT 'yara_x',
           CASE lower(trim(coalesce(meta.severity, 'high')))
               WHEN 'critical' THEN 'critical' WHEN 'high' THEN 'high'
               WHEN 'medium' THEN 'medium' WHEN 'low' THEN 'low'
               WHEN 'informational' THEN 'info' WHEN 'info' THEN 'info'
               ELSE 'high' END,
           'YARA: ' || rule,
           file,
           printf('%s — matched in %s',
                  coalesce(meta.description,
                           printf('YARA rule ''%s'' matched', rule)), file)
    FROM (
        SELECT m.rule AS rule, coalesce(m.file, 'unknown') AS file,
               m.metadata AS meta
        FROM (SELECT unnest(matches) AS m FROM read_json('{_YARA}',
            columns={{'matches':
            'STRUCT(rule VARCHAR, file VARCHAR, metadata STRUCT(severity VARCHAR,
             description VARCHAR, mitre_attack VARCHAR), path VARCHAR,
             rules STRUCT(identifier VARCHAR, metadata STRUCT(severity VARCHAR,
             description VARCHAR, mitre_attack VARCHAR))[])[]'}}))
        WHERE m.rule IS NOT NULL
        UNION ALL
        SELECT coalesce(r.identifier, 'unknown_rule'),
               coalesce(m.path, 'unknown'), r.metadata
        FROM (SELECT unnest(matches) AS m FROM read_json('{_YARA}',
            columns={{'matches':
            'STRUCT(rule VARCHAR, file VARCHAR, metadata STRUCT(severity VARCHAR,
             description VARCHAR, mitre_attack VARCHAR), path VARCHAR,
             rules STRUCT(identifier VARCHAR, metadata STRUCT(severity VARCHAR,
             description VARCHAR, mitre_attack VARCHAR))[])[]'}})),
             UNNEST(m.rules) AS t(r)
        WHERE m.rule IS NULL AND m.rules IS NOT NULL
    )
), dlls AS (
    SELECT 'listdlls', 'medium',
           'ListDLLs: unsigned DLL in ' || process,
           dll_path,
           printf('Unsigned DLL loaded into %s (PID %s): %s',
                  process, pid, dll_path)
    FROM (
        WITH lines AS (
            SELECT trim(line) AS line, row_number() OVER () AS pos
            FROM {_SQL_LINES.format(path=_LISTDLLS)}
        ), tagged AS (
            SELECT line, pos,
                   last_value(CASE WHEN regexp_matches(line, '(?i)^.*\\bpid:\\s*\\d+')
                        THEN trim(regexp_extract(line, '(?i)^(.*?)\\s*pid:', 1)) END
                        IGNORE NULLS) OVER w AS process,
                   last_value(CASE WHEN regexp_matches(line, '(?i)^.*\\bpid:\\s*\\d+')
                        THEN trim(regexp_extract(line, '(?i)pid:\\s*(\\d+)', 1)) END
                        IGNORE NULLS) OVER w AS pid
            FROM lines
            WINDOW w AS (ORDER BY pos ROWS UNBOUNDED PRECEDING)
        )
        SELECT process, pid,
               regexp_extract(line, '^0x\\S+\\s+0x\\S+\\s+\\S+\\s+(.*)$', 1) AS dll_path
        FROM tagged
        WHERE line LIKE '0x%' AND process IS NOT NULL
          AND regexp_extract(line, '^0x\\S+\\s+0x\\S+\\s+\\S+\\s+(.*)$', 1) <> ''
    )
), allf AS (
    SELECT * FROM hay WHERE severity <> 'info'
    UNION ALL SELECT * FROM clam
    UNION ALL SELECT * FROM sig
    UNION ALL SELECT * FROM auto
    UNION ALL (SELECT * FROM chain WHERE sev <> 'info')
    UNION ALL SELECT * FROM hol
    UNION ALL SELECT * FROM yara
    UNION ALL SELECT * FROM dlls
)
SELECT sha256(concat_ws(chr(31), tool_name, title, target, description))
           AS finding_id,
       tool_name, severity, title, target, description,
       CASE severity WHEN 'critical' THEN 0 WHEN 'high' THEN 1
                     WHEN 'medium' THEN 2 WHEN 'low' THEN 3 ELSE 4 END AS rnk
FROM allf
ORDER BY rnk, title, target, description
LIMIT 100
""",
)
def findings_pipeline_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's DAILY PIPELINE as one oracle row: every tool
    dump under the fixtures dir normalized (all 8 sources), unioned
    into the findings fact table, severity-ranked and top-K'd — the
    run_audit_pipeline composition
    (/root/reference/src/audit/pipeline.py:124-316) end-to-end,
    value-hashed against DuckDB replaying all 8 normalizers in SQL
    (finding_id hashes included). Individual normalizers stay graded
    or sim-checked on their own; this is the cross-source integration
    gate the reference actually ships as its core workload."""
    from filesystemagent_spark.operators.relational import rank_by_map
    from filesystemagent_spark.plans.pipeline import run_audit_pipeline
    from filesystemagent_spark.schemas import SEVERITY_RANK

    res = run_audit_pipeline(spark, FIX)
    # The pipeline's skip/continue tolerance is an OPERATIONAL choice
    # (reference pipeline.py:208-213); under the oracle it would turn a
    # missing fixture or a normalizer error into a quietly shrunken
    # findings table whose only symptom is an inscrutable hash
    # mismatch — fail loudly here instead.
    if res.sources_skipped or res.sources_failed:
        raise ValueError(
            f"audit pipeline incomplete: skipped={res.sources_skipped} "
            f"failed={res.sources_failed}"
        )
    ranked = rank_by_map(res.findings, "severity", SEVERITY_RANK, rank_col="rnk")
    return (
        ranked.select(
            "finding_id", "tool_name", "severity", "title", "target",
            "description", "rnk",
        )
        .orderBy("rnk", "title", "target", "description")
        .limit(100)
    )
