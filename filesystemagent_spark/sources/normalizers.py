"""Tool-output normalizers: raw scanner/collector dumps → the unified
`findings` fact table (SURVEY.md §2.1 S13-S20, §2.2 P18, §2.6 SO2).

Each normalizer is a declarative Spark read + projection producing the
canonical FINDING schema (schemas.FINDING); `union_findings` is the
SO2 unionByName. Everything stays JVM-side (regexp/format_string/when),
no Python UDFs — at scale a normalizer is a parallel scan over a
directory of dumps, one task per file split.

Semantics mirrored from the reference (file:line cited per function);
the reference's per-row try/except skipping is replaced by declared
schemas + permissive mode (SURVEY §1.3).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from filesystemagent_spark import schemas as S

# ---------------------------------------------------------------------------
# Severity maps (reference result_parser.py:157-183) — `when` chains so
# the mapping runs inside codegen, with the reference's defaults.

_HAYABUSA_LEVELS = {
    "critical": "critical",
    "crit": "critical",
    "high": "high",
    "medium": "medium",
    "med": "medium",
    "low": "low",
    "informational": "info",
    "info": "info",
}

_SIGMA_LEVELS = {
    "critical": "critical",
    "high": "high",
    "medium": "medium",
    "low": "low",
    "informational": "info",
}


def _map_level(col: Column, mapping: dict[str, str], default: str) -> Column:
    c = F.lower(F.trim(col))
    expr: Column = F.lit(default)
    for k, v in reversed(mapping.items()):
        expr = F.when(c == k, v).otherwise(expr)
    return expr


def severity_from_hayabusa_level(col: Column) -> Column:
    """/root/reference/src/audit/result_parser.py:157-170 (default info)."""
    return _map_level(col, _HAYABUSA_LEVELS, "info")


def severity_from_sigma_level(col: Column) -> Column:
    """/root/reference/src/audit/result_parser.py:172-183 (default info)."""
    return _map_level(col, _SIGMA_LEVELS, "info")


# ---------------------------------------------------------------------------
# Finding construction


def as_finding(
    df: DataFrame,
    tool_name: str,
    category: str,
    severity: Column | str,
    title: Column,
    description: Column,
    target: Column,
    raw_data: Column | None = None,
    timestamp: Column | None = None,
    mitre_attack: Column | str | None = None,
    domain: str = "security",
) -> DataFrame:
    """Project arbitrary normalized rows into the canonical FINDING
    columns (P18). finding_id is a deterministic content hash rather
    than the reference's uuid4 (models.py:77) so runs are reproducible
    and cross-engine checkable."""
    sev = F.lit(severity) if isinstance(severity, str) else severity
    mitre = (
        F.lit(None).cast("string")
        if mitre_attack is None
        else (F.lit(mitre_attack) if isinstance(mitre_attack, str) else mitre_attack)
    )
    return df.select(
        F.sha2(F.concat_ws("\x1f", F.lit(tool_name), title, target, description), 256).alias(
            "finding_id"
        ),
        F.lit(tool_name).alias("tool_name"),
        sev.alias("severity"),
        F.lit(category).alias("category"),
        title.alias("title"),
        description.alias("description"),
        target.alias("target"),
        F.lit(domain).alias("domain"),
        (raw_data if raw_data is not None else F.lit(None).cast(S.STR_MAP)).alias("raw_data"),
        (timestamp if timestamp is not None else F.lit(None).cast("timestamp")).alias(
            "timestamp"
        ),
        mitre.alias("mitre_attack"),
    )


def union_findings(*dfs: DataFrame) -> DataFrame:
    """SO2: one findings fact table from all sources
    (/root/reference/src/audit/models.py:261-270)."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def _raw(cols: dict[str, Column]) -> Column:
    """Build the raw_data MAP<STRING,STRING> column."""
    pairs: list[Column] = []
    for k, v in cols.items():
        pairs += [F.lit(k), v.cast("string")]
    return F.map_filter(F.create_map(*pairs), lambda _, v: v.isNotNull())


# ---------------------------------------------------------------------------
# S16 — Hayabusa CSV timeline


def hayabusa_findings(spark: SparkSession, path: str) -> DataFrame:
    """Hayabusa timeline CSV → event_log_alert findings; info rows are
    dropped at parse, matching the reference's pre-filter
    (/root/reference/src/audit/scanners/hayabusa.py:88-124)."""
    rows = spark.read.schema(S.HAYABUSA_CSV).option("header", True).csv(path)
    sev = severity_from_hayabusa_level(F.col("Level"))
    e = F.coalesce  # null-tolerant text pieces
    lit = F.lit("")
    return as_finding(
        rows.withColumn("severity", sev).filter(F.col("severity") != "info"),
        tool_name="hayabusa",
        category="event_log_alert",
        severity=F.col("severity"),
        title=F.concat(F.lit("Hayabusa: "), e(F.col("RuleTitle"), F.lit("Unknown rule"))),
        description=F.format_string(
            "[%s] %s on %s (Channel: %s) — %s",
            e(F.col("Level"), lit),
            e(F.col("RuleTitle"), F.lit("Unknown rule")),
            e(F.col("Computer"), lit),
            e(F.col("Channel"), lit),
            e(F.col("Details"), lit),
        ),
        target=F.concat_ws(":", F.col("Computer"), F.col("Channel")),
        raw_data=_raw(
            {
                "Timestamp": F.col("Timestamp"),
                "Computer": F.col("Computer"),
                "Channel": F.col("Channel"),
                "EventID": F.col("EventID"),
                "Level": F.col("Level"),
                "RecordID": F.col("RecordID"),
                "RuleTitle": F.col("RuleTitle"),
                "Details": F.col("Details"),
                "RuleFile": F.col("RuleFile"),
            }
        ),
        timestamp=F.to_timestamp(F.col("Timestamp")),
    )


# ---------------------------------------------------------------------------
# S13 — clamscan log


def clamscan_findings(spark: SparkSession, path: str) -> DataFrame:
    """clamscan text log: lines '<path>: <sig> FOUND' → HIGH
    malware_signature findings
    (/root/reference/src/audit/result_parser.py:47-80 +
    scanners/clamav.py:62-84). OK lines and the SCAN SUMMARY block
    carry no findings."""
    lines = spark.read.text(path)
    det = lines.filter(F.col("value").endswith(" FOUND")).select(
        F.regexp_extract("value", r"^(.*?): (.*) FOUND$", 1).alias("file"),
        F.regexp_extract("value", r"^(.*?): (.*) FOUND$", 2).alias("malware"),
    )
    return as_finding(
        det,
        tool_name="clamav",
        category="malware_signature",
        severity="high",
        title=F.concat(F.lit("ClamAV: "), F.col("malware")),
        description=F.format_string(
            "ClamAV detected known malware signature '%s' in file: %s",
            F.col("malware"),
            F.col("file"),
        ),
        target=F.col("file"),
        raw_data=_raw({"file": F.col("file"), "malware": F.col("malware")}),
    )


def clamscan_summary(spark: SparkSession, path: str) -> DataFrame:
    """The 'SCAN SUMMARY' key:value block → (key, value) rows
    (/root/reference/src/audit/result_parser.py:66-78)."""
    lines = spark.read.text(path)
    kv = lines.filter(
        F.col("value").contains(":")
        & ~F.col("value").endswith(" FOUND")
        & ~F.col("value").endswith(": OK")
        & ~F.col("value").startswith("-")
    )
    return kv.select(
        F.trim(F.substring_index("value", ":", 1)).alias("key"),
        F.trim(F.expr("substring(value, instr(value, ':') + 1)")).alias("val"),
    ).filter(F.col("val") != "")


# ---------------------------------------------------------------------------
# S18 — sigcheck CSV


def sigcheck_findings(spark: SparkSession, path: str) -> DataFrame:
    """Unsigned binaries (Verified == 'Unsigned', case-insensitive) →
    MEDIUM unsigned_binary
    (/root/reference/src/audit/scanners/sysinternals.py:139-168)."""
    rows = spark.read.schema(S.SIGCHECK_CSV).option("header", True).csv(path)
    unsigned = rows.filter(F.lower(F.col("Verified")) == "unsigned")
    basename = F.element_at(F.split(F.col("Path"), r"[\\/]"), -1)
    return as_finding(
        unsigned,
        tool_name="sigcheck",
        category="unsigned_binary",
        severity="medium",
        title=F.concat(F.lit("Sigcheck: unsigned binary "), basename),
        description=F.format_string(
            "Unsigned executable found: %s. Publisher: %s",
            F.col("Path"),
            F.coalesce(F.nullif(F.col("Publisher"), F.lit("")), F.lit("unknown")),
        ),
        target=F.col("Path"),
        raw_data=_raw({"Path": F.col("Path"), "Verified": F.col("Verified"),
                       "Publisher": F.col("Publisher")}),
    )


# ---------------------------------------------------------------------------
# S18 — autorunsc CSV


def autorunsc_findings(spark: SparkSession, path: str) -> DataFrame:
    """Two finding kinds per the reference
    (/root/reference/src/audit/scanners/sysinternals.py:45-102):
    unsigned autostart entries (HIGH, 'not verified' substring) and
    VirusTotal hits (CRITICAL, 'n|m' ratio with n>0), both T1547."""
    rows = spark.read.schema(S.AUTORUNSC_CSV).option("header", True).csv(path)
    entry = F.coalesce(F.nullif(F.col("Entry"), F.lit("")), F.col("Entry Location"))
    raw = _raw(
        {
            "Entry": F.col("Entry"),
            "Entry Location": F.col("Entry Location"),
            "Image Path": F.col("Image Path"),
            "Launch String": F.col("Launch String"),
            "Verified": F.col("Verified"),
            "VT detection": F.col("VT detection"),
        }
    )
    target = F.coalesce(F.nullif(F.col("Image Path"), F.lit("")), entry)

    unsigned = as_finding(
        rows.filter(F.lower(F.col("Verified")).contains("not verified")),
        tool_name="autorunsc",
        category="persistence",
        severity="high",
        title=F.concat(F.lit("Autoruns: unsigned entry at "), entry),
        description=F.format_string(
            "Unsigned autostart entry: %s. Image: %s. Launch: %s",
            entry,
            F.col("Image Path"),
            F.col("Launch String"),
        ),
        target=target,
        raw_data=raw,
        mitre_attack="T1547",
    )

    vt_n = F.split(F.col("VT detection"), r"\|")
    vt_hits = as_finding(
        rows.filter(
            F.col("VT detection").isNotNull()
            & ~F.col("VT detection").isin("", "0|0", "Unknown")
            & (F.size(vt_n) == 2)
            & (F.element_at(vt_n, 1).cast("int") > 0)
        ),
        tool_name="autorunsc",
        category="persistence",
        severity="critical",
        title=F.concat(F.lit("Autoruns: VT hit on "), entry),
        description=F.format_string(
            "VirusTotal detection %s for autostart entry: %s. Image: %s",
            F.col("VT detection"),
            entry,
            F.col("Image Path"),
        ),
        target=target,
        raw_data=raw,
        mitre_attack="T1547",
    )
    return union_findings(unsigned, vt_hits)


# ---------------------------------------------------------------------------
# S17 — chainsaw JSON


def chainsaw_findings(spark: SparkSession, path: str) -> DataFrame:
    """Sigma detections (JSON array) → event_log_alert findings; info
    level dropped; source falls back to document.path
    (/root/reference/src/audit/scanners/chainsaw.py:100-144)."""
    rows = (
        spark.read.schema(S.CHAINSAW_JSON)
        .option("multiLine", True)
        .option("mode", "PERMISSIVE")
        .json(path)
    )
    name = F.coalesce(F.col("name"), F.col("title"), F.lit("Unknown detection"))
    level = F.coalesce(F.col("level"), F.col("severity"), F.lit("medium"))
    source = F.coalesce(F.col("source"), F.col("document.path"), F.lit(""))
    sev = severity_from_sigma_level(level)
    desc = F.concat_ws(
        " ",
        name,
        F.when(F.nullif(F.col("timestamp"), F.lit("")).isNotNull(),
               F.concat(F.lit("at "), F.col("timestamp"))),
        F.when(F.nullif(source, F.lit("")).isNotNull(), F.concat(F.lit("in "), source)),
    )
    return as_finding(
        rows.withColumn("sev", sev).filter(F.col("sev") != "info"),
        tool_name="chainsaw",
        category="event_log_alert",
        severity=F.col("sev"),
        title=F.concat(F.lit("Chainsaw: "), name),
        description=desc,
        target=source,
        raw_data=_raw(
            {
                "name": name,
                "level": level,
                "timestamp": F.col("timestamp"),
                "source": source,
                "authors": F.col("authors"),
            }
        ),
        timestamp=F.to_timestamp(F.col("timestamp")),
    )


# ---------------------------------------------------------------------------
# S15 — HollowsHunter JSON report


# anomaly → (severity, mitre, description) —
# /root/reference/src/audit/scanners/hollows_hunter.py:19-45
ANOMALY_SEVERITY: dict[str, tuple[str, str, str]] = {
    "replaced": ("critical", "T1055.012", "Process hollowing — entire module replaced in memory"),
    "implanted": ("critical", "T1055", "Code injection — foreign code implanted into process"),
    "hdr_modified": ("high", "T1055", "PE header modification — headers tampered in memory"),
    "patched": ("medium", "T1574", "Inline patching — code bytes modified (possible hook)"),
    "iat_hooked": ("high", "T1574.009", "IAT hooking — import table redirected"),
    "unreachable_file": ("high", "T1055.012", "Module not backed by a reachable file on disk"),
    "other": ("medium", "T1055", "Unclassified in-memory anomaly"),
}


def hollows_hunter_findings(spark: SparkSession, path: str) -> DataFrame:
    """Per-process anomaly counts → one memory_anomaly finding per
    anomaly type with count>0
    (/root/reference/src/audit/result_parser.py:83-129 +
    scanners/hollows_hunter.py:101-130). The dynamic-pid `scanned`
    object reads as MAP<pid, struct> then explodes — the Spark form of
    the reference's dict loop."""
    report = spark.read.schema(S.HOLLOWS_HUNTER_JSON).option("multiLine", True).json(path)
    procs = report.select(F.explode("scanned").alias("pid", "p"))
    # anomaly matrix → long form: one row per (pid, anomaly_type, count)
    anomalies = procs.select(
        "pid",
        F.col("p.name").alias("name"),
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(k) for k in ANOMALY_SEVERITY]),
                F.array(*[F.coalesce(F.col(f"p.{k}"), F.lit(0)) for k in ANOMALY_SEVERITY]),
            )
        ).alias("anomaly_type", "n"),
    ).filter(F.col("n") > 0)

    sev = F.lit(None).cast("string")
    mitre = F.lit(None).cast("string")
    desc0 = F.lit(None).cast("string")
    for k, (s, m, d) in reversed(ANOMALY_SEVERITY.items()):
        cond = F.col("anomaly_type") == k
        sev = F.when(cond, s).otherwise(sev)
        mitre = F.when(cond, m).otherwise(mitre)
        desc0 = F.when(cond, d).otherwise(desc0)

    plural = F.when(F.col("n") > 1, "ies").otherwise("y")
    return as_finding(
        anomalies.withColumn("sev", sev).withColumn("mitre", mitre).withColumn("d0", desc0),
        tool_name="hollows_hunter",
        category="memory_anomaly",
        severity=F.col("sev"),
        title=F.format_string(
            "HollowsHunter: %s in %s (PID %s)", F.col("anomaly_type"), F.col("name"), F.col("pid")
        ),
        description=F.format_string(
            "%s. Found %s %s anomal%s in process %s (PID %s).",
            F.col("d0"),
            F.col("n"),
            F.col("anomaly_type"),
            plural,
            F.col("name"),
            F.col("pid"),
        ),
        target=F.concat(F.lit("PID:"), F.col("pid")),
        raw_data=_raw(
            {"pid": F.col("pid"), "name": F.col("name"),
             "anomaly_type": F.col("anomaly_type"), "count": F.col("n")}
        ),
        mitre_attack=F.col("mitre"),
    )


# ---------------------------------------------------------------------------
# S20-adjacent — YARA JSON


def yara_findings(spark: SparkSession, path: str) -> DataFrame:
    """YARA-X matches → suspicious_pattern findings; severity from rule
    metadata with HIGH default; supports both the v1.x {rule,file}
    shape and the legacy {path,rules:[...]} shape
    (/root/reference/src/audit/scanners/yara_scanner.py:102-179)."""
    report = spark.read.schema(S.YARA_JSON).option("multiLine", True).json(path)
    m = report.select(F.explode("matches").alias("m"))

    def build(rule: Column, file: Column, meta: Column) -> DataFrame:
        sev = _map_level(
            F.coalesce(meta.getField("severity"), F.lit("high")),
            _SIGMA_LEVELS | {"info": "info"},
            "high",
        )
        desc = F.coalesce(
            meta.getField("description"),
            F.format_string("YARA rule '%s' matched", rule),
        )
        return (
            rule.alias("rule"),
            file.alias("file"),
            sev.alias("sev"),
            desc.alias("desc"),
            meta.getField("mitre_attack").alias("mitre"),
        )

    modern = m.filter(F.col("m.rule").isNotNull()).select(
        *build(F.col("m.rule"), F.coalesce(F.col("m.file"), F.lit("unknown")), F.col("m.metadata"))
    )
    legacy = (
        m.filter(F.col("m.rule").isNull() & F.col("m.rules").isNotNull())
        .select(
            F.coalesce(F.col("m.path"), F.lit("unknown")).alias("_path"),
            F.explode("m.rules").alias("r"),
        )
        .select(
            *build(
                F.coalesce(F.col("r.identifier"), F.lit("unknown_rule")),
                F.col("_path"),
                F.col("r.metadata"),
            )
        )
    )
    rows = modern.unionByName(legacy)
    return as_finding(
        rows,
        tool_name="yara_x",
        category="suspicious_pattern",
        severity=F.col("sev"),
        title=F.concat(F.lit("YARA: "), F.col("rule")),
        description=F.format_string("%s — matched in %s", F.col("desc"), F.col("file")),
        target=F.col("file"),
        raw_data=_raw({"rule": F.col("rule"), "file": F.col("file")}),
        mitre_attack=F.col("mitre"),
    )


# ---------------------------------------------------------------------------
# S19 — ListDLLs stateful text parse


def listdlls_modules(spark: SparkSession, path: str) -> DataFrame:
    """The stateful line parser as a window: propagate the last process
    header ('<name> pid: <n>') down to the DLL lines ('0x...') below it
    (/root/reference/src/audit/scanners/sysinternals.py:187-241).

    Scale shape: ordering is per input file (partitionBy file), so a
    directory of N dumps parses as N independent window partitions —
    the classic 'last non-null over line order' Spark idiom. A single
    multi-GB dump would serialize into one partition; tool dumps are
    MBs, the fan-out is across files.
    """
    lines = (
        spark.read.text(path)
        .select(
            F.trim(F.col("value")).alias("line"),
            F.input_file_name().alias("src"),
            F.monotonically_increasing_id().alias("pos"),
        )
    )
    w = Window.partitionBy("src").orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    header = F.when(
        F.col("line").rlike(r"(?i)^.*\bpid:\s*\d+"),
        F.struct(
            F.trim(F.regexp_extract(F.col("line"), r"(?i)^(.*?)\s*pid:", 1)).alias("process"),
            F.trim(F.regexp_extract(F.col("line"), r"(?i)pid:\s*(\d+)", 1)).alias("pid"),
        ),
    )
    tagged = lines.withColumn("hdr", F.last(header, True).over(w))
    dll = tagged.filter(F.col("line").startswith("0x") & F.col("hdr").isNotNull()).select(
        F.col("hdr.process").alias("process"),
        F.col("hdr.pid").alias("pid"),
        F.regexp_extract("line", r"^(0x\S+)", 1).alias("base"),
        F.regexp_extract("line", r"^0x\S+\s+(0x\S+)", 1).alias("size"),
        F.regexp_extract("line", r"^0x\S+\s+0x\S+\s+(\S+)", 1).alias("version"),
        # path may contain spaces — everything after the 3rd field
        F.regexp_extract("line", r"^0x\S+\s+0x\S+\s+\S+\s+(.*)$", 1).alias("dll_path"),
    )
    return dll.filter(F.col("dll_path") != "")


def listdlls_findings(spark: SparkSession, path: str) -> DataFrame:
    """Every parsed DLL row → MEDIUM unsigned_dll finding, T1055.001
    (/root/reference/src/audit/scanners/sysinternals.py:219-241)."""
    return as_finding(
        listdlls_modules(spark, path),
        tool_name="listdlls",
        category="unsigned_dll",
        severity="medium",
        title=F.concat(F.lit("ListDLLs: unsigned DLL in "), F.col("process")),
        description=F.format_string(
            "Unsigned DLL loaded into %s (PID %s): %s",
            F.col("process"),
            F.col("pid"),
            F.col("dll_path"),
        ),
        target=F.col("dll_path"),
        raw_data=_raw(
            {"process": F.col("process"), "pid": F.col("pid"), "dll_path": F.col("dll_path")}
        ),
        mitre_attack="T1055.001",
    )
