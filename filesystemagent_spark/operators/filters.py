"""Predicate catalog (SURVEY.md §2.2): every filter the reference
evaluates row-by-row in Python, re-expressed as Column expressions so
Catalyst can push them into scans and codegen evaluates them JVM-side.

All functions return `Column` (composable with & | ~); `FileFilter`
compiles the reference's 8-clause conjunction. Thresholds are module
constants mirroring the reference's (file:line cited inline).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from filesystemagent_spark.functions.tscompat import epoch_seconds

# ---------------------------------------------------------------------------
# F7: glob → Java regex — the one custom compile helper (SURVEY §7.4).


def _translate_class(inner: str) -> str:
    """Render a glob character class body as a safe regex class,
    following fnmatch.translate's rules: descending ranges (invalid in
    both Python and Java regex) collapse to the empty range and drop;
    a fully-empty class becomes the never-matching `(?!)`; `-` and
    class metacharacters are escaped so the output parses in either
    dialect."""
    neg = inner.startswith("!")
    body = inner[1:] if neg else inner
    if "-" not in body:
        chunks = [body] if body else []
    else:
        chunks = []
        k = 1  # a leading '-' is literal, never a range start
        start = 0
        while True:
            k = body.find("-", k, len(body) - 1)
            if k < 0:
                break
            chunks.append(body[start:k])
            start = k + 1
            k = k + 3
        chunk = body[start:]
        if chunk:
            chunks.append(chunk)
        elif chunks:
            chunks[-1] += "-"
        # merge away descending ("empty") ranges, as fnmatch does
        for k in range(len(chunks) - 1, 0, -1):
            if chunks[k - 1][-1:] > chunks[k][:1]:
                chunks[k - 1] = chunks[k - 1][:-1] + chunks[k][1:]
                del chunks[k]
        chunks = [c for c in chunks if c or len(chunks) == 1]
    stuff = "-".join(
        c.replace("\\", r"\\").replace("-", r"\-") for c in chunks
    )
    # Java char classes treat & (and Python some others) specially
    stuff = re.sub(r"([&~|\[\]])", r"\\\1", stuff)
    if not stuff:
        return "." if neg else "(?!)"
    if stuff.startswith("^"):
        stuff = "\\" + stuff
    return f"[{'^' if neg else ''}{stuff}]"


def glob_to_regex(pattern: str) -> str:
    """Translate an fnmatch-style glob to an anchored regex valid in
    both Java and Python dialects.

    Semantics follow fnmatch (reference etl_template_base.py:155-173):
    `*` matches any run including separators (fnmatch does not treat
    `/` specially), `?` one char, `[seq]` a class, `[!seq]` negated —
    including fnmatch's lenient treatment of unclosed brackets and
    descending ranges (property-tested against fnmatchcase in
    tests/test_properties.py).
    """
    out: list[str] = []
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        elif c == "[":
            j = i + 1
            if j < n and pattern[j] == "!":
                j += 1
            if j < n and pattern[j] == "]":
                j += 1
            while j < n and pattern[j] != "]":
                j += 1
            if j >= n:
                out.append(re.escape("["))
            else:
                out.append(_translate_class(pattern[i + 1 : j]))
                i = j
        else:
            out.append(re.escape(c))
        i += 1
    return "^" + "".join(out) + "$"


def matches_glob(col: Column | str, *patterns: str) -> Column:
    """fnmatch any-of as a single rlike alternation."""
    c = F.col(col) if isinstance(col, str) else col
    rx = "|".join(f"(?:{glob_to_regex(p)})" for p in patterns)
    return c.rlike(rx)


# ---------------------------------------------------------------------------
# P1: FileFilter — conjunction of 8 predicates
# (reference _matches_filter etl_template_base.py:122-175)

#: directory names treated as system files (etl_template_base.py:132-134)
SYSTEM_DIRS = ("System Volume Information", "$RECYCLE.BIN", "pagefile.sys")


@dataclass(frozen=True)
class FileFilter:
    """Declarative file filter; `compile()` yields one Column that
    Catalyst folds into the scan. Ages are seconds relative to `now`
    (pass a literal timestamp for deterministic plans)."""

    include_patterns: tuple[str, ...] = ()
    exclude_patterns: tuple[str, ...] = ()
    file_extensions: tuple[str, ...] = ()
    min_size: int | None = None
    max_size: int | None = None
    min_age_seconds: float | None = None
    max_age_seconds: float | None = None
    ignore_hidden: bool = True
    ignore_system: bool = True

    def compile(
        self,
        now: Column,
        path: Column | str = "file_path",
        name: Column | str = "file_name",
        size: Column | str = "file_size",
        modified: Column | str = "modified_time",
        is_directory: Column | str = "is_directory",
    ) -> Column:
        p = F.col(path) if isinstance(path, str) else path
        nm = F.col(name) if isinstance(name, str) else name
        sz = F.col(size) if isinstance(size, str) else size
        mt = F.col(modified) if isinstance(modified, str) else modified
        isdir = F.col(is_directory) if isinstance(is_directory, str) else is_directory

        cond = F.lit(True)
        if self.ignore_hidden:
            cond &= ~nm.startswith(".")
        if self.ignore_system:
            cond &= ~(isdir & nm.isin(*SYSTEM_DIRS))
        if self.min_size is not None:
            cond &= sz >= self.min_size
        if self.max_size is not None:
            cond &= sz <= self.max_size
        age = epoch_seconds(now) - epoch_seconds(mt)
        if self.min_age_seconds is not None:
            cond &= age >= self.min_age_seconds
        if self.max_age_seconds is not None:
            cond &= age <= self.max_age_seconds
        if self.file_extensions:
            ext = F.lower(F.element_at(F.split(nm, r"\."), -1))
            cond &= isdir | ext.isin(*[e.lower().lstrip(".") for e in self.file_extensions])
        if self.include_patterns:
            cond &= matches_glob(p, *self.include_patterns) | matches_glob(
                nm, *self.include_patterns
            )
        if self.exclude_patterns:
            cond &= ~(
                matches_glob(p, *self.exclude_patterns)
                | matches_glob(nm, *self.exclude_patterns)
            )
        return cond


# ---------------------------------------------------------------------------
# P5-P7: signature / VT predicates (sysinternals.py:45-168)


def is_not_verified(verified: Column) -> Column:
    """'not verified' substring — autoruns semantics (:61-76)."""
    return F.lower(verified).contains("not verified")


def is_unsigned(verified: Column) -> Column:
    """exact 'Unsigned' — sigcheck semantics (:146-167)."""
    return F.lower(verified) == "unsigned"


def vt_positive(vt: Column) -> Column:
    """P6/F16: 'n|m' VirusTotal ratio with n>0 (:77-100)."""
    parts = F.split(vt, r"\|")
    return (
        vt.isNotNull()
        & ~vt.isin("", "0|0", "Unknown")
        & (F.size(parts) == 2)
        & (F.element_at(parts, 1).cast("int") > 0)
    )


# ---------------------------------------------------------------------------
# P9/P10: resource thresholds (resource_analyzer.py:28-48)

HIGH_RAM_MB = 1024
HIGH_CPU_SECONDS = 3600
HIGH_THREAD_COUNT = 200
HIGH_HANDLE_COUNT = 5000
STALE_HOURS = 168
ORPHAN_STALE_HOURS = 24

KNOWN_LONG_RUNNING = (
    "system", "system idle process", "smss.exe", "csrss.exe",
    "wininit.exe", "services.exe", "lsass.exe", "svchost.exe",
    "dwm.exe", "explorer.exe", "winlogon.exe", "fontdrvhost.exe",
    "memory compression", "registry", "sihost.exe", "taskhostw.exe",
    "runtimebroker.exe", "dllhost.exe", "conhost.exe",
    "searchhost.exe", "startmenuexperiencehost.exe",
    "textinputhost.exe", "shellexperiencehost.exe",
    "spoolsv.exe", "wudfhost.exe", "ctfmon.exe",
    "securityhealthservice.exe", "msmpeng.exe",
    "sgrmbroker.exe", "msdtc.exe", "lsm.exe",
)


def is_user_process(pid: Column) -> Column:
    """Skip system pids 0/4 (resource_analyzer.py:144-151, 279-280)."""
    return pid > 4


def resource_hog_category(
    ram_mb: Column, cpu_seconds: Column, threads: Column, handles: Column
) -> Column:
    """P9: first-matching resource category, null if none
    (resource_analyzer.py:144-215 — the reference emits one finding
    per exceeded threshold; the column form tags the dominant one,
    use the individual comparisons for multi-tag)."""
    return (
        F.when(ram_mb > HIGH_RAM_MB, "high_ram")
        .when(cpu_seconds > HIGH_CPU_SECONDS, "high_cpu")
        .when(threads > HIGH_THREAD_COUNT, "high_threads")
        .when(handles > HIGH_HANDLE_COUNT, "high_handles")
    )


def parse_wmi_date(col: Column) -> Column:
    """F9: WMI '/Date(millis)/' → timestamp
    (resource_analyzer.py:254-263)."""
    millis = F.regexp_extract(col, r"/Date\((\d+)\)", 1)
    return F.when(
        millis != "", F.timestamp_millis(millis.cast("long"))
    ).otherwise(F.lit(None).cast("timestamp"))


def is_stale_process(
    name: Column, pid: Column, created_at_wmi: Column, now: Column,
    stale_hours: int = STALE_HOURS,
) -> Column:
    """P10: running longer than the threshold, excluding the
    long-running allowlist and system pids
    (resource_analyzer.py:265-303)."""
    created = parse_wmi_date(created_at_wmi)
    age_h = (epoch_seconds(now) - epoch_seconds(created)) / 3600.0
    return (
        is_user_process(pid)
        & ~F.lower(name).isin(*KNOWN_LONG_RUNNING)
        & created.isNotNull()
        & (age_h > stale_hours)
    )


# ---------------------------------------------------------------------------
# P11: unquoted service path (service_auditor.py:228-253)


def has_unquoted_path(path: Column) -> Column:
    trimmed = F.trim(path)
    # exe path = before any ' -' or ' /' argument introducer
    exe = F.trim(F.regexp_extract(trimmed, r"^(.*?)(?:\s+[-/].*)?$", 1))
    return (
        path.isNotNull()
        & (trimmed != "")
        & ~trimmed.startswith('"')
        & exe.contains(" ")
    )


# ---------------------------------------------------------------------------
# P12: standard-location predicates

STANDARD_WINDOWS_PREFIXES = (
    "c:\\windows\\",
    "c:\\program files\\",
    "c:\\program files (x86)\\",
    "c:\\programdata\\",
)

#: extra prefixes accepted for scheduled tasks (persistence_auditor.py:250-265)
TASK_STANDARD_EXTRAS = ("powershell", "cmd", "%systemroot%", "%windir%")


def _normalized(path: Column) -> Column:
    return F.replace(F.lower(F.trim(path)), F.lit("/"), F.lit("\\"))


def _strip_quotes(col: Column) -> Column:
    return F.regexp_replace(col, '^"+|"+$', "")


def _starts_with_any(col: Column, prefixes: tuple[str, ...]) -> Column:
    cond = F.lit(False)
    for p in prefixes:
        cond |= col.startswith(p)
    return cond


def is_standard_path(path: Column) -> Column:
    """process_snapshot.py:258-268 / service_auditor.py:255-267."""
    return _starts_with_any(_strip_quotes(_normalized(path)), STANDARD_WINDOWS_PREFIXES)


def is_suspicious_task_path(execute: Column) -> Column:
    """persistence_auditor.py:250-265 (powershell/cmd/envvar roots ok)."""
    n = _strip_quotes(_normalized(execute))
    return ~_starts_with_any(n, STANDARD_WINDOWS_PREFIXES + TASK_STANDARD_EXTRAS)


def is_suspicious_run_key_path(exe_path: Column) -> Column:
    """persistence_auditor.py:267-289 — C:\\Users\\ is NOT suspicious."""
    n = _strip_quotes(_normalized(exe_path))
    return ~_starts_with_any(n, STANDARD_WINDOWS_PREFIXES + ("c:\\users\\",))


# ---------------------------------------------------------------------------
# P13: SYSTEM account (service_auditor.py:269-276)


def is_system_account(account: Column) -> Column:
    a = F.lower(account)
    return (
        a.contains("localsystem")
        | a.contains("local system")
        | a.contains("nt authority\\system")
    )


# ---------------------------------------------------------------------------
# P14/F17: RFC1918 / external classifier (network_mapper.py:186-238)


def is_external_address(addr_col: Column) -> Column:
    a = F.trim(addr_col)
    lower = F.lower(a)
    octs = F.split(a, r"\.")
    o = [F.element_at(octs, i + 1).cast("int") for i in range(4)]
    ipv4_ok = (F.size(octs) == 4) & o[0].isNotNull() & o[1].isNotNull() & o[2].isNotNull() & o[3].isNotNull()
    ipv4_internal = (
        (o[0] == 127)
        | (o[0] == 0)
        | (o[0] == 10)
        | ((o[0] == 172) & o[1].between(16, 31))
        | ((o[0] == 192) & (o[1] == 168))
        | ((o[0] == 169) & (o[1] == 254))
    )
    ipv6 = a.contains(":")
    ipv6_internal = (
        a.isin("::", "::1")
        | lower.startswith("fe80:")
        | lower.startswith("fd")
        | lower.startswith("fc")
    )
    return F.when(addr_col.isNull() | (a == ""), F.lit(False)).otherwise(
        F.when(ipv6, ~ipv6_internal).otherwise(ipv4_ok & ~ipv4_internal)
    )


#: well-known ports excluded from the suspicious-listener check
#: (network_mapper.py:240-267)
COMMON_PORTS = (
    80, 443, 445, 135, 139, 993, 995, 587, 25,
    3389, 5985, 5986, 1433, 3306, 5432, 8080, 8443,
)


def is_suspicious_listener(local_address: Column, local_port: Column) -> Column:
    """P15: wildcard bind on a high, non-well-known port."""
    return (
        local_address.isin("0.0.0.0", "::", "[::]")
        & ~local_port.isin(*COMMON_PORTS)
        & (local_port >= 1024)
    )


def is_listener(state: Column) -> Column:
    """P8 (baseline_differ.py:364-372)."""
    return state == "Listen"


def listener_key(local_address: Column, local_port: Column) -> Column:
    """addr:port composite key for listener diffs."""
    return F.concat_ws(":", local_address, local_port)


# ---------------------------------------------------------------------------
# P16: elevated task (persistence_auditor.py:186-207)


def is_elevated_task(run_level: Column, state: Column) -> Column:
    return (run_level == "Highest") & (state != "Disabled")


# ---------------------------------------------------------------------------
# P17: exe-path extraction (persistence_auditor.py:291-308,
# service_auditor.py:165-180)


def extract_exe_path(value: Column) -> Column:
    """Quoted → first quoted token; unquoted → first whitespace token."""
    t = F.trim(value)
    quoted = F.regexp_extract(t, r'^"([^"]+)"', 1)
    unquoted = F.regexp_extract(t, r"^(\S+)", 1)
    return F.when(quoted != "", quoted).otherwise(unquoted)


# ---------------------------------------------------------------------------
# P2: catalog search (file_indexing_system.py:358-400)


def search_predicate(query: str, search_type: str = "name") -> Column:
    if search_type == "name":
        return F.col("file_name").contains(query)
    if search_type == "path":
        return F.col("file_path").contains(query)
    if search_type == "hash":
        return F.col("file_hash") == query
    if search_type == "size":
        return F.col("file_size") == int(query)
    raise ValueError(f"Unknown search_type: {search_type}")
