"""Thin job-scheduling shell (SURVEY.md §2.8 ST4).

Replicates the reference scheduler's capability surface
(/root/reference/src/scheduler.py:54-196: cron/interval/once
schedules, next-run computation, bounded concurrency) as a driver
-side service that *launches* engine queries. Deliberately not a Spark
operator — SURVEY §7.3 hard part #3 is keeping orchestration out of
the query layer.

The cron dialect is the standard 5-field subset the reference's
croniter configs actually use: `* , - /` per field
(minute hour day-of-month month day-of-week; dow 0=Sunday, 6=Saturday,
7 accepted as Sunday). Matching follows the common vixie-cron rule:
when BOTH dom and dow are restricted, either may match.
"""

from __future__ import annotations

import threading
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Any, Callable

_FIELD_RANGES = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 6)]


def _parse_field(spec: str, lo: int, hi: int, *, dow: bool = False) -> frozenset[int]:
    # dow accepts 0-7 with both 0 and 7 meaning Sunday (vixie cron);
    # ranges expand in 0-7 space first, then 7 folds onto 0
    if dow:
        hi = 7
    values: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step <= 0:
                raise ValueError(f"step must be positive in {spec!r}")
        if part == "*":
            start, end = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            start, end = int(a), int(b)
        else:
            start = end = int(part)
        if not (lo <= start <= hi and lo <= end <= hi and start <= end):
            raise ValueError(f"field {spec!r} out of range [{lo},{hi}]")
        values.update(range(start, end + 1, step))
    if dow:
        values = {v % 7 for v in values}
    return frozenset(values)


@dataclass(frozen=True)
class CronSpec:
    minutes: frozenset[int]
    hours: frozenset[int]
    dom: frozenset[int]
    months: frozenset[int]
    dow: frozenset[int]
    dom_restricted: bool
    dow_restricted: bool

    @classmethod
    def parse(cls, expr: str) -> "CronSpec":
        fields = expr.split()
        if len(fields) != 5:
            raise ValueError(f"cron expr needs 5 fields, got {expr!r}")
        sets = [
            _parse_field(f, lo, hi, dow=(i == 4))
            for i, (f, (lo, hi)) in enumerate(zip(fields, _FIELD_RANGES))
        ]
        return cls(
            minutes=sets[0],
            hours=sets[1],
            dom=sets[2],
            months=sets[3],
            dow=sets[4],
            dom_restricted=fields[2] != "*",
            dow_restricted=fields[4] != "*",
        )

    def matches(self, t: datetime) -> bool:
        if t.minute not in self.minutes or t.hour not in self.hours:
            return False
        if t.month not in self.months:
            return False
        dom_ok = t.day in self.dom
        # python weekday(): Monday=0; cron dow: Sunday=0
        dow_ok = ((t.weekday() + 1) % 7) in self.dow
        if self.dom_restricted and self.dow_restricted:
            return dom_ok or dow_ok  # vixie-cron OR rule
        return dom_ok and dow_ok

    def next_fire(self, after: datetime) -> datetime:
        """Smallest matching minute strictly after `after` (croniter
        get_next semantics). Minute-resolution walk, bounded at 4 years
        (beyond any real 5-field schedule's period)."""
        t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
        limit = after + timedelta(days=365 * 4 + 1)
        while t <= limit:
            if self.matches(t):
                return t
            t += timedelta(minutes=1)
        raise ValueError("no matching time within 4 years")


@dataclass
class ScheduledJob:
    """cron | interval | once — mirrors the reference's ScheduleType
    (src/models.py:44-54)."""

    name: str
    action: Callable[[], Any]
    cron: str | None = None
    interval_seconds: float | None = None
    run_at: datetime | None = None
    enabled: bool = True
    next_run: datetime | None = None
    last_run: datetime | None = None
    runs: int = 0
    _spec: CronSpec | None = field(default=None, repr=False)

    def __post_init__(self) -> None:
        modes = sum(x is not None for x in (self.cron, self.interval_seconds, self.run_at))
        if modes != 1:
            raise ValueError("exactly one of cron/interval_seconds/run_at required")
        if self.cron is not None:
            self._spec = CronSpec.parse(self.cron)

    def compute_next(self, now: datetime) -> datetime | None:
        if self.cron is not None:
            return self._spec.next_fire(now)
        if self.interval_seconds is not None:
            return now + timedelta(seconds=self.interval_seconds)
        return self.run_at if self.runs == 0 else None  # once


class Scheduler:
    """Poll-driven scheduler with bounded concurrency (reference: poll
    1 s, max 2 concurrent — src/scheduler.py:96, config.yaml:20).

    `tick(now)` is pure scheduling logic (testable without sleeping);
    `run(poll_seconds)` is the thin wall-clock loop around it. Job
    actions run on a bounded pool so a slow job delays nothing but its
    own next firing (a job never overlaps itself).
    """

    def __init__(self, max_concurrent: int = 2):
        self._jobs: dict[str, ScheduledJob] = {}
        self._pool = ThreadPoolExecutor(max_workers=max_concurrent)
        self._inflight: dict[str, Future] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()

    def add(self, job: ScheduledJob, now: datetime | None = None) -> None:
        job.next_run = job.compute_next(now or datetime.now())
        with self._lock:
            self._jobs[job.name] = job

    def remove(self, name: str) -> None:
        with self._lock:
            self._jobs.pop(name, None)

    def jobs(self) -> list[ScheduledJob]:
        with self._lock:
            return list(self._jobs.values())

    def tick(self, now: datetime) -> list[str]:
        """Fire every enabled, due, not-already-running job. Returns
        the names fired this tick."""
        fired: list[str] = []
        with self._lock:
            due = [
                j
                for j in self._jobs.values()
                if j.enabled
                and j.next_run is not None
                and j.next_run <= now
                and not (
                    (f := self._inflight.get(j.name)) is not None and not f.done()
                )
            ]
            for job in due:
                self._inflight[job.name] = self._pool.submit(job.action)
                job.last_run = now
                job.runs += 1
                job.next_run = job.compute_next(now)
                fired.append(job.name)
        return fired

    def run(self, poll_seconds: float = 1.0) -> None:
        while not self._stop.wait(poll_seconds):
            self.tick(datetime.now())

    def stop(self) -> None:
        self._stop.set()
        self._pool.shutdown(wait=True)
