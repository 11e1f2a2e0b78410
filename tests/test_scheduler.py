"""Scheduler shell tests (ST4): cron next-fire math, interval/once
jobs, bounded/non-overlapping firing — all with an injected clock, no
sleeping."""

from __future__ import annotations

import threading
from datetime import datetime, timedelta

import pytest

from filesystemagent_spark.plans.scheduler import CronSpec, ScheduledJob, Scheduler


class TestCronSpec:
    def test_every_minute(self):
        s = CronSpec.parse("* * * * *")
        assert s.next_fire(datetime(2026, 8, 13, 10, 0, 30)) == datetime(2026, 8, 13, 10, 1)

    def test_daily_at_time(self):
        s = CronSpec.parse("30 2 * * *")
        assert s.next_fire(datetime(2026, 8, 13, 3, 0)) == datetime(2026, 8, 14, 2, 30)
        assert s.next_fire(datetime(2026, 8, 13, 1, 0)) == datetime(2026, 8, 13, 2, 30)

    def test_step_and_list(self):
        s = CronSpec.parse("*/15 9-17 * * 1,3,5")
        # 2026-08-13 is a Thursday; next Mon/Wed/Fri window is Friday 08-14
        got = s.next_fire(datetime(2026, 8, 13, 20, 0))
        assert got == datetime(2026, 8, 14, 9, 0)
        assert got.weekday() == 4  # Friday

    def test_dow_seven_is_sunday(self):
        assert CronSpec.parse("0 0 * * 7").dow == CronSpec.parse("0 0 * * 0").dow

    def test_dow_range_wrap(self):
        # 5-7 = Fri, Sat, Sun(0)
        assert CronSpec.parse("0 0 * * 5-7").dow == frozenset({5, 6, 0})

    def test_vixie_dom_dow_or_rule(self):
        # both restricted: fires on the 15th OR on Mondays
        s = CronSpec.parse("0 0 15 * 1")
        assert s.matches(datetime(2026, 8, 15, 0, 0))  # a Saturday, dom hits
        assert s.matches(datetime(2026, 8, 17, 0, 0))  # a Monday, dow hits
        assert not s.matches(datetime(2026, 8, 18, 0, 0))

    def test_next_fire_is_strictly_after(self):
        s = CronSpec.parse("0 12 * * *")
        exactly = datetime(2026, 8, 13, 12, 0)
        assert s.next_fire(exactly) == datetime(2026, 8, 14, 12, 0)

    def test_invalid(self):
        with pytest.raises(ValueError):
            CronSpec.parse("* * * *")
        with pytest.raises(ValueError):
            CronSpec.parse("61 * * * *")


class TestScheduledJob:
    def test_exactly_one_mode(self):
        with pytest.raises(ValueError):
            ScheduledJob("j", lambda: None)
        with pytest.raises(ValueError):
            ScheduledJob("j", lambda: None, cron="* * * * *", interval_seconds=5)

    def test_once_runs_once(self):
        t = datetime(2026, 8, 13, 10, 0)
        j = ScheduledJob("j", lambda: None, run_at=t)
        assert j.compute_next(t - timedelta(hours=1)) == t
        j.runs = 1
        assert j.compute_next(t) is None


class TestScheduler:
    def test_tick_fires_due_and_reschedules(self):
        ran = []
        sched = Scheduler(max_concurrent=2)
        now = datetime(2026, 8, 13, 10, 0)
        sched.add(
            ScheduledJob("iv", lambda: ran.append("iv"), interval_seconds=60), now=now
        )
        assert sched.tick(now) == []  # first due at now+60
        fired = sched.tick(now + timedelta(seconds=61))
        assert fired == ["iv"]
        job = sched.jobs()[0]
        assert job.runs == 1
        assert job.next_run == now + timedelta(seconds=61) + timedelta(seconds=60)
        sched.stop()
        assert ran == ["iv"]

    def test_no_self_overlap(self):
        release = threading.Event()
        started = threading.Event()

        def slow():
            started.set()
            release.wait(5)

        sched = Scheduler(max_concurrent=2)
        now = datetime(2026, 8, 13, 10, 0)
        sched.add(ScheduledJob("slow", slow, interval_seconds=1), now=now)
        assert sched.tick(now + timedelta(seconds=2)) == ["slow"]
        started.wait(5)
        # due again, but still in flight: skipped, not queued twice
        assert sched.tick(now + timedelta(seconds=10)) == []
        release.set()
        sched.stop()

    def test_once_job_never_refires(self):
        ran = []
        sched = Scheduler()
        now = datetime(2026, 8, 13, 10, 0)
        sched.add(
            ScheduledJob("once", lambda: ran.append(1), run_at=now + timedelta(seconds=5)),
            now=now,
        )
        assert sched.tick(now + timedelta(seconds=6)) == ["once"]
        assert sched.tick(now + timedelta(seconds=60)) == []
        sched.stop()
        assert ran == [1]
