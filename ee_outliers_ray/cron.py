"""Minimal 5-field cron schedule + config-mtime watcher (stdlib-only).

Reference: daemon mode computes the next run from a croniter schedule
(/root/reference/app/outliers.py:147-151) and hot-reloads when watched
config files change (/root/reference/app/helpers/watchers.py:4-33).
croniter isn't available here; this implements the standard subset the
reference's schedules use: ``* */n a,b,c a-b`` per field
(minute hour day-of-month month day-of-week; dow 0=Sunday, 7 aliases 0).
"""

from __future__ import annotations

import datetime as dt
import os


def _parse_field(spec: str, lo: int, hi: int) -> set[int]:
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        if part in ("*", ""):
            lo2, hi2 = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            lo2, hi2 = int(a), int(b)
        else:
            lo2 = hi2 = int(part)
        for v in range(lo2, hi2 + 1, step):
            out.add(v)
    return out


class CronSchedule:
    def __init__(self, expr: str):
        fields = expr.split()
        if len(fields) != 5:
            raise ValueError(f"cron expression needs 5 fields: {expr!r}")
        self.minutes = _parse_field(fields[0], 0, 59)
        self.hours = _parse_field(fields[1], 0, 23)
        self.dom = _parse_field(fields[2], 1, 31)
        self.months = _parse_field(fields[3], 1, 12)
        dow = _parse_field(fields[4], 0, 7)
        self.dow = {d % 7 for d in dow}  # 7 == 0 == Sunday
        self.dom_restricted = fields[2] != "*"
        self.dow_restricted = fields[4] != "*"

    def _day_matches(self, t: dt.datetime) -> bool:
        dom_ok = t.day in self.dom
        # python weekday(): Monday=0; cron: Sunday=0
        dow_ok = (t.weekday() + 1) % 7 in self.dow
        if self.dom_restricted and self.dow_restricted:
            return dom_ok or dow_ok  # standard cron OR semantics
        return dom_ok and dow_ok

    def next_run(self, after: dt.datetime) -> dt.datetime:
        """First schedule time strictly after ``after`` (minute grain)."""
        t = (after + dt.timedelta(minutes=1)).replace(second=0, microsecond=0)
        for _ in range(60 * 24 * 366 * 4):  # bounded scan (4 years)
            if (t.month in self.months and self._day_matches(t)
                    and t.hour in self.hours and t.minute in self.minutes):
                return t
            t += dt.timedelta(minutes=1)
        raise ValueError("no matching cron time within 4 years")


class FileModificationWatcher:
    """Mtime watcher (reference helpers/watchers.py:4-33): remembers the
    mtimes of watched files; ``files_changed()`` reports and re-arms."""

    def __init__(self, paths: list[str] | None = None):
        self._mtimes: dict[str, float] = {}
        for p in paths or []:
            self.add_file(p)

    def add_file(self, path: str) -> None:
        try:
            self._mtimes[path] = os.path.getmtime(path)
        except OSError:
            self._mtimes[path] = -1.0

    def files_changed(self) -> bool:
        changed = False
        for p, old in list(self._mtimes.items()):
            try:
                cur = os.path.getmtime(p)
            except OSError:
                cur = -1.0
            if cur != old:
                changed = True
                self._mtimes[p] = cur
        return changed
