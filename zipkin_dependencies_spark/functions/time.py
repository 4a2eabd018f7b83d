"""Day math (SURVEY §2.2 P8): UTC-midnight days, microsecond windows."""

from __future__ import annotations

import datetime as dt

DAY_MICROS = 86_400_000_000


def utc_day(day: str | dt.date) -> dt.date:
    """Parse ``yyyy-MM-dd`` (ZipkinDependenciesJob.java:95-104) or pass a date
    through; the result is the UTC day key ([EXT] DateUtil.midnightUTC)."""
    if isinstance(day, dt.date):
        return day
    return dt.datetime.strptime(day, "%Y-%m-%d").date()


def day_window_micros(day: str | dt.date) -> tuple[int, int]:
    """[day 00:00:00.000000, day 23:59:59.999999] in epoch µs — the window the
    reference computes at CassandraDependenciesJob.java:168-169 and
    MySQLDependenciesJob.java:182-183."""
    d = utc_day(day)
    start = int(
        dt.datetime(d.year, d.month, d.day, tzinfo=dt.timezone.utc).timestamp()
    ) * 1_000_000
    return start, start + DAY_MICROS - 1


def micros_to_day(micros: int) -> dt.date:
    """Epoch µs → UTC day."""
    return dt.datetime.fromtimestamp(micros / 1_000_000, tz=dt.timezone.utc).date()
