"""Day-boundary date formatting — default / utc / both modes
(reference helper/date/date.go:39-105, config switch config.go:728-735).

The partition column `date` prunes the points/index scan; WHICH day a
boundary timestamp belongs to depends on the mode because of a historical
carbon-clickhouse bug that wrote local-time days ("default", broken
symmetric). "both" covers either writer by widening the range:
min(local, UTC) for the lower bound, max for the upper.

These feed the partition predicate (`col("date").between(lo, hi)`) —
driver-side scalar code, exactly like the reference emits Date conjuncts.
"""

from __future__ import annotations

from datetime import datetime, timezone

DATE_FMT = "%Y-%m-%d"


def date_utc(ts: int) -> str:
    """UTCTimestampToDaysFormat (date.go:50-52)."""
    return datetime.fromtimestamp(ts, tz=timezone.utc).strftime(DATE_FMT)


def date_default(ts: int) -> str:
    """DefaultTimestampToDaysFormat (date.go:39-42): the LOCAL calendar
    day (then labeled as if UTC) — reproduces the carbon-clickhouse
    write-side behavior."""
    return datetime.fromtimestamp(ts).strftime(DATE_FMT)


def date_min(ts: int) -> str:
    """MinTimestampToDaysFormat (date.go:71-76): earlier of local/UTC day."""
    return min(date_default(ts), date_utc(ts))


def date_max(ts: int) -> str:
    """MaxTimestampToDaysFormat (date.go:92-97): later of local/UTC day."""
    return max(date_default(ts), date_utc(ts))


def date_bounds(from_ts: int, until_ts: int, mode: str = "utc") -> tuple[str, str]:
    """Partition-pruning [lo, hi] day strings for a time range.

    mode: 'utc' | 'default' | 'both' (config.go:728-735). 'both' widens to
    cover data written under either convention."""
    if mode == "utc":
        return date_utc(from_ts), date_utc(until_ts)
    if mode == "default":
        return date_default(from_ts), date_default(until_ts)
    if mode == "both":
        return date_min(from_ts), date_max(until_ts)
    raise ValueError(f"unknown date mode: {mode}")
