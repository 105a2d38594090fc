"""Graphite time-spec parsing — `from`/`until` values like `-1d`, `now`,
`midnight+60s`, `16:00_20240101`, `20060102`, epoch ints.

Parity with /root/reference/helper/datetime/datetime.go:47-219 (the e2e
corpus uses these specs: `rnow-10`, `midnight+60s`, ...) and the public
graphite-web / carbonapi interval grammar (s/min/h/d/w/mon/y; month=30 d,
year=365 d).

All math is UTC — the engine pins spark.sql.session.timeZone=UTC and the
testdata is UTC; the reference's tz parameter generalizes the same logic.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

_UNIT_SECONDS = [
    # longest-match first
    ("seconds", 1), ("second", 1), ("sec", 1), ("s", 1),
    # "m" = minutes: the reference resolves offsets through carbonapi's
    # parser.IntervalString, whose unit table accepts bare "m" (the e2e
    # corpus relies on it: issues/daytime/test.toml "midnight+1380m")
    ("minutes", 60), ("minute", 60), ("min", 60), ("m", 60),
    ("hours", 3600), ("hour", 3600), ("h", 3600),
    ("days", 86400), ("day", 86400), ("d", 86400),
    ("weeks", 604800), ("week", 604800), ("w", 604800),
    ("months", 2592000), ("month", 2592000), ("mon", 2592000),
    ("years", 31536000), ("year", 31536000), ("y", 31536000),
]

_INTERVAL_RE = re.compile(r"(\d+)([a-zA-Z]+)")


def interval_seconds(s: str, default_sign: int = 1) -> int:
    """`-1d`, `2h30min`, `10` (bare number = seconds) -> signed seconds.
    Mirrors carbonapi parser.IntervalString semantics."""
    s = s.strip()
    sign = default_sign
    if s.startswith("-"):
        sign, s = -1, s[1:]
    elif s.startswith("+"):
        sign, s = 1, s[1:]
    if not s:
        raise ValueError("empty interval")
    if s.isdigit():
        return sign * int(s)
    total = 0
    pos = 0
    for m in _INTERVAL_RE.finditer(s):
        if m.start() != pos:
            raise ValueError(f"bad interval: {s!r}")
        pos = m.end()
        qty, unit = int(m.group(1)), m.group(2).lower()
        for name, secs in _UNIT_SECONDS:
            if unit == name:
                total += qty * secs
                break
        else:
            raise ValueError(f"unknown unit {unit!r} in {s!r}")
    if pos != len(s):
        raise ValueError(f"bad interval: {s!r}")
    return sign * total


def _parse_clock(s: str) -> tuple[int, int] | None:
    """'midnight'/'noon'/'teatime'/'HH:MM' -> (hour, minute)
    (datetime.go:15-42)."""
    named = {"midnight": (0, 0), "noon": (12, 0), "teatime": (16, 0)}
    if s in named:
        return named[s]
    parts = s.split(":")
    if len(parts) == 2 and parts[0].isdigit() and parts[1].isdigit():
        return int(parts[0]), int(parts[1])
    return None


_DATE_FORMATS = ["%Y%m%d", "%m/%d/%y"]  # TimeFormats (datetime.go:44)


def _truncate(dt: datetime, truncate_sec: int) -> datetime:
    if truncate_sec <= 1:
        return dt
    epoch = int(dt.timestamp())
    return datetime.fromtimestamp(epoch - epoch % truncate_sec, tz=timezone.utc)


def _base_keyword(ds: str, now: datetime, truncate_sec: int) -> datetime | None:
    if ds in ("now", "today"):
        return now
    if ds in ("rnow", "rtoday"):
        return _truncate(now, truncate_sec)
    if ds == "yesterday":
        return now - timedelta(days=1)
    if ds == "ryesterday":
        return _truncate(now, truncate_sec) - timedelta(days=1)
    if ds == "tomorrow":
        return now + timedelta(days=1)
    if ds == "rtomorrow":
        return _truncate(now, truncate_sec) + timedelta(days=1)
    clock = _parse_clock(ds)
    if clock is not None and ds in ("midnight", "noon", "teatime"):
        return now.replace(hour=clock[0], minute=clock[1], second=0, microsecond=0)
    return None


def date_param_to_epoch(s: str, now_ts: int, truncate_sec: int = 1) -> int:
    """DateParamToEpoch (datetime.go:47-211); 0 = unparseable/empty."""
    if not s:
        return 0
    now = datetime.fromtimestamp(now_ts, tz=timezone.utc)

    if s[0] in "+-":
        try:
            return now_ts + interval_seconds(s, -1 if s[0] == "-" else 1)
        except ValueError:
            return 0

    if s in ("now", "rnow", "midnight", "noon", "teatime"):
        base = _base_keyword(s, now, truncate_sec)
        return int(base.timestamp())

    # bare epoch int (but 8 digits = YYYYMMDD)
    if re.fullmatch(r"\d+", s) and len(s) != 8:
        return int(s)

    s = s.replace("_", " ", 1)
    split = s.split()

    if len(split) == 1:
        # keyword±interval chain, e.g. midnight+60s, rnow-10, now-1d+2h
        m = re.search(r"[+-]", s)
        if m is not None:
            ds, rest = s[: m.start()], s[m.start():]
            base = _base_keyword(ds, now, truncate_sec)
            if base is None:
                return 0
            t = base
            for part in re.findall(r"[+-][^+-]*", rest):
                try:
                    t += timedelta(seconds=interval_seconds(part))
                except ValueError:
                    return 0
            return int(t.timestamp())
        ts_part, ds_part = "", s
    elif len(split) == 2:
        ts_part, ds_part = split
    else:
        return 0

    base = _base_keyword(ds_part, now, truncate_sec)
    if base is None:
        for fmt in _DATE_FORMATS:
            try:
                base = datetime.strptime(ds_part, fmt).replace(tzinfo=timezone.utc)
                break
            except ValueError:
                continue
        else:
            return 0

    hour = minute = 0
    if ts_part:
        clock = _parse_clock(ts_part)
        if clock is not None:
            hour, minute = clock
    return int(
        base.replace(hour=hour, minute=minute, second=0, microsecond=0).timestamp()
    )
