"""Graphite time-spec parsing — cases modeled on the reference e2e corpus
(rnow-10, midnight+60s) and helper/datetime/datetime.go behavior."""

from graphite_clickhouse_spark.functions.datetime_spec import (
    date_param_to_epoch,
    interval_seconds,
)

NOW = 1704153600 + 3723  # 2024-01-02 01:02:03 UTC
MIDNIGHT = 1704153600  # 2024-01-02 00:00:00 UTC


class TestInterval:
    def test_units(self):
        assert interval_seconds("1d") == 86400
        assert interval_seconds("-2h") == -7200
        assert interval_seconds("10min") == 600
        assert interval_seconds("1w") == 604800
        assert interval_seconds("1mon") == 30 * 86400
        assert interval_seconds("1y") == 365 * 86400
        assert interval_seconds("2h30min") == 9000

    def test_bare_number_is_seconds(self):
        assert interval_seconds("10", -1) == -10
        assert interval_seconds("-10") == -10


class TestDateParam:
    def test_empty_and_garbage(self):
        assert date_param_to_epoch("", NOW) == 0
        assert date_param_to_epoch("nonsense", NOW) == 0

    def test_relative(self):
        assert date_param_to_epoch("-1d", NOW) == NOW - 86400
        assert date_param_to_epoch("+2h", NOW) == NOW + 7200

    def test_now_and_rnow_truncated(self):
        assert date_param_to_epoch("now", NOW) == NOW
        assert date_param_to_epoch("rnow", NOW, truncate_sec=60) == NOW - NOW % 60

    def test_rnow_minus_offset(self):
        # the e2e corpus' `rnow-10`
        assert date_param_to_epoch("rnow-10", NOW, truncate_sec=60) == NOW - NOW % 60 - 10

    def test_midnight_and_chain(self):
        assert date_param_to_epoch("midnight", NOW) == MIDNIGHT
        assert date_param_to_epoch("midnight+60s", NOW) == MIDNIGHT + 60
        assert date_param_to_epoch("noon", NOW) == MIDNIGHT + 12 * 3600
        assert date_param_to_epoch("teatime", NOW) == MIDNIGHT + 16 * 3600

    def test_compound_chain(self):
        assert date_param_to_epoch("now-1d+2h", NOW) == NOW - 86400 + 7200

    def test_epoch_passthrough(self):
        assert date_param_to_epoch("1704067200", NOW) == 1704067200

    def test_yyyymmdd_not_epoch(self):
        # 8 digits = date, not seconds (datetime.go:85-89)
        assert date_param_to_epoch("20240102", NOW) == MIDNIGHT

    def test_clock_underscore_date(self):
        assert date_param_to_epoch("16:00_20240102", NOW) == MIDNIGHT + 16 * 3600
        assert date_param_to_epoch("noon_20240102", NOW) == MIDNIGHT + 12 * 3600

    def test_us_date_format(self):
        assert date_param_to_epoch("01/02/24", NOW) == MIDNIGHT

    def test_yesterday_tomorrow_are_midnights(self):
        # bare date keywords zero the clock (datetime.go:183-191)
        assert date_param_to_epoch("yesterday", NOW) == MIDNIGHT - 86400
        assert date_param_to_epoch("tomorrow", NOW) == MIDNIGHT + 86400

    def test_yesterday_chain_keeps_clock(self):
        # ...but inside a ±chain the full timestamp is kept (datetime.go:104-146)
        assert date_param_to_epoch("yesterday+2h", NOW) == NOW - 86400 + 7200


class TestReferenceGoldenTable:
    """The reference's own TestDateParamToEpoch{,Truncate} tables
    (/root/reference/helper/datetime/datetime_test.go), evaluated in UTC
    (upstream runs them in time.Local; the vectors are tz-parametric —
    now = 1994-Aug-16 15:30 in the chosen zone)."""

    def _check(self, cases, truncate_sec):
        from datetime import datetime, timezone

        from graphite_clickhouse_spark.functions.datetime_spec import (
            date_param_to_epoch,
        )

        now = int(datetime(1994, 8, 16, 15, 30,
                           tzinfo=timezone.utc).timestamp())
        for inp, out in cases:
            want = int(
                datetime.strptime(out, "%H:%M:%S %Y-%m-%d")
                .replace(tzinfo=timezone.utc).timestamp()
            )
            got = date_param_to_epoch(inp, now, truncate_sec)
            assert got == want, (inp, got, want)

    def test_main_table(self):
        self._check([
            ("midnight", "00:00:00 1994-08-16"),
            ("noon", "12:00:00 1994-08-16"),
            ("teatime", "16:00:00 1994-08-16"),
            ("tomorrow", "00:00:00 1994-08-17"),
            ("noon 08/12/94", "12:00:00 1994-08-12"),
            ("midnight 20060812", "00:00:00 2006-08-12"),
            ("noon tomorrow", "12:00:00 1994-08-17"),
            ("17:04 19940812", "17:04:00 1994-08-12"),
            ("-1day", "15:30:00 1994-08-15"),
            ("19940812", "00:00:00 1994-08-12"),
            ("midnight-10", "23:59:50 1994-08-15"),
            ("midnight-1s", "23:59:59 1994-08-15"),
            ("midnight-1day", "00:00:00 1994-08-15"),
            ("midnight-1day+1s", "00:00:01 1994-08-15"),
        ], truncate_sec=1)

    def test_truncate_table(self):
        self._check([
            ("midnight", "00:00:00 1994-08-16"),
            ("noon", "12:00:00 1994-08-16"),
            ("teatime", "16:00:00 1994-08-16"),
            ("tomorrow", "00:00:00 1994-08-17"),
            ("noon 08/12/94", "12:00:00 1994-08-12"),
            ("midnight 20060812", "00:00:00 2006-08-12"),
            ("noon tomorrow", "12:00:00 1994-08-17"),
            ("17:04 19940812", "17:04:00 1994-08-12"),
            ("-1day", "15:30:00 1994-08-15"),
            ("19940812", "00:00:00 1994-08-12"),
            ("midnight-10", "23:59:50 1994-08-15"),
            ("midnight-1s", "23:59:59 1994-08-15"),
            ("midnight-1day", "00:00:00 1994-08-15"),
            ("now-1", "15:29:59 1994-08-16"),
            ("now-45s", "15:29:15 1994-08-16"),
        ], truncate_sec=10)
