"""Prometheus remote read — /api/v1/read (snappy-framed prompb).

The reference serves this by embedding the upstream Prometheus web
handler over its custom storage.Querier
(/root/reference/prometheus/run.go:63-87, matchers translated at
prometheus/matcher.go:15-77, series selected and fetched by
prometheus/querier_select.go:95-147). Here the same surface is a thin
driver-side codec (hand-rolled prompb, pure-Python snappy) around a
DataFrame plan: matcher predicate -> time-range filter -> version dedup,
all pushed to the scan.

prompb message layout (public prometheus/prompb/remote.proto, types.proto):

  ReadRequest  { repeated Query queries = 1; }
  Query        { int64 start_timestamp_ms = 1; int64 end_timestamp_ms = 2;
                 repeated LabelMatcher matchers = 3; ReadHints hints = 4; }
  LabelMatcher { Type type = 1 (EQ NEQ RE NRE); string name = 2; string value = 3; }
  ReadResponse { repeated QueryResult results = 1; }
  QueryResult  { repeated TimeSeries timeseries = 1; }
  TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2; }
  Label        { string name = 1; string value = 2; }
  Sample       { double value = 1; int64 timestamp = 2; }   // ms
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


from ..plans.prometheus import LabelMatcher, terms_from_matchers
from ..plans.tagged import tagged_predicate
from . import request as _request
from .request import _decode_fields
from .reply import _len_delim, _string, _uvarint_field

#: prompb.LabelMatcher.Type enum -> graphite tagged op
_MATCHER_TYPES = {0: "=", 1: "!=", 2: "=~", 3: "!~"}


@dataclass
class RemoteReadQuery:
    start_ms: int = 0
    end_ms: int = 0
    matchers: list[LabelMatcher] = field(default_factory=list)


def _parse_matcher(buf: bytes) -> LabelMatcher:
    mtype, name, value = 0, "", ""
    for f, _w, v in _decode_fields(buf):
        if f == 1:
            mtype = v
        elif f == 2:
            name = v.decode("utf-8")
        elif f == 3:
            value = v.decode("utf-8")
    op = _MATCHER_TYPES.get(mtype)
    if op is None:
        raise ValueError(f"unknown matcher type {mtype}")
    return LabelMatcher(name, op, value)


def _parse_query(buf: bytes) -> RemoteReadQuery:
    q = RemoteReadQuery()
    for f, _w, v in _decode_fields(buf):
        if f == 1:
            q.start_ms = v
        elif f == 2:
            q.end_ms = v
        elif f == 3:
            q.matchers.append(_parse_matcher(v))
    return q


@_request.bad_request_guard
def parse_read_request(body: bytes) -> list[RemoteReadQuery]:
    """Decoded (already snappy-decompressed) ReadRequest -> queries."""
    out = []
    for f, w, v in _decode_fields(body):
        if f == 1 and w == 2:
            out.append(_parse_query(v))
    return out


def remote_read_frame(
    tagged: DataFrame, matchers: list[LabelMatcher], start_s: int, end_s: int
) -> DataFrame:
    """The Select + fetch plan for one remote-read query: matcher
    predicate and time range as scan filters (both push down to
    parquet), then the standard max-version dedup per (path, time) —
    raw samples, exactly what upstream's SAMPLES response type carries."""
    pred = tagged_predicate(terms_from_matchers(matchers), F.col("tags"))
    df = tagged.filter(
        pred & F.col("time").between(int(start_s), int(end_s))
    )
    # max-version dedup: tags can't ride in a max-struct (maps have no
    # ordering) but they are functionally dependent on path, so first()
    # is exact
    ordered = F.struct(F.col("version").alias("v"), F.col("value").alias("x"))
    return df.groupBy("path", "time").agg(
        F.max(ordered).getField("x").alias("value"),
        F.first("tags").alias("tags"),
    ).select("path", "tags", "time", "value")


def _encode_sample(value: float, ts_ms: int) -> bytes:
    body = b"\x09" + struct.pack("<d", value)  # field 1, wire 1
    body += _uvarint_field(2, ts_ms)
    return body


def _encode_series(labels: dict[str, str], samples: list[tuple[int, float]]) -> bytes:
    # prometheus requires label pairs sorted by name
    body = b""
    for k in sorted(labels):
        body += _len_delim(1, _string(1, k) + _string(2, labels[k]))
    for ts_ms, value in samples:
        body += _len_delim(2, _encode_sample(value, ts_ms))
    return body


def encode_read_response(
    results: list[list[tuple[dict[str, str], list[tuple[int, float]]]]]
) -> bytes:
    """[per-query [(labels, [(ts_ms, value)...])...]] -> ReadResponse
    bytes (uncompressed; the HTTP layer snappy-frames it)."""
    out = b""
    for series_list in results:
        qr = b""
        for labels, samples in series_list:
            qr += _len_delim(1, _encode_series(labels, samples))
        out += _len_delim(1, qr)
    return out


@_request.bad_request_guard
def parse_write_request(body: bytes) -> list[tuple[dict[str, str], list[tuple[int, float]]]]:
    """prompb.WriteRequest (remote.proto: repeated TimeSeries = 1,
    already snappy-decompressed) -> [(labels, [(ts_ms, value)...])].

    Remote WRITE is additive surface: the reference is a read-only query
    backend (ingest belongs to carbon-clickhouse), but this engine owns
    its ingest (streaming/ingest.py), so accepting Prometheus
    remote_write completes the federation story."""
    out = []
    for f, w, v in _decode_fields(body):
        if f == 1 and w == 2:
            labels: dict[str, str] = {}
            samples: list[tuple[int, float]] = []
            for f2, _w2, v2 in _decode_fields(v):
                if f2 == 1:
                    parts = {ff: vv for ff, _ww, vv in _decode_fields(v2)}
                    labels[parts[1].decode()] = parts[2].decode()
                elif f2 == 2:
                    parts = {ff: vv for ff, _ww, vv in _decode_fields(v2)}
                    samples.append((int(parts.get(2, 0)), float(parts.get(1, 0.0))))
            out.append((labels, samples))
    return out


def write_request_to_points(spark, serieses, version: int | None = None) -> DataFrame:
    """WriteRequest series -> ingest-schema rows (path, value, time,
    date, version). Labels collapse to the canonical tagged path
    `name?k=v&...` with sorted tags (the carbon-clickhouse canonical
    form this engine stores, streaming/ingest.py _normalize_tagged);
    series without __name__ are dropped, like invalid carbon lines."""
    import time as _time

    ver = int(_time.time()) if version is None else int(version)
    rows = []
    for labels, samples in serieses:
        name = labels.get("__name__")
        if not name:
            continue
        tags = "&".join(
            f"{k}={labels[k]}" for k in sorted(labels) if k != "__name__"
        )
        path = f"{name}?{tags}" if tags else name
        for ts_ms, value in samples:
            ts = int(ts_ms // 1000)
            # same wire bound as carbon ingest (uint32 seconds): a hostile
            # int64 timestamp would otherwise blow up timestamp_seconds
            # (Math.multiplyExact long overflow) and kill the whole write
            if 0 <= ts <= 4294967295:
                rows.append((path, float(value), ts))
    df = spark.createDataFrame(rows, "path string, value double, time long")
    return (
        df.withColumn("date", F.to_date(F.timestamp_seconds(F.col("time"))))
        .withColumn("version", F.lit(ver).cast("long"))
    )


def series_from_rows(rows) -> list[tuple[dict[str, str], list[tuple[int, float]]]]:
    """(path, tags, time, value) rows -> per-series (labels, samples),
    series ordered by path, samples by timestamp (ms)."""
    by_path: dict[str, tuple[dict[str, str], list[tuple[int, float]]]] = {}
    for r in rows:
        entry = by_path.setdefault(r.path, (dict(r.tags), []))
        entry[1].append((int(r.time) * 1000, float(r.value)))
    out = []
    for path in sorted(by_path):
        labels, samples = by_path[path]
        samples.sort()
        out.append((labels, samples))
    return out
