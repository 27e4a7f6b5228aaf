"""HTTP facade (route-for-route reference parity) and format adapters."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from tickdb_spark.api import TickDB
from tickdb_spark.server import TickDBServer
from tickdb_spark.sources import read_any, read_tick_docs, write_any


def _req(url, method="GET", body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_surface(tmp_path, spark):
    tdb = TickDB(spark, str(tmp_path / "wh"))
    with TickDBServer(tdb) as srv:
        u = srv.url
        assert _req(f"{u}/")[1]["engine"] == "pyspark"
        assert _req(f"{u}/_all_dbs")[1] == []
        assert _req(f"{u}/m", "PUT")[0] == 201
        assert _req(f"{u}/m", "PUT")[0] == 412  # duplicate
        assert _req(f"{u}/_all_dbs")[1] == ["m"]

        docs = [
            {"time": "2016-08-01T09:00:00Z", "index": "AAPL", "value": {"open": 10.0}},
            {"time": "2016-08-01T09:00:30Z", "index": "AAPL", "value": {"open": 11.0}},
            {"time": "2016-08-01T09:01:00Z", "index": "AAPL", "value": {"open": 14.0}},
        ]
        code, out = _req(f"{u}/m", "POST", docs)
        assert code == 201 and out["ok"]

        code, pt = _req(f"{u}/m/AAPL/2016-08-01T09:00:30Z")
        assert code == 200 and pt == {"open": 11.0}
        assert _req(f"{u}/m/AAPL/1999-01-01T00:00:00Z")[0] == 404

        code, rows = _req(
            f"{u}/m/_query",
            "POST",
            {
                "index": "AAPL",
                "from": "2016-08-01T00:00:00Z",
                "to": "2016-08-02T00:00:00Z",
                "group": "minute",
                "fields": {"open": {"reducer": "avg"}},
            },
        )
        assert code == 200
        assert [r["open_avg"] for r in rows] == [10.5, 14.0]

        # range delete [09:00, 09:01) then re-query
        code, _ = _req(
            f"{u}/m/AAPL", "DELETE",
            {"from": "2016-08-01T09:00:00Z", "to": "2016-08-01T09:01:00Z"},
        )
        assert code == 200
        _, rows = _req(
            f"{u}/m/_query",
            "POST",
            {
                "index": "AAPL",
                "from": "2016-08-01T00:00:00Z",
                "to": "2016-08-02T00:00:00Z",
                "group": "minute",
                "fields": {"open": "count"},
            },
        )
        assert [r["open_count"] for r in rows] == [1]

        assert _req(f"{u}/m/AAPL/_all", "DELETE")[0] == 200
        assert _req(f"{u}/m")[1]["indexes"] == []
        assert _req(f"{u}/m/_all", "DELETE")[0] == 200
        assert _req(f"{u}/_all_dbs")[1] == []
        # error paths
        assert _req(f"{u}/nope/_query", "POST", {"index": "x", "from": "a",
                    "to": "b", "group": "minute", "fields": {}})[0] in (400, 404, 500)
        assert _req(f"{u}/m", "POST", {"not": "a list"})[0] == 400


def test_format_roundtrip(tmp_path, spark):
    df = spark.range(10).selectExpr("id", "CAST(id * 2.5 AS DOUBLE) AS v")
    for fmt in ("parquet", "orc", "json", "csv"):
        path = str(tmp_path / fmt)
        write_any(df, path, fmt=fmt)
        back = read_any(spark, path, fmt=fmt, schema="id long, v double")
        assert back.count() == 10
        assert {r["id"]: r["v"] for r in back.collect()} == {i: i * 2.5 for i in range(10)}
    with pytest.raises(ValueError):
        read_any(spark, str(tmp_path / "json"), fmt="json")  # schema required
    with pytest.raises(ValueError):
        write_any(df, str(tmp_path / "x"), fmt="avro")


def test_read_tick_docs(tmp_path, spark):
    docs = [
        {"time": "2024-03-01T10:00:00Z", "index": "a", "value": {"p": 1.5}},
        {"time": "2024-03-01T10:00:01.250Z", "index": "b", "value": {"p": 2.5, "q": 1.0}},
    ]
    p = tmp_path / "docs.json"
    p.write_text("\n".join(json.dumps(d) for d in docs))
    ticks = read_tick_docs(spark, str(p))
    rows = {r["series"]: r for r in ticks.collect()}
    assert rows["a"]["value"] == {"p": 1.5}
    assert rows["b"]["ts"] % 10**9 == 250_000_000  # ms precision preserved
    assert set(ticks.columns) == {"series", "ts", "value", "ts_utc"}
