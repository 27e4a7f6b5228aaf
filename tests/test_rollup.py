"""Rollup cascade correctness: every reducer answered from a rollup must
equal the raw-tick answer (exact mode) bit-for-bit, at every granularity
and cascade level."""

from __future__ import annotations

import pytest

from tickdb_spark.api import TickDB
from tickdb_spark.rollup import RollupStore, route_tick_query
from tickdb_spark.tickquery import run_tick_query


@pytest.fixture(scope="module")
def db(tmp_path_factory, spark):
    tdb = TickDB(spark, str(tmp_path_factory.mktemp("wh")))
    tdb.create_db("r")
    docs = []
    # two series, sparse fields, several days, out-of-order
    for d in (1, 2, 3, 5):
        for h in (0, 7, 13, 23):
            for m in (0, 17, 42):
                v = float(d * 10000 + h * 100 + m)
                docs.append(
                    {
                        "time": f"2016-08-{d:02d}T{h:02d}:{m:02d}:30Z",
                        "index": "s1",
                        "value": {"x": v, **({"y": -v} if m != 17 else {})},
                    }
                )
                docs.append(
                    {"time": f"2016-08-{d:02d}T{h:02d}:{m:02d}:31Z", "index": "s2",
                     "value": {"x": v / 7.0}}
                )
    import random

    random.Random(42).shuffle(docs)
    tdb.put("r", docs)
    path = tdb.catalog._existing("r")
    RollupStore(spark, path).refresh()
    return tdb, path


ALL_REDUCERS = ["sum", "max", "min", "avg", "count", "first", "last"]


@pytest.mark.parametrize("group", ["hour", "day", "month"])
def test_rollup_equals_raw(db, spark, group):
    tdb, path = db
    spec = {
        "index": "s1",
        "from": "2016-08-01T00:00:00Z",
        "to": "2016-09-01T00:00:00Z",
        "group": group,
        "fields": {"x": ALL_REDUCERS, "y": ["sum", "first", "count"]},
        "exact": True,
    }
    raw = run_tick_query(tdb.ticks("r"), spec).collect()
    routed = route_tick_query(spark, path, spec).collect()
    assert len(raw) == len(routed) and len(raw) > 0
    for a, b in zip(raw, routed):
        assert a.asDict() == b.asDict(), (a, b)


def test_router_falls_back_on_unaligned(db, spark):
    tdb, path = db
    spec = {
        "index": "s1",
        "from": "2016-08-01T00:30:00Z",  # not hour-aligned
        "to": "2016-08-03T00:00:00Z",
        "group": "hour",
        "fields": {"x": "sum"},
        "exact": True,
    }
    raw = run_tick_query(tdb.ticks("r"), spec).collect()
    routed = route_tick_query(spark, path, spec).collect()
    assert [r.asDict() for r in raw] == [r.asDict() for r in routed]


def _reads_rollup(df, level: str) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return f"rollups/{level}" in plan or f"rollups\\{level}" in plan


@pytest.mark.parametrize(
    "group,level",
    [
        ("2hours", "hour"),  # width 2h: hour divides it, day doesn't
        ("5minutes", "minute"),  # the D4 flagship shape
        ("90minutes", "minute"),  # no coarser level divides 90 min
        ("week", "day"),  # calendar week = union of days
        ("2months", "month"),  # N-month buckets = unions of months
    ],
)
def test_router_nunit_routes_and_matches_raw(db, spark, group, level):
    """N-unit anchored buckets (D4) are unions of whole finer-level
    buckets when alignment allows — the router must answer them from the
    rollup (plan reads rollups/<level>) and match raw bit-for-bit."""
    tdb, path = db
    spec = {
        "index": "s1",
        "from": "2016-08-01T00:00:00Z",
        "to": "2016-09-01T00:00:00Z" if "month" in group or group == "week" else "2016-08-06T00:00:00Z",
        "group": group,
        "fields": {"x": ALL_REDUCERS, "y": ["sum", "count", "first"]},
        "exact": True,
    }
    routed_df = route_tick_query(spark, path, spec)
    assert _reads_rollup(routed_df, level), f"{group} did not route via {level}"
    raw = run_tick_query(tdb.ticks("r"), spec).collect()
    routed = routed_df.collect()
    assert len(raw) == len(routed) and len(raw) > 0
    for a, b in zip(raw, routed):
        assert a.asDict() == b.asDict(), (a, b)


def test_router_nunit_falls_back_unaligned(db, spark):
    """A 2-hour query with a half-hour anchor is NOT a union of hour
    buckets — must fall back to raw and still be correct."""
    tdb, path = db
    spec = {
        "index": "s2",
        "from": "2016-08-01T00:30:00Z",
        "to": "2016-08-05T00:30:00Z",
        "group": "2hours",
        "fields": {"x": "avg"},
        "exact": True,
    }
    routed_df = route_tick_query(spark, path, spec)
    assert not _reads_rollup(routed_df, "hour")
    raw = run_tick_query(tdb.ticks("r"), spec).collect()
    assert [r.asDict() for r in raw] == [r.asDict() for r in routed_df.collect()]


def test_router_multiseries_routes(db, spark):
    """Multi-series specs group per (series, bucket) through the rollup
    path too — one row per series per bucket, same as raw."""
    tdb, path = db
    spec = {
        "index": None,
        "from": "2016-08-01T00:00:00Z",
        "to": "2016-08-06T00:00:00Z",
        "group": "day",
        "fields": {"x": ["sum", "count"]},
        "exact": True,
    }
    routed_df = route_tick_query(spark, path, spec)
    assert _reads_rollup(routed_df, "day")
    raw = run_tick_query(tdb.ticks("r"), spec).collect()
    routed = routed_df.collect()
    assert len(raw) == len(routed) and len(raw) > 0
    for a, b in zip(raw, routed):
        assert a.asDict() == b.asDict(), (a, b)


def test_router_ma_window_falls_back(db, spark):
    """ma:<k> needs the post-aggregation window; the router must not
    answer it from rollup merge aggregates."""
    tdb, path = db
    spec = {
        "index": "s1",
        "from": "2016-08-01T00:00:00Z",
        "to": "2016-08-06T00:00:00Z",
        "group": "hour",
        "fields": {"x": "ma:3"},
        "exact": True,
    }
    routed_df = route_tick_query(spark, path, spec)
    assert not _reads_rollup(routed_df, "hour")
    raw = run_tick_query(tdb.ticks("r"), spec).collect()
    assert [r.asDict() for r in raw] == [r.asDict() for r in routed_df.collect()]


def test_rollup_scan_is_smaller(db, spark):
    _, path = db
    store = RollupStore(spark, path)
    day = store.read("day")
    minute = store.read("minute")
    assert day.count() < minute.count()
    assert set(store.available()) == {"minute", "hour", "day", "month", "year"}


def test_incremental_refresh_matches_full(tmp_path, spark):
    """Incremental refresh after new batches + a delete must produce the
    same rollup tables as a full rebuild."""
    from tickdb_spark.ingest import _read_meta

    tdb = TickDB(spark, str(tmp_path / "wh"))
    tdb.create_db("inc")
    path = tdb.catalog._existing("inc")
    batch1 = [
        {"time": f"2016-08-{d:02d}T{h:02d}:00:00Z", "index": s, "value": {"x": float(d * 100 + h)}}
        for d in (1, 2, 20) for h in (0, 6, 12) for s in ("a", "b")
    ]
    tdb.put("inc", batch1)
    store = RollupStore(spark, path)
    store.refresh(("minute", "hour", "day", "month"))
    assert _read_meta(path)["dirty"] == []

    # new batch: new dates AND an upsert of an existing (series, ts)
    batch2 = [
        {"time": "2016-08-02T06:00:00Z", "index": "a", "value": {"x": 9999.0}},  # upsert
        {"time": "2016-09-05T03:00:00Z", "index": "a", "value": {"x": 7.0}},  # new month
        {"time": "2016-08-21T12:00:00Z", "index": "b", "value": {"x": 8.0}},
    ]
    tdb.put("inc", batch2)
    # delete a slice of series b (dirties its partitions too)
    tdb.delete("inc", "b", "2016-08-20T00:00:00Z", "2016-08-21T00:00:00Z")
    assert _read_meta(path)["dirty"] != []

    store.refresh_incremental()
    assert _read_meta(path)["dirty"] == []
    incremental = {
        u: sorted(
            (r["series"], r["bucket"], r["field"], float(r["sum"]), r["count"],
             r["first"], r["last"], r["min"], r["max"])
            for r in store.read(u).collect()
        )
        for u in ("minute", "hour", "day", "month")
    }

    store.refresh(("minute", "hour", "day", "month"))
    full = {
        u: sorted(
            (r["series"], r["bucket"], r["field"], float(r["sum"]), r["count"],
             r["first"], r["last"], r["min"], r["max"])
            for r in store.read(u).collect()
        )
        for u in ("minute", "hour", "day", "month")
    }
    assert incremental == full


def test_refresh_salted_write_bounds_files_per_series(db, spark):
    """r17 (VERDICT r16 ask #2): the salted write shape must bound BOTH
    writers and files per series — at most SPLITS_PER_SERIES parquet
    files in any series dir at any level (the small-files guarantee the
    removed per-series exchange used to give, without its one-writer-
    per-series straggler)."""
    import os

    from tickdb_spark.rollup import SPLITS_PER_SERIES

    _tdb, path = db
    for unit in ("minute", "hour", "day"):
        lvl = os.path.join(path, "rollups", unit)
        assert os.path.isdir(lvl)
        per_series = {}
        for root, _dirs, files in os.walk(lvl):
            pq = [f for f in files if f.endswith(".parquet")]
            if pq and "series=" in root:
                key = [p for p in root.split(os.sep) if p.startswith("series=")][0]
                per_series[key] = per_series.get(key, 0) + len(pq)
        assert per_series, f"no series dirs under {lvl}"
        assert max(per_series.values()) <= SPLITS_PER_SERIES, (unit, per_series)
