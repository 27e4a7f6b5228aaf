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


def test_router_nunit_falls_back(db, spark):
    tdb, path = db
    spec = {
        "index": "s2",
        "from": "2016-08-01T00:00:00Z",
        "to": "2016-08-06T00:00:00Z",
        "group": "2hours",
        "fields": {"x": "avg"},
        "exact": True,
    }
    raw = run_tick_query(tdb.ticks("r"), spec).collect()
    routed = route_tick_query(spark, path, spec).collect()
    assert [r.asDict() for r in raw] == [r.asDict() for r in routed]


def test_rollup_scan_is_smaller(db, spark):
    _, path = db
    store = RollupStore(spark, path)
    day = store.read("day")
    minute = store.read("minute")
    assert day.count() < minute.count()
    assert set(store.available()) == {"minute", "hour", "day", "month", "year"}
