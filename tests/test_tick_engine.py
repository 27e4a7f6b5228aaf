"""End-to-end tick engine tests on tiny synthetic batches (fixtures modeled
on FIXTURES.md F2/F3/F4: sparse fields, LWW upsert, bucket edges)."""

from __future__ import annotations

import pytest

from tickdb_spark.api import TickDB
from tickdb_spark.schema import parse_time_ns
from tickdb_spark.tickquery import parse_group

NS = 1_000_000_000


def _mk(tmp_path, spark, name="db1"):
    tdb = TickDB(spark, str(tmp_path / "warehouse"))
    tdb.create_db(name)
    return tdb


def test_parse_group():
    assert parse_group("minute") == (1, "minute")
    assert parse_group("5minutes") == (5, "minute")
    assert parse_group("2hour") == (2, "hour")
    assert parse_group("second") == (1, "second")  # B5 fixed
    with pytest.raises(ValueError):
        parse_group("fortnight")


def test_parse_time_ns():
    assert parse_time_ns("1970-01-01T00:00:01Z") == NS
    assert parse_time_ns("2016-08-01T00:00:00Z") == 1470009600 * NS
    assert parse_time_ns(123) == 123
    assert parse_time_ns("2016-08-01T00:00:00.000123Z") == 1470009600 * NS + 123_000


def test_catalog_roundtrip(tmp_path, spark):
    tdb = _mk(tmp_path, spark)
    assert tdb.list_dbs() == ["db1"]
    assert tdb.db_info("db1")["indexes"] == []
    tdb.create_db("db2")
    tdb.drop_db("db2")
    assert tdb.list_dbs() == ["db1"]
    assert "version" in tdb.server_info()


def test_put_get_query_lww(tmp_path, spark):
    tdb = _mk(tmp_path, spark)
    t0 = "2016-08-01T00:00:00Z"
    tdb.put(
        "db1",
        [
            {"time": t0, "index": "idx", "value": {"open": 10.0, "close": 11.0}},
            {"time": "2016-08-01T00:00:30Z", "index": "idx", "value": {"open": 12.0}},
            {"time": "2016-08-01T00:01:10Z", "index": "idx", "value": {"open": 20.0, "close": 21.0}},
        ],
    )
    # exact GET (Q1)
    assert tdb.get("db1", "idx", t0) == {"open": 10.0, "close": 11.0}
    assert tdb.get("db1", "idx", "2016-08-01T09:00:00Z") is None

    # LWW upsert: second batch replaces the whole value map (D6)
    tdb.put("db1", [{"time": t0, "index": "idx", "value": {"open": 99.0}}])
    assert tdb.get("db1", "idx", t0) == {"open": 99.0}

    # minute-bucket aggregate (D3): bucket 0 has open 99,12; bucket 1 has 20
    out = tdb.query(
        "db1",
        {
            "index": "idx",
            "from": t0,
            "to": "2016-08-01T01:00:00Z",
            "group": "minute",
            "fields": {"open": {"reducer": "avg"}, "close": "last"},
        },
    ).collect()
    assert len(out) == 2
    b0, b1 = out
    assert b0["open_avg"] == pytest.approx(55.5)
    # close missing at LWW winner for t0 and at 00:00:30 → bucket-0 last close is NULL
    assert b0["close_last"] is None
    assert b1["open_avg"] == 20.0 and b1["close_last"] == 21.0
    assert b0["bucket"] == parse_time_ns(t0)
    assert b1["bucket"] == parse_time_ns(t0) + 60 * NS

    # after compact, same answers without the dedup aggregate
    tdb.compact("db1")
    assert tdb.get("db1", "idx", t0) == {"open": 99.0}
    assert tdb.db_info("db1")["indexes"] == ["idx"]


def test_nunit_buckets_and_range(tmp_path, spark):
    tdb = _mk(tmp_path, spark)
    docs = [
        {"time": f"2016-08-01T00:{m:02d}:00Z", "index": "g", "value": {"v": float(m)}}
        for m in range(10)
    ]
    tdb.put("db1", docs)
    # 2-minute from-anchored buckets over [00:01, 00:09) → anchor 00:01 (D4)
    out = tdb.query(
        "db1",
        {
            "index": "g",
            "from": "2016-08-01T00:01:00Z",
            "to": "2016-08-01T00:09:00Z",
            "group": "2minutes",
            "fields": {"v": "sum"},
        },
    ).collect()
    anchor = parse_time_ns("2016-08-01T00:01:00Z")
    assert [(r["bucket"] - anchor) // (60 * NS) for r in out] == [0, 2, 4, 6]
    assert [r["v_sum"] for r in out] == [1 + 2, 3 + 4, 5 + 6, 7 + 8]
    # to-bound enforced (B3 fixed): minute 9 excluded


def test_reducers_match_semantics(tmp_path, spark):
    tdb = _mk(tmp_path, spark)
    tdb.put(
        "db1",
        [
            {"time": "2016-08-01T00:00:01Z", "index": "r", "value": {"a": 5.0, "b": 1.0}},
            {"time": "2016-08-01T00:00:02Z", "index": "r", "value": {"a": 3.0}},
            {"time": "2016-08-01T00:00:03Z", "index": "r", "value": {"a": 4.0, "b": 2.0}},
        ],
    )
    out = tdb.query(
        "db1",
        {
            "index": "r",
            "from": "2016-08-01T00:00:00Z",
            "to": "2016-08-01T00:01:00Z",
            "group": "minute",
            "fields": {"a": "min", "b": "first"},
        },
    ).collect()[0]
    assert out["a_min"] == 3.0  # B6 fixed: true min
    assert out["b_first"] == 1.0  # earliest point where b present
    out2 = tdb.query(
        "db1",
        {
            "index": "r",
            "from": "2016-08-01T00:00:00Z",
            "to": "2016-08-01T00:01:00Z",
            "group": "minute",
            "fields": {"b": "count"},
        },
    ).collect()[0]
    assert out2["b_count"] == 2  # B4 fixed: true count of non-null b


def test_range_delete(tmp_path, spark):
    tdb = _mk(tmp_path, spark)
    docs = [
        {"time": f"2016-08-0{d}T12:00:00Z", "index": "del", "value": {"v": float(d)}}
        for d in range(1, 6)
    ]
    tdb.put("db1", docs)
    # interior delete [day2 , day4) → days 2,3 gone (half-open, D7)
    tdb.delete("db1", "del", "2016-08-02T00:00:00Z", "2016-08-04T00:00:00Z")
    left = sorted(r["v_sum"] for r in tdb.query(
        "db1",
        {
            "index": "del",
            "from": "2016-08-01T00:00:00Z",
            "to": "2016-09-01T00:00:00Z",
            "group": "day",
            "fields": {"v": "sum"},
        },
    ).collect())
    assert left == [1.0, 4.0, 5.0]
    # delete matching nothing is a no-op
    tdb.delete("db1", "del", "2017-01-01T00:00:00Z", "2017-02-01T00:00:00Z")
    assert tdb.get("db1", "del", "2016-08-01T12:00:00Z") == {"v": 1.0}


def test_drop_index(tmp_path, spark):
    tdb = _mk(tmp_path, spark)
    tdb.put("db1", [{"time": "2016-08-01T00:00:00Z", "index": "s1", "value": {"x": 1.0}},
                    {"time": "2016-08-01T00:00:00Z", "index": "s2", "value": {"x": 2.0}}])
    assert tdb.db_info("db1")["indexes"] == ["s1", "s2"]
    tdb.drop_index("db1", "s1")
    assert tdb.db_info("db1")["indexes"] == ["s2"]
    assert tdb.get("db1", "s2", "2016-08-01T00:00:00Z") == {"x": 2.0}


def test_sql_surface(tmp_path, spark):
    tdb = _mk(tmp_path, spark, "sq")
    tdb.put(
        "sq",
        [
            {"time": f"2016-08-01T00:0{m}:00Z", "index": "a", "value": {"v": float(m)}}
            for m in range(5)
        ],
    )
    out = tdb.sql(
        "sq",
        """
        SELECT series, count(*) AS n, sum(value['v']) AS total,
               max(ts) - min(ts) AS span_ns
        FROM ticks GROUP BY series
        """,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 5 and r["total"] == 10.0 and r["span_ns"] == 4 * 60 * 10**9


def test_wide_view(tmp_path, spark):
    from tickdb_spark.tickquery import wide_view

    tdb = _mk(tmp_path, spark, "wv")
    tdb.put(
        "wv",
        [
            {"time": "2016-08-01T00:00:00Z", "index": "x",
             "value": {"open": 1.0, "close": 2.0}},
            {"time": "2016-08-01T00:00:01Z", "index": "x", "value": {"open": 3.0}},
        ],
    )
    rows = wide_view(tdb.ticks("wv"), ["open", "close", "volume"]).orderBy("ts").collect()
    assert [r["open"] for r in rows] == [1.0, 3.0]
    assert [r["close"] for r in rows] == [2.0, None]
    assert all(r["volume"] is None for r in rows)


def test_bucket_edges_f4(tmp_path, spark):
    """FIXTURES.md F4: leap day, exact boundaries, 23:59:59.999999 vs
    next-midnight neighbors, mid-bucket from/to, from == to."""
    tdb = _mk(tmp_path, spark, "edge")
    docs = [
        {"time": "2016-01-01T00:00:00Z", "index": "e", "value": {"v": 1.0}},
        {"time": "2016-02-29T00:00:00Z", "index": "e", "value": {"v": 1.0}},  # leap day
        {"time": "2016-02-29T23:59:59.999999Z", "index": "e", "value": {"v": 1.0}},
        {"time": "2016-03-01T00:00:00Z", "index": "e", "value": {"v": 1.0}},
        {"time": "2016-03-13T07:30:00Z", "index": "e", "value": {"v": 1.0}},  # US DST moment
    ]
    tdb.put("edge", docs)

    days = tdb.query("edge", {
        "index": "e", "from": "2016-01-01T00:00:00Z", "to": "2017-01-01T00:00:00Z",
        "group": "day", "fields": {"v": "count"}}).collect()
    got = {r["bucket"]: r["v_count"] for r in days}
    assert got == {
        parse_time_ns("2016-01-01T00:00:00Z"): 1,
        parse_time_ns("2016-02-29T00:00:00Z"): 2,  # leap day holds both
        parse_time_ns("2016-03-01T00:00:00Z"): 1,
        parse_time_ns("2016-03-13T00:00:00Z"): 1,  # UTC day regardless of DST
    }

    # months: February bucket exists and ends before March
    months = tdb.query("edge", {
        "index": "e", "from": "2016-01-01T00:00:00Z", "to": "2017-01-01T00:00:00Z",
        "group": "month", "fields": {"v": "count"}}).collect()
    got_m = {r["bucket"]: r["v_count"] for r in months}
    assert got_m[parse_time_ns("2016-02-01T00:00:00Z")] == 2

    # mid-bucket from: point at 00:00:00 is excluded, partial day still buckets at midnight
    part = tdb.query("edge", {
        "index": "e", "from": "2016-02-29T12:00:00Z", "to": "2016-03-02T00:00:00Z",
        "group": "day", "fields": {"v": "count"}}).collect()
    assert {r["bucket"]: r["v_count"] for r in part} == {
        parse_time_ns("2016-02-29T00:00:00Z"): 1,
        parse_time_ns("2016-03-01T00:00:00Z"): 1,
    }

    # from == to → empty
    assert tdb.query("edge", {
        "index": "e", "from": "2016-02-29T00:00:00Z", "to": "2016-02-29T00:00:00Z",
        "group": "day", "fields": {"v": "count"}}).count() == 0


def test_compaction_collapses_files_and_preserves_results(tmp_path, spark):
    """compact() must (a) shrink the per-partition file spray from
    multi-batch appends back to one file per (series, dt), and (b) leave
    query results bit-identical while flipping reads to the clean
    (no-dedup-shuffle) path."""
    import glob
    import os

    from pyspark.sql import functions as F

    from tickdb_spark.ingest import append_batch, compact, read_ticks

    db = str(tmp_path / "db")
    os.makedirs(db)
    rows = [
        ("A", (1704067200 + i * 3600) * 10**9, None, {"v": float(i)})
        for i in range(48)
    ]
    ticks = spark.createDataFrame(
        rows, "series string, ts long, ts_utc timestamp, value map<string,double>"
    ).withColumn("ts_utc", F.timestamp_micros(F.expr("ts div 1000")))
    for k in range(4):  # interleaved appends -> 4 files per (series, dt)
        append_batch(db, ticks.where(F.expr("(ts div 3600000000000) % 4") == k))
    # one LWW overwrite batch
    append_batch(db, ticks.where(F.col("ts") == rows[0][1]).withColumn(
        "value", F.create_map(F.lit("v"), F.lit(99.0))))

    def files():
        return [p for p in glob.glob(f"{db}/ticks/series=*/dt=*/*") if p.endswith(".parquet")]

    def state():
        return sorted(
            (r["series"], r["ts"], dict(r["value"]))
            for r in read_ticks(spark, db).collect()
        )

    before_files, before_state = len(files()), state()
    compact(spark, db)
    after_files, after_state = len(files()), state()
    assert before_files > after_files, (before_files, after_files)
    assert after_files == 2  # 48 hourly points span 2 days -> 2 partitions
    assert after_state == before_state
    assert after_state[0][2] == {"v": 99.0}  # LWW overwrite materialized


def test_salted_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from tickdb_spark.operators.skew import salted_join

    big = spark.range(2000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("rid")
    )
    small = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    got = sorted(
        (r["k"], r["rid"], r["w"]) for r in salted_join(big, small, ["k"], salts=7).collect()
    )
    want = sorted((r["k"], r["rid"], r["w"]) for r in big.join(small, "k").collect())
    assert got == want
    # left join keeps unmatched big rows exactly once
    small2 = small.where(F.col("k") < 3)
    got_l = sorted(
        (r["k"], r["rid"], r["w"])
        for r in salted_join(big, small2, ["k"], salts=4, how="left").collect()
    )
    want_l = sorted(
        (r["k"], r["rid"], r["w"]) for r in big.join(small2, "k", "left").collect()
    )
    assert got_l == want_l
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(big, small, ["k"], how="full")


def test_gapfill_interp_fills_between_anchors_only(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from tickdb_spark.operators.timeseries import gapfill_interp

    bucketed = spark.createDataFrame(
        [(100, 10.0), (130, 40.0), (150, 20.0)], "bucket long, v double"
    )
    out = {
        r["bucket"]: (r["v"], r["n_obs"])
        for r in gapfill_interp(bucketed, 90, 170, 10, ["v"]).collect()
    }
    assert out[100] == (10.0, 1) and out[130] == (40.0, 1) and out[150] == (20.0, 1)
    assert out[110] == (20.0, 0) and out[120] == (30.0, 0)  # linear 10->40
    assert out[140] == (30.0, 0)  # linear 40->20
    assert out[90] == (None, 0) and out[160] == (None, 0)  # unanchored edges


def test_time_travel_snapshots_and_truncation(tmp_path, spark):
    import pytest as _pytest

    from tickdb_spark.api import TickDB
    from tickdb_spark.ingest import read_ticks

    tdb = TickDB(spark, str(tmp_path))
    tdb.create_db("tt")
    db_path = tdb.catalog._existing("tt")
    tdb.put("tt", [
        {"time": "2024-03-01T00:00:00Z", "index": "m", "value": {"p": 1.0}},
        {"time": "2024-03-01T01:00:00Z", "index": "m", "value": {"p": 2.0}},
    ])  # seq 0
    tdb.put("tt", [
        {"time": "2024-03-01T00:00:00Z", "index": "m", "value": {"p": 10.0}},  # upsert
        {"time": "2024-03-01T02:00:00Z", "index": "m", "value": {"p": 3.0}},   # new
    ])  # seq 1

    def vals(df):
        return {r["ts"]: r["value"]["p"] for r in df.collect()}

    # snapshot 0: pre-upsert state
    assert vals(read_ticks(spark, db_path, as_of_seq=0)) == {
        1709251200000000000: 1.0, 1709254800000000000: 2.0}
    # snapshot 1 == current
    assert vals(read_ticks(spark, db_path, as_of_seq=1)) == vals(tdb.ticks("tt"))
    assert vals(tdb.ticks("tt", as_of_seq=1))[1709251200000000000] == 10.0
    # query() accepts the snapshot too
    q = tdb.query("tt", {"index": "m", "from": "2024-03-01T00:00:00Z",
                         "to": "2024-03-02T00:00:00Z", "group": "day",
                         "fields": {"p": "sum"}}, as_of_seq=0).collect()
    assert q[0]["p_sum"] == 3.0
    # compaction truncates history: old snapshots refuse, latest still works
    tdb.compact("tt")
    with _pytest.raises(ValueError, match="truncated"):
        read_ticks(spark, db_path, as_of_seq=0)
    assert vals(read_ticks(spark, db_path, as_of_seq=1))[1709258400000000000] == 3.0


def test_gapfill_chunked_carry_exact_across_boundaries(spark, monkeypatch):
    """Shrink the chunk size so the fill crosses many chunk boundaries and
    whole chunks are empty; LOCF and interp must still equal the
    single-window semantics (two-phase carry is exact for any contiguous
    chunking)."""
    from tickdb_spark.operators import timeseries as ts

    monkeypatch.setattr(ts, "_CHUNK_BUCKETS", 4)
    # spine 0..40 step 10 => 24 buckets across 6 chunks; observations in
    # chunks 0 and 4 only (chunks 1-3 fully empty => carry must hop them).
    bucketed = spark.createDataFrame(
        [(10, 1.0), (180, 18.0), (230, 23.0)], "bucket long, v double"
    )
    locf = {
        r["bucket"]: (r["v"], r["n_obs"])
        for r in ts.gapfill_locf(bucketed, 0, 240, 10, ["v"]).collect()
    }
    assert locf[0] == (None, 0)
    assert locf[10] == (1.0, 1)
    for b in range(20, 180, 10):  # carried across empty chunks
        assert locf[b] == (1.0, 0), b
    assert locf[180] == (18.0, 1)
    assert locf[190] == (18.0, 0) and locf[230] == (23.0, 1)

    interp = {
        r["bucket"]: (r["v"], r["n_obs"])
        for r in ts.gapfill_interp(bucketed, 0, 240, 10, ["v"]).collect()
    }
    assert interp[0] == (None, 0)
    for b in range(20, 180, 10):  # linear 1.0@10 -> 18.0@180
        exp = 1.0 + (18.0 - 1.0) * (b - 10) / (180 - 10)
        assert abs(interp[b][0] - exp) < 1e-12 and interp[b][1] == 0, b
    assert interp[200] == (18.0 + (23.0 - 18.0) * 20 / 50, 0)


def test_snapshot_diff_classifies_all_three_changes(tmp_path, spark):
    """Plant one added, one removed (via a rewriting compact? no —
    removal here means 'present at seq_a, absent later', which only a
    rewrite produces; between two APPEND-only seqs 'removed' is
    impossible and the test proves exactly that), and one changed row,
    then diff seq 0 vs seq 1."""
    from pyspark.sql import functions as F

    from tickdb_spark.ingest import append_batch, snapshot_diff
    from tickdb_spark.schema import ns_to_ts

    db = str(tmp_path / "db")
    import os

    os.makedirs(db)

    def batch(rows):
        df = spark.createDataFrame(rows, "series string, ts long, value map<string,double>")
        return df.withColumn("ts_utc", ns_to_ts(F.col("ts")))

    t0 = 1_700_000_000_000_000_000
    append_batch(db, batch([("a", t0, {"v": 1.0}), ("a", t0 + 1, {"v": 2.0})]))
    append_batch(
        db,
        batch([("a", t0, {"v": 9.0}), ("a", t0 + 2, {"v": 3.0})]),  # upsert + new
    )
    d = {(r.ts, r.change) for r in snapshot_diff(spark, db, 0, 1).collect()}
    assert d == {(t0, "changed"), (t0 + 2, "added")}
    # unchanged row (t0+1) must NOT appear; append-only history can
    # never produce 'removed'
    vals = {
        r.ts: (r.value_a, r.value_b) for r in snapshot_diff(spark, db, 0, 1).collect()
    }
    assert vals[t0] == ({"v": 1.0}, {"v": 9.0})
    assert vals[t0 + 2] == (None, {"v": 3.0})
    # identical snapshots diff to empty
    assert snapshot_diff(spark, db, 1, 1).count() == 0


def _crash_after(monkeypatch_ctx, module_obj, attr, n, exc_msg):
    """Patch module_obj.attr so the (n+1)-th call raises — crash injection."""
    real = getattr(module_obj, attr)
    calls = {"k": 0}

    def wrapper(*a, **kw):
        if calls["k"] >= n:
            raise RuntimeError(exc_msg)
        calls["k"] += 1
        return real(*a, **kw)

    monkeypatch_ctx.setattr(module_obj, attr, wrapper)


def _mk_crash_db(tmp_path, spark):
    import os as _os

    from pyspark.sql import functions as F

    from tickdb_spark.ingest import append_batch

    db = str(tmp_path / "db")
    _os.makedirs(db)
    rows = [
        ("A", (1704067200 + i * 3600) * 10**9, None, {"v": float(i)})
        for i in range(72)  # 3 days of hourly points -> 3 dt partitions
    ]
    ticks = spark.createDataFrame(
        rows, "series string, ts long, ts_utc timestamp, value map<string,double>"
    ).withColumn("ts_utc", F.timestamp_micros(F.expr("ts div 1000")))
    append_batch(db, ticks)
    # one LWW overwrite so compact has real work to do
    append_batch(
        db,
        ticks.where(F.col("ts") == rows[0][1]).withColumn(
            "value", F.create_map(F.lit("v"), F.lit(99.0))
        ),
    )
    return db, rows


def _state(spark, db):
    from tickdb_spark.ingest import read_ticks

    return sorted(
        (r["series"], r["ts"], dict(r["value"]))
        for r in read_ticks(spark, db).collect()
    )


@pytest.mark.parametrize("renames_before_crash", [0, 1])
def test_compact_crash_midswap_recovers(tmp_path, spark, monkeypatch, renames_before_crash):
    """Kill compact between the staged-write and the directory swap (crash
    before the first rename, and between the two renames — the exact
    window VERDICT r12 flagged). The journal is the commit point: the next
    read rolls the swap forward and sees exactly the compacted table."""
    import os as _os

    import tickdb_spark.ingest as ing

    db, _rows = _mk_crash_db(tmp_path, spark)
    expected = _state(spark, db)

    with monkeypatch.context() as m:
        _crash_after(m, ing.os, "rename", renames_before_crash, "injected crash")
        with pytest.raises(RuntimeError, match="injected crash"):
            ing.compact(spark, db)
    # journal persisted before any destructive step -> recovery possible
    assert _os.path.exists(ing._journal_path(db))
    # plain read triggers recover(): old-or-new, never partial
    assert _state(spark, db) == expected
    assert not _os.path.exists(ing._journal_path(db))
    meta = ing._read_meta(db)
    assert meta["clean"] is True  # the journaled compact COMMITTED
    # table dir healthy, no leftover staging/old dirs
    leftovers = [n for n in _os.listdir(db) if n.startswith("ticks.")]
    assert leftovers == []
    # and the system keeps working after recovery
    ing.compact(spark, db)
    assert _state(spark, db) == expected


@pytest.mark.parametrize("renames_before_crash", [0, 1])
def test_delete_range_crash_midswap_recovers(
    tmp_path, spark, monkeypatch, renames_before_crash
):
    """Kill delete_range mid-partition-swap (after the pure-delete rmtree,
    before/between the replacement renames). Recovery must complete the
    delete — readers see the post-delete table, never a state where a kept
    row of an affected partition is missing."""
    import os as _os

    import tickdb_spark.ingest as ing

    db, rows = _mk_crash_db(tmp_path, spark)
    # range: last 12h of day 1 .. first 12h of day 3 -> day 2 is a PURE
    # delete (no survivors), days 1 and 3 get staged replacements
    frm = rows[12][1]
    to = rows[60][1]
    expected = [
        (s, ts, v if ts != rows[0][1] else {"v": 99.0})
        for (s, ts, _t, v) in rows
        if not (frm <= ts < to)
    ]
    expected = sorted(expected)

    with monkeypatch.context() as m:
        _crash_after(m, ing.os, "rename", renames_before_crash, "injected crash")
        with pytest.raises(RuntimeError, match="injected crash"):
            ing.delete_range(spark, db, "A", frm, to)
    assert _os.path.exists(ing._journal_path(db))
    assert _state(spark, db) == expected
    assert not _os.path.exists(ing._journal_path(db))
    # day-2 partition physically gone; days 1/3 swapped in
    sdir = _os.path.join(db, ing.TICKS_DIR, "series=A")
    assert sorted(_os.listdir(sdir)) == ["dt=2024-01-01", "dt=2024-01-03"]
    # no staging leftovers
    assert [n for n in _os.listdir(db) if n.startswith("_delete-")] == []
    # dirty partitions recorded through the journaled meta
    dirty = {tuple(t) for t in ing._read_meta(db).get("dirty", [])}
    assert ("A", "2024-01-02") in dirty


def test_crash_during_staging_leaves_table_untouched(tmp_path, spark, monkeypatch):
    """A crash BEFORE the journal write (e.g. during the staged Spark
    write) must leave the live table byte-identical: no journal, no
    recovery, reads serve the old state."""
    import os as _os

    import tickdb_spark.ingest as ing

    db, rows = _mk_crash_db(tmp_path, spark)
    before = _state(spark, db)

    with monkeypatch.context() as m:
        def boom(*a, **kw):
            raise RuntimeError("staging crash")

        m.setattr(ing, "_write_journal", boom)
        with pytest.raises(RuntimeError, match="staging crash"):
            ing.delete_range(spark, db, "A", rows[12][1], rows[60][1])
        with pytest.raises(RuntimeError, match="staging crash"):
            ing.compact(spark, db)
    assert not _os.path.exists(ing._journal_path(db))
    assert ing.recover(db) is False
    assert _state(spark, db) == before


def test_expire_before_downsampled_retention_and_crash(tmp_path, spark, monkeypatch):
    """Retention lifecycle: expire_before drops whole days physically
    (O(partitions), no rewrite), rollups built over them keep answering
    (downsampled retention — expiry must NOT dirty the rollup), raw
    reads see only the retained tail, and a kill mid-rmtree rolls
    forward via the journal."""
    import os as _os

    import tickdb_spark.ingest as ing
    from tickdb_spark.rollup import RollupStore, route_tick_query

    db, rows = _mk_crash_db(tmp_path, spark)  # 3 days of hourly points
    RollupStore(spark, db).refresh(("minute", "hour", "day"))
    day_q = {
        "index": "A",
        "from": "2024-01-01T00:00:00Z",
        "to": "2024-01-04T00:00:00Z",
        "group": "day",
        "fields": {"v": ["sum", "count"]},
        "exact": True,
    }
    before = {r["bucket"]: (r["v_sum"], r["v_count"])
              for r in route_tick_query(spark, db, day_q).collect()}
    assert len(before) == 3

    # crash mid-expiry (after the first rmtree) -> journal rolls forward
    with monkeypatch.context() as m:
        real = ing.shutil.rmtree
        calls = {"k": 0}

        def boom(*a, **kw):
            if calls["k"] >= 1:
                raise RuntimeError("injected crash")
            calls["k"] += 1
            return real(*a, **kw)

        m.setattr(ing.shutil, "rmtree", boom)
        with pytest.raises(RuntimeError, match="injected crash"):
            ing.expire_before(spark, db, "2024-01-03T00:00:00Z")
    assert _os.path.exists(ing._journal_path(db))
    # any read triggers recovery and sees the POST-expiry raw state
    raw_days = sorted(
        {r["ts"] // (86_400 * 10**9) for r in ing.read_ticks(spark, db).collect()}
    )
    assert raw_days == [19725]  # only 2024-01-03 remains raw
    assert not _os.path.exists(ing._journal_path(db))
    assert ing._read_meta(db)["expired_before_ns"] > 0

    # rollup-served day query still covers the FULL range, bit-identical
    after = {r["bucket"]: (r["v_sum"], r["v_count"])
             for r in route_tick_query(spark, db, day_q).collect()}
    assert after == before

    # idempotent re-run: nothing left to drop
    assert ing.expire_before(spark, db, "2024-01-03T00:00:00Z") == []
