"""Shared fixtures: one SparkSession per test run, testdata dirs, and a
DuckDB-oracle compare helper replicating the driver's correctness gate."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from tickdb_spark.session import get_spark

    # Small local session for unit tests: fewer threads, fast startup.
    s = get_spark(app_name="tickdb_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for sf in (SF_SMOKE, SF_CORRECT):
        tag = os.path.basename(sf)
        for t in TABLES:
            path = f"{sf}/{t}.parquet"
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {t}_{tag.replace('.', '_')} AS SELECT * FROM '{path}'"
                )
    yield con
    con.close()


#: Oracles above this SQL size are the unrolled trainer replays
#: (k-means Lloyd, BPE) — run them in a fresh interpreter like the
#: driver's per-entry subprocess. In the long-lived suite process
#: (Spark JVM + hundreds of tests) DuckDB intermittently fails tiny
#: allocations on exactly these, while the same SQL runs in <2 GB in a
#: clean process.
_SUBPROCESS_SQL_BYTES = 20_000


def _oracle_subprocess(sql: str, sf_dir: str) -> pd.DataFrame:
    import subprocess
    import sys
    import tempfile

    with tempfile.TemporaryDirectory(prefix="oracle_sub_") as tmp:
        sql_path = os.path.join(tmp, "q.sql")
        out_path = os.path.join(tmp, "out.parquet")
        with open(sql_path, "w") as f:
            f.write(sql)
        views = [
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            for t in TABLES
            if os.path.exists(f"{sf_dir}/{t}.parquet")
        ]
        code = (
            "import duckdb, sys\n"
            "con = duckdb.connect()\n"
            "con.execute(\"SET temp_directory='/tmp/duck_spill'\")\n"
            f"[con.execute(v) for v in {views!r}]\n"
            f"df = con.execute(open({sql_path!r}).read()).df()\n"
            f"df.to_parquet({out_path!r})\n"
        )
        subprocess.run([sys.executable, "-c", code], check=True, timeout=600)
        return pd.read_parquet(out_path)


def oracle_frame(con: duckdb.DuckDBPyConnection, sql: str, sf_dir: str) -> pd.DataFrame:
    """Run oracle SQL with the driver's table views registered."""
    if len(sql) > _SUBPROCESS_SQL_BYTES:
        return _oracle_subprocess(sql, sf_dir)
    local = duckdb.connect()
    # In-memory DuckDB cannot offload without a temp dir: under the
    # suite's JVM memory pressure the heavy replay oracles would OOM
    # instead of spilling.
    local.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            local.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    try:
        return local.execute(sql).df()
    finally:
        local.close()


def assert_frames_match(spark_df, duck_df: pd.DataFrame, float_tol: float = 0.0):
    """Driver-style compare: row count, column-name set, and
    order-insensitive values with columns sorted by name."""
    sp = spark_df.toPandas()
    assert sorted(sp.columns) == sorted(duck_df.columns), (
        f"schema mismatch: spark={sorted(sp.columns)} oracle={sorted(duck_df.columns)}"
    )
    assert len(sp) == len(duck_df), f"row count: spark={len(sp)} oracle={len(duck_df)}"
    cols = sorted(sp.columns)
    a = sp[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = duck_df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    for c in cols:
        av, bv = a[c], b[c]
        # Driver-faithful dtype discipline: the driver hashes raw values, so
        # an integer column on one side vs float on the other (e.g. DuckDB
        # SUM(int) -> HUGEINT -> float64) is a hash mismatch even when the
        # values are numerically equal. Catch it here instead of coercing.
        ak, bk = av.dtype.kind, bv.dtype.kind
        int_vs_float = (ak in "iu" and bk == "f") or (ak == "f" and bk in "iu")
        assert not int_vs_float, (
            f"column {c} dtype-kind mismatch: spark={av.dtype} oracle={bv.dtype} "
            "(integer vs float — would fail the driver's hash; CAST the oracle "
            "aggregate to BIGINT or the Spark side to DOUBLE)"
        )
        if float_tol and av.dtype.kind == "f":
            both_nan = av.isna() & bv.isna()
            close = (av - bv).abs() <= float_tol
            assert (both_nan | close).all(), f"column {c} differs beyond tol"
        else:
            pd.testing.assert_series_equal(
                av, bv.astype(av.dtype), check_names=False, check_exact=(av.dtype.kind != "f")
            )
