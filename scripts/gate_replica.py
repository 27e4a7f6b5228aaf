"""Local replica of the driver's CORRECTNESS gate.

Runs registry entries against the DuckDB oracle at sf0.01, mirroring the
driver's compare (row count + column-name set + column-sorted values +
dtype-kind). Usage:

    python scripts/gate_replica.py            # head-50 (what the driver samples)
    python scripts/gate_replica.py all        # every registry entry
    python scripts/gate_replica.py name1 name2 ...   # specific entries
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as E
from tickdb_spark import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(master="local[8]", shuffle_partitions=8)

    def oracle(sql: str):
        # fresh connection per oracle, like the driver's per-entry
        # subprocess: a long-lived connection accumulates buffer state
        # across 50 heavy replays and eventually fails tiny allocations
        con = duckdb.connect()
        try:
            con.execute("SET TimeZone='UTC'")
            # spill instead of OOM on the heavy replay oracles (in-memory
            # DuckDB cannot offload without a temp dir)
            con.execute("SET temp_directory='/tmp/duck_spill'")
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
                )
            return con.execute(sql).df()
        finally:
            con.close()

    qs, osql = E.queries(), E.oracle_sql()
    args = sys.argv[1:]
    if not args:
        names = list(qs)[:50]
    elif args == ["all"]:
        names = list(qs)
    else:
        names = args
    n_red = 0
    for n in names:
        t0 = time.time()
        try:
            sdf = qs[n](spark, sf).toPandas()
            if n not in osql:
                # replay the driver's rows-only canonicalization too: it
                # sorts the pandas frame over all columns, which dies on
                # unhashable cells (array/map columns) — the exact class
                # of red that hit agg_approx_sketches three times
                cols = sorted(sdf.columns)
                sdf[cols].sort_values(cols).reset_index(drop=True)
                print(f"{n:42s} rows-only {len(sdf):6d}  {time.time()-t0:5.1f}s")
                continue
            odf = oracle(osql[n])
            cols = sorted(sdf.columns)
            s = sdf[cols].sort_values(cols).reset_index(drop=True)
            o = odf[cols].sort_values(cols).reset_index(drop=True)
            pd.testing.assert_frame_equal(s, o, check_dtype=False)
            assert all(s[c].dtype.kind == o[c].dtype.kind for c in cols), (
                f"dtype-kind mismatch: "
                f"{[(c, s[c].dtype, o[c].dtype) for c in cols]}"
            )
            print(f"{n:42s} GREEN     {len(sdf):6d}  {time.time()-t0:5.1f}s")
        except Exception as e:  # noqa: BLE001 — report-and-continue harness
            n_red += 1
            msg = str(e).split("\n")[0][:160]
            print(f"{n:42s} RED  {type(e).__name__}: {msg}")
    print(f"\n{len(names)} entries, {n_red} red")
    return 1 if n_red else 0


if __name__ == "__main__":
    sys.exit(main())
