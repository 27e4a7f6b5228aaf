"""Z-order data-skipping measurement (round 13): how many parquet files
(= row-group proxies; maxRecordsPerFile=5000 makes each file one row
group) a min/max-stats pruner must read for range predicates, under
three layouts of the SAME events table — time-sorted (the ingest
default), 1-D sorted by user_id, and Z-ordered on (user_id, value).

Skippability is computed from the files' own parquet footer statistics
(pyarrow), i.e. exactly the information a Parquet reader's row-group
skip uses — engine-independent and deterministic, no metric plumbing.
Query results are row-identical across layouts by construction (the
output-identity contract, asserted here).

    python scripts/bench_zorder_pruning.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tickdb_spark.operators.zorder import zorder_write  # noqa: E402
from tickdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def file_stats(path: str, cols: list[str]):
    """Per row group: {col: (min, max)} over every file in the dir."""
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            st = {}
            for c in cols:
                s = g.column(idx[c]).statistics
                st[c] = (s.min, s.max)
            st["_rows"] = g.num_rows
            out.append(st)
    return out


def must_read(stats, pred):
    """(row groups read, rows read) for a stats pruner: a group is read
    unless its [min, max] envelope PROVABLY misses the predicate."""
    groups = [s for s in stats if pred(s)]
    return len(groups), sum(s["_rows"] for s in groups)


def main() -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts", "user_id", "value"
    )
    total = ev.count()
    uid_hi = int(ev.agg(F.max("user_id")).first()[0])
    work = tempfile.mkdtemp(prefix="zorder_")
    layouts = {}

    p = os.path.join(work, "ts_sorted")
    (ev.repartitionByRange(16, "ts").sortWithinPartitions("ts")
       .write.mode("overwrite").option("maxRecordsPerFile", 5000).parquet(p))
    layouts["ts_sorted"] = p
    p = os.path.join(work, "user_sorted")
    (ev.repartitionByRange(16, "user_id").sortWithinPartitions("user_id")
       .write.mode("overwrite").option("maxRecordsPerFile", 5000).parquet(p))
    layouts["user_sorted"] = p
    p = os.path.join(work, "zorder")
    zorder_write(
        ev, p,
        [("user_id", 0, uid_hi), ("CAST(floor(value) AS BIGINT)", 0, 600)],
        bits=16, n_files=16, max_records_per_file=5000,
    )
    layouts["zorder_user_value"] = p

    u_lo, u_hi = uid_hi // 4, uid_hi // 4 + uid_hi // 20
    v_lo, v_hi = 100.0, 160.0
    preds = {
        "2-D box": lambda s: not (s["user_id"][1] < u_lo or s["user_id"][0] > u_hi
                                  or s["value"][1] < v_lo or s["value"][0] > v_hi),
        "user only": lambda s: not (s["user_id"][1] < u_lo or s["user_id"][0] > u_hi),
        "value only": lambda s: not (s["value"][1] < v_lo or s["value"][0] > v_hi),
    }
    # output-identity check across layouts
    box = (F.col("user_id").between(u_lo, u_hi)
           & F.col("value").between(v_lo, v_hi))
    results = {
        name: sorted(r["event_id"] for r in
                     spark.read.parquet(path).where(box).collect())
        for name, path in layouts.items()
    }
    assert len({tuple(v) for v in results.values()}) == 1, "layouts diverge!"
    print(f"table rows: {total}; box result rows: {len(results['zorder_user_value'])}")
    print("| layout | groups | predicate | groups read | rows read | read % |")
    print("|---|---|---|---|---|---|")
    for name, path in layouts.items():
        stats = file_stats(path, ["user_id", "value"])
        for pname, pred in preds.items():
            g, r = must_read(stats, pred)
            print(f"| {name} | {len(stats)} | {pname} | {g} | {r} | {r * 100 // total}% |")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
