"""Z-order data-skipping measurement (r13, extended r14): how many
parquet files (= row-group proxies; maxRecordsPerFile sizes each file to
one row group) a min/max-stats pruner must read for range predicates,
under four layouts of the SAME events table — time-sorted (the ingest
default), 1-D sorted by user_id, Z-ordered on (user_id, value), and
Z-ordered on (ts, user_id, value) — at THREE row-group counts (32 /
128 / 512). r13 measured only ~32 groups, which blunts the effect (a
32-way split exercises only ~5 effective z-bits per dim); the VERDICT
r13 ask #5 is the scaling view: fractions should sharpen toward the
per-dim selectivity product as groups grow.

Skippability is computed from the files' own parquet footer statistics
(pyarrow), i.e. exactly the information a Parquet reader's row-group
skip uses — engine-independent and deterministic, no metric plumbing.
Query results are row-identical across layouts by construction (the
output-identity contract, asserted here).

    python scripts/bench_zorder_pruning.py
"""

from __future__ import annotations

import datetime as dt
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
GROUP_TARGETS = (32, 128, 512)


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
    # events ts is TIMESTAMP_NTZ; cast to TIMESTAMP under the UTC session
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    r = ev.agg(F.min(us).alias("lo"), F.max(us).alias("hi")).first()
    ts_lo_us, ts_hi_us = int(r["lo"]), int(r["hi"])

    # predicates: ~10% time window x ~5% of users x a value band
    u_lo, u_hi = uid_hi // 4, uid_hi // 4 + uid_hi // 20
    v_lo, v_hi = 100.0, 160.0
    t_lo = dt.datetime(2024, 1, 10)
    t_hi = dt.datetime(2024, 1, 13)

    def _miss(lohi, lo, hi):
        return lohi[1] < lo or lohi[0] > hi

    preds = {
        "3-D box": lambda s: not (
            _miss(s["ts"], t_lo, t_hi)
            or _miss(s["user_id"], u_lo, u_hi)
            or _miss(s["value"], v_lo, v_hi)
        ),
        "2-D (user,value)": lambda s: not (
            _miss(s["user_id"], u_lo, u_hi) or _miss(s["value"], v_lo, v_hi)
        ),
        "ts only": lambda s: not _miss(s["ts"], t_lo, t_hi),
        "user only": lambda s: not _miss(s["user_id"], u_lo, u_hi),
        "value only": lambda s: not _miss(s["value"], v_lo, v_hi),
    }

    box = (
        F.col("ts").between(t_lo, t_hi)
        & F.col("user_id").between(u_lo, u_hi)
        & F.col("value").between(v_lo, v_hi)
    )

    print(f"table rows: {total}")
    print("| groups target | layout | groups | predicate | groups read |"
          " rows read | read % |")
    print("|---|---|---|---|---|---|---|")
    for n_groups in GROUP_TARGETS:
        rpf = max(total // n_groups, 1)
        work = tempfile.mkdtemp(prefix=f"zorder_{n_groups}_")
        layouts = {}

        p = os.path.join(work, "ts_sorted")
        (ev.repartitionByRange(n_groups, "ts").sortWithinPartitions("ts")
           .write.mode("overwrite").option("maxRecordsPerFile", rpf).parquet(p))
        layouts["ts_sorted"] = p
        p = os.path.join(work, "user_sorted")
        (ev.repartitionByRange(n_groups, "user_id")
           .sortWithinPartitions("user_id")
           .write.mode("overwrite").option("maxRecordsPerFile", rpf).parquet(p))
        layouts["user_sorted"] = p
        p = os.path.join(work, "z2_user_value")
        zorder_write(
            ev, p,
            [("user_id", 0, uid_hi), ("CAST(floor(value) AS BIGINT)", 0, 600)],
            bits=16, n_files=n_groups, max_records_per_file=rpf,
        )
        layouts["z2_user_value"] = p
        p = os.path.join(work, "z3_ts_user_value")
        zorder_write(
            ev, p,
            [("unix_micros(CAST(ts AS TIMESTAMP))", ts_lo_us, ts_hi_us),
             ("user_id", 0, uid_hi),
             ("CAST(floor(value) AS BIGINT)", 0, 600)],
            bits=20, n_files=n_groups, max_records_per_file=rpf,
        )
        layouts["z3_ts_user_value"] = p

        # output-identity across layouts (the gate contract, re-asserted
        # at every group count)
        results = {
            name: sorted(r["event_id"] for r in
                         spark.read.parquet(path).where(box).collect())
            for name, path in layouts.items()
        }
        assert len({tuple(v) for v in results.values()}) == 1, "layouts diverge!"

        for name, path in layouts.items():
            stats = file_stats(path, ["ts", "user_id", "value"])
            for pname, pred in preds.items():
                g, rr = must_read(stats, pred)
                print(f"| {n_groups} | {name} | {len(stats)} | {pname} |"
                      f" {g} | {rr} | {rr * 100 // total}% |")
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
