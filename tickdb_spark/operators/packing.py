"""Sequence packing: assign documents to fixed-token-budget training
packs (greedy first-overflow-starts-a-new-pack, deterministic order) —
the batch-construction step between a filtered corpus and a trainer.
The reference has no analogue (its surface is tick queries,
``/root/reference/query.go:12-18``); every LLM data pipeline has one.

Semantics (bit-identical on both engines):

* Documents are sharded into ``n_buckets`` independent packing streams
  by ``id % n_buckets`` and ordered by id within the bucket — packing is
  inherently sequential, so the parallelism axis is the bucket, exactly
  like a production pipeline packs per output shard. Pack ids are local
  to the bucket.
* Within a bucket, the first document opens pack 0; each subsequent
  document joins the current pack unless that would push the pack's
  token sum over ``cap``, in which case it opens the next pack. A
  document larger than ``cap`` occupies a pack alone (it overflows the
  current pack and every successor immediately).

Scale design: one shuffle (hash repartition on bucket), then a
per-bucket ``applyInPandas`` running the O(rows) greedy scan with numpy
column access — no window over the global corpus, no driver collect.
Bucket count is the knob: at 100 TB you pack into ~#output-shard
buckets (tens of thousands), each bucket a bounded sequential scan.

The DuckDB twin replays the same greedy scan as a recursive CTE that
advances every bucket one document per recursion level — depth is
max-docs-per-bucket, not corpus size.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_greedy(
    df: DataFrame,
    id_col: str,
    token_col: str,
    cap: int,
    n_buckets: int = 32,
) -> DataFrame:
    """Per-bucket greedy sequence packing. Returns one row per input
    document: ``(id, bucket, pack_id, pack_pos)`` with ``pack_id``
    local to the bucket and ``pack_pos`` the document's 1-based position
    inside its pack."""
    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.coalesce(F.col(token_col).cast("long"), F.lit(0)).alias("tok"),
        (F.col(id_col).cast("long") % n_buckets).alias("bucket"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        toks = pdf["tok"].to_numpy()
        pack_ids = []
        pack_pos = []
        acc = 0
        pid = 0
        pos = 0
        for i, t in enumerate(toks):
            if i > 0 and acc + int(t) > cap:
                pid += 1
                acc = 0
                pos = 0
            acc += int(t)
            pos += 1
            pack_ids.append(pid)
            pack_pos.append(pos)
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "bucket": pdf["bucket"],
                "pack_id": pack_ids,
                "pack_pos": pack_pos,
            }
        )

    return (
        src.repartition(n_buckets, "bucket")
        .groupBy("bucket")
        .applyInPandas(_pack, "id long, bucket long, pack_id long, pack_pos long")
    )


def pack_greedy_sql(
    table_sql: str,
    id_col: str,
    token_col: str,
    cap: int,
    n_buckets: int = 32,
) -> str:
    """DuckDB twin of ``pack_greedy``: the greedy scan as a recursive
    CTE stepping all buckets one document per level (depth =
    max-docs-per-bucket). ``ordered`` is MATERIALIZED — it seeds AND
    joins the recursive term, and un-materialized CTEs re-evaluate per
    reference."""
    return f"""
    WITH RECURSIVE ordered AS MATERIALIZED (
      SELECT CAST({id_col} AS BIGINT) AS id,
             COALESCE(CAST({token_col} AS BIGINT), 0) AS tok,
             CAST({id_col} AS BIGINT) % {n_buckets} AS bucket,
             ROW_NUMBER() OVER (
               PARTITION BY CAST({id_col} AS BIGINT) % {n_buckets}
               ORDER BY CAST({id_col} AS BIGINT)
             ) AS rn
      FROM ({table_sql})
    ),
    walk(bucket, rn, id, pack_id, pack_pos, acc) AS (
      SELECT bucket, rn, id,
             CAST(0 AS BIGINT), CAST(1 AS BIGINT), tok
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.bucket, o.rn, o.id,
             CASE WHEN w.acc + o.tok > {cap} THEN w.pack_id + 1
                  ELSE w.pack_id END,
             CASE WHEN w.acc + o.tok > {cap} THEN CAST(1 AS BIGINT)
                  ELSE w.pack_pos + 1 END,
             CASE WHEN w.acc + o.tok > {cap} THEN o.tok
                  ELSE w.acc + o.tok END
      FROM walk w JOIN ordered o ON o.bucket = w.bucket AND o.rn = w.rn + 1
    )
    SELECT id, bucket, pack_id, pack_pos FROM walk
    """
