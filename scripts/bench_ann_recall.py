"""Sweep multi-table LSH (tables x planes) for recall@5 vs candidate
volume on the gate corpus — the map an operator of this engine needs to
pick a production setting (VERDICT r3 item #4). Results land in
BASELINE.md; the chosen setting pins test_multitable_lsh_recall_floor.

Candidate volume is the honest cost axis: scoring cost per query is
proportional to the distinct candidate count, and brute force is
|corpus| candidates per query (recall 1.0 by definition).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tickdb_spark import get_spark
from tickdb_spark.operators.similarity import (
    _hyperplanes,
    ann_topk_bruteforce,
    ann_topk_lsh_multitable,
    bucket_expr,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
K = 5
QIDS = list(range(0, 60, 2))


def main() -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    n_corpus = emb.count()
    gt = ann_topk_bruteforce(emb, QIDS, k=K).toPandas()
    gset = set(map(tuple, gt[["query_id", "neighbor_id"]].values))

    print(f"corpus={n_corpus}, queries={len(QIDS)}, k={K} (brute force: "
          f"{n_corpus - 1} candidates/query, recall 1.000)")
    print(f"{'tables':>6} {'planes':>6} {'recall@5':>9} {'cand/query':>11} "
          f"{'% corpus':>9}")
    for planes in (3, 4, 5, 6):
        for tables in (1, 4, 6, 8, 12, 16, 24, 32):
            tp = [_hyperplanes(n=planes, seed=7 + 13 * t) for t in range(tables)]
            got = ann_topk_lsh_multitable(
                emb, QIDS, k=K, table_planes=tp
            ).toPandas()
            dset = set(map(tuple, got[["query_id", "neighbor_id"]].values))
            recall = len(gset & dset) / len(gset)
            # distinct candidate pairs, computed with the operator's own
            # bucket expressions
            sigs = "array(" + ", ".join(bucket_expr("embedding", planes=p) for p in tp) + ")"
            b = emb.select(
                "vec_id", F.posexplode(F.expr(sigs)).alias("table_id", "bucket")
            )
            q = b.where(F.col("vec_id").isin(QIDS)).select(
                F.col("vec_id").alias("query_id"), "table_id", "bucket"
            )
            n_cand = (
                b.join(q, ["table_id", "bucket"])
                .where(F.col("query_id") != F.col("vec_id"))
                .select("query_id", "vec_id")
                .distinct()
                .count()
            )
            per_q = n_cand / len(QIDS)
            print(f"{tables:>6} {planes:>6} {recall:>9.3f} {per_q:>11.1f} "
                  f"{100.0 * per_q / (n_corpus - 1):>8.1f}%")


if __name__ == "__main__":
    main()
