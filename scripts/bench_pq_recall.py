"""PQ / IVFADC recall measurement (cited in BASELINE.md's ANN frontier).

Recall@5 vs exact L2 top-5 on the gate corpus for the three PQ
operating points — pure ADC (compressed tier only), ADC shortlist +
exact rerank, and IVFADC (coarse probe → in-cell ADC → rerank) — plus
the candidate volume each one exactly re-scores:

    python scripts/bench_pq_recall.py            # sf0.01 corpus
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tickdb_spark.operators.kmeans import kmeans_fit  # noqa: E402
from tickdb_spark.operators.pq import (  # noqa: E402
    ivfadc_topk,
    pq_adc_rerank_topk,
    pq_adc_topk,
    pq_train,
)
from tickdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
QUERIES = [0, 101, 202, 303, 404]


def main() -> None:
    spark = get_spark(app_name="pq_recall", master="local[8]", shuffle_partitions=8)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    pdf = emb.toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.vstack(pdf["embedding"].to_numpy()).astype("float64")
    n = len(ids)

    def exact_top5(q: int) -> set:
        qi = int(np.where(ids == q)[0][0])
        d2 = ((mat - mat[qi]) ** 2).sum(1)
        d2[qi] = np.inf
        return set(ids[np.lexsort((ids, d2))[:5]])

    truth = {q: exact_top5(q) for q in QUERIES}
    books = pq_train(emb, dim=64, m_sub=8, k=16, iters=2, sample_fraction=0.5)
    coarse = kmeans_fit(emb, k=4, max_iter=3, tol=0.0, sample_fraction=0.5)

    def recall(df) -> float:
        got: dict[int, set] = {}
        for r in df.collect():
            got.setdefault(r.q_id, set()).add(r.vec_id)
        return sum(len(got.get(q, set()) & truth[q]) for q in QUERIES) / (
            5 * len(QUERIES)
        )

    rows = [
        ("pq_adc_only", recall(pq_adc_topk(emb, books, QUERIES, k_top=5)), 0),
        (
            "pq_adc50_exact_rerank",
            recall(pq_adc_rerank_topk(emb, books, QUERIES, shortlist=50, k_top=5)),
            50,
        ),
        (
            "ivfadc_probe2_short30",
            recall(
                ivfadc_topk(
                    emb, coarse, books, QUERIES, n_probe=2, shortlist=30, k_top=5
                )
            ),
            30,
        ),
    ]
    for name, rec, exact_vol in rows:
        print(
            json.dumps(
                {
                    "op": name,
                    "recall_at_5": round(rec, 3),
                    "exact_rescore_per_query": exact_vol,
                    "corpus": n,
                }
            )
        )


if __name__ == "__main__":
    main()
