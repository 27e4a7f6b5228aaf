"""Join-shaped op scaling curves (VERDICT r6 ask #7): wall time at
1x / 2x / 4x / 8x input size for the r6-new candidate-generation joins
whose blowup would be invisible at sf0.1:

  - interval_overlap   — bucket-expansion interval x interval join
                         (rangejoin_interval_overlap's exact shape);
                         scaled by GROWING THE KEY SPACE (replicated
                         span tables with offset user_ids), constant
                         per-key overlap density — candidates are
                         equality-confined on (key, bucket), so wall
                         time should stay ~linear.
  - semantic_gemm_exact — the exact all-pairs GEMM detector feeding
                         sim_semantic_dedup. O(n^2 d) FLOPs BY DESIGN
                         (it is exact); recorded honestly so the curve
                         shows where the exact path stops being the
                         corpus-scale tool.
  - semantic_ivf       — cosine_neardup_pairs_ivf with cells scaled
                         with the corpus (k = 8*factor, bounded cell
                         occupancy): the SemDeDup production operating
                         point, expected ~linear.

Embedding corpus scaling uses per-copy RANDOM-SIGN modulation: vectors
in copy k are s_k ⊙ v with a deterministic ±1 vector s_k. Within a copy
all pairwise dots are EXACTLY preserved (s_i^2 = 1), so every copy
contributes the base corpus's true pair set; cross-copy dots are
sign-decorrelated (mean 0, std ~1/√d ≈ 0.125). NOTE (measured): at
τ=0.4 the decorrelated tail still crosses the threshold at ~4e-4 rate,
so the TRUE OUTPUT itself grows ~quadratically with the corpus
(out_rows in the result lines show it) — compare wall time against
out_rows, not against corpus size alone.

    python scripts/bench_join_scale.py

Prints one JSON line per op with [1x, 2x, 4x, 8x] seconds and log2
growth factors (1.0 = linear, 2.0 = quadratic).
"""

from __future__ import annotations

import json
import math
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tickdb_spark.operators import rangejoin as _rj  # noqa: E402
from tickdb_spark.operators import similarity as _sim  # noqa: E402
from tickdb_spark.operators import pq as _pq  # noqa: E402

#: lazily trained once on the base corpus (list for closure mutability)
_PQ_BOOKS: list = [None]
from tickdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DAY = 86_400_000_000_000


def _sign_vectors(factor: int, dim: int = 64) -> list[list[float]]:
    out = []
    for k in range(factor):
        rng = random.Random(1000 + k)
        # copy 0 keeps the base corpus bit-identical
        out.append([1.0] * dim if k == 0 else [float(rng.choice((-1, 1))) for _ in range(dim)])
    return out


def scaled_embeddings(spark, factor: int):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")
    parts = []
    for k, signs in enumerate(_sign_vectors(factor)):
        lit = "array(" + ", ".join(repr(s) for s in signs) + ")"
        parts.append(
            emb.select(
                (F.col("vec_id") * factor + k).alias("vec_id"),
                F.expr(
                    f"zip_with(embedding, {lit}, (x, s) -> CAST(x * s AS FLOAT))"
                ).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def scaled_spans(spark, factor: int):
    from tickdb_spark.querybank import _with_ts_ns

    base = _with_ts_ns(spark.read.parquet(f"{SF_DIR}/events.parquet")).select(
        "user_id", "event_type", "ts"
    )
    max_uid = base.agg(F.max("user_id")).first()[0] + 1

    def spans(etype, s, e):
        return (
            base.where(F.col("event_type") == etype)
            .groupBy("user_id", F.expr(f"ts div {DAY}").alias("_day"))
            .agg(F.min("ts").alias(s), (F.max("ts") + 1).alias(e))
            .drop("_day")
        )

    copies = spark.range(factor).select(F.col("id").alias("_k"))

    def rep(df):
        return df.crossJoin(copies).select(
            (F.col("user_id") + F.col("_k") * max_uid).alias("user_id"),
            *[c for c in df.columns if c != "user_id"],
        )

    return rep(spans("view", "v_start", "v_end")), rep(spans("click", "c_start", "c_end"))


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench_join_scale",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    def measure(make_inputs, op, factors=(1, 2, 4, 8)):
        times, rows = [], []
        for factor in factors:
            inputs = make_inputs(factor)
            cached = [d.cache() for d in inputs]
            for d in cached:
                d.count()
            out = op(factor, *cached)
            rows.append(out.count())  # warm + record output volume
            t0 = time.perf_counter()
            run(op(factor, *cached))
            times.append(round(time.perf_counter() - t0, 3))
            for d in cached:
                d.unpersist()
        growth = [
            round(math.log2(times[i + 1] / times[i]), 2)
            for i in range(len(times) - 1)
        ]
        return {"sec_1x_2x_4x_8x": times, "out_rows": rows, "log2_growth": growth}

    _PQ_BOOKS[0] = _pq.pq_train(
        scaled_embeddings(spark, 1),
        dim=64, m_sub=8, k=16, iters=2, sample_fraction=0.5,
    )

    results = {
        "interval_overlap": measure(
            lambda f: scaled_spans(spark, f),
            lambda f, v, c: _rj.interval_overlap_join(
                v, c, ["user_id"], "v_start", "v_end", "c_start", "c_end",
                bucket_ns=6 * 3600 * 10**9,
            ),
        ),
        "semantic_gemm_exact": measure(
            lambda f: (scaled_embeddings(spark, f),),
            lambda f, e: _sim.cosine_neardup_pairs(e, threshold=0.4),
        ),
        # IVF assignment (one corpus scan vs k ∝ n centroids) is an
        # INGEST-TIME precompute at 100 TB — stored as columns, like LSH
        # signatures. Measure it separately from the recurring MINING
        # phase, which runs over the cached assignment.
        "semantic_ivf_assign": measure(
            lambda f: (scaled_embeddings(spark, f),),
            lambda f, e: _sim.ivf_probe_assign(
                e, centroids=_sim._centroids(n=8 * f)
            ).select("id", "cell"),
        ),
        "semantic_ivf_mine": measure(
            lambda f: (
                _sim.ivf_probe_assign(
                    scaled_embeddings(spark, f),
                    centroids=_sim._centroids(n=8 * f),
                ),
            ),
            lambda f, a: _sim.cosine_neardup_pairs_ivf(
                None, threshold=0.4, assignment=a
            ),
        ),
        "pq_encode": measure(
            # the PQ STORAGE build: per-subspace nearest-code assignment
            # over the corpus (one Arrow GEMM per subspace batch) — the
            # ingest-time cost of the 32x-compressed tier; must be
            # ~linear in the corpus (codebooks fixed: train once on the
            # base corpus, encode every copy)
            lambda f: (scaled_embeddings(spark, f),),
            lambda f, e: _pq.pq_encode(e, _PQ_BOOKS[0]),
        ),
    }
    for name, r in results.items():
        print(json.dumps({"op": name, **r}))


if __name__ == "__main__":
    main()
