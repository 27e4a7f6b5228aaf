"""Dedup-family scaling curve: wall time at 1x / 2x / 4x / 8x corpus size.

The 100-TB question for candidate-confined dedup is whether wall time
grows ~linearly with corpus size (candidate generation is equality-join
bounded) or quadratically (all-pairs). This script scales the sf0.1
documents table by UNION-ing suffix-perturbed copies (each copy keeps
high within-group similarity, so the pair workload grows too — the
adversarial direction) and measures the three main detectors warm.

    python scripts/bench_dedup_scale.py

Prints one JSON line per detector with [1x, 2x, 4x, 8x] seconds and the
log2 growth factors (1.0 = perfectly linear; 2.0 = quadratic).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tickdb_spark.operators import dedup as _dedup  # noqa: E402
from tickdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scaled_docs(spark, factor: int):
    """factor-times corpus with CONSTANT duplicate rate: every token gets
    the copy index appended, so copies share no n-grams with each other
    (cross-copy Jaccard 0) while each copy preserves the base corpus's
    internal near-dup structure. Measures corpus growth, not dup-rate
    growth — suffix-only perturbation would make every copy a near-dup
    group of size `factor` and the true pair OUTPUT itself quadratic."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    copies = spark.range(factor).select(F.col("id").alias("k"))
    tagged = F.concat_ws(
        " ",
        F.transform(
            F.split(F.trim("text"), r"\s+"),
            lambda t: F.concat(t, F.lit("_"), F.col("k").cast("string")),
        ),
    )
    return base.crossJoin(copies).select(
        (F.col("doc_id") * factor + F.col("k")).alias("doc_id"),
        tagged.alias("text"),
    )


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench_dedup_scale",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    detectors = {
        "exact": lambda d: _dedup.exact_dedup_groups(d, "text", "doc_id"),
        "ngram_prefix": lambda d: _dedup.ngram_jaccard_pairs(
            d, "text", "doc_id", threshold=0.7
        ),
        "minhash_lsh": lambda d: _dedup.minhash_lsh_pairs(
            d, "text", "doc_id", threshold=0.7
        ),
    }
    out = {}
    for name, make in detectors.items():
        times = []
        for factor in (1, 2, 4, 8):
            docs = scaled_docs(spark, factor).cache()
            docs.count()
            make(docs).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            make(docs).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            docs.unpersist()
        import math

        growth = [
            round(math.log2(times[i + 1] / times[i]), 2) for i in range(len(times) - 1)
        ]
        out[name] = {"sec_1x_2x_4x_8x": times, "log2_growth": growth}
        print(json.dumps({"detector": name, **out[name]}))


if __name__ == "__main__":
    main()
