"""Phase profile of decontaminate_bloom_prefilter (r17 target: 0.94 s in
r15 -> 5.1 s r16 -> 15.5/17.6 s in both r17 baseline bench runs).

Times each phase of contamination_report_bloom in isolation with the noop
sink (guide 1.4), fresh process, sf0.1 by default.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tickdb_spark.operators import decontam as D  # noqa: E402
from tickdb_spark.querybank import REGISTRY, _read  # noqa: E402
from tickdb_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(
    app_name="bloom_profile", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
)


def t(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    sec = time.perf_counter() - t0
    print(f"{label:46s} {sec:7.2f}s", flush=True)
    return sec


docs = _read(spark, sf_dir, "documents")
train = docs.where(F.col("doc_id") % 25 != 0)
eval_set = docs.where(F.col("doc_id") % 25 == 0)
par = spark.sparkContext.defaultParallelism

# phase 1: train gram explode
tg = D._gram_hashes(train.repartition(par), "text", "doc_id", 8)
t("train gram explode (tg)", tg)

# phase 2: eval gram distinct
eg = D._gram_hashes(eval_set, "text", "doc_id", 8).select("gram").distinct()
t("eval grams distinct (eg)", eg)

# phase 3: full entry, twice (warm repeat separates codegen/first-run cost)
fn = REGISTRY["decontaminate_bloom_prefilter"].fn
for i in (1, 2):
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"full entry run {i}: {time.perf_counter()-t0:7.2f}s", flush=True)
