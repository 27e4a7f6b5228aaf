"""One-off: measure exact-8-gram vs LSH catch rates for every-7th-token
paraphrases at sf0.01, across band settings, to pin the re-planted
decontamination property test (VERDICT r3 item #1)."""

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tickdb_spark.operators.decontam import (
    contamination_report,
    neardup_contamination,
)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
eval_set = docs.where(F.col("doc_id") < 50).select("doc_id", "text").cache()
toks = F.split(F.trim(F.col("text")), r"\s+")

for drop in (7, 13):
    para = eval_set.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", F.filter(toks, lambda t, i: (i + 1) % drop != 0)).alias(
            "text"
        ),
    ).cache()
    exact = contamination_report(para, eval_set, "text", "doc_id", n=8)
    n_exact = exact.where("contaminated").count()
    print(f"drop=every-{drop}th  exact-8gram catches: {n_exact}/50")
    for bands in (4, 6, 12):
        near = neardup_contamination(para, eval_set, "text", "doc_id", 0.4, bands=bands)
        # one row per (train_id, eval_id) candidate PAIR — count distinct
        # caught docs, or a paraphrase matching several eval items
        # double-counts; true positives additionally match their source
        n_docs = (
            near.where(F.col("train_id") >= 1_000_000)
            .select("train_id").distinct().count()
        )
        n_tp = near.where(F.col("eval_id") == F.col("train_id") - 1_000_000).count()
        n_pairs = near.count()
        print(
            f"  bands={bands}: LSH catches {n_docs}/50 distinct docs "
            f"({n_tp} true-positive pairs, {n_pairs} total pairs)"
        )
    para.unpersist()
