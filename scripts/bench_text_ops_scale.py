"""Scaling curves for the round-6 text-pipeline operators: wall time at
1x / 2x / 4x / 8x corpus size for repetition metrics, bigram-LM
familiarity scoring, and rolling z-score anomalies (events axis).

The 100-TB question per operator:
- repetition_metrics: explode + two hash aggregates keyed per-doc —
  shuffle volume is tokens x 5, so growth must be ~linear.
- bigram_familiarity: model aggregate + one equi-join — the model's key
  space is vocabulary-bounded (Zipf), so doubling docs grows the join
  probe side linearly while the build side saturates.
- rolling_zscore_anomalies: series-partitioned windows — linear in
  points per series; the multiplied-copies axis adds SERIES (the
  scale-out direction), so growth must stay ~linear.
- substring_dedup: stride-1 rolling windows, (hash, doc, pos) rank
  shuffle + doc-partitioned interval windows — tokens ∝ corpus, so
  growth must stay ~linear.
- pagerank: per-iteration shuffle is the edge list (disjoint graph
  copies, edges ∝ factor) — growth must stay ~linear.

    python scripts/bench_text_ops_scale.py

One JSON line per operator with [1x, 2x, 4x, 8x] seconds and log2
growth factors (1.0 = linear, 2.0 = quadratic).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tickdb_spark.functions.repetition import repetition_metrics  # noqa: E402
from tickdb_spark.operators.cluster import pagerank  # noqa: E402
from tickdb_spark.operators.dedup import substring_dedup  # noqa: E402
from tickdb_spark.operators.lm import bigram_familiarity  # noqa: E402
from tickdb_spark.operators.timeseries import rolling_zscore_anomalies  # noqa: E402
from tickdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = (1, 2, 4, 8)


def scaled_docs(spark, factor: int):
    """factor-times corpus; copy index appended per token so copies share
    no vocabulary (the adversarial direction for the bigram model: its
    key space grows with the corpus instead of saturating)."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    copies = spark.range(factor).select(F.col("id").alias("k"))
    tagged = F.concat_ws(
        " ",
        F.transform(
            F.split(F.trim("text"), r"\s+"),
            lambda t: F.concat(t, F.lit("_"), F.col("k").cast("string")),
        ),
    )
    return (
        base.crossJoin(copies)
        .select((F.col("doc_id") * factor + F.col("k")).alias("doc_id"), tagged.alias("text"))
        .repartition(32)
    )


def scaled_plain_docs(spark, factor: int):
    """factor-times corpus with a one-token copy marker PREFIXED to the
    text (not per-token tagging): fingerprints differ per copy, so exact
    dedup keeps ∝factor docs, while stopword/length distributions stay
    realistic — the honest direction for the curation pipeline and for
    packing (bin count grows with the corpus)."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    copies = spark.range(factor).select(F.col("id").alias("k"))
    return (
        base.crossJoin(copies)
        .select(
            (F.col("doc_id") * factor + F.col("k")).alias("doc_id"),
            F.concat(
                F.lit("copymark"), F.col("k").cast("string"), F.lit(" "), F.col("text")
            ).alias("text"),
        )
        .repartition(32)
    )


def curation_pipeline(docs):
    """pipeline_curation_end2end's exact dataflow over any (doc_id, text)
    frame: integer-exact quality gate -> fingerprint keep-first dedup ->
    greedy packing (every stage the library operator)."""
    from pyspark.sql import Window

    from tickdb_spark.functions.text import fingerprint, stopword_hits, token_count
    from tickdb_spark.operators.packing import pack_greedy

    ntok = token_count(F.col("text"))
    filtered = docs.where(
        (ntok >= 15) & (stopword_hits(F.col("text"), "en") * 100 >= ntok)
    )
    w = Window.partitionBy("_fp").orderBy("doc_id")
    curated = (
        filtered.withColumn("_fp", fingerprint(F.col("text")))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id", F.length("text").cast("long").alias("n_chars"))
    )
    return pack_greedy(curated, "doc_id", "n_chars", cap=4096)


def scaled_events(spark, factor: int):
    """factor-times events with copy-suffixed series names — adds series,
    the scale-out axis for partitioned windows."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts", "event_type", "value"
    )
    copies = spark.range(factor).select(F.col("id").alias("k"))
    return (
        ev.crossJoin(copies)
        .select(
            (F.col("event_id") * factor + F.col("k")).alias("event_id"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            F.concat("event_type", F.lit("_"), F.col("k").cast("string")).alias(
                "event_type"
            ),
            "value",
        )
        .repartition(32)
    )


def scaled_edges(spark, factor: int, n_nodes: int = 20_000, n_edges: int = 60_000):
    """factor-times pair graph: disjoint copies of one pseudo-random base
    graph with node ids offset per copy — edges grow ∝ factor while every
    component stays base-sized, the shape a sharded dedup graph has."""
    base = (
        spark.range(n_edges)
        .select(
            F.pmod(F.hash((F.col("id") * 2 + 1).cast("string")), F.lit(n_nodes)).alias("a"),
            F.pmod(F.hash((F.col("id") * 2 + 2).cast("string")), F.lit(n_nodes)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("id_a"), F.greatest("a", "b").alias("id_b")
        )
        .distinct()
    )
    copies = spark.range(factor).select((F.col("id") * n_nodes).alias("off"))
    return (
        base.crossJoin(copies)
        .select(
            (F.col("id_a") + F.col("off")).alias("id_a"),
            (F.col("id_b") + F.col("off")).alias("id_b"),
        )
        .repartition(32)
    )


def growth(times):
    return [
        round(math.log2(times[i + 1] / times[i]), 2) for i in range(len(times) - 1)
    ]


def main() -> None:
    spark = get_spark(app_name="text_ops_scale", master="local[32]", shuffle_partitions=32)

    def run(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # warm up input caches once
    scaled_docs(spark, 1).count()
    scaled_events(spark, 1).count()

    from tickdb_spark.operators.heavyhitters import heavy_hitters_exact

    def hh(f):
        # vocabulary grows ∝ corpus (copies share no tokens) — the
        # adversarial direction for heavy hitters: the naive aggregate's
        # shuffle grows with the vocab, the MG candidate set stays
        # ≤ partitions × capacity no matter how wide the tail gets
        tok = scaled_docs(spark, f).select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
        )
        # φ scales 1/f: disjoint-vocab copies dilute every token's global
        # share by f, so a fixed φ would empty the output instead of
        # holding the operating point (same per-copy threshold, output
        # and MG capacity grow linearly — the honest direction)
        return heavy_hitters_exact(tok, "token", phi=0.002 / f)

    out = {}
    for name, build in (
        ("repetition_metrics", lambda f: repetition_metrics(scaled_docs(spark, f))),
        (
            "bigram_familiarity",
            lambda f: bigram_familiarity(scaled_docs(spark, f), train_fraction=0.1),
        ),
        (
            "rolling_zscore_anomalies",
            lambda f: rolling_zscore_anomalies(
                scaled_events(spark, f), "event_type", "ts_us", "event_id", "value"
            ),
        ),
        ("heavy_hitters", hh),
        # stride-1 rolling windows: window stream = tokens x 1 rows, rank
        # shuffle carries (hash, doc, pos) — disjoint-vocab copies keep
        # dup volume ∝ corpus, so growth must stay ~linear
        (
            "substring_dedup",
            lambda f: substring_dedup(scaled_docs(spark, f), "text", "doc_id", window=8),
        ),
        # 5 iterations x (one equi-join + one partial-aggregable sum):
        # edges ∝ factor, components stay base-sized — per-iteration
        # shuffle is the edge list, so growth must stay ~linear
        (
            "pagerank",
            lambda f: pagerank(scaled_edges(spark, f)),
        ),
        # one hash shuffle on n_chars-bucketed keys + per-bucket greedy
        # fold: rows ∝ corpus, bins ∝ corpus — growth must stay ~linear
        (
            "pack_sequences",
            lambda f: __import__(
                "tickdb_spark.operators.packing", fromlist=["pack_greedy"]
            ).pack_greedy(
                scaled_plain_docs(spark, f).select(
                    "doc_id", F.length("text").cast("long").alias("n_chars")
                ),
                "doc_id",
                "n_chars",
                cap=4096,
            ),
        ),
        # the full composed pipeline (filter -> fp dedup -> pack): every
        # stage keyed/hash-shuffled, no stage all-pairs — growth must
        # stay ~linear with survivors ∝ corpus (copy-marker scaling)
        (
            "curation_end2end",
            lambda f: curation_pipeline(scaled_plain_docs(spark, f)),
        ),
    ):
        times = [run(build(f)) for f in FACTORS]
        out[name] = {"sec": times, "log2_growth": growth(times)}
        print(json.dumps({"op": name, **out[name]}))


if __name__ == "__main__":
    main()
