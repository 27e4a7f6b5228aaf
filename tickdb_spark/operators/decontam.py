"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set — the standard pretraining
hygiene pass (the GPT-3-style 13-gram overlap check; n is a parameter
because the right n depends on document length).

The reference engine has no analogue (its query surface is time-bucket
reducers only, ``/root/reference/query.go:20-59``); this belongs to the
LLM-pipeline extension set alongside dedup (``operators/dedup.py``).

Scale design: the eval set is tiny (thousands of docs) next to a 100-TB
corpus, so its distinct gram-hash set BROADCASTS; the corpus-side grams
stream through one scan and a broadcast semi-ish join — the corpus is
never shuffled. Grams are hashed to 60-bit md5-prefix ints (the same
scheme as ``dedup.py``): 8-byte join keys, identical in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tickdb_spark.operators.dedup import word_ngrams, word_ngrams_sql


def _gram_hashes(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    ).select(
        "id",
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("long").alias("gram"),
    )


def contamination_report(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
) -> DataFrame:
    """Per training doc: how many distinct n-grams it shares with the
    eval set and the keep/drop verdict. Returns
    ``(id, n_shared_grams, contaminated)`` for every train doc."""
    # Spread the doc rows first: the gram build + md5 is the expensive
    # part, and a single-split parquet source would otherwise run it in
    # one task (the CLAUDE.md single-split gotcha; shuffling raw docs is
    # cheap next to hashing every 8-gram).
    par = train.sparkSession.sparkContext.defaultParallelism
    tg = _gram_hashes(train.repartition(par), text_col, id_col, n)
    eg = (
        _gram_hashes(eval_set, text_col, id_col, n)
        .select("gram")
        .distinct()
    )
    # word_ngrams dedups per doc (array_distinct), so the joined rows are
    # already one per (doc, shared gram): a plain count replaces the
    # count-distinct and its dedup pass. The oracle counts identically.
    hits = (
        tg.join(F.broadcast(eg), "gram")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
    return (
        train.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
            (F.coalesce("n_shared_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def contamination_report_sql(
    train_sql: str, eval_sql: str, text_col: str, id_col: str, n: int = 8
) -> str:
    """DuckDB twin; ``train_sql``/``eval_sql`` are full SELECTs yielding
    (id_col, text_col)."""
    grams = word_ngrams_sql(text_col, n)

    def hashes(src: str) -> str:
        return (
            f"SELECT id, CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT)"
            f" AS gram FROM (SELECT {id_col} AS id, unnest({grams}) AS gram"
            f" FROM ({src}))"
        )

    return f"""
    WITH tg AS ({hashes(train_sql)}),
    eg AS (SELECT DISTINCT gram FROM ({hashes(eval_sql)})),
    hits AS (
      SELECT tg.id, count(*) AS n_shared_grams
      FROM tg JOIN eg USING (gram) GROUP BY tg.id
    )
    SELECT t.{id_col} AS id,
           COALESCE(h.n_shared_grams, 0) AS n_shared_grams,
           COALESCE(h.n_shared_grams, 0) > 0 AS contaminated
    FROM ({train_sql}) t LEFT JOIN hits h ON h.id = t.{id_col}
    """
