"""DSIR-shaped data selection: importance-weighted domain matching over
hashed n-gram features (Xie et al., "Data Selection for Language Models
via Importance Resampling", NeurIPS 2023 — public method).

The 100-TB problem: given a huge raw pool and a small TARGET domain
sample (curated wiki, a benchmark's train split, an in-house corpus),
keep the pool documents whose token distribution looks most like the
target. DSIR's estimator: hash every unigram+bigram into B buckets,
model target and pool as bag-of-buckets multinomials, and score each
document by its per-feature likelihood ratio under target vs pool.

Determinism contract (what makes it gate-checkable — the same
discipline as kmeans/pq):

* features hash through the md5-prefix integer both engines compute
  identically (the dedup family's portable hash), then ``% B``;
* per-bucket evidence is the LAPLACE-SMOOTHED COUNT RATIO
  ``(ct_b + 1) / (cs_b + 1)`` — ONE double division of exactly
  representable integers (counts < 2^53), bit-identical cross-engine —
  quantized to BIGINT units via ``floor(x · 1e10 + 0.5)``;
* a document's score is the exact, order-independent BIGINT SUM of its
  features' quantized ratios. (The paper aggregates per-feature
  evidence as a log-product; a float log-sum is not bit-replayable
  across engines — glibc vs JVM ``log`` differ in the last ulp — so
  this implementation sums quantized ratios instead: same per-feature
  evidence, monotone in each feature's target-likeness, exactly
  replayable.)
* selection is deterministic top-k on (score DESC, id ASC) — the
  greedy variant of the paper's Gumbel-top-k resampling (sampling
  noise is the one part that cannot be an oracle-checked value).

Scale shape: the feature stream is (id, bucket int) — tokens×2 rows of
8 bytes of key; bucket histograms are B-row map-side-combinable
aggregates; the weight table (B rows) broadcasts; the doc score is one
hash aggregate on id; top-k is TakeOrdered, never a global sort. No raw
text crosses the wire after tokenization.

The reference engine has no text surface at all
(``/root/reference/query.go:12-18``); this extends the curation family
(quality gates / dedup / decontamination / sampling) with
distribution-matching selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: feature-hash buckets (the paper uses 10k; B trades collision bias
#: against weight-table size — at gate corpus sizes 256 keeps every
#: bucket populated enough for the smoothed ratio to be meaningful)
DSIR_BUCKETS = 256

#: ratio quantum: floor(ratio * 1e10 + 0.5) — pure IEEE double ops on
#: exactly-representable integer counts, identical on any engine
QUANTUM = 1e10


def _feature_stream(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    carry: list[str] | None = None,
) -> DataFrame:
    """(id, bucket): one row per unigram AND bigram occurrence
    (duplicates kept — DSIR counts occurrences, not types). ``carry``
    names extra per-doc columns to ride along unchanged."""
    extra = list(carry or [])
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    bigrams = F.when(
        F.size(toks) > 1,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.concat(toks, bigrams)).alias("feat"),
        *[F.col(c) for c in extra],
    ).select(
        "id",
        (
            F.conv(F.substring(F.md5("feat"), 1, 8), 16, 10).cast("long")
            % F.lit(n_buckets)
        ).alias("bucket"),
        *[F.col(c) for c in extra],
    )


def _feature_stream_sql(table_sql: str, text_col: str, id_col: str, n_buckets: int) -> str:
    toks = f"string_split_regex(trim({text_col}), '\\s+')"
    return f"""
      SELECT {id_col} AS id,
             CAST(('0x' || substr(md5(feat), 1, 8)) AS BIGINT) % {n_buckets} AS bucket
      FROM (
        SELECT {id_col}, unnest(
                 list_concat(
                   {toks},
                   CASE WHEN len({toks}) > 1
                        THEN list_transform(range(1, len({toks})),
                                            i -> array_to_string(list_slice({toks}, i, i + 1), ' '))
                        ELSE [] END
                 )
               ) AS feat
        FROM ({table_sql})
      )
    """


def _bucket_weights(src_feats: DataFrame, tgt_feats: DataFrame, n_buckets: int) -> DataFrame:
    """(bucket, w): quantized smoothed target/pool count ratio per
    bucket. Dense over [0, B) so absent buckets weigh (1/ (cs+1))."""
    spark = src_feats.sparkSession
    ct = tgt_feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    cs = src_feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("cs"))
    grid = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    ratio = (
        (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("cs"), F.lit(0)) + 1).cast("double")
    )
    return (
        grid.join(ct, "bucket", "left")
        .join(cs, "bucket", "left")
        .select(
            "bucket",
            F.floor(ratio * F.lit(QUANTUM) + F.lit(0.5)).cast("long").alias("w"),
        )
    )


def dsir_select(
    pool: DataFrame,
    target: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
    k: int = 100,
    target_pred=None,
) -> DataFrame:
    """Top-k pool documents by DSIR importance score against ``target``.
    Returns ``(id_col, dsir_score)`` — score is the exact BIGINT sum of
    the document's per-feature quantized target/pool ratios.

    ``target_pred`` (r16 opt): when the target is a SUBSET of the pool,
    pass the boolean Column over ``pool``'s columns that selects it
    (and ``target=None``). The flag rides the feature stream, so BOTH
    bucket histograms come from ONE tokenize pass (was two: pool
    histogram + a separate target-stream explode). Counts are identical
    — the flagged rows ARE the filtered-subset stream's rows (the
    per-row derivation commutes with the filter)."""
    # r17 (ADVICE fix): exactly one of target / target_pred must be given —
    # a non-None target alongside target_pred was silently ignored, and
    # neither crashed deep inside _feature_stream with an opaque error.
    if (target is None) == (target_pred is None):
        raise ValueError(
            "dsir_select: pass exactly one of `target` (a DataFrame) or "
            "`target_pred` (a boolean Column over the pool)"
        )
    if target_pred is not None:
        flagged = _feature_stream(
            pool.withColumn("_dsir_tgt", target_pred),
            text_col,
            id_col,
            n_buckets,
            carry=["_dsir_tgt"],
        )
        spark = pool.sparkSession
        hist = flagged.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("cs"),
            F.count(F.when(F.col("_dsir_tgt"), 1)).alias("ct"),
        )
        grid = spark.range(n_buckets).select(F.col("id").alias("bucket"))
        ratio = (
            (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
            / (F.coalesce(F.col("cs"), F.lit(0)) + 1).cast("double")
        )
        w = grid.join(hist, "bucket", "left").select(
            "bucket",
            F.floor(ratio * F.lit(QUANTUM) + F.lit(0.5)).cast("long").alias("w"),
        )
        feats = _feature_stream(pool, text_col, id_col, n_buckets)
    else:
        feats = _feature_stream(pool, text_col, id_col, n_buckets)
        tgt = _feature_stream(target, text_col, id_col, n_buckets)
        w = _bucket_weights(feats, tgt, n_buckets)
    scored = (
        feats.join(F.broadcast(w), "bucket")
        .groupBy("id")
        .agg(F.sum("w").alias("dsir_score"))
    )
    return (
        scored.orderBy(F.desc("dsir_score"), "id")
        .limit(k)
        .select(F.col("id").alias(id_col), "dsir_score")
    )


def dsir_select_sql(
    pool_sql: str,
    target_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
    k: int = 100,
) -> str:
    """DuckDB twin: identical hash, identical one-division ratio,
    identical quantization and BIGINT sum."""
    feats = _feature_stream_sql(pool_sql, text_col, id_col, n_buckets)
    tgt = _feature_stream_sql(target_sql, text_col, id_col, n_buckets)
    return f"""
    WITH feats AS MATERIALIZED ({feats}),
    tgt AS ({tgt}),
    ct AS (SELECT bucket, count(*) AS ct FROM tgt GROUP BY bucket),
    cs AS (SELECT bucket, count(*) AS cs FROM feats GROUP BY bucket),
    w AS (
      SELECT g.bucket,
             CAST(floor(
               (CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE)
                / CAST(COALESCE(cs.cs, 0) + 1 AS DOUBLE)) * {QUANTUM!r} + 0.5
             ) AS BIGINT) AS w
      FROM (SELECT range AS bucket FROM range({n_buckets})) g
      LEFT JOIN ct ON ct.bucket = g.bucket
      LEFT JOIN cs ON cs.bucket = g.bucket
    )
    SELECT id AS {id_col}, dsir_score FROM (
      SELECT f.id, CAST(SUM(w.w) AS BIGINT) AS dsir_score
      FROM feats f JOIN w ON w.bucket = f.bucket
      GROUP BY f.id
    )
    ORDER BY dsir_score DESC, id
    LIMIT {k}
    """
