"""Domain mixture reweighting (DoReMi-shaped; Xie et al. 2023) — learn
per-domain sampling weights for a training mixture by upweighting the
domains a proxy model finds hardest, via multiplicative-weights updates
over a sequence of observation steps.

Exact-arithmetic adaptation (every departure documented):

* **proxy loss** — DoReMi trains a small LM in the loop; in-engine the
  proxy is the corpus bigram model (``operators/lm.py``), and a domain's
  loss in a step is its OOV RATE against that model, quantized to an
  exact integer ``L = (Σ n_oov · 1000) div max(Σ n_bigrams, 1)`` ∈
  [0, 1000] (integer division — identical on both engines). OOV rate is
  the familiarity module's natural "excess loss": high for domains the
  reference model covers poorly, which is exactly what DoReMi upweights.
* **steps** — DoReMi's steps come from the proxy model evolving during
  training; in-engine the steps are ``n_shards`` deterministic md5
  hash-slices of the corpus (the same portable split primitive as
  ``operators/sampling.hash_sample``): each shard yields an independent
  per-domain loss observation.
* **update** — the textbook update ``w ← w·exp(η·L)`` is replaced by the
  linearized multiplicative weight ``w ← w·(1000 + L)`` (exp is a
  libm call whose last-ulp behavior differs across engines; a linear-MW
  factor preserves the update's monotonicity and keeps the whole state
  an exact BIGINT: factors ≤ 2000, so Π over ≤ 17 shards stays under
  2^63 — the default 3 stays under 2^33). Normalized weights are ONE
  IEEE division each over exactly-representable integers.

Scale shape: one bigram-model aggregate + one familiarity join over the
corpus (both proven shapes, ``lm.py``), then a (shards × domains) tiny
aggregate and a per-domain fold — no windows over data, no driver state,
no Python. The learned row per domain is
``(domain, n_docs, w_raw, weight)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tickdb_spark.operators.lm import bigram_familiarity, bigram_familiarity_sql

LOSS_SCALE = 1000  # L in [0, 1000]; MW factor = LOSS_SCALE + L in [1000, 2000]


def _shard_expr(id_col: str):
    """Deterministic md5 shard key — the portable split primitive."""
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")


def doremi_domain_weights(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 3,
) -> DataFrame:
    """Learn the domain mixture: ``(domain, n_docs, w_raw, weight)`` with
    ``w_raw = Π_shards (1000 + L_shard)`` (exact BIGINT) and
    ``weight = w_raw / Σ w_raw`` (one IEEE division of exact ints)."""
    # MW factors are in [LOSS_SCALE, 2*LOSS_SCALE] = [1000, 2000], so the
    # per-domain product w_raw is bounded by 2000^n_shards. Both engines
    # must stay EXACT: Spark's BIGINT product wraps silently (ANSI off)
    # past 2^63 and DuckDB's product() is a double, inexact past 2^53 —
    # 2000^5 = 3.2e16 > 2^53 already diverges, 2000^4 = 1.6e13 is safe
    # on both. (ADVICE r9: the old [1, 17] "int64 bound" ignored the
    # oracle's double product.)
    if not 1 <= n_shards <= 4:
        raise ValueError(
            "n_shards must be in [1, 4]: 2000^n_shards must stay under "
            "2^53 so the BIGINT product (Spark) and double product "
            "(DuckDB oracle) are both exact"
        )
    fam = bigram_familiarity(docs, text_col, id_col)
    tagged = docs.select(
        F.col(id_col),
        F.col(domain_col).alias("domain"),
        (_shard_expr(id_col) % n_shards).alias("shard"),
    ).join(fam, id_col)
    step = tagged.groupBy("domain", "shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr(
            f"(CAST(sum(n_oov) AS BIGINT) * {LOSS_SCALE}) div "
            f"greatest(CAST(sum(n_bigrams) AS BIGINT), 1)"
        ).alias("loss_q"),
    )
    # per_domain carries the whole familiarity computation and is
    # multiply referenced: the broadcast total, the final select, AND —
    # when a caller sorts the tiny result — the range exchange's
    # sampling pass each re-execute it without lineage truncation (the
    # r9/r12 trap). Checkpointing the domain-cardinality frame collapses
    # that to one execution: 2.05 s → 0.14–0.27 s in the bench sequence
    # at sf0.1 (solo-session warm ~1.6 s; sequence numbers reproduced
    # twice). The checkpoint itself is |domains| rows — free.
    per_domain = step.groupBy("domain").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.aggregate(
            F.collect_list(F.col("loss_q") + F.lit(LOSS_SCALE)),
            F.lit(1).cast("long"),
            lambda acc, x: acc * x,
        ).alias("w_raw"),
    ).localCheckpoint(eager=False)
    total = per_domain.agg(F.sum("w_raw").cast("long").alias("_tot"))
    return per_domain.crossJoin(F.broadcast(total)).select(
        "domain",
        "n_docs",
        "w_raw",
        (F.col("w_raw").cast("double") / F.col("_tot")).alias("weight"),
    )


def doremi_domain_weights_sql(
    table: str = "documents",
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 3,
) -> str:
    """DuckDB twin: identical familiarity CTE, shard hash, quantized
    loss, and product fold (``product()`` is a double but every value is
    an exact integer < 2^53 at the default shard count)."""
    fam = bigram_familiarity_sql(table, text_col, id_col)
    return f"""
    WITH fam AS MATERIALIZED ({fam}),
    tagged AS (
      SELECT d.{domain_col} AS domain,
             CAST(('0x' || substr(md5(CAST(d.{id_col} AS VARCHAR)), 1, 15))
                  AS BIGINT) % {n_shards} AS shard,
             f.n_oov, f.n_bigrams
      FROM {table} d JOIN fam f USING ({id_col})
    ),
    step AS (
      SELECT domain, shard, count(*)::BIGINT AS n_docs,
             (CAST(sum(n_oov) AS BIGINT) * {LOSS_SCALE})
               // greatest(CAST(sum(n_bigrams) AS BIGINT), 1) AS loss_q
      FROM tagged GROUP BY domain, shard
    ),
    per_domain AS (
      SELECT domain, CAST(sum(n_docs) AS BIGINT) AS n_docs,
             CAST(product(loss_q + {LOSS_SCALE}) AS BIGINT) AS w_raw
      FROM step GROUP BY domain
    )
    SELECT domain, n_docs, w_raw,
           CAST(w_raw AS DOUBLE) / (SELECT CAST(sum(w_raw) AS BIGINT)
                                    FROM per_domain) AS weight
    FROM per_domain
    """
