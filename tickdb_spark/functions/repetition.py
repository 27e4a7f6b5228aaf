"""Intra-document repetition metrics — the Gopher/MassiveText-style
repetition filters (Rae et al. 2021, §A1.1): fraction of a document made
of duplicated words, the most frequent word n-gram, and duplicated
longer n-grams. Documents dominated by repeated boilerplate (nav bars,
keyword stuffing, templated spam) score high and get filtered before
training.

Spark shape: one whitespace tokenization per doc, n-gram arrays built
with codegen ``transform``/``slice`` (no Python), then ONE explode +
hash-aggregate keyed on ``(doc_id, n, gram)`` — the same
shuffle-volume class as the shingle-based dedup family
(``operators/dedup.py``): per-doc key cardinality is bounded by token
count, keys are never global, so the plan is a scan → explode →
two hash aggregates and survives 100 TB unchanged. No window, no
driver-side state.

Each metric is an exact integer ratio (BIGINT numerator / BIGINT
denominator) rounded at 1e-6 identically in the ``*_sql`` DuckDB twin,
so the operator is oracle-hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tickdb_spark.functions.text import TOKEN_SEP

#: n-gram sizes for the "top n-gram char fraction" metrics (Gopher uses
#: n = 2, 3, 4) and the "duplicated n-gram char fraction" ones (Gopher
#: n = 5..10; one representative n keeps the gate entry compact).
TOP_NS = (2, 3, 4)
DUP_N = 5


def _ngrams(toks, n: int):
    """array<string> of space-joined word n-grams (codegen; empty when
    the doc has fewer than n tokens)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_metrics(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition profile:

    - ``n_words``            total tokens
    - ``dup_word_frac``      1 - distinct_words / total_words
    - ``top{2,3,4}_char_frac`` chars covered by the most frequent word
      n-gram (count x gram length, single-space joined) / doc chars
    - ``dup5_char_frac``     chars covered by 5-grams occurring >= 2
      times (count x gram length) / doc chars

    Ties on "most frequent n-gram" cannot skew the result: the metric is
    max(count * length), a pure aggregate, not an argmax row.
    """
    toks = F.split(F.trim(F.col(text_col)), TOKEN_SEP)
    base = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.length(F.concat_ws(" ", toks)).cast("long").alias("total_chars"),
    )
    grams = base.select(
        id_col,
        "total_chars",
        F.size("_toks").cast("long").alias("n_words"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("n"), _ngrams(F.col("_toks"), n).alias("grams")
                    )
                    for n in (1, *TOP_NS, DUP_N)
                ]
            )
        ).alias("g"),
    ).select(
        id_col,
        "total_chars",
        "n_words",
        F.col("g.n").alias("n"),
        F.explode_outer("g.grams").alias("gram"),
    )
    counted = grams.groupBy(id_col, "total_chars", "n_words", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_n = counted.groupBy(id_col, "total_chars", "n_words").agg(
        *[
            F.max(
                F.when(
                    (F.col("n") == n) & F.col("gram").isNotNull(),
                    F.col("cnt") * F.length("gram"),
                )
            ).alias(f"_top{n}")
            for n in TOP_NS
        ],
        F.sum(
            F.when(
                (F.col("n") == DUP_N) & F.col("gram").isNotNull() & (F.col("cnt") >= 2),
                F.col("cnt") * F.length("gram"),
            )
        ).alias("_dup"),
        F.count(
            F.when((F.col("n") == 1) & F.col("gram").isNotNull(), F.lit(1))
        ).alias("_distinct_words"),
    )
    frac = lambda num: F.round(  # noqa: E731
        F.coalesce(num, F.lit(0)).cast("double")
        / F.greatest(F.col("total_chars"), F.lit(1)),
        6,
    )
    return per_n.select(
        id_col,
        "n_words",
        F.round(
            1.0 - F.col("_distinct_words").cast("double") / F.greatest("n_words", F.lit(1)),
            6,
        ).alias("dup_word_frac"),
        *[frac(F.col(f"_top{n}")).alias(f"top{n}_char_frac") for n in TOP_NS],
        frac(F.col("_dup")).alias("dup5_char_frac"),
    )


def repetition_metrics_sql(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin: identical tokenization, gram construction, and
    integer arithmetic (list slicing is 1-based inclusive on both
    engines' formulations here)."""
    gram_selects = []
    for n in (1, *TOP_NS, DUP_N):
        gram_selects.append(
            f"""
      SELECT {id_col}, total_chars, n_words, {n} AS n,
             unnest(CASE WHEN len(t) >= {n} THEN list_transform(
                      generate_series(1, len(t) - {n - 1}),
                      i -> array_to_string(t[i:i+{n - 1}], ' '))
                    ELSE [NULL] END) AS gram
      FROM toks"""
        )
    grams_sql = "\n      UNION ALL".join(gram_selects)
    top_cols = ",\n".join(
        f"""      max(CASE WHEN n = {n} AND gram IS NOT NULL
          THEN cnt * length(gram) END) AS _top{n}"""
        for n in TOP_NS
    )
    frac_cols = ",\n".join(
        f"""      round(COALESCE(_top{n}, 0)::DOUBLE
            / greatest(total_chars, 1), 6) AS top{n}_char_frac"""
        for n in TOP_NS
    )
    return f"""
    WITH toks AS (
      SELECT {id_col},
             string_split_regex(trim({text_col}), '\\s+') AS t,
             length(array_to_string(string_split_regex(trim({text_col}), '\\s+'), ' '))::BIGINT
               AS total_chars,
             len(string_split_regex(trim({text_col}), '\\s+'))::BIGINT AS n_words
      FROM {table}
    ),
    grams AS ({grams_sql}
    ),
    counted AS (
      SELECT {id_col}, total_chars, n_words, n, gram, count(*)::BIGINT AS cnt
      FROM grams GROUP BY ALL
    ),
    per_doc AS (
      SELECT {id_col}, total_chars, n_words,
{top_cols},
      sum(CASE WHEN n = {DUP_N} AND gram IS NOT NULL AND cnt >= 2
          THEN cnt * length(gram) END) AS _dup,
      count(CASE WHEN n = 1 AND gram IS NOT NULL THEN 1 END) AS _distinct_words
      FROM counted GROUP BY {id_col}, total_chars, n_words
    )
    SELECT {id_col}, n_words,
      round(1.0 - _distinct_words::DOUBLE / greatest(n_words, 1), 6) AS dup_word_frac,
{frac_cols},
      round(COALESCE(_dup, 0)::DOUBLE / greatest(total_chars, 1), 6) AS dup5_char_frac
    FROM per_doc
    """
