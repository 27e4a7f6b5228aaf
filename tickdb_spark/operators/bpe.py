"""BPE (byte-pair-encoding) tokenizer training — the iterative
vocabulary-learning primitive every LLM data pipeline runs before
tokenizing a corpus.

Spark-first shape (same discipline as ``operators/kmeans.py``):

* **vocabulary pass**: one corpus scan — whitespace words aggregated to a
  (word, freq) table. Zipf bounds the vocabulary far below the corpus, so
  every later step touches the aggregate, never the corpus (standard BPE
  practice — Sennrich et al. 2016 train on word frequencies).
* **merge loop**: per step, adjacent-pair counts are one explode + one
  hash aggregate keyed on (left, right) — O(vocab · word-length) rows,
  map-side combined; only the winning pair (one row) reaches the driver,
  exactly like k-means' k-row centroid collect.
* **merge application**: symbol sequences are sentinel-delimited strings
  (``<a><b><c>``), and a merge is a literal ``replace`` of ``<l><r>``
  with ``<lr>`` — left-to-right non-overlapping in both Spark and DuckDB,
  which IS greedy BPE merge order. Whole-stage codegen, no UDF.
* **determinism**: pair counts are exact integer sums; ties break by
  (count desc, left, right) — ASCII compare, identical cross-engine. The
  whole trainer replays as an unrolled SQL CTE chain, so the merge table
  is oracle-checkable like any batch query.

Encoding with a trained merge list is a pure projection: the N learned
replaces chained over each word — scan-speed over any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Symbol-boundary sentinels. Words must not contain them — nor single
#: quotes / backslashes, which would break the literal-replace SQL the
#: learned merges are interpolated into; the word filter drops all four
#: on BOTH engines (corpus text, not markup/quoted prose, is the target).
L, R = "<", ">"


def _word_freq(docs: DataFrame, text_col: str) -> DataFrame:
    words = docs.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
    ).where((F.col("word") != "") & ~F.col("word").rlike("[<>'\\\\]"))
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _seq_expr(word_col: str) -> F.Column:
    """word -> '<c1><c2>...<ck>' sentinel-delimited character sequence."""
    return F.concat(
        F.lit(L), F.array_join(F.split(F.col(word_col), ""), R + L), F.lit(R)
    )


def _pair_counts(w: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts weighted by word frequency."""
    arr = F.split(F.expr("substring(seq, 2, length(seq) - 2)"), R + L)
    pairs = F.expr(
        "CASE WHEN size(_syms) < 2 THEN array() "
        "ELSE transform(sequence(1, size(_syms) - 1), "
        "     i -> struct(element_at(_syms, i) AS l, element_at(_syms, i + 1) AS r)) END"
    )
    return (
        w.withColumn("_syms", arr)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(
    docs: DataFrame, text_col: str = "text", n_merges: int = 8
) -> tuple[DataFrame, list[tuple[str, str, int]]]:
    """Learn ``n_merges`` BPE merges from a corpus.

    Returns ``(merges_df, merges_list)``: the DataFrame has one row per
    merge ``(step, merge_left, merge_right, pair_count)`` in learning
    order; the list is the same data driver-side for :func:`bpe_encode`.
    """
    spark = docs.sparkSession
    w = _word_freq(docs, text_col).select("freq", _seq_expr("word").alias("seq"))
    w = w.cache()
    merges: list[tuple[str, str, int]] = []
    for _step in range(n_merges):
        best = (
            _pair_counts(w)
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((l, r, cnt))
        prev = w
        w = w.select(
            "freq",
            F.expr(
                f"replace(seq, '{L}{l}{R}{L}{r}{R}', '{L}{l}{r}{R}')"
            ).alias("seq"),
        ).cache()
        prev.unpersist()
    w.unpersist()
    rows = [
        (i + 1, l, r, cnt) for i, (l, r, cnt) in enumerate(merges)
    ]
    out = spark.createDataFrame(
        rows, "step int, merge_left string, merge_right string, pair_count long"
    )
    return out.orderBy("step"), merges


def bpe_encode_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE token count under a trained merge list — a pure
    projection (the learned replaces chained as literals; no shuffle, no
    UDF): ``(id_col, n_words, n_bpe_tokens)``."""
    seq = f"concat('{L}', array_join(split(word, ''), '{R}{L}'), '{R}')"
    for l, r, _ in merges:
        seq = f"replace({seq}, '{L}{l}{R}{L}{r}{R}', '{L}{l}{r}{R}')"
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word"),
    ).where((F.col("word") != "") & ~F.col("word").rlike("[<>'\\\\]"))
    per_word = words.select(
        id_col, F.size(F.split(F.expr(f"substring({seq}, 2, length({seq}) - 2)"), R + L)).alias("n_sym")
    )
    return (
        per_word.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("n_bpe_tokens"),
        )
        .orderBy(id_col)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle replay (unrolled, MATERIALIZED — same pattern as
# kmeans_replay_ctes: bounded iterations, each step a small table).
# ---------------------------------------------------------------------------


def _sql_words(table: str, text_col: str) -> str:
    return f"""bpe_words AS MATERIALIZED (
      SELECT word, COUNT(*) AS freq FROM (
        SELECT unnest(string_split_regex(trim({text_col}), '\\s+')) AS word
        FROM {table}
      ) WHERE word <> '' AND NOT regexp_matches(word, '[<>''\\\\]')
      GROUP BY word
    )"""


def _sql_pairs(src: str, name: str) -> str:
    return f"""{name} AS MATERIALIZED (
      SELECT s[i] AS l, s[i + 1] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT string_split(substr(seq, 2, length(seq) - 2), '{R}{L}') AS s,
                   freq FROM {src}),
           UNNEST(range(1, len(s))) AS t(i)
      GROUP BY l, r
    )"""


def bpe_train_ctes(table: str, text_col: str, n_merges: int) -> str:
    """CTE chain (no WITH) replaying ``bpe_train``; merge t lands in
    ``bpe_b{t}(l, r, cnt)``."""
    ctes = [
        _sql_words(table, text_col),
        f"""bpe_w0 AS MATERIALIZED (
      SELECT freq,
             '{L}' || array_to_string(string_split(word, ''), '{R}{L}') || '{R}' AS seq
      FROM bpe_words
    )""",
    ]
    for t in range(1, n_merges + 1):
        ctes.append(_sql_pairs(f"bpe_w{t - 1}", f"bpe_p{t}"))
        ctes.append(
            f"""bpe_b{t} AS MATERIALIZED (
      SELECT l, r, cnt FROM bpe_p{t} ORDER BY cnt DESC, l, r LIMIT 1
    )"""
        )
        ctes.append(
            f"""bpe_w{t} AS MATERIALIZED (
      SELECT freq,
             replace(seq, '{L}' || b.l || '{R}{L}' || b.r || '{R}',
                          '{L}' || b.l || b.r || '{R}') AS seq
      FROM bpe_w{t - 1}, bpe_b{t} b
    )"""
        )
    return ",\n    ".join(ctes)


def bpe_train_sql(table: str, text_col: str, n_merges: int) -> str:
    """Full oracle for the merge table."""
    ctes = bpe_train_ctes(table, text_col, n_merges)
    unions = "\n      UNION ALL ".join(
        f"SELECT {t} AS step, l AS merge_left, r AS merge_right, cnt AS pair_count FROM bpe_b{t}"
        for t in range(1, n_merges + 1)
    )
    return f"""
    WITH {ctes}
    SELECT step, merge_left, merge_right, pair_count FROM (
      {unions}
    ) ORDER BY step
    """


def bpe_encode_sql(
    table: str, text_col: str, id_col: str, n_merges: int
) -> str:
    """Oracle for :func:`bpe_encode_token_counts`: replays the trainer,
    then applies the learned merges as scalar-subquery replaces."""
    ctes = bpe_train_ctes(table, text_col, n_merges)
    seq = f"'{L}' || array_to_string(string_split(word, ''), '{R}{L}') || '{R}'"
    for t in range(1, n_merges + 1):
        seq = (
            f"replace({seq}, '{L}' || (SELECT l FROM bpe_b{t}) || '{R}{L}' || "
            f"(SELECT r FROM bpe_b{t}) || '{R}', "
            f"'{L}' || (SELECT l FROM bpe_b{t}) || (SELECT r FROM bpe_b{t}) || '{R}')"
        )
    return f"""
    WITH {ctes},
    bpe_doc_words AS MATERIALIZED (
      SELECT {id_col}, unnest(string_split_regex(trim({text_col}), '\\s+')) AS word
      FROM {table}
    )
    SELECT {id_col}, COUNT(*) AS n_words,
           CAST(SUM(len(string_split(substr(s, 2, length(s) - 2), '{R}{L}'))) AS BIGINT)
             AS n_bpe_tokens
    FROM (SELECT {id_col}, {seq} AS s FROM bpe_doc_words
          WHERE word <> '' AND NOT regexp_matches(word, '[<>''\\\\]'))
    GROUP BY {id_col} ORDER BY {id_col}
    """
