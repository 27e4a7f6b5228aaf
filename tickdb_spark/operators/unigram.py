"""Unigram-LM tokenizer training (SentencePiece's unigram model, Kudo
2018) — the second tokenizer family next to BPE (``operators/bpe.py``):
instead of greedily growing a vocab by merges, it SEEDS a large candidate
vocabulary and iteratively prunes it, re-estimating piece scores from the
best segmentations (hard/Viterbi EM — the standard exact-arithmetic
simplification of the forward-backward E-step).

Spark-first shape (the kmeans/bpe/perceptron discipline):

* **vocabulary pass**: one corpus scan to the (word, freq) aggregate;
  Zipf bounds it far below the corpus, so EVERY later step — candidate
  substrings, segmentation, pruning — touches the aggregate only.
* **segmentation = enumeration, not sequential DP**: a word of length
  n ≤ 8 has ≤ 108 compositions into pieces of 1..4 chars (223 total
  across lengths — a fixed combinatorial literal table). Enumerating and
  arg-maxing them is one join + one window over (words × compositions),
  embarrassingly parallel and EXACTLY replayable in SQL, where a
  sequential Viterbi recurrence would be neither.
* **integer-exact scoring**: piece score s = usage·49 // total + 1 ∈
  [1, 50] (exact integer division both engines) stands for the
  probability s/50; a k-piece segmentation's LM probability Π s_i/50^k
  is compared at the common denominator 50^MAX_WORD_LEN, i.e.
  score = Π s_i · 50^(8−k) — every value ≤ 50^8 < 2^53, so Spark's
  BIGINT fold and DuckDB's double ``product()`` are both exact and
  identical. (The denominator padding is what makes FEWER pieces win
  like a real probability product — raw integer products > 1 would
  invert the preference.) Dropping the usual log-prob sum for a bounded
  integer comparison is the same monotone-transform move PMI made
  (CLAUDE.md: ln differs across engines in the last ulp; exact integer
  arithmetic does not).
* **determinism**: every argmax is tie-broken on
  (score DESC, n_pieces ASC, seg_string ASC); every prune on
  (usage DESC, piece ASC). The whole trainer replays as an unrolled SQL
  CTE chain (AS MATERIALIZED — multiply-referenced CTEs re-evaluate
  otherwise), so the learned vocabulary is oracle-checkable like any
  batch query.

Words longer than ``MAX_WORD_LEN`` fall back to single-character pieces
(SentencePiece similarly bounds trainable sentence pieces); the fallback
is explicit and deterministic on both engines.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_PIECE = 4
MAX_WORD_LEN = 8
SCORE_SCALE = 49  # s = usage*49 // total + 1  ∈ [1, 50]
SCORE_BASE = SCORE_SCALE + 1  # s/SCORE_BASE is the piece probability


def _pad_case_sql(n_pieces_col: str = "n_pieces") -> str:
    """The common-denominator pad 50^(MAX_WORD_LEN - k) as a literal
    integer CASE — identical text on both engines, no float power."""
    arms = " ".join(
        f"WHEN {k} THEN {SCORE_BASE ** (MAX_WORD_LEN - k)}"
        for k in range(1, MAX_WORD_LEN + 1)
    )
    return f"(CASE {n_pieces_col} {arms} END)"


@functools.lru_cache(None)
def _comps(n: int) -> tuple[tuple[int, ...], ...]:
    """All compositions of n into parts of 1..MAX_PIECE."""
    if n == 0:
        return ((),)
    out = []
    for p in range(1, min(MAX_PIECE, n) + 1):
        out += [(p,) + rest for rest in _comps(n - p)]
    return tuple(out)


def composition_rows() -> list[tuple[int, int, int, int, int, int]]:
    """Flattened piece rows of every composition for word lengths
    1..MAX_WORD_LEN: ``(n, seg_id, n_pieces, piece_idx, off, len)`` with
    1-based offsets (both engines' substring convention). A fixed
    combinatorial object — 223 compositions, ~900 piece rows."""
    rows = []
    for n in range(1, MAX_WORD_LEN + 1):
        for seg_id, comp in enumerate(_comps(n)):
            off = 1
            for piece_idx, ln in enumerate(comp):
                rows.append((n, seg_id, len(comp), piece_idx, off, ln))
                off += ln
    return rows


def _comps_df(spark) -> DataFrame:
    return spark.createDataFrame(
        composition_rows(),
        "n int, seg_id int, n_pieces int, piece_idx int, off int, len int",
    )


def word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus's Zipf-bounded (word, freq) aggregate — the ONE corpus
    scan the trainer makes. Repartitioned up front: a single-split
    parquet input would serialize the explode+aggregate onto one task
    (CLAUDE.md perf note)."""
    return (
        docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
        .select(
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _trainable(words: DataFrame) -> DataFrame:
    return words.where(F.length("word") <= MAX_WORD_LEN)


def seed_vocab(words: DataFrame, seed_size: int = 48) -> DataFrame:
    """Seed candidates: all substrings of length 1..MAX_PIECE of the
    trainable words, freq-weighted (a piece occurring twice in a word
    counts twice, matching later usage counting); keep the top
    ``seed_size`` by (cnt DESC, piece ASC) plus ALL single characters
    (the segmentability guarantee). Returns ``(piece, cnt)``."""
    w = _trainable(words)
    subs = w.select(
        "freq",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, length(word)), o -> "
                f"transform(sequence(1, least({MAX_PIECE}, length(word) - o + 1)), "
                f"l -> substring(word, o, l))))"
            )
        ).alias("piece"),
    )
    cand = subs.groupBy("piece").agg(F.sum("freq").alias("cnt"))
    top = (
        cand.withColumn(
            "_rk",
            F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("piece"))),
        )
        .where(F.col("_rk") <= seed_size)
        .drop("_rk")
    )
    chars = cand.where(F.length("piece") == 1)
    return top.unionByName(chars).groupBy("piece").agg(F.max("cnt").alias("cnt"))


def _scored(vocab_counts: DataFrame, cnt_col: str) -> DataFrame:
    """(piece, cnt) -> (piece, s) with s = cnt*49 // total + 1."""
    total = vocab_counts.agg(F.sum(cnt_col).cast("long").alias("_tot"))
    return vocab_counts.crossJoin(F.broadcast(total)).select(
        "piece",
        (
            F.expr(f"(CAST({cnt_col} AS BIGINT) * {SCORE_SCALE}) div _tot")
            + F.lit(1)
        )
        .cast("long")
        .alias("s"),
    )


def best_segmentations(
    words: DataFrame, scores: DataFrame, comps: DataFrame
) -> DataFrame:
    """Per trainable word, the argmax segmentation under the current
    piece scores: ``(word, freq, piece_idx, piece)`` rows of the winning
    segmentation. Valid = every piece in the vocabulary; argmax by
    (product of scores DESC, n_pieces ASC, seg string ASC)."""
    w = _trainable(words).withColumn("n", F.length("word").cast("int"))
    pieces = (
        w.join(F.broadcast(comps), "n")
        .select(
            "word",
            "freq",
            "seg_id",
            "n_pieces",
            "piece_idx",
            F.expr("substring(word, off, len)").alias("piece"),
        )
        .join(F.broadcast(scores), "piece")
    )
    segs = pieces.groupBy("word", "freq", "seg_id", "n_pieces").agg(
        F.count(F.lit(1)).alias("_found"),
        # exact BIGINT fold: ≤ 8 factors ≤ 50 each (multiplication is
        # fully associative/commutative on ints — list order immaterial);
        # padded to the common denominator so fewer pieces win like a
        # real probability product
        (
            F.aggregate(
                F.collect_list("s"), F.lit(1).cast("long"), lambda acc, x: acc * x
            )
            * F.expr(_pad_case_sql("n_pieces")).cast("long")
        ).alias("score"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("piece_idx", "piece"))),
                lambda x: x["piece"],
            ),
            "|",
        ).alias("seg"),
    )
    best = segs.where(F.col("_found") == F.col("n_pieces")).withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy("word").orderBy(
                F.desc("score"), F.asc("n_pieces"), F.asc("seg")
            )
        ),
    ).where(F.col("_rk") == 1)
    return best.select(
        "word",
        "freq",
        F.posexplode(F.split("seg", r"\|")).alias("piece_idx", "piece"),
    )


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    seed_size: int = 48,
    vocab_sizes: tuple[int, ...] = (32, 24),
) -> DataFrame:
    """Train the unigram vocabulary: seed → (segment → count usage →
    prune to K → re-score) per pruning round. Returns
    ``(piece, usage, score)`` of the final vocabulary, where ``usage`` is
    the freq-weighted occurrence count in the last round's best
    segmentations and ``score`` its integer re-estimate."""
    spark = docs.sparkSession
    comps = _comps_df(spark)
    words = word_freq(docs, text_col).localCheckpoint(eager=False)
    vocab = _scored(seed_vocab(words, seed_size), "cnt")
    out = None
    for k in vocab_sizes:
        seg = best_segmentations(words, vocab, comps)
        usage = seg.groupBy("piece").agg(
            F.sum("freq").cast("long").alias("usage")
        )
        # chars always survive (segmentability); usage 0 if never used
        chars = (
            vocab.where(F.length("piece") == 1)
            .select("piece")
            .join(usage, "piece", "left")
            .select("piece", F.coalesce("usage", F.lit(0)).cast("long").alias("usage"))
        )
        kept = (
            usage.withColumn(
                "_rk",
                F.row_number().over(
                    Window.orderBy(F.desc("usage"), F.asc("piece"))
                ),
            )
            .where(F.col("_rk") <= k)
            .drop("_rk")
            .unionByName(chars)
            .groupBy("piece")
            .agg(F.max("usage").alias("usage"))
        ).localCheckpoint(eager=False)
        vocab = _scored(kept, "usage")
        out = kept.join(vocab, "piece").select("piece", "usage", F.col("s").alias("score"))
    return out


def unigram_tokenize(
    docs: DataFrame,
    vocab_scores: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Corpus token counts under a trained vocabulary (the
    :func:`unigram_train` output or any ``(piece, score|s)`` frame):
    trainable words segment by the same argmax; words longer than
    ``MAX_WORD_LEN`` fall back to single characters. Returns
    ``(token, n_tokens)``."""
    spark = docs.sparkSession
    if "score" in vocab_scores.columns:
        vocab_scores = vocab_scores.select(
            "piece", F.col("score").cast("long").alias("s")
        )
    words = word_freq(docs, text_col).localCheckpoint(eager=False)
    seg = best_segmentations(words, vocab_scores, _comps_df(spark)).select(
        "freq", "piece"
    )
    long_chars = (
        words.where(F.length("word") > MAX_WORD_LEN)
        .select("freq", F.explode(F.split("word", "")).alias("piece"))
        .where(F.col("piece") != "")
    )
    return (
        seg.unionByName(long_chars)
        .groupBy(F.col("piece").alias("token"))
        .agg(F.sum("freq").cast("long").alias("n_tokens"))
    )


# ---------------------------------------------------------------------------
# SQL twins — the unrolled CTE replay of the trainer (DuckDB oracle)
# ---------------------------------------------------------------------------


def _comps_values_sql() -> str:
    rows = ", ".join(
        f"({n}, {sid}, {np}, {pi}, {off}, {ln})"
        for n, sid, np, pi, off, ln in composition_rows()
    )
    return (
        "SELECT * FROM (VALUES "
        + rows
        + ") AS t(n, seg_id, n_pieces, piece_idx, off, len)"
    )


def _words_sql(table: str, text_col: str) -> str:
    return f"""
      SELECT word, count(*)::BIGINT AS freq FROM (
        SELECT unnest(string_split_regex(trim(lower({text_col})), '\\s+')) AS word
        FROM {table}
      ) WHERE word <> '' GROUP BY word
    """


def _best_seg_sql(words_cte: str, scores_cte: str) -> str:
    """Winning-segmentation piece rows under ``scores_cte(piece, s)``:
    SELECT word, freq, piece_idx, piece."""
    pieces = f"""
        SELECT w.word, w.freq, c.seg_id, c.n_pieces, c.piece_idx,
               substr(w.word, c.off, c.len) AS piece
        FROM {words_cte} w JOIN comps c ON c.n = length(w.word)
        WHERE length(w.word) <= {MAX_WORD_LEN}
    """
    return f"""
      SELECT p.word, p.freq, p.piece_idx, p.piece
      FROM ({pieces}) p
      JOIN (
        SELECT word, seg_id FROM (
          SELECT word, seg_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY word
                   ORDER BY score DESC, n_pieces ASC, seg ASC) AS _rk
          FROM (
            SELECT p2.word, p2.seg_id,
                   min(p2.n_pieces) AS n_pieces,
                   CAST(product(v2.s) AS BIGINT)
                     * {_pad_case_sql("min(p2.n_pieces)")} AS score,
                   string_agg(p2.piece, '|' ORDER BY p2.piece_idx) AS seg
            FROM ({pieces}) p2 JOIN {scores_cte} v2 USING (piece)
            GROUP BY p2.word, p2.seg_id
            HAVING count(*) = min(p2.n_pieces)
          )
        ) WHERE _rk = 1
      ) win ON p.word = win.word AND p.seg_id = win.seg_id
    """


def unigram_train_ctes(
    table: str,
    text_col: str = "text",
    seed_size: int = 48,
    vocab_sizes: tuple[int, ...] = (32, 24),
) -> str:
    """The WITH-clause body replaying the trainer; final vocabulary in
    CTE ``vocab_final(piece, usage, score)``."""
    parts = [
        f"comps AS MATERIALIZED ({_comps_values_sql()})",
        f"words AS MATERIALIZED ({_words_sql(table, text_col)})",
        f"""cand AS MATERIALIZED (
          SELECT piece, SUM(freq)::BIGINT AS cnt FROM (
            SELECT w.freq, substr(w.word, o.range, l.range) AS piece
            FROM words w,
                 range(1, {MAX_WORD_LEN} + 1) o,
                 range(1, {MAX_PIECE} + 1) l
            WHERE length(w.word) <= {MAX_WORD_LEN}
              AND o.range + l.range - 1 <= length(w.word)
          ) GROUP BY piece
        )""",
        f"""vocab_0 AS MATERIALIZED (
          SELECT piece, cnt FROM (
            SELECT piece, cnt,
                   ROW_NUMBER() OVER (ORDER BY cnt DESC, piece ASC) AS _rk
            FROM cand
          ) WHERE _rk <= {seed_size}
          UNION ALL SELECT piece, cnt FROM cand WHERE length(piece) = 1
        )""",
        """vocab_0d AS MATERIALIZED (
          SELECT piece, MAX(cnt) AS cnt FROM vocab_0 GROUP BY piece
        )""",
        f"""scores_0 AS MATERIALIZED (
          SELECT piece,
                 (cnt * {SCORE_SCALE}) // (SELECT SUM(cnt) FROM vocab_0d) + 1 AS s
          FROM vocab_0d
        )""",
    ]
    prev = "scores_0"
    for i, k in enumerate(vocab_sizes, start=1):
        parts += [
            f"seg_{i} AS MATERIALIZED ({_best_seg_sql('words', prev)})",
            f"""usage_{i} AS MATERIALIZED (
              SELECT piece, SUM(freq)::BIGINT AS usage
              FROM seg_{i} GROUP BY piece
            )""",
            f"""kept_{i} AS MATERIALIZED (
              SELECT piece, MAX(usage) AS usage FROM (
                SELECT piece, usage FROM (
                  SELECT piece, usage,
                         ROW_NUMBER() OVER (ORDER BY usage DESC, piece ASC) AS _rk
                  FROM usage_{i}
                ) WHERE _rk <= {k}
                UNION ALL
                SELECT v.piece, COALESCE(u.usage, 0) AS usage
                FROM {prev} v LEFT JOIN usage_{i} u USING (piece)
                WHERE length(v.piece) = 1
              ) GROUP BY piece
            )""",
            f"""scores_{i} AS MATERIALIZED (
              SELECT piece,
                     (usage * {SCORE_SCALE}) //
                       (SELECT SUM(usage) FROM kept_{i}) + 1 AS s
              FROM kept_{i}
            )""",
        ]
        prev = f"scores_{i}"
    last = len(vocab_sizes)
    parts.append(
        f"""vocab_final AS MATERIALIZED (
          SELECT k.piece, k.usage::BIGINT AS usage, s.s::BIGINT AS score
          FROM kept_{last} k JOIN scores_{last} s USING (piece)
        )"""
    )
    return ",\n".join(parts)


def unigram_train_sql(
    table: str,
    text_col: str = "text",
    seed_size: int = 48,
    vocab_sizes: tuple[int, ...] = (32, 24),
) -> str:
    ctes = unigram_train_ctes(table, text_col, seed_size, vocab_sizes)
    return f"WITH {ctes} SELECT piece, usage, score FROM vocab_final"


def unigram_tokenize_sql(
    table: str,
    text_col: str = "text",
    seed_size: int = 48,
    vocab_sizes: tuple[int, ...] = (32, 24),
) -> str:
    ctes = unigram_train_ctes(table, text_col, seed_size, vocab_sizes)
    last = len(vocab_sizes)
    return f"""
    WITH {ctes},
    final_seg AS ({_best_seg_sql('words', f'scores_{last}')}),
    long_chars AS (
      SELECT freq, unnest(string_split(word, '')) AS piece
      FROM words WHERE length(word) > {MAX_WORD_LEN}
    )
    SELECT piece AS token, SUM(freq)::BIGINT AS n_tokens FROM (
      SELECT freq, piece FROM final_seg
      UNION ALL SELECT freq, piece FROM long_chars WHERE piece <> ''
    ) GROUP BY piece
    """
