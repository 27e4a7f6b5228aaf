"""BM25 top-k text retrieval over the document corpus — the lexical
search operator every training-data pipeline needs next to the embedding
ANN tier (inspect corpora, mine hard negatives, build eval sets).

The reference engine has no text surface at all (its query surface is
time-bucket reducers, ``/root/reference/query.go:20-59``); this belongs
to the LLM-pipeline extension set alongside tf-idf and PMI in
``functions/text.py``.

Cross-engine exactness (the hash-gate discipline): classic BM25's
``log`` idf is not bit-replayable (JVM intrinsic vs glibc differ in the
last ulp), so the idf here is the RATIONAL Robertson–Spärck-Jones
weight WITHOUT the log: ``(N - df + 0.5) / (df + 0.5)``. Per term that
is a monotone transform of log-idf (log is increasing), so each term's
doc-ordering is preserved; the SUMMED score is a documented variant
(not identical rank to log-BM25 for multi-term queries) — deterministic
and engine-exact, which the gate needs more than textbook fidelity.
Every per-term score is ONE fixed double expression tree (shared
formula text between Spark and the DuckDB oracle — ``_SCORE_TMPL``),
then integer-quantized ``floor(x*1e9 + 0.5)`` so the per-document sum
over query terms is an order-independent exact BIGINT.

Scale design: the corpus-wide token explode is FILTERED to query terms
before any shuffle (one scan, predicate on the exploded token), so
tf/df aggregates and the scoring join run over |matching (doc, term)|
rows, not the corpus vocabulary; the query-term table and df table
broadcast. Corpus statistics (N, total token count) are two exact
BIGINTs computed once — at ingest time in production (the stored-stats
pattern), inline here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Shared per-term score formula — IDENTICAL text on both engines, so
#: every IEEE op runs on bit-identical inputs in the same order.
#: Placeholders: {tf} {df} {dl} exact-BIGINT column refs, {n} {tot}
#: exact integer literals / refs, {k1} {b1} {b} BM25 constants.
_SCORE_TMPL = (
    "CAST(floor(("
    "((CAST({n} - {df} AS DOUBLE) + 0.5) / (CAST({df} AS DOUBLE) + 0.5))"
    " * ((CAST({tf} AS DOUBLE) * {k1p1})"
    "    / (CAST({tf} AS DOUBLE)"
    "       + {k1} * ({omb} + {b} * (CAST({dl} AS DOUBLE)"
    "                                / (CAST({tot} AS DOUBLE) / {n})))))"
    ") * 1e9 + 0.5) AS BIGINT)"
)

_K1 = "1.2"
_K1P1 = "2.2"
_B = "0.75"
_OMB = "0.25"  # 1 - b


def _terms(queries: list[tuple[int, str]]) -> list[tuple[int, str]]:
    """(q_id, term) pairs, DISTINCT terms per query (a repeated query
    term scores once — the qtf weight is 1, the common simplification)."""
    out = []
    for q_id, text in queries:
        seen = set()
        for t in text.strip().lower().split():
            if t not in seen:
                seen.add(t)
                out.append((int(q_id), t))
    return out


def _rank_from_tf(
    tf: DataFrame,
    qt: DataFrame,
    n_docs: int,
    tot: int,
    k_top: int,
) -> DataFrame:
    """Shared scoring tail: a ``(doc_id, token, tf, dl)`` frame (already
    restricted to query terms) + a ``(q_id, token)`` query table →
    ``(q_id, rnk, doc_id, score)``. df per token comes from the tf frame
    itself — (doc_id, token) is unique there, so a plain count IS the
    exact global document frequency of each query term."""
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    score_q = F.expr(
        _SCORE_TMPL.format(
            tf="tf", df="df", dl="dl", n=n_docs, tot=tot,
            k1=_K1, k1p1=_K1P1, b=_B, omb=_OMB,
        )
    )
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(F.broadcast(qt), "token")
        .groupBy("q_id", "doc_id")
        .agg(F.sum(score_q).cast("long").alias("score_q"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score_q"), "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k_top)
        .select(
            "q_id",
            F.col("rnk").cast("long").alias("rnk"),
            "doc_id",
            (F.col("score_q").cast("double") / F.lit(1e9)).alias("score"),
        )
    )


def postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The inverted-index postings of a (sub)corpus: one row per
    (doc, term) — ``(token, doc_id, tf, dl)``. This is the AT-REST shape
    of lexical search state: build it once at ingest, and query-time
    BM25 reads postings for the query terms only (predicate pushdown on
    ``token``), never the raw text."""
    # spread the docs first: a single-split parquet source would run the
    # tokenize+explode in ONE task (the single-split gotcha — measured
    # 2.2 s serialized vs ~0.3 s spread at sf0.1)
    par = docs.sparkSession.sparkContext.defaultParallelism
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        docs.repartition(par)
        .select(
            F.col(id_col).alias("doc_id"),
            F.size(toks).cast("long").alias("dl"),
            F.explode(toks).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.max("dl").alias("dl"),
        )
        .select("token", "doc_id", "tf", "dl")
    )


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k_top: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k_top`` documents per query by the rational-idf BM25 score.
    Returns ``(q_id, rnk, doc_id, score)``, ranked score-desc with a
    ``doc_id`` tie-break; only documents containing at least one query
    term are candidates (standard inverted-index semantics)."""
    spark = docs.sparkSession
    terms = _terms(queries)
    all_terms = sorted({t for _, t in terms})

    # spread the docs first (single-split gotcha: one task otherwise
    # tokenizes the whole corpus)
    par = spark.sparkContext.defaultParallelism
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    tok = docs.repartition(par).select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        F.explode(toks).alias("token"),
    )
    # corpus stats: two exact BIGINTs (stored at ingest in production)
    n_docs, tot = docs.select(
        F.count(F.lit(1)).cast("long"),
        F.sum(F.size(toks)).cast("long"),
    ).first()

    # filter BEFORE any shuffle: only query-term rows leave the scan
    tf = (
        tok.where(F.col("token").isin(all_terms))
        .groupBy("doc_id", "token")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.max("dl").alias("dl"),
        )
        .cache()
    )
    # EAGER materialization (r16 opt): _rank_from_tf references tf twice
    # (dfreq broadcast build + the scored stream) and each reference
    # re-ran the corpus tokenize+explode. tf holds only query-term-
    # matching (doc, term) rows — the index-path scan size — so the
    # cache is small at any corpus scale.
    tf.count()
    qt = spark.createDataFrame(terms, "q_id long, token string")
    return _rank_from_tf(tf, qt, n_docs, tot, k_top)


def bm25_topk_from_index(
    index: DataFrame,
    n_docs: int,
    total_dl: int,
    queries: list[tuple[int, str]],
    k_top: int = 10,
) -> DataFrame:
    """Query-time BM25 over a STORED postings index (``postings`` shape,
    e.g. the maintained table from ``streaming/index.
    stream_bm25_index_maintenance``) plus the stored corpus stats.
    The raw corpus is never touched: the only scan is the postings
    table with the query-term predicate pushed into it — at 100 TB the
    query cost is |postings of the query terms|, not the corpus."""
    spark = index.sparkSession
    terms = _terms(queries)
    all_terms = sorted({t for _, t in terms})
    tf = index.where(F.col("token").isin(all_terms)).select(
        "doc_id", "token", "tf", "dl"
    )
    qt = spark.createDataFrame(terms, "q_id long, token string")
    return _rank_from_tf(tf, qt, int(n_docs), int(total_dl), k_top)


def bm25_topk_sql(
    table: str,
    queries: list[tuple[int, str]],
    k_top: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin: same filtered-explode shape, same ``_SCORE_TMPL``
    formula text, same quantized BIGINT sum and tie-break."""
    terms = _terms(queries)
    # SQL-escape the interpolated terms (ADVICE r10): a term containing a
    # single quote would otherwise break the oracle query text — and terms
    # can come from data (by-example queries), not just plan constants.
    esc = lambda t: t.replace("'", "''")
    all_terms = ", ".join(f"'{esc(t)}'" for t in sorted({t for _, t in terms}))
    qvals = ", ".join(f"({q}, '{esc(t)}')" for q, t in terms)
    toks = f"string_split_regex(trim(lower({text_col})), '\\s+')"
    score = _SCORE_TMPL.format(
        tf="t.tf", df="d.df", dl="t.dl", n="s.n_docs", tot="s.tot",
        k1=_K1, k1p1=_K1P1, b=_B, omb=_OMB,
    )
    return f"""
    WITH tok AS (
      SELECT {id_col} AS doc_id, len({toks})::BIGINT AS dl,
             unnest({toks}) AS token
      FROM {table}
    ),
    s AS (
      SELECT count(*)::BIGINT AS n_docs, sum(len({toks}))::BIGINT AS tot
      FROM {table}
    ),
    qt(q_id, token) AS (VALUES {qvals}),
    tf AS (
      SELECT doc_id, token, count(*)::BIGINT AS tf, max(dl)::BIGINT AS dl
      FROM tok WHERE token IN ({all_terms}) GROUP BY doc_id, token
    ),
    dfreq AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY token),
    scored AS (
      SELECT q.q_id, t.doc_id, SUM({score})::BIGINT AS score_q
      FROM tf t JOIN dfreq d USING (token) JOIN qt q USING (token), s
      GROUP BY q.q_id, t.doc_id
    ),
    ranked AS (
      SELECT q_id, doc_id, score_q,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY score_q DESC, doc_id) AS rnk
      FROM scored
    )
    SELECT CAST(q_id AS BIGINT) AS q_id, CAST(rnk AS BIGINT) AS rnk,
           doc_id, CAST(score_q AS DOUBLE) / 1e9 AS score
    FROM ranked WHERE rnk <= {k_top}
    """


def bm25_topk_by_example(
    docs: DataFrame,
    query_ids: list[int],
    k_top: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Query-by-example BM25: each query is a CORPUS DOCUMENT (its
    distinct tokens become the query terms), the standard shape for
    near-dup candidate retrieval and hard-negative mining. Returns
    ``(q_id, rnk, doc_id)`` with the query doc itself excluded.

    Same scale shape as :func:`bm25_topk` except the term filter is a
    broadcast semi-join on the (query-doc-bounded) term set instead of
    a literal IN-list — terms are data here, not plan constants."""
    qids = [int(q) for q in query_ids]
    par = docs.sparkSession.sparkContext.defaultParallelism
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    # spread first (single-split gotcha)
    tok = docs.repartition(par).select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        F.explode(toks).alias("token"),
    )
    n_docs, tot = docs.select(
        F.count(F.lit(1)).cast("long"),
        F.sum(F.size(toks)).cast("long"),
    ).first()

    # EAGER materializations (r16 opt): qt feeds its own broadcast, the
    # qterms derivation, and the final scored join — un-cached, each
    # reference re-ran the (doc_id-pruned) tokenize; tf feeds both the
    # dfreq broadcast build and the scored stream — un-cached, each
    # re-ran the FULL corpus tokenize+explode. Both frames are bounded
    # by the query docs' term sets (qt) and the matching (doc, term)
    # rows (tf) — small at any corpus scale.
    qt = (
        tok.where(F.col("doc_id").isin(qids))
        .select(F.col("doc_id").alias("q_id"), "token")
        .distinct()
        .cache()
    )
    qt.count()
    qterms = qt.select("token").distinct()
    tf = (
        tok.join(F.broadcast(qterms), "token")
        .groupBy("doc_id", "token")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.max("dl").alias("dl"),
        )
        .cache()
    )
    tf.count()
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    score_q = F.expr(
        _SCORE_TMPL.format(
            tf="tf", df="df", dl="dl", n=n_docs, tot=tot,
            k1=_K1, k1p1=_K1P1, b=_B, omb=_OMB,
        )
    )
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(F.broadcast(qt), "token")
        .where(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", "doc_id")
        .agg(F.sum(score_q).cast("long").alias("score_q"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score_q"), "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k_top)
        .select("q_id", F.col("rnk").cast("long").alias("rnk"), "doc_id")
    )


def bm25_topk_by_example_sql(
    table: str,
    query_ids: list[int],
    k_top: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bm25_topk_by_example` (no leading WITH —
    composes as CTE text inside a larger query via ``{prefix}``)."""
    ids = ", ".join(str(int(q)) for q in query_ids)
    toks = f"string_split_regex(trim(lower({text_col})), '\\s+')"
    score = _SCORE_TMPL.format(
        tf="t.tf", df="d.df", dl="t.dl", n="s.n_docs", tot="s.tot",
        k1=_K1, k1p1=_K1P1, b=_B, omb=_OMB,
    )
    return f"""
    bm_tok AS MATERIALIZED (
      SELECT {id_col} AS doc_id, len({toks})::BIGINT AS dl,
             unnest({toks}) AS token
      FROM {table}
    ),
    bm_s AS (
      SELECT count(*)::BIGINT AS n_docs, sum(len({toks}))::BIGINT AS tot
      FROM {table}
    ),
    bm_qt AS (SELECT DISTINCT doc_id AS q_id, token FROM bm_tok
              WHERE doc_id IN ({ids})),
    bm_qterms AS (SELECT DISTINCT token FROM bm_qt),
    bm_tf AS MATERIALIZED (
      SELECT doc_id, token, count(*)::BIGINT AS tf, max(dl)::BIGINT AS dl
      FROM bm_tok JOIN bm_qterms USING (token) GROUP BY doc_id, token
    ),
    bm_dfreq AS (SELECT token, count(*)::BIGINT AS df FROM bm_tf GROUP BY token),
    bm_scored AS (
      SELECT q.q_id, t.doc_id, SUM({score})::BIGINT AS score_q
      FROM bm_tf t JOIN bm_dfreq d USING (token) JOIN bm_qt q USING (token),
           bm_s s
      WHERE t.doc_id <> q.q_id
      GROUP BY q.q_id, t.doc_id
    ),
    bm_ranked AS (
      SELECT q_id, doc_id,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY score_q DESC, doc_id) AS rnk
      FROM bm_scored
    ),
    bm AS (SELECT q_id, rnk, doc_id FROM bm_ranked WHERE rnk <= {k_top})
    """


#: RRF quantum: score contribution = RRF_SCALE // (RRF_K + rank) — an
#: EXACT integer division on both engines (the documented variant of
#: 1/(k+rank); same ordering, no floats anywhere).
RRF_K = 60
RRF_SCALE = 1_000_000_000_000


def rrf_fuse(
    rankings: list[DataFrame],
    k_top: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack & Clarke 2009) over any rankings
    shaped ``(q_id, doc_id, rnk)``: fused score = Σ over rankers of
    ``RRF_SCALE div (RRF_K + rnk)`` (exact BIGINT — the division is
    integer on both engines, so fusion needs no float story at all).
    Documents missing from a ranker contribute 0. Returns
    ``(q_id, rnk, doc_id, rrf_score)``."""
    contrib = F.expr(f"CAST({RRF_SCALE} DIV ({RRF_K} + rnk) AS BIGINT)")
    u = rankings[0].select("q_id", "doc_id", contrib.alias("c"))
    for r in rankings[1:]:
        u = u.unionByName(r.select("q_id", "doc_id", contrib.alias("c")))
    fused = u.groupBy("q_id", "doc_id").agg(
        F.sum("c").cast("long").alias("rrf_score")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("rrf_score"), "doc_id")
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k_top)
        .select("q_id", F.col("rnk").cast("long").alias("rnk"), "doc_id", "rrf_score")
    )


def rag_chunk_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k_top: int = 5,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAG retrieval at CHUNK granularity with per-document dedup — the
    end-to-end shape a retrieval-augmented pipeline actually serves:
    documents split into overlapping token chunks
    (:func:`functions.text.chunk_sliding`), each chunk scored as its own
    BM25 unit (chunk-local tf/dl, chunk-level df — long documents can't
    hide a relevant passage in their length normalization), then ONE
    best chunk per (query, document) so k results are k DISTINCT
    documents, each represented by its best passage.

    Returns ``(q_id, rnk, doc_id, chunk_id, score, chunk_text)``.

    Exactness: every chunk is scored (no candidate truncation before
    the per-doc dedup), both windows are row_number with id tie-breaks,
    and the score is the repo's quantized rational-idf BM25 — fully
    SQL-replayable. Scale shape: the chunk token explode is filtered to
    query terms BEFORE any shuffle, so scoring traffic is |matching
    (chunk, term)| rows; the windows partition by query. Only ids and
    integers cross shuffles — the winning chunks' text joins back at
    the end from a second chunk pass over the (pushdown-pruned) text
    column; at 100 TB the chunk table is stored at ingest (the
    postings pattern) and both passes read it, not the raw corpus."""
    from tickdb_spark.functions.text import chunk_sliding

    spark = docs.sparkSession
    terms = _terms(queries)
    all_terms = sorted({t for _, t in terms})
    par = spark.sparkContext.defaultParallelism

    # the chunk frame is referenced three times (token explode, the
    # stats action, the winning-text join-back) — truncate lineage so
    # the chunk build runs once; at 100 TB this is the stored chunk
    # table, so the checkpoint stands in for the ingest-time write
    chunks = chunk_sliding(
        docs.repartition(par), text_col, id_col, window, stride
    ).localCheckpoint(eager=False)
    toks = F.split(F.trim(F.lower(F.col("chunk_text"))), r"\s+")
    tok = chunks.select(
        F.col(id_col).alias("doc_id"),
        "chunk_id",
        F.size(toks).cast("long").alias("dl"),
        F.explode(toks).alias("token"),
    )
    # chunk-corpus stats (stored at ingest in production, inline here)
    n_chunks, tot = chunks.select(
        F.count(F.lit(1)).cast("long"),
        F.sum(F.size(toks)).cast("long"),
    ).first()

    tf = (
        tok.where(F.col("token").isin(all_terms))
        .groupBy("doc_id", "chunk_id", "token")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.max("dl").alias("dl"),
        )
        .cache()
    )
    # EAGER materialization (r16 opt): tf feeds BOTH the dfreq broadcast
    # build and the scored stream — each reference re-ran the whole
    # chunk-token explode (the run's dominant stage, 2×). tf is the
    # query-term-matching rows only (exactly what the scoring shuffle
    # carries anyway), so the cache is small and spill-safe at scale.
    tf.count()
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    qt = spark.createDataFrame(terms, "q_id long, token string")
    score_q = F.expr(
        _SCORE_TMPL.format(
            tf="tf", df="df", dl="dl", n=n_chunks, tot=tot,
            k1=_K1, k1p1=_K1P1, b=_B, omb=_OMB,
        )
    )
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(F.broadcast(qt), "token")
        .groupBy("q_id", "doc_id", "chunk_id")
        .agg(F.sum(score_q).cast("long").alias("score_q"))
    )
    w_doc = Window.partitionBy("q_id", "doc_id").orderBy(
        F.desc("score_q"), "chunk_id"
    )
    w_q = Window.partitionBy("q_id").orderBy(F.desc("score_q"), "doc_id")
    best = (
        scored.withColumn("_cr", F.row_number().over(w_doc))
        .where(F.col("_cr") == 1)
        .withColumn("rnk", F.row_number().over(w_q))
        .where(F.col("rnk") <= k_top)
    )
    return (
        best.join(
            chunks.select(
                F.col(id_col).alias("doc_id"), "chunk_id", "chunk_text"
            ),
            ["doc_id", "chunk_id"],
        )
        .select(
            "q_id",
            F.col("rnk").cast("long").alias("rnk"),
            "doc_id",
            "chunk_id",
            (F.col("score_q").cast("double") / F.lit(1e9)).alias("score"),
            "chunk_text",
        )
    )


def rag_chunk_topk_sql(
    table: str,
    queries: list[tuple[int, str]],
    k_top: int = 5,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`rag_chunk_topk`: chunk_sliding_sql composed
    under the same filtered explode, score template, and double window."""
    from tickdb_spark.functions.text import chunk_sliding_sql

    terms = _terms(queries)
    esc = lambda t: t.replace("'", "''")
    all_terms = ", ".join(f"'{esc(t)}'" for t in sorted({t for _, t in terms}))
    qvals = ", ".join(f"({q}, '{esc(t)}')" for q, t in terms)
    chunks = chunk_sliding_sql(table, text_col, id_col, window, stride)
    toks = "string_split_regex(trim(lower(chunk_text)), '\\s+')"
    score = _SCORE_TMPL.format(
        tf="t.tf", df="d.df", dl="t.dl", n="s.n_chunks", tot="s.tot",
        k1=_K1, k1p1=_K1P1, b=_B, omb=_OMB,
    )
    return f"""
    WITH chunks AS MATERIALIZED ({chunks}),
    tok AS (
      SELECT {id_col} AS doc_id, chunk_id, len({toks})::BIGINT AS dl,
             unnest({toks}) AS token
      FROM chunks
    ),
    s AS (
      SELECT count(*)::BIGINT AS n_chunks, sum(len({toks}))::BIGINT AS tot
      FROM chunks
    ),
    qt(q_id, token) AS (VALUES {qvals}),
    tf AS (
      SELECT doc_id, chunk_id, token, count(*)::BIGINT AS tf,
             max(dl)::BIGINT AS dl
      FROM tok WHERE token IN ({all_terms})
      GROUP BY doc_id, chunk_id, token
    ),
    dfreq AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY token),
    scored AS (
      SELECT q.q_id, t.doc_id, t.chunk_id, SUM({score})::BIGINT AS score_q
      FROM tf t JOIN dfreq d USING (token) JOIN qt q USING (token), s
      GROUP BY q.q_id, t.doc_id, t.chunk_id
    ),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY q_id, doc_id
                                   ORDER BY score_q DESC, chunk_id) AS _cr
      FROM scored
    ),
    ranked AS (
      SELECT q_id, doc_id, chunk_id, score_q,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY score_q DESC, doc_id) AS rnk
      FROM best WHERE _cr = 1
    )
    SELECT r.q_id, CAST(r.rnk AS BIGINT) AS rnk, r.doc_id, r.chunk_id,
           CAST(r.score_q AS DOUBLE) / 1e9 AS score, c.chunk_text
    FROM ranked r JOIN chunks c
      ON r.doc_id = c.{id_col} AND r.chunk_id = c.chunk_id
    WHERE r.rnk <= {k_top}
    """


def rag_chunk_postings(
    chunks: DataFrame,
) -> DataFrame:
    """The AT-REST postings of a chunk table (:func:`functions.text.
    chunk_sliding` output): one row per (doc, chunk, term) —
    ``(token, doc_id, chunk_id, tf, dl)``. Built ONCE at ingest next to
    the chunk table; query-time RAG retrieval then reads postings for
    the query terms only (predicate pushdown on ``token``) and never
    touches raw text — the chunk-granular twin of :func:`postings`."""
    par = chunks.sparkSession.sparkContext.defaultParallelism
    toks = F.split(F.trim(F.lower(F.col("chunk_text"))), r"\s+")
    return (
        chunks.repartition(par)
        .select(
            "doc_id",
            "chunk_id",
            F.size(toks).cast("long").alias("dl"),
            F.explode(toks).alias("token"),
        )
        .groupBy("doc_id", "chunk_id", "token")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.max("dl").alias("dl"),
        )
        .select("token", "doc_id", "chunk_id", "tf", "dl")
    )


def rag_chunk_topk_from_index(
    chunks: DataFrame,
    postings: DataFrame,
    queries: list[tuple[int, str]],
    k_top: int = 5,
) -> DataFrame:
    """Query-time RAG chunk retrieval over the STORED chunk table +
    chunk postings — the production shape :func:`rag_chunk_topk`'s
    docstring promises: the raw corpus is never touched, the only scans
    are the postings table with the query-term predicate pushed into it
    (cost = |postings of the query terms|, not the corpus) and the
    chunk table for (a) two stored-stats aggregates over pruned columns
    and (b) the winning passages' text join-back. Row-for-row and
    BIT-for-bit equal to the inline path over the same rows: same
    quantized score template, same per-doc dedup and tie-breaks."""
    spark = chunks.sparkSession
    terms = _terms(queries)
    all_terms = sorted({t for _, t in terms})
    # stored corpus stats (computed at ingest in production; two exact
    # BIGINTs from pruned columns here — chunk_text's token count is
    # exactly the inline tokenizer's dl, so tot matches bit-for-bit)
    toks = F.split(F.trim(F.lower(F.col("chunk_text"))), r"\s+")
    n_chunks, tot = chunks.select(
        F.count(F.lit(1)).cast("long"),
        F.sum(F.size(toks)).cast("long"),
    ).first()

    tf = postings.where(F.col("token").isin(all_terms)).select(
        "doc_id", "chunk_id", "token", "tf", "dl"
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    qt = spark.createDataFrame(terms, "q_id long, token string")
    score_q = F.expr(
        _SCORE_TMPL.format(
            tf="tf", df="df", dl="dl", n=n_chunks, tot=tot,
            k1=_K1, k1p1=_K1P1, b=_B, omb=_OMB,
        )
    )
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(F.broadcast(qt), "token")
        .groupBy("q_id", "doc_id", "chunk_id")
        .agg(F.sum(score_q).cast("long").alias("score_q"))
    )
    w_doc = Window.partitionBy("q_id", "doc_id").orderBy(
        F.desc("score_q"), "chunk_id"
    )
    w_q = Window.partitionBy("q_id").orderBy(F.desc("score_q"), "doc_id")
    best = (
        scored.withColumn("_cr", F.row_number().over(w_doc))
        .where(F.col("_cr") == 1)
        .withColumn("rnk", F.row_number().over(w_q))
        .where(F.col("rnk") <= k_top)
    )
    return best.join(
        chunks.select("doc_id", "chunk_id", "chunk_text"), ["doc_id", "chunk_id"]
    ).select(
        "q_id",
        F.col("rnk").cast("long").alias("rnk"),
        "doc_id",
        "chunk_id",
        (F.col("score_q").cast("double") / F.lit(1e9)).alias("score"),
        "chunk_text",
    )
