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
    eval_set: DataFrame | None,
    text_col: str,
    id_col: str,
    n: int = 8,
    eval_grams: DataFrame | None = None,
    train_grams: DataFrame | None = None,
) -> DataFrame:
    """Per training doc: how many distinct n-grams it shares with the
    eval set and the keep/drop verdict. Returns
    ``(id, n_shared_grams, contaminated)`` for every train doc.

    ``eval_grams`` takes a pre-built distinct gram-hash table (e.g. the
    maintained set from ``streaming/index.stream_decontam_gram_
    maintenance``) — the production shape: the benchmark gram set is
    stored state, not a per-run re-derivation. Omitted, it is derived
    from ``eval_set`` inline. ``train_grams`` (r16 opt) likewise takes a
    pre-built ``(id, gram)`` table covering the train docs — a caller
    auditing several splits of ONE corpus derives the gram table once
    and passes id-filtered slices (gram derivation is row-local, so the
    filter commutes and counts are bit-identical)."""
    # Spread the doc rows first: the gram build + md5 is the expensive
    # part, and a single-split parquet source would otherwise run it in
    # one task (the single-split gotcha in the working notes; shuffling raw docs is
    # cheap next to hashing every 8-gram).
    par = train.sparkSession.sparkContext.defaultParallelism
    tg = (
        train_grams
        if train_grams is not None
        else _gram_hashes(train.repartition(par), text_col, id_col, n)
    )
    eg = (
        eval_grams.select("gram")
        if eval_grams is not None
        else _gram_hashes(eval_set, text_col, id_col, n).select("gram").distinct()
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


def novelty_report(
    docs: DataFrame,
    reference: DataFrame | None,
    text_col: str,
    id_col: str,
    n: int = 8,
    ref_grams: DataFrame | None = None,
    doc_grams: DataFrame | None = None,
) -> DataFrame:
    """Per-document n-gram NOVELTY against a reference corpus — the
    inverse of :func:`contamination_report` and the "does this shard add
    anything new?" curation signal: of a doc's distinct n-grams, the
    fraction absent from the reference's gram set. Near-zero novelty =
    redundant with what the model has already seen (candidate to drop
    or downweight); high novelty = new content. Returns
    ``(id, total_grams, novel_grams, novelty_ppm)`` for every doc —
    texts shorter than n words shingle to the full text (the
    ``word_ngrams`` convention: every doc has at least one gram, so
    exact short-doc copies still register as seen).

    Same scale shape as contamination: the reference gram set broadcasts
    (or arrives as the stored/maintained gram table via ``ref_grams``),
    the corpus streams through one scan, and the rate is exact integer
    arithmetic (never a float fraction).

    ``doc_grams`` (r16 opt): pre-built ``(id, gram)`` rows for ``docs``
    — a caller splitting ONE corpus into docs/reference by an id
    predicate derives the gram table once and passes filtered slices
    (gram derivation is row-local, so the filter commutes)."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    tg = (
        doc_grams
        if doc_grams is not None
        else _gram_hashes(docs.repartition(par), text_col, id_col, n)
    )
    rg = (
        ref_grams.select("gram")
        if ref_grams is not None
        else _gram_hashes(reference, text_col, id_col, n)
        .select("gram")
        .distinct()
    )
    # one aggregate computes both counts: total distinct grams (word_ngrams
    # dedups per doc) and how many hit the reference set (left join keeps
    # the miss rows with NULL marker)
    stats = (
        tg.join(F.broadcast(rg.withColumn("_hit", F.lit(1))), "gram", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_grams"),
            (F.count(F.lit(1)) - F.count("_hit")).cast("long").alias("novel_grams"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(stats, "id", "left")
        .select(
            "id",
            F.coalesce("total_grams", F.lit(0)).cast("long").alias("total_grams"),
            F.coalesce("novel_grams", F.lit(0)).cast("long").alias("novel_grams"),
            F.expr(
                "CASE WHEN coalesce(total_grams, 0) = 0 THEN CAST(0 AS BIGINT) "
                "ELSE (1000000 * novel_grams) div total_grams END"
            ).cast("long").alias("novelty_ppm"),
        )
    )


def novelty_report_sql(
    docs_sql: str, ref_sql: str, text_col: str, id_col: str, n: int = 8
) -> str:
    """DuckDB twin; both inputs are full SELECTs yielding
    (id_col, text_col)."""
    grams = word_ngrams_sql(text_col, n)

    def hashes(src: str) -> str:
        return (
            f"SELECT id, CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT)"
            f" AS gram FROM (SELECT {id_col} AS id, unnest({grams}) AS gram"
            f" FROM ({src}))"
        )

    return f"""
    WITH tg AS ({hashes(docs_sql)}),
    rg AS (SELECT DISTINCT gram, 1 AS _hit FROM ({hashes(ref_sql)})),
    stats AS (
      SELECT tg.id, count(*)::BIGINT AS total_grams,
             (count(*) - count(rg._hit))::BIGINT AS novel_grams
      FROM tg LEFT JOIN rg USING (gram) GROUP BY tg.id
    )
    SELECT d.{id_col} AS id,
           COALESCE(s.total_grams, 0)::BIGINT AS total_grams,
           COALESCE(s.novel_grams, 0)::BIGINT AS novel_grams,
           CASE WHEN COALESCE(s.total_grams, 0) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST((1000000 * s.novel_grams) // s.total_grams AS BIGINT)
           END AS novelty_ppm
    FROM ({docs_sql}) d LEFT JOIN stats s ON s.id = d.{id_col}
    """


def contamination_report_bloom(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    m_bits: int = 1 << 20,
    k_hashes: int = 3,
    train_grams: DataFrame | None = None,
    eval_grams: DataFrame | None = None,
) -> DataFrame:
    """``contamination_report`` with a Bloom-filter prefilter — IDENTICAL
    output (a Bloom filter has no false negatives; false positives are
    removed by the exact join), different 100-TB cost model.

    The exact path broadcasts the eval set's distinct gram hashes: fine
    for thousands of eval docs, but a large eval/benchmark suite
    (tens of millions of grams) is a multi-GB broadcast. Here the
    broadcast is a fixed ``m_bits``-bit bitmap (1 Mbit = 128 KB
    regardless of eval size): corpus grams probe the bitmap in a
    vectorized Arrow batch (numpy uint64 mixing, k bit tests), and only
    the surviving ~FPR·corpus + true-hit grams reach the exact
    (shuffled, partitioned — NOT broadcast) join against the eval gram
    table. At FPR ≈ 1% the corpus-side shuffle shrinks 100×; the
    answer cannot change, only the plan does.

    The bitmap is built distributed: each partition ORs its grams into a
    local bitmap, the driver ORs the per-partition bitmaps (bounded by
    partitions × m/8 bytes, data-independent). Probe hashing is
    splitmix64-style numpy uint64 arithmetic — engine-independent, so
    the oracle stays the exact-path SQL."""
    import numpy as np
    import pandas as pd

    par = train.sparkSession.sparkContext.defaultParallelism
    # r17 opt (guide §2.4): accept pre-built gram tables like
    # contamination_report does — a caller auditing several splits of ONE
    # corpus derives (and caches) the gram table once and passes
    # id-filtered slices. Gram derivation is row-local, so the filter
    # commutes and the slice is bit-identical to deriving from the
    # filtered docs (the r16 train_grams argument).
    tg = (
        train_grams
        if train_grams is not None
        else _gram_hashes(train.repartition(par), text_col, id_col, n)
    )
    eg = (
        eval_grams.select("gram")
        if eval_grams is not None
        else _gram_hashes(eval_set, text_col, id_col, n).select("gram").distinct()
    )

    words = m_bits // 64
    mask = np.uint64(m_bits - 1)

    def _positions(grams: "np.ndarray") -> list["np.ndarray"]:
        g = grams.astype("uint64")
        out = []
        with np.errstate(over="ignore"):
            for i in range(k_hashes):
                x = g + np.uint64(
                    (0x9E3779B97F4A7C15 * (i + 1)) & 0xFFFFFFFFFFFFFFFF
                )
                x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                x = x ^ (x >> np.uint64(31))
                out.append(x & mask)
        return out

    def _build(batches):
        bits = np.zeros(words, dtype="uint64")
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            for pos in _positions(pdf["gram"].to_numpy()):
                np.bitwise_or.at(
                    bits, (pos >> np.uint64(6)).astype("int64"),
                    np.uint64(1) << (pos & np.uint64(63)),
                )
        if seen:
            yield pd.DataFrame({"w": bits.view("int64")})

    # bounded collect: per-partition bitmaps OR-ed on the driver —
    # m_bits/8 bytes each, independent of eval-set size
    parts = eg.mapInPandas(_build, "w long").toPandas()
    bitmap = np.zeros(words, dtype="uint64")
    for s in range(0, len(parts), words):
        bitmap |= parts["w"].to_numpy()[s : s + words].view("uint64")
    bc = train.sparkSession.sparkContext.broadcast(bitmap)

    # no type hints: pandas_udf resolves hints via module globals, and
    # pd/np are function-local imports here (legacy SCALAR inference)
    @F.pandas_udf("boolean")
    def probe(grams):
        b = bc.value
        g = grams.to_numpy()
        ok = np.ones(len(g), dtype=bool)
        for pos in _positions(g):
            ok &= (
                b[(pos >> np.uint64(6)).astype("int64")]
                >> (pos & np.uint64(63)) & np.uint64(1)
            ).astype(bool)
        return pd.Series(ok)

    cand = tg.where(probe(F.col("gram")))
    # exact verification: shuffled hash join (eval side partitioned, not
    # broadcast — the point of the bloom path), then the same per-doc count
    hits = (
        cand.join(eg.hint("shuffle_hash"), "gram")
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


# ---------------------------------------------------------------------------
# Near-duplicate decontamination (cross-table MinHash LSH)
# ---------------------------------------------------------------------------


def neardup_contamination(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    bands: int | None = None,
) -> DataFrame:
    """Flag training docs that are NEAR duplicates of eval docs — the
    paraphrase-contamination pass exact n-gram overlap misses (a
    reworded benchmark item shares few 8-grams but most shingles).

    Cross-table shape of ``dedup.minhash_lsh_pairs``: signatures on both
    sides, the eval side's banded signatures BROADCAST (eval is tiny next
    to a 100-TB corpus), candidates = band collisions, then exact Jaccard
    verification over the candidates' shingle sets only. The corpus is
    never self-joined and never shuffled against itself.

    Returns ``(train_id, eval_id, jaccard)`` for every pair the banding
    surfaces with exact Jaccard ≥ threshold.

    ``bands`` is the recall knob: more bands → fewer rows per band →
    higher collision probability at a given Jaccard (at k=12, a pair at
    s=0.44 collides with p≈0.30 under 4 bands of 3 rows but p≈0.73 under
    6 bands of 2). Decontamination wants recall — a missed contaminated
    doc silently poisons evals, while a surfaced candidate only costs one
    exact-Jaccard verification — so callers should band finer than the
    dedup default. Must divide MINHASH_K.
    """
    from tickdb_spark.operators.dedup import (
        LSH_BANDS,
        MINHASH_K,
        _hashed_shingles,
        _sigs_from_hashed,
    )

    k = MINHASH_K
    bands = LSH_BANDS if bands is None else bands
    if k % bands:
        raise ValueError(f"bands={bands} must divide MINHASH_K={k}")
    r = k // bands
    # r17: the train-side shingles are corpus-token-sized -> bounded
    # corpus_persist registry (lazy here: consumers are sequential, the
    # persist only needs to survive the signature + verify passes of one
    # action). The eval side is benchmark-sized — plain cache is fine.
    from tickdb_spark.cachereg import corpus_persist

    par = train.sparkSession.sparkContext.defaultParallelism
    t_sh = corpus_persist(
        _hashed_shingles(train.repartition(par), text_col, id_col),
        materialize=False,
    )
    e_sh = _hashed_shingles(eval_set, text_col, id_col).cache()

    def banded(sig: DataFrame) -> DataFrame:
        cols = [
            F.struct(
                F.lit(bi).alias("band_idx"),
                F.concat_ws(
                    "#", *[F.col(f"mh_{bi * r + j}") for j in range(r)]
                ).alias("band_sig"),
            )
            for bi in range(bands)
        ]
        return sig.select("id", F.explode(F.array(*cols)).alias("b")).select(
            "id",
            F.col("b.band_idx").alias("band_idx"),
            F.col("b.band_sig").alias("band_sig"),
        )

    t_band = banded(_sigs_from_hashed(t_sh, k)).withColumnRenamed("id", "train_id")
    e_band = banded(_sigs_from_hashed(e_sh, k)).withColumnRenamed("id", "eval_id")
    candidates = (
        t_band.join(F.broadcast(e_band), ["band_idx", "band_sig"])
        .select("train_id", "eval_id")
        .distinct()
    )
    sizes_t = t_sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_t"))
    sizes_e = e_sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_e"))
    shared = (
        candidates.join(t_sh.select(F.col("id").alias("train_id"), "shingle"), "train_id")
        .join(
            e_sh.select(F.col("id").alias("eval_id"), "shingle"),
            ["eval_id", "shingle"],
        )
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(sizes_t.select(F.col("id").alias("train_id"), "n_t"), "train_id")
        .join(sizes_e.select(F.col("id").alias("eval_id"), "n_e"), "eval_id")
        .withColumn(
            "jaccard",
            F.col("n_shared") / (F.col("n_t") + F.col("n_e") - F.col("n_shared")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("train_id", "eval_id", "jaccard")
    )


def neardup_contamination_sql(
    train_sql: str,
    eval_sql: str,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    bands: int | None = None,
) -> str:
    """DuckDB twin: replays the banding (not just the verification), so
    the emitted pair set matches the LSH exactly. ``bands`` mirrors the
    operator's recall knob and must match the Spark call."""
    from tickdb_spark.operators.dedup import (
        LSH_BANDS,
        MH_COEF,
        MINHASH_K,
        MINHASH_P,
        word_ngrams_sql,
    )

    k = MINHASH_K
    bands = LSH_BANDS if bands is None else bands
    if k % bands:
        raise ValueError(f"bands={bands} must divide MINHASH_K={k}")
    r = k // bands
    grams = word_ngrams_sql(text_col)

    def shingles(src: str) -> str:
        return (
            f"SELECT id, CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT)"
            f" AS shingle FROM (SELECT {id_col} AS id, unnest({grams}) AS shingle"
            f" FROM ({src}))"
        )

    mh_aggs = ", ".join(
        f"min(((shingle >> 16) * {a} + {b}) % {MINHASH_P}) AS mh_{i}"
        for i, (a, b) in enumerate(MH_COEF[:k])
    )

    def band_rows(sig: str) -> str:
        return " UNION ALL ".join(
            f"SELECT id, {bi} AS band_idx, "
            + " || '#' || ".join(f"mh_{bi * r + j}" for j in range(r))
            + f" AS band_sig FROM {sig}"
            for bi in range(bands)
        )

    return f"""
    WITH t_sh AS ({shingles(train_sql)}),
    e_sh AS ({shingles(eval_sql)}),
    t_sig AS (SELECT id, {mh_aggs} FROM t_sh GROUP BY id),
    e_sig AS (SELECT id, {mh_aggs} FROM e_sh GROUP BY id),
    t_band AS ({band_rows('t_sig')}),
    e_band AS ({band_rows('e_sig')}),
    candidates AS (
      SELECT DISTINCT t.id AS train_id, e.id AS eval_id
      FROM t_band t JOIN e_band e USING (band_idx, band_sig)
    ),
    t_sz AS (SELECT id, count(*) AS n_t FROM t_sh GROUP BY id),
    e_sz AS (SELECT id, count(*) AS n_e FROM e_sh GROUP BY id),
    shared AS (
      SELECT c.train_id, c.eval_id, count(*) AS n_shared
      FROM candidates c
      JOIN t_sh ON t_sh.id = c.train_id
      JOIN e_sh ON e_sh.id = c.eval_id AND e_sh.shingle = t_sh.shingle
      GROUP BY c.train_id, c.eval_id
    )
    SELECT s.train_id, s.eval_id,
           s.n_shared / (t_sz.n_t + e_sz.n_e - s.n_shared) AS jaccard
    FROM shared s
    JOIN t_sz ON t_sz.id = s.train_id
    JOIN e_sz ON e_sz.id = s.eval_id
    WHERE s.n_shared / (t_sz.n_t + e_sz.n_e - s.n_shared) >= {threshold}
    """
