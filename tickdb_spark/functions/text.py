"""Text analysis for large-scale training-data pipelines: tokenization,
quality scoring, language ID, fingerprinting.

All pure built-in column expressions (whole-stage codegen, no Python in the
hot path — at 100 TB a row-at-a-time UDF here would dominate the job).
Each helper has a ``*_sql`` twin generating the equivalent DuckDB SQL from
the same parameters, keeping engine and oracle in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the heuristic language scorer.
#: Deterministic and dialect-neutral — real deployments would swap in
#: fastText/CLD3 via a Pandas UDF (see operators/multimodal.py for the
#: stub pattern).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "is", "in", "that"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une"],
    "es": ["el", "la", "de", "que", "y", "los", "las", "un"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein", "mit"],
}

TOKEN_SEP = r"\s+"


def tokens(col: Column) -> Column:
    """Whitespace tokenization → array<string>."""
    return F.split(F.trim(col), TOKEN_SEP)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token estimate: words + digit runs + punctuation marks,
    the standard cheap proxy for BPE token counts when no tokenizer model
    is shippable to executors."""
    words = F.size(F.split(F.trim(col), r"[^A-Za-z0-9]+"))
    puncts = F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return (words + puncts).cast("long")


def stopword_hits(col: Column, lang: str) -> Column:
    """Count of tokens (with multiplicity) found in the language's list."""
    stoplist = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(stoplist, t)))


def _langid_from_scores(scores: Column) -> Column:
    """Arg-max of a stopword-hit scores array (STOPWORDS key order):
    first-max wins ties, 'und' when nothing scores > 0."""
    langs = F.array(*[F.lit(lang) for lang in STOPWORDS])
    mx = F.array_max(scores)
    return F.when(
        mx > 0, F.element_at(langs, F.array_position(scores, mx).cast("int"))
    ).otherwise(F.lit("und"))


def langid_scores(col: Column) -> Column:
    """Per-language stopword hit counts as one array (STOPWORDS order)."""
    return F.array(*[stopword_hits(col, lang).cast("int") for lang in STOPWORDS])


def langid(col: Column) -> Column:
    """Heuristic language ID as a single column expression. Convenience
    form — the argmax references the scores array three times inside ONE
    projection, and Catalyst's subexpression elimination does not rescue
    it there, so the N tokenize+filter passes run ~3x per row. Hot paths
    should use :func:`with_langid`, which stages the scores array in its
    own projection (measured 1.7x faster than even the old CASE-chain
    form; see BASELINE.md r5)."""
    return _langid_from_scores(langid_scores(col))


def _scores_over_tokens(toks: Column) -> Column:
    """Per-language stopword hit counts over an already-tokenized array."""

    def hits(lang: str) -> Column:
        stoplist = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(stoplist, t)))

    return F.array(*[hits(lang).cast("int") for lang in STOPWORDS])


def with_langid(df, text_col: str = "text", out_col: str = "lang"):
    """Three-projection language ID: the token array materializes once
    (one regex split instead of N), the scores array materializes in its
    own projection (each is referenced multiple times downstream, so
    CollapseProject keeps the stages separate), then the argmax. The N
    per-language filter passes share the staged token array — measured
    ~1.5x faster than the two-projection form that re-tokenized per
    language, on top of the 1.7x the staging itself bought (BASELINE.md
    r5/r6)."""
    step = df.withColumn("_langid_toks", tokens(F.col(text_col)))
    step = step.withColumn(
        "_langid_scores", _scores_over_tokens(F.col("_langid_toks"))
    )
    return step.withColumn(
        out_col, _langid_from_scores(F.col("_langid_scores"))
    ).drop("_langid_toks", "_langid_scores")


def langid_sql(text_expr: str = "text") -> str:
    """DuckDB equivalent of :func:`langid` (same first-max tie order)."""
    toks = f"string_split_regex(trim({text_expr}), '{TOKEN_SEP}')"

    def hits(lang: str) -> str:
        lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        return f"len(list_filter({toks}, t -> list_contains([{lst}], t)))"

    scores = "[" + ", ".join(hits(lg) for lg in STOPWORDS) + "]"
    langs = "[" + ", ".join(f"'{lg}'" for lg in STOPWORDS) + "]"
    mx = f"list_aggregate({scores}, 'max')"
    return (
        f"CASE WHEN {mx} > 0 THEN {langs}[list_position({scores}, {mx})] "
        f"ELSE 'und' END"
    )


def quality_metrics(col: Column) -> dict[str, Column]:
    """Cheap quality signals: length, token stats, punctuation/alpha
    ratios, stopword ratio. Ratios are double divisions of identical
    integers on any engine → bit-stable."""
    n_chars = F.length(col).cast("long")
    n_tokens = token_count(col).cast("long")
    n_alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", "")).cast("long")
    n_punct = (
        F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    ).cast("long")
    en_stops = stopword_hits(col, "en").cast("long")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": n_alpha / n_chars,
        "punct_ratio": n_punct / n_chars,
        "avg_token_len": n_alpha / n_tokens,
        "stopword_ratio": en_stops / n_tokens,
    }


QUALITY_SQL = {
    "n_chars": "length(text)::BIGINT",
    "n_tokens": "len(string_split_regex(trim(text), '\\s+'))::BIGINT",
    "alpha_ratio": "length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE"
    " / length(text)",
    "punct_ratio": "(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE"
    " / length(text)",
    "avg_token_len": "length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE"
    " / len(string_split_regex(trim(text), '\\s+'))",
    "stopword_ratio": "len(list_filter(string_split_regex(trim(text), '\\s+'),"
    " t -> list_contains(['the','a','of','and','to','is','in','that'], t)))::DOUBLE"
    " / len(string_split_regex(trim(text), '\\s+'))",
}


def fingerprint_from_tokens(toks: Column, bits: int = 64) -> Column:
    """:func:`fingerprint` over an already-tokenized array — lets a hot
    path stage the token array once and share it across langid + both
    fingerprints (one regex split per row instead of four)."""
    return F.substring(F.md5(F.concat_ws(" ", toks)), 1, bits // 4)


def fingerprint(col: Column, bits: int = 64) -> Column:
    """Deterministic document fingerprint: md5 of the token-normalized text
    (whitespace collapsed), truncated to ``bits``/4 hex chars. Identical
    across engines — both sides md5 the same normalized string."""
    return fingerprint_from_tokens(tokens(col), bits)


def fingerprint_sql(text_expr: str = "text", bits: int = 64) -> str:
    return (
        f"substr(md5(array_to_string(string_split_regex(trim({text_expr}),"
        f" '{TOKEN_SEP}'), ' ')), 1, {bits // 4})"
    )


#: PII patterns — deliberately simple, lookaround-free regexes that parse
#: identically under Java regex (Spark) and RE2 (DuckDB). Real pipelines
#: extend the list; the plumbing (codegen scrub + per-doc counts) is what
#: matters at 100 TB.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "longnum": r"\b\d{9,}\b",
}
PII_ORDER = ("email", "ipv4", "longnum")  # scrub order matters (overlaps)


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-pattern match counts (regexp_extract_all → size), all codegen."""
    return {
        name: F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))).cast("long")
        for name, pat in PII_PATTERNS.items()
    }


def pii_scrub(col: Column) -> Column:
    """Replace each PII class with a typed placeholder, in fixed order so
    both engines transform identically (an email scrubbed first can't be
    half-eaten by the number pattern)."""
    out = col
    for name in PII_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[name], f"<{name.upper()}>")
    return out


def pii_counts_sql(text_expr: str = "text") -> dict[str, str]:
    return {
        name: f"len(regexp_extract_all({text_expr}, '{pat}'))::BIGINT"
        for name, pat in PII_PATTERNS.items()
    }


def pii_scrub_sql(text_expr: str = "text") -> str:
    out = text_expr
    for name in PII_ORDER:
        out = f"regexp_replace({out}, '{PII_PATTERNS[name]}', '<{name.upper()}>', 'g')"
    return out


ROLL_MOD = 1_000_000_007
ROLL_BASE = 31


def rolling_fingerprint_from_tokens(toks: Column) -> Column:
    """:func:`rolling_fingerprint` over an already-tokenized array."""
    hv = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")  # noqa: E731
    return F.aggregate(
        F.transform(toks, hv),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLL_BASE + x) % ROLL_MOD,
    )


def rolling_fingerprint(col: Column) -> Column:
    """Polynomial rolling-hash fingerprint over tokens:
    ``fp = fold(tokens, 0, (acc, t) -> (acc*B + h(t)) % M)`` with
    ``h(t)`` = first 32 bits of md5. Order-sensitive (unlike the md5
    set fingerprint) — permuted documents hash differently. Pure integer
    arithmetic, identical on any engine."""
    return rolling_fingerprint_from_tokens(tokens(col))


def rolling_fingerprint_sql(text_expr: str = "text") -> str:
    toks = f"string_split_regex(trim({text_expr}), '{TOKEN_SEP}')"
    hv = "CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT)"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform({toks}, t -> {hv})),"
        f" (acc, x) -> (acc * {ROLL_BASE} + x) % {ROLL_MOD})"
    )


# ---------------------------------------------------------------------------
# Sliding-window document chunking
# ---------------------------------------------------------------------------


def chunk_sliding(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> "DataFrame":
    """Split each document into overlapping token chunks — the context-
    window preparation step every LLM training pipeline runs before
    tokenization: window tokens per chunk, advancing by ``stride``
    (``window - stride`` tokens of overlap preserve cross-boundary
    context).

    One projection + posexplode, all codegen, no shuffle: chunk starts
    come from ``sequence(1, n, stride)``, the text from ``slice``; at
    100 TB this runs at scan speed and multiplies rows by ~n/stride.
    Returns ``(id, chunk_id, chunk_text, n_tokens)``.
    """
    from pyspark.sql import functions as FF

    toks = FF.split(FF.trim(FF.col(text_col)), r"\s+")
    base = df.select(
        FF.col(id_col),
        toks.alias("_toks"),
        FF.greatest(FF.size(toks), FF.lit(1)).alias("_n"),
    ).select(
        id_col,
        "_toks",
        "_n",
        FF.posexplode(
            FF.sequence(FF.lit(1), FF.col("_n"), FF.lit(stride))
        ).alias("chunk_id", "_s"),
    )
    return base.select(
        id_col,
        FF.col("chunk_id").cast("long").alias("chunk_id"),
        FF.concat_ws(" ", FF.slice("_toks", FF.col("_s"), window)).alias("chunk_text"),
        FF.least(FF.lit(window), FF.col("_n") - FF.col("_s") + 1)
        .cast("long")
        .alias("n_tokens"),
    )


def chunk_sliding_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> str:
    """DuckDB twin of :func:`chunk_sliding` (1-based inclusive slices;
    chunk_id recomputed from the start offset so UNNEST needs no
    ordinality)."""
    toks = f"string_split_regex(trim({text_col}), '{TOKEN_SEP}')"
    return f"""
    WITH d AS (
      SELECT {id_col}, {toks} AS toks,
             greatest(len({toks}), 1) AS n
      FROM {table}
    )
    SELECT {id_col}, CAST((s - 1) // {stride} AS BIGINT) AS chunk_id,
           array_to_string(list_slice(toks, s, s + {window} - 1), ' ')
             AS chunk_text,
           CAST(least({window}, n - s + 1) AS BIGINT) AS n_tokens
    FROM d, UNNEST(range(1, n + 1, {stride})) AS t(s)
    """
