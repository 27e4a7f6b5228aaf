"""Fuzzy string linkage (entity resolution / spelling-variant mining)
via SymSpell-style deletion-neighborhood blocking + exact edit-distance
verification (Garbe's SymSpell, public art; the blocking-key pattern of
classical record linkage).

Why it's an engine operator: the naive way to find "which dirty strings
match which canonical names within edit distance 1" is an all-pairs
cross join with a per-pair edit-distance UDF — O(|A|·|B|) distance
evaluations, unrunnable at crawl-vocabulary scale (10^7 tokens → 10^14
pairs). The SymSpell observation: two strings are within edit distance
1 **iff** their deletion neighborhoods intersect, where
``keys(s) = {s} ∪ {s with one char deleted}``:

- substitution at i → deleting position i from both sides gives the
  same string;
- insertion/deletion → the shorter string is literally a member of the
  longer one's deletion set (and of its own key set);
- equality → the identity key.

So candidate generation is an **equi-join on the key column** — each
string contributes len+1 keys, candidates are confined to shared-key
buckets, and the exact ``levenshtein`` (an integer, bit-identical on
any engine) runs only on candidates. No cross join can appear in the
plan.

Scale shape at 100 TB: the vocabulary/name table is the *aggregated*
side (zipf-bounded, tiny vs the corpus); keys multiply it by ~avg_len+1
(≈10×) before one hash-partitioned equi-join. Per-key bucket sizes are
bounded by how many strings share a deletion variant — a property of
the language, not the corpus size. The verify step is a codegen'd
integer expression, never a Python UDF.

Completeness note: deletion-neighborhood blocking is exact for
max_dist=1 (every edit-1 pair shares a key — the three cases above).
This module deliberately stops at distance 1; higher radii need
multi-deletion key sets (same join shape, more keys per string).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Upper bound used for the "rest of string" substring length. Both
#: engines clamp past-the-end substrings to the string tail.
_REST = 1_000_000


def deletion_keys() -> Column:
    """``{s} ∪ deletions1(s)`` as an array<string>, read from a staged
    ``_lk_s`` column (see :func:`_exploded_keys`). Pure codegen string
    ops: for i in 1..len(s), ``substring(s,1,i-1) || substring(s,i+1)``.
    ``array_union`` also dedupes (adjacent equal chars produce the same
    deletion), keeping candidate-pair multiplicity down before the
    post-join ``distinct``."""
    dels = F.expr(
        "transform(sequence(1, length(_lk_s)), i -> "
        f"concat(substring(_lk_s, 1, i-1), substring(_lk_s, i+1, {_REST})))"
    )
    return F.array_union(F.array(F.col("_lk_s")), dels)


def deletion_keys_sql(s: str) -> str:
    """DuckDB twin: identical per-position deletions, same dedupe."""
    return (
        f"list_distinct(list_prepend(({s}), "
        f"list_transform(range(1, length(({s})) + 1), "
        f"i -> substr(({s}), 1, i-1) || substr(({s}), i+1, {_REST}))))"
    )


def _exploded_keys(df: DataFrame, col: str, out: str) -> DataFrame:
    """One row per (original string, blocking key)."""
    staged = df.withColumn("_lk_s", F.col(col))
    return staged.select(*df.columns, F.explode(deletion_keys()).alias(out))


def fuzzy_link(
    dirty: DataFrame,
    clean: DataFrame,
    dirty_col: str,
    clean_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Link each ``dirty`` string to every ``clean`` string within
    ``max_dist`` (must be 1 — the radius the deletion neighborhood is
    exact for). Returns ``(dirty_col, clean_col, edit_dist)`` distinct
    pairs; callers rank/filter on top.

    Plan shape: explode keys on both sides → hash equi-join on the key
    → distinct candidate pairs → codegen ``levenshtein`` filter. The
    clean side is typically the small (vocabulary/dimension) side; Spark
    broadcasts it when below the threshold, and the join stays a
    hash-partitioned equi-join above it — never a nested loop.
    """
    if max_dist != 1:
        raise ValueError("deletion-neighborhood blocking is exact only for max_dist=1")
    d_keys = _exploded_keys(
        dirty.select(F.col(dirty_col)).distinct(), dirty_col, "_lk_key"
    )
    c_keys = _exploded_keys(
        clean.select(F.col(clean_col)).distinct(), clean_col, "_lk_key"
    )
    cand = (
        d_keys.join(c_keys, "_lk_key")
        .select(dirty_col, clean_col)
        .distinct()
    )
    return cand.where(
        F.levenshtein(F.col(dirty_col), F.col(clean_col)) <= max_dist
    ).select(
        F.col(dirty_col),
        F.col(clean_col),
        F.levenshtein(F.col(dirty_col), F.col(clean_col))
        .cast("long")
        .alias("edit_dist"),
    )


def fuzzy_link_sql(
    dirty_rel: str, clean_rel: str, dirty_col: str, clean_col: str, max_dist: int = 1
) -> str:
    """DuckDB replay of :func:`fuzzy_link` (same keys, same verify).
    ``dirty_rel`` / ``clean_rel`` are one-column relations (CTE names or
    subqueries) exposing ``dirty_col`` / ``clean_col``."""
    if max_dist != 1:
        raise ValueError("deletion-neighborhood blocking is exact only for max_dist=1")
    return f"""
    SELECT {dirty_col}, {clean_col},
           CAST(levenshtein({dirty_col}, {clean_col}) AS BIGINT) AS edit_dist
    FROM (
      SELECT DISTINCT d.{dirty_col}, c.{clean_col}
      FROM (SELECT {dirty_col},
                   unnest({deletion_keys_sql(dirty_col)}) AS _lk_key
            FROM (SELECT DISTINCT {dirty_col} FROM {dirty_rel})) d
      JOIN (SELECT {clean_col},
                   unnest({deletion_keys_sql(clean_col)}) AS _lk_key
            FROM (SELECT DISTINCT {clean_col} FROM {clean_rel})) c
        ON d._lk_key = c._lk_key
    )
    WHERE levenshtein({dirty_col}, {clean_col}) <= {max_dist}
    """


def weighted_link(
    dirty: DataFrame,
    clean: DataFrame,
    dirty_id: str,
    clean_id: str,
    dirty_name: str,
    clean_name: str,
    exact_fields: list[tuple[str, str, int, int]],
    w_name_exact: int = 40,
    w_name_fuzzy: int = 25,
    min_score: int | None = None,
) -> DataFrame:
    """Multi-field weighted record linkage — the Fellegi-Sunter (1969)
    decision shape on top of the SymSpell blocking: candidates come from
    the NAME field's deletion-neighborhood join (never all pairs), then
    each candidate record pair accumulates an integer match score —
    ``w_name_exact``/``w_name_fuzzy`` for edit-distance 0/1 names plus,
    per ``(dirty_col, clean_col, w_agree, w_disagree)`` in
    ``exact_fields``, the agree/disagree weight (NULL-safe equality:
    Spark ``eqNullSafe`` == DuckDB ``IS NOT DISTINCT FROM`` — two NULLs
    agree, one NULL disagrees, identically on both engines).

    Weights are CALLER-SUPPLIED integers (production estimates them as
    log-likelihood ratios via EM — that estimate is a float pipeline;
    the decision arithmetic here stays exact integer so the gate can
    hash it). Returns ``(dirty_id, clean_id, edit_dist, score)``; with
    ``min_score`` only pairs at or above the threshold survive.

    Scale shape: the heavy join runs on DISTINCT name strings (the
    deletion-key equi-join of :func:`fuzzy_link`); records join back to
    the matched name pairs by name — two hash joins on strings, field
    comparisons are codegen, no UDFs, no cross join anywhere."""
    name_links = fuzzy_link(
        dirty.select(F.col(dirty_name)),
        clean.select(F.col(clean_name)),
        dirty_name,
        clean_name,
    )
    pairs = dirty.join(name_links, dirty_name).join(clean, clean_name)
    score = F.when(
        F.col("edit_dist") == 0, F.lit(int(w_name_exact))
    ).otherwise(F.lit(int(w_name_fuzzy)))
    for dc, cc, wa, wd in exact_fields:
        score = score + F.when(
            F.col(dc).eqNullSafe(F.col(cc)), F.lit(int(wa))
        ).otherwise(F.lit(int(wd)))
    out = pairs.select(
        F.col(dirty_id),
        F.col(clean_id),
        F.col("edit_dist"),
        score.cast("long").alias("score"),
    )
    if min_score is not None:
        out = out.where(F.col("score") >= int(min_score))
    return out


def weighted_link_sql(
    dirty_rel: str,
    clean_rel: str,
    dirty_id: str,
    clean_id: str,
    dirty_name: str,
    clean_name: str,
    exact_fields: list[tuple[str, str, int, int]],
    w_name_exact: int = 40,
    w_name_fuzzy: int = 25,
    min_score: int | None = None,
) -> str:
    """DuckDB twin of :func:`weighted_link` — same blocking, same
    NULL-safe agreement semantics, same integer score text."""
    links = fuzzy_link_sql(
        f"(SELECT {dirty_name} FROM {dirty_rel})",
        f"(SELECT {clean_name} FROM {clean_rel})",
        dirty_name,
        clean_name,
    )
    terms = [
        f"CASE WHEN l.edit_dist = 0 THEN {int(w_name_exact)} "
        f"ELSE {int(w_name_fuzzy)} END"
    ]
    for dc, cc, wa, wd in exact_fields:
        terms.append(
            f"CASE WHEN d.{dc} IS NOT DISTINCT FROM c.{cc} "
            f"THEN {int(wa)} ELSE {int(wd)} END"
        )
    score = " + ".join(terms)
    where = f"WHERE ({score}) >= {int(min_score)}" if min_score is not None else ""
    return f"""
    SELECT d.{dirty_id}, c.{clean_id}, l.edit_dist,
           CAST({score} AS BIGINT) AS score
    FROM ({links}) l
    JOIN {dirty_rel} d ON d.{dirty_name} = l.{dirty_name}
    JOIN {clean_rel} c ON c.{clean_name} = l.{clean_name}
    {where}
    """
