"""Exact heavy hitters with shuffle-bounded candidate generation.

The 100-TB vocabulary problem: a plain ``GROUP BY token HAVING count >=
φ·n`` map-side-combines fine, but still shuffles every distinct
(partition, token) pair — at corpus scale the long Zipf tail IS the
shuffle (billions of singleton keys crossing the wire only to be
discarded by the HAVING). The classical fix is a two-phase plan:

  1. **Candidate generation** — each partition runs a Misra-Gries
     summary with capacity ``c``. Pigeonhole guarantee: any key with
     GLOBAL count > n/c exceeds n_p/c in at least one partition, and a
     key with partition count > n_p/c always survives that partition's
     summary — so the union of partition summaries is a SUPERSET of
     every global φ-heavy key whenever c ≥ 1/φ. Summary size is c keys
     per partition regardless of vocabulary size.
  2. **Exact verification** — broadcast the candidate set, semi-join the
     corpus (the Zipf tail never shuffles), exact-count the survivors,
     keep ``count ≥ ceil(φ·n)``.

Phase 2 is exact and phase 1 is a superset, so the result is IDENTICAL
to the naive global aggregate — which is exactly what the DuckDB oracle
runs (``heavy_hitters_sql``). The approximation only bounds the shuffle,
never the answer.

Misra-Gries here uses the batch-decrement form (vectorized over Arrow
batches, no per-row Python loop): merge a batch's value_counts into the
running summary; when the summary exceeds capacity, subtract the
(c+1)-th largest count from everything and drop non-positives. Each
decrement round subtracts the same δ from ≥ c+1 keys, so total
decrement mass per partition is ≤ n_p/c — the standard MG error bound,
hence the superset guarantee above.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(capacity: int, key: str):
    import pandas as pd

    def summarize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        acc = None
        n_p = 0
        for pdf in batches:
            n_p += len(pdf)
            counts = pdf[key].value_counts()
            acc = counts if acc is None else acc.add(counts, fill_value=0)
            if len(acc) > capacity:
                # batch decrement: subtract the (c+1)-th largest count
                # from every key, drop non-positive — ≥ c+1 keys share
                # each subtracted unit, preserving the MG error bound
                delta = acc.nlargest(capacity + 1).iloc[-1]
                acc = acc - delta
                acc = acc[acc > 0]
        # candidates (one row each) + ONE total row (key NULL, _pn = this
        # partition's exact row count) — the same scan serves candidate
        # generation AND the global n, so the corpus is read once here
        keys = (
            pd.Series(dtype="object")
            if acc is None or len(acc) == 0
            else pd.Series(acc.index.astype(str))
        )
        out = pd.DataFrame({key: keys, "_pn": pd.array([None] * len(keys), dtype="Int64")})
        total_row = pd.DataFrame({key: pd.array([None], dtype="object"), "_pn": pd.array([n_p], dtype="Int64")})
        yield pd.concat([out, total_row], ignore_index=True)

    return summarize


def _phi_rational(phi: float) -> tuple[int, int]:
    """φ as an exact small rational (num, den). The threshold test must
    be the INTEGER cross-multiply ``cnt·den ≥ n·num`` on both engines:
    ceil(double(φ)·n) disagrees with ceil(decimal(φ)·n) whenever n·φ
    lands exactly on an integer (double(0.002) > 1/500, so at n=500k
    Spark's ceil is one higher than DuckDB's and boundary keys drop on
    one side only)."""
    from fractions import Fraction

    fr = Fraction(phi).limit_denominator(1_000_000)
    return fr.numerator, fr.denominator


def heavy_hitters_exact(
    items: DataFrame,
    key_col: str,
    phi: float,
    capacity: int | None = None,
) -> DataFrame:
    """All keys with exact count ≥ φ·n over ``items`` (one row per
    occurrence), as ``(key_col, cnt)``. Identical to the global
    aggregate; the MG pass only confines the shuffle to candidates.
    φ is applied as an exact rational via integer cross-multiply
    (``cnt·den ≥ n·num``) so the result is corpus-size-independent and
    engine-independent — no float-ceil boundary drift.

    ``capacity`` defaults to ceil(2/φ) — the 2× margin keeps the
    superset guarantee comfortably clear of batch-decrement rounding.
    """
    num, den = _phi_rational(phi)
    c = capacity if capacity is not None else math.ceil(2.0 / phi)
    # ONE corpus pass yields candidates AND per-partition exact row
    # counts (r16 opt: `total` as a separate aggregate re-ran the whole
    # items subtree — tokenize+explode for the gate entry — as a third
    # scan). The summary is tiny (≤ capacity+1 rows per partition), so
    # the eager cache that lets its two consumers share it is free; lazy
    # caches don't dedupe the parallel broadcast builds (CLAUDE.md r13).
    summ = items.select(key_col).mapInPandas(
        _mg_partition(c, key_col), f"{key_col} string, _pn long"
    ).cache()
    summ.count()
    cands = summ.where(F.col(key_col).isNotNull()).select(key_col).distinct()
    total = summ.agg(F.coalesce(F.sum("_pn"), F.lit(0)).cast("long").alias("_n"))
    return (
        items.join(F.broadcast(cands), key_col)
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") * F.lit(den) >= F.col("_n") * F.lit(num))
        .select(key_col, "cnt")
    )


def heavy_hitters_sql(items_sql: str, key_col: str, phi: float) -> str:
    """DuckDB twin: the naive exact aggregate the two-phase plan equals
    (same integer cross-multiply threshold as the Spark side)."""
    num, den = _phi_rational(phi)
    return f"""
    WITH items AS ({items_sql}),
    n AS (SELECT count(*) AS _n FROM items)
    SELECT {key_col}, count(*) AS cnt
    FROM items, n
    GROUP BY {key_col}, _n
    HAVING count(*) * {den} >= _n * {num}
    """
