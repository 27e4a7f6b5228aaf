"""Data-quality expectation checks (the Deequ / dbt-test / Great
Expectations family, public art): declarative constraints — not-null,
range, accepted values, uniqueness, referential integrity — evaluated
as exact integer violation counts with a pass/fail verdict per check.

Why it's an engine operator: at 100 TB the naive "one query per
expectation" pattern costs one corpus scan per check; the right shape
fuses every row-level check on a table into ONE conditional aggregate
(a single scan regardless of how many checks ride it — Deequ's core
trick), keeps uniqueness in the same aggregate (count vs count
distinct), and expresses referential integrity as a broadcast/shuffled
anti-join count (never a correlated subquery per row). The report is a
handful of rows; every number is an exact BIGINT, so the gate can
hash-check the whole report cross-engine.

Output schema (one row per check)::

    (table_name, check_name, violations, total, passed, violation_ppm)

``passed`` is BIGINT 0/1; ``violation_ppm`` is exact integer ppm
(``violations·10^6 div total`` — non-negative, Spark div == DuckDB //).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """A row-level expectation: ``flag`` is 1 when the row VIOLATES."""

    name: str
    flag: Column


def not_null(name: str, col: str) -> Check:
    return Check(name, F.when(F.col(col).isNull(), F.lit(1)).otherwise(F.lit(0)))


def in_range(name: str, col: str, lo, hi) -> Check:
    ok = F.col(col).isNotNull() & (F.col(col) >= lo) & (F.col(col) <= hi)
    return Check(name, F.when(ok, F.lit(0)).otherwise(F.lit(1)))


def accepted_values(name: str, col: str, values: tuple) -> Check:
    ok = F.col(col).isin(*values)
    return Check(name, F.when(ok, F.lit(0)).otherwise(F.lit(1)))


def _report_cols(table: str):
    ppm = F.call_function(
        "div", F.col("violations") * F.lit(1_000_000), F.col("total")
    )
    return [
        F.lit(table).alias("table_name"),
        F.col("check_name"),
        F.col("violations"),
        F.col("total"),
        F.when(F.col("violations") == 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("passed"),
        ppm.cast("long").alias("violation_ppm"),
    ]


def run_checks(
    df: DataFrame,
    table: str,
    checks: list[Check],
    uniques: list[tuple[str, list[str]]] | None = None,
) -> DataFrame:
    """Evaluate every check on ``df`` in ONE fused aggregate scan.

    ``uniques`` entries are ``(check_name, [cols])`` uniqueness
    expectations — violations = total − distinct key count, computed in
    the SAME aggregate. Semantics are PK-style: ``count_distinct``
    skips tuples with any NULL argument, so every NULL-keyed row counts
    as a violation (a unique key must also be non-null); the SQL twin
    matches this explicitly. The unpivot to report rows happens on the
    single aggregate row, never on data."""
    uniques = uniques or []
    aggs = [F.count(F.lit(1)).cast("long").alias("_total")]
    for c in checks:
        aggs.append(F.sum(c.flag).cast("long").alias(f"_v_{c.name}"))
    for name, cols in uniques:
        aggs.append(
            (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]))
            .cast("long")
            .alias(f"_v_{name}")
        )
    one = df.agg(*aggs)
    names = [c.name for c in checks] + [name for name, _ in uniques]
    stacked = one.select(
        F.expr(
            "stack("
            + str(len(names))
            + ", "
            + ", ".join(f"'{n}', _v_{n}" for n in names)
            + ") AS (check_name, violations)"
        ),
        F.col("_total").alias("total"),
    )
    return stacked.select(*_report_cols(table))


def ri_check(
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
    table: str,
    check_name: str,
) -> DataFrame:
    """Referential integrity as an anti-join count: child rows whose
    ``fk`` has no match in ``parent.pk`` (NULL fks violate, matching
    SQL NOT EXISTS semantics is NOT wanted here — an fk that is null
    points nowhere and is counted). The parent side deduplicates to its
    key set; Spark broadcasts it when small, shuffles otherwise."""
    orphans = child.join(
        parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
    )
    # The crossJoin (plans as a nested-loop join) pairs two SINGLE-ROW
    # aggregate frames — 1×1 at any corpus size; the data-sized work is
    # the anti-join above and the count scans.
    one = child.agg(F.count(F.lit(1)).cast("long").alias("total")).crossJoin(
        orphans.agg(F.count(F.lit(1)).cast("long").alias("violations"))
    )
    return one.select(
        F.lit(check_name).alias("check_name"), "violations", "total"
    ).select(*_report_cols(table))


# --- SQL twins ---------------------------------------------------------------


def run_checks_sql(
    rel: str,
    table: str,
    checks: list[tuple[str, str]],
    uniques: list[tuple[str, list[str]]] | None = None,
) -> str:
    """DuckDB twin of :func:`run_checks`. ``checks`` are
    ``(name, flag_sql)`` with flag_sql evaluating to 1 on violation.
    The single-row aggregate is MATERIALIZED (it is referenced once per
    check row in the unpivot)."""
    uniques = uniques or []
    aggs = ["CAST(count(*) AS BIGINT) AS _total"]
    for name, flag in checks:
        aggs.append(f"CAST(SUM({flag}) AS BIGINT) AS _v_{name}")
    for name, cols in uniques:
        tup = ", ".join(cols)
        notnull = " AND ".join(f"{c} IS NOT NULL" for c in cols)
        # NULL-keyed rows: Spark's count_distinct skips tuples with ANY
        # NULL argument, while DuckDB's count(DISTINCT (a, b)) counts
        # tuples CONTAINING NULL fields — the CASE makes DuckDB skip them
        # identically, so both engines implement PK-style uniqueness
        # (every NULL-keyed row is a violation). See run_checks.
        aggs.append(
            f"CAST(count(*) - count(DISTINCT CASE WHEN {notnull} "
            f"THEN ({tup}) END) AS BIGINT) AS _v_{name}"
        )
    names = [n for n, _ in checks] + [n for n, _ in uniques]
    rows = "\n      UNION ALL\n      ".join(
        f"SELECT '{n}' AS check_name, _v_{n} AS violations, _total AS total FROM agg"
        for n in names
    )
    return f"""
    WITH agg AS MATERIALIZED (
      SELECT {", ".join(aggs)} FROM {rel}
    ),
    unp AS (
      {rows}
    )
    SELECT '{table}' AS table_name, check_name, violations, total,
           CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed,
           CAST(violations * 1000000 // total AS BIGINT) AS violation_ppm
    FROM unp
    """


def ri_check_sql(
    child_rel: str, fk: str, parent_rel: str, pk: str, table: str, check_name: str
) -> str:
    """DuckDB twin of :func:`ri_check` (anti-join semantics: NULL or
    unmatched fk both violate)."""
    return f"""
    SELECT '{table}' AS table_name, '{check_name}' AS check_name,
           v.violations, t.total,
           CAST(CASE WHEN v.violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed,
           CAST(v.violations * 1000000 // t.total AS BIGINT) AS violation_ppm
    FROM (SELECT CAST(count(*) AS BIGINT) AS violations
          FROM {child_rel} c ANTI JOIN
               (SELECT DISTINCT {pk} AS _pk FROM {parent_rel}) p
            ON c.{fk} = p._pk) v,
         (SELECT CAST(count(*) AS BIGINT) AS total FROM {child_rel}) t
    """
