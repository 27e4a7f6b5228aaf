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


# --- Benford first-digit distribution check ----------------------------------

#: floor(log10(1 + 1/d) * 10^6 + 0.5) for d = 1..9 — FIXED literals, so no
#: cross-engine log is ever evaluated (the float-discipline house rule).
BENFORD_PPM = (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757)


def _benford_case(digit_expr: str) -> str:
    whens = " ".join(
        f"WHEN {d} THEN {p}" for d, p in enumerate(BENFORD_PPM, start=1)
    )
    return f"CASE {digit_expr} {whens} END"


def benford_first_digit(
    df: DataFrame, value_col: str, group_cols: list[str], scale: int = 1000
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law, per group —
    the forensic DQ check for fabricated/truncated/unit-mixed numeric
    columns (Benford 1938; standard audit practice). NOT a conformance
    assertion: the output is the full digit distribution with exact
    integer deviations, and the READER decides (synthetic uniform data
    legitimately deviates; invoice amounts should not).

    Cross-engine-exact digit extraction with no log/pow: values are
    quantized to ``q = floor(v·scale + 0.5)`` (one IEEE multiply on
    doubles, BIGINT thereafter), non-positive q dropped, and the first
    significant digit read as the first character of the INTEGER's
    decimal string — identical on Spark and DuckDB by construction.
    Absent digits are emitted with count 0 through a 9-row spine per
    group, so the report shape is fixed: |groups| × 9 rows.

    One scan + one aggregate; the spine/joins run on aggregate-sized
    frames. Returns ``(group_cols..., digit, n_d, total, observed_ppm,
    benford_ppm, abs_dev_ppm)`` — all BIGINT."""
    spark = df.sparkSession
    base = df.select(
        *group_cols,
        F.expr(f"CAST(floor({value_col} * {int(scale)} + 0.5) AS BIGINT)").alias("q"),
    ).where(F.col("q") > 0)
    counts = (
        base.select(
            *group_cols,
            F.substring(F.col("q").cast("string"), 1, 1).cast("long").alias("digit"),
        )
        .groupBy(*group_cols, "digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_d"))
    )
    totals = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("total")
    )
    digits = spark.range(1, 10).select(F.col("id").cast("long").alias("digit"))
    spine = totals.crossJoin(F.broadcast(digits))
    benford = F.element_at(
        F.array(*[F.lit(p).cast("long") for p in BENFORD_PPM]),
        F.col("digit").cast("int"),
    )
    j = spine.join(counts, [*group_cols, "digit"], "left").withColumn(
        "n_d", F.coalesce(F.col("n_d"), F.lit(0)).cast("long")
    )
    obs = F.call_function("div", F.col("n_d") * F.lit(1_000_000), F.col("total"))
    return j.select(
        *group_cols,
        "digit",
        "n_d",
        "total",
        obs.cast("long").alias("observed_ppm"),
        benford.alias("benford_ppm"),
        F.abs(obs - benford).cast("long").alias("abs_dev_ppm"),
    )


def benford_first_digit_sql(
    rel: str, value_col: str, group_cols: list[str], scale: int = 1000
) -> str:
    """DuckDB twin of :func:`benford_first_digit`: same quantization,
    same string-head digit extraction, same spine and integer ppm."""
    g = ", ".join(group_cols)
    case = _benford_case("s.digit")
    return f"""
    WITH base AS MATERIALIZED (
      SELECT {g}, q FROM (
        SELECT {g}, CAST(floor({value_col} * {int(scale)} + 0.5) AS BIGINT) AS q
        FROM {rel}
      ) WHERE q > 0
    ),
    counts AS (
      SELECT {g}, CAST(substr(CAST(q AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             CAST(count(*) AS BIGINT) AS n_d
      FROM base GROUP BY ALL
    ),
    totals AS (
      SELECT {g}, CAST(count(*) AS BIGINT) AS total FROM base GROUP BY ALL
    ),
    spine AS (
      SELECT t.*, CAST(d.range AS BIGINT) AS digit
      FROM totals t, range(1, 10) d
    )
    SELECT {", ".join("s." + c for c in group_cols)}, s.digit,
           CAST(COALESCE(c.n_d, 0) AS BIGINT) AS n_d, s.total,
           CAST(COALESCE(c.n_d, 0) * 1000000 // s.total AS BIGINT) AS observed_ppm,
           CAST({case} AS BIGINT) AS benford_ppm,
           CAST(abs(COALESCE(c.n_d, 0) * 1000000 // s.total - {case}) AS BIGINT)
             AS abs_dev_ppm
    FROM spine s LEFT JOIN counts c
      ON {" AND ".join(f"c.{c} = s.{c}" for c in group_cols)} AND c.digit = s.digit
    """
