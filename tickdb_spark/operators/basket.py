"""Market-basket association rules (Agrawal-Srikant support/confidence
plus lift — public art since 1993): co-occurrence of items within a
basket, scored by exact integer ratios.

Engine shape: baskets are (basket-key, item) DISTINCT pairs; item
supports are one hash aggregate; pair supports come from the basket
self-join on the basket key with ``item_a < item_b`` — join volume is
Σ_b |b|² over basket SIZES (bounded by the item vocabulary, never the
corpus), the same volume any Apriori candidate pass costs at k=2. At
100 TB the basket key is the shuffle key; a hot basket is impossible by
construction when |items| is small (event types, product categories) —
a basket holds at most |vocabulary| rows after the distinct.

All emitted metrics are integer-exact (the house float discipline):
``support_ppm = n_xy·10⁶ div N``, directional confidences
``n_xy·10⁶ div n_x``, and ``lift_ppm = ((n_xy·10⁶ div n_x)·N) div
n_y`` — a two-stage floor division whose rounding convention is fixed
(floor after the x-confidence, then floor again). The staged form
exists for overflow headroom: the inner quotient is ≤ 10⁶ (n_xy ≤
n_x), so the largest intermediate is 10⁶·N — safe in BIGINT to ~9.2
trillion baskets, where the naive triple product ``n_xy·N·10⁶``
overflows at a few million (Spark would wrap silently, DuckDB error —
r13 ADVICE). Denominators are ≥ 1 by construction (x and y each occur
in at least the pair's baskets), so no zero guards are needed.

Reference scope note: vimrus/tickdb has no analytics operators at all
(single-table time-tree scans, main.go:24-37); this module is extension
surface for the LLM/warehouse pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_cols: list[str],
    item_col: str,
) -> DataFrame:
    """Unordered item-pair rules over DISTINCT (basket, item) pairs.

    Returns one row per unordered co-occurring pair ``(item_x <
    item_y)``: ``(item_x, item_y, n_xy, n_x, n_y, n_baskets,
    support_ppm, conf_x_to_y_ppm, conf_y_to_x_ppm, lift_ppm)``."""
    baskets = df.select(
        *[F.col(c) for c in basket_cols], F.col(item_col).alias("item")
    ).distinct()
    n_baskets = baskets.select(*basket_cols).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_baskets")
    )
    items = baskets.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("n_item")
    )
    a = baskets.select(*basket_cols, F.col("item").alias("item_x"))
    b = baskets.select(*basket_cols, F.col("item").alias("item_y"))
    pairs = (
        a.join(b, basket_cols)
        .where(F.col("item_x") < F.col("item_y"))
        .groupBy("item_x", "item_y")
        .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
    )
    j = (
        pairs.join(
            F.broadcast(items.select(F.col("item").alias("item_x"),
                                     F.col("n_item").alias("n_x"))),
            "item_x",
        )
        .join(
            F.broadcast(items.select(F.col("item").alias("item_y"),
                                     F.col("n_item").alias("n_y"))),
            "item_y",
        )
        .crossJoin(F.broadcast(n_baskets))  # single-row frame
    )
    div = lambda num, den: F.call_function("div", num, den)  # noqa: E731
    return j.select(
        "item_x",
        "item_y",
        "n_xy",
        "n_x",
        "n_y",
        "n_baskets",
        div(F.col("n_xy") * F.lit(1_000_000), F.col("n_baskets"))
        .cast("long")
        .alias("support_ppm"),
        div(F.col("n_xy") * F.lit(1_000_000), F.col("n_x"))
        .cast("long")
        .alias("conf_x_to_y_ppm"),
        div(F.col("n_xy") * F.lit(1_000_000), F.col("n_y"))
        .cast("long")
        .alias("conf_y_to_x_ppm"),
        div(
            div(F.col("n_xy") * F.lit(1_000_000), F.col("n_x"))
            * F.col("n_baskets"),
            F.col("n_y"),
        )
        .cast("long")
        .alias("lift_ppm"),
    )


def association_rules_sql(
    rel: str, basket_exprs: list[tuple[str, str]], item_expr: str
) -> str:
    """DuckDB twin of :func:`association_rules` — same distinct basket
    pairs, same integer ppm expressions. ``basket_exprs`` are
    ``(sql_expr, alias)`` pairs (the alias is the self-join key)."""
    bk = ", ".join(f"{e} AS {a}" for e, a in basket_exprs)
    names = [a for _, a in basket_exprs]
    return f"""
    WITH baskets AS MATERIALIZED (
      SELECT DISTINCT {bk}, {item_expr} AS item FROM {rel}
    ),
    nb AS (
      SELECT CAST(count(*) AS BIGINT) AS n_baskets
      FROM (SELECT DISTINCT {", ".join(names)} FROM baskets)
    ),
    items AS MATERIALIZED (
      SELECT item, CAST(count(*) AS BIGINT) AS n_item
      FROM baskets GROUP BY item
    ),
    pairs AS (
      SELECT a.item AS item_x, b.item AS item_y, CAST(count(*) AS BIGINT) AS n_xy
      FROM baskets a JOIN baskets b
        ON {" AND ".join(f"a.{n} = b.{n}" for n in names)}
       AND a.item < b.item
      GROUP BY a.item, b.item
    )
    SELECT item_x, item_y, n_xy,
           ix.n_item AS n_x, iy.n_item AS n_y, nb.n_baskets,
           CAST(n_xy * 1000000 // nb.n_baskets AS BIGINT) AS support_ppm,
           CAST(n_xy * 1000000 // ix.n_item AS BIGINT) AS conf_x_to_y_ppm,
           CAST(n_xy * 1000000 // iy.n_item AS BIGINT) AS conf_y_to_x_ppm,
           CAST(((n_xy * 1000000 // ix.n_item) * nb.n_baskets) // iy.n_item
                AS BIGINT) AS lift_ppm
    FROM pairs
    JOIN items ix ON ix.item = pairs.item_x
    JOIN items iy ON iy.item = pairs.item_y
    CROSS JOIN nb
    """
