"""Deterministic sampling for training-data pipelines.

`df.sample()` is the wrong tool for corpus curation at 100 TB: it is
seed+partitioning dependent (recomputes differently after a repartition,
unreproducible across engines), and quota sampling ("N docs per
language") isn't expressible with it at all. Both operators here are
*pure functions of the data* — rerunnable, engine-independent (DuckDB
twins are exact), and stable under repartitioning/AQE.

* **hash_sample** — keep a row iff a multiplicative integer hash
  (Knuth 2^32 golden-ratio constant) of its id lands under the cut.
  A stateless filter: whole-stage codegen, no shuffle, pushes past
  column pruning; at 100 TB it's free relative to the scan.
* **stratified_sample** — exactly n rows per stratum, chosen by the
  same hash (then id as total tie-break). One shuffle on the stratum
  key + window top-n; per-stratum output is tiny so skewed strata cost
  scan time, not shuffle spill. (For huge n per stratum, switch to a
  two-phase approximate quantile cut on the hash — same determinism.)

The hash is NOT Spark's murmur `F.hash` — engine-specific hashes can't
be oracle-checked. (id * 2654435761) mod 2^32 on BIGINT arithmetic is
identical in any engine with 64-bit ints; ids up to ~7e9 stay inside
int64 before the mod.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KNUTH = 2654435761  # floor(2^32 / golden ratio), odd → bijective mod 2^32
MOD = 1 << 32


def id_hash(id_col: Column) -> Column:
    """Deterministic 32-bit mixing hash of an integer id (Fibonacci
    hashing): uniform enough for sampling, exactly reproducible in SQL."""
    return (id_col.cast("long") * F.lit(KNUTH)) % F.lit(MOD)


def id_hash_sql(id_expr: str) -> str:
    return f"(({id_expr}::BIGINT * {KNUTH}) % {MOD})"


def hash_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Deterministic ~`fraction` sample: keep rows whose id-hash falls in
    the first `fraction` of the 2^32 hash space. Pure filter — no
    shuffle, no state, reproducible on any engine/partitioning."""
    cut = int(fraction * MOD)
    return df.where(id_hash(F.col(id_col)) < F.lit(cut))


def hash_sample_sql(table: str, id_col: str, fraction: float) -> str:
    cut = int(fraction * MOD)
    return f"SELECT * FROM {table} WHERE {id_hash_sql(id_col)} < {cut}"


def stratified_sample(
    df: DataFrame, strata_col: str, id_col: str, n_per_stratum: int
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum — the "language/domain
    quota" primitive. Selection order is the id-hash (uniform within the
    stratum), tie-broken by id so the chosen set is total-order stable."""
    w = (
        Window.partitionBy(strata_col)
        .orderBy(id_hash(F.col(id_col)), F.col(id_col))
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def weighted_mixture_sample(
    df: DataFrame, strata_col: str, id_col: str, quotas: dict[str, int]
) -> DataFrame:
    """Dataset mixing: per-stratum quotas (``{"en": 40, "zh": 6, ...}``) —
    the "recompose the training mix by source/language weights" primitive.
    Strata absent from ``quotas`` contribute nothing; a stratum smaller
    than its quota is taken whole. Selection is the id-hash order (same
    determinism contract as :func:`stratified_sample`): the chosen set is
    a pure function of the data, stable under repartitioning and across
    engines."""
    w = (
        Window.partitionBy(strata_col)
        .orderBy(id_hash(F.col(id_col)), F.col(id_col))
    )
    quota = F.coalesce(
        *[
            F.when(F.col(strata_col) == F.lit(k), F.lit(int(v)))
            for k, v in quotas.items()
        ],
        F.lit(0),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= quota)
        .drop("_rn")
    )


def weighted_mixture_sample_sql(
    table: str, strata_col: str, id_col: str, quotas: dict[str, int]
) -> str:
    cases = " ".join(
        f"WHEN {strata_col} = '{k}' THEN {int(v)}" for k, v in quotas.items()
    )
    return f"""
    SELECT * EXCLUDE (_rn) FROM (
      SELECT *, row_number() OVER (
        PARTITION BY {strata_col}
        ORDER BY {id_hash_sql(id_col)}, {id_col}
      ) AS _rn FROM {table}
    ) WHERE _rn <= (CASE {cases} ELSE 0 END)
    """


def temperature_mixture_allocation(
    df: DataFrame, strata_col: str, budget: int, halvings: int = 1
) -> DataFrame:
    """Temperature-scaled mixture weights: stratum d gets sampling weight
    ∝ count_d^α with α = 2^-halvings — the standard multilingual/domain
    rebalancing (α=0.5 at halvings=1) that upweights low-resource strata
    relative to proportional sampling without flattening to uniform.

    Cross-engine float discipline: α is restricted to the 2^-t family so
    count^α is computed by REPEATED sqrt — IEEE-754 requires sqrt to be
    correctly rounded, so Spark (Math.sqrt intrinsic) and any libm agree
    bit-for-bit, unlike pow/exp/ln (last-ulp divergent, the reason DSIR
    dropped log-products). The exact-rounded double is then quantized
    once (floor(x·1e9 + 0.5) as BIGINT) and everything downstream — the
    weight normalization and the per-stratum allocation of ``budget``
    documents — is exact integer arithmetic (BIGINT sums + integer
    division), never a float sum whose value depends on partition order.

    Returns one row per stratum: ``(strata_col, n_docs, w_ppm, alloc)``
    where ``alloc = budget · q_d div Σq`` (floor allocation; the ≤
    |strata| leftover documents are deliberately unallocated — quota
    semantics elsewhere in this module treat budgets as floors).

    One hash aggregate over a pruned column — linear scan, no shuffle
    beyond the |strata|-row combine; at 100 TB the counts come free from
    catalog/partition stats."""
    scaled = F.col("n_docs").cast("double")
    for _ in range(int(halvings)):
        scaled = F.sqrt(scaled)
    per = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_docs"))
    q = per.withColumn(
        "q", F.floor(scaled * F.lit(1_000_000_000.0) + F.lit(0.5)).cast("long")
    )
    tot = F.sum("q").over(Window.partitionBy())  # |strata| rows: free
    return (
        q.withColumn("q_tot", tot)
        .select(
            strata_col,
            "n_docs",
            F.expr("(1000000 * q) div q_tot").cast("long").alias("w_ppm"),
            F.expr(f"({int(budget)} * q) div q_tot").cast("long").alias("alloc"),
        )
    )


def temperature_mixture_allocation_sql(
    table: str, strata_col: str, budget: int, halvings: int = 1
) -> str:
    scaled = "CAST(n_docs AS DOUBLE)"
    for _ in range(int(halvings)):
        scaled = f"sqrt({scaled})"
    return f"""
    WITH per AS (
      SELECT {strata_col}, CAST(count(*) AS BIGINT) AS n_docs
      FROM {table} GROUP BY {strata_col}
    ),
    qs AS (
      SELECT {strata_col}, n_docs,
             CAST(floor({scaled} * 1000000000.0 + 0.5) AS BIGINT) AS q
      FROM per
    )
    SELECT {strata_col}, n_docs,
           CAST((1000000 * q) // SUM(q) OVER () AS BIGINT) AS w_ppm,
           CAST(({int(budget)} * q) // SUM(q) OVER () AS BIGINT) AS alloc
    FROM qs
    """


def temperature_mixture_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    budget: int,
    halvings: int = 1,
) -> DataFrame:
    """Allocate-then-sample: collect the |strata|-row allocation (a
    deliberate driver action, same contract as ``planned_join``) and
    apply it as :func:`weighted_mixture_sample` quotas."""
    alloc = temperature_mixture_allocation(df, strata_col, budget, halvings)
    quotas = {r[strata_col]: int(r["alloc"]) for r in alloc.collect()}
    return weighted_mixture_sample(df, strata_col, id_col, quotas)


def stratified_sample_sql(
    table: str, strata_col: str, id_col: str, n_per_stratum: int
) -> str:
    return f"""
    SELECT * EXCLUDE (_rn) FROM (
      SELECT *, row_number() OVER (
        PARTITION BY {strata_col}
        ORDER BY {id_hash_sql(id_col)}, {id_col}
      ) AS _rn FROM {table}
    ) WHERE _rn <= {n_per_stratum}
    """


def split_expr(id_col: Column, splits: list[tuple[str, float]]) -> Column:
    """The split-assignment CASE as a pure expression over any integer
    column: the id-hash position in the 2^32 space picks the split by
    cumulative fraction."""
    h = id_hash(id_col)
    acc = 0.0
    cases = []
    for name, frac in splits[:-1]:
        acc += frac
        cases.append((int(acc * MOD), name))
    expr = F.lit(splits[-1][0])
    for cut, name in reversed(cases):  # innermost = last declared split
        expr = F.when(h < cut, name).otherwise(expr)
    return expr


def split_expr_sql(id_expr: str, splits: list[tuple[str, float]]) -> str:
    h = id_hash_sql(id_expr)
    acc = 0.0
    whens = []
    for name, frac in splits[:-1]:
        acc += frac
        whens.append(f"WHEN {h} < {int(acc * MOD)} THEN '{name}'")
    return "CASE " + " ".join(whens) + f" ELSE '{splits[-1][0]}' END"


def split_assign(
    df: DataFrame, id_col: str, splits: list[tuple[str, float]]
) -> DataFrame:
    """Deterministic train/val/test assignment: the id-hash position in
    the 2^32 space picks the split by cumulative fraction. A pure
    projection (no shuffle, no state) — membership is a function of the
    id alone, so it is stable across reruns, repartitions, engines, and
    incremental corpus growth (new docs never move old docs between
    splits — the property random splitting loses)."""
    return df.withColumn("split", split_expr(F.col(id_col), splits))


def split_assign_sql(table: str, id_col: str, splits: list[tuple[str, float]]) -> str:
    return f"SELECT *, {split_expr_sql(id_col, splits)} AS split FROM {table}"


def leakage_safe_split(
    docs: DataFrame,
    id_col: str,
    pairs: DataFrame,
    splits: list[tuple[str, float]],
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Group-aware train/val/test split: near-duplicate documents move
    as ONE unit. Plain :func:`split_assign` hashes the doc id, so two
    near-dups can land in train and test — eval contamination built
    into the split itself. Here every doc's split comes from the
    id-hash of its near-dup COMPONENT representative (min doc id in
    the connected component over ``pairs``; singletons represent
    themselves), so a whole duplicate cluster lands in one split.
    Membership stays deterministic and rerun-stable; incremental
    corpus growth only moves a doc if its cluster gains an older
    member (i.e. its representative changes).

    Scale shape: components run over the pair graph only (never the
    corpus); the split itself is a pure projection of the component id.
    Returns ``(id_col, component, split)``."""
    from tickdb_spark.operators.cluster import connected_components

    comp = connected_components(
        docs.select(id_col), pairs, id_col=id_col, src_col=src_col, dst_col=dst_col
    )
    return split_assign(
        comp.select(F.col("id").alias(id_col), "component"), "component", splits
    )


def leakage_safe_split_sql(
    pairs_sql: str,
    table: str,
    id_col: str,
    splits: list[tuple[str, float]],
) -> str:
    """DuckDB twin: recursive-CTE transitive closure → min-id component
    per node → the SAME split CASE applied to the component id."""
    comp = f"""(WITH RECURSIVE pairs AS MATERIALIZED ({pairs_sql}),
    edges AS MATERIALIZED (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT {id_col}::BIGINT, {id_col}::BIGINT FROM {table}
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS {id_col}, min(v) AS component FROM reach GROUP BY u)"""
    return split_assign_sql(comp, "component", splits)


def split_leakage_audit(
    docs: DataFrame,
    id_col: str,
    pairs: DataFrame,
    splits: list[tuple[str, float]],
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Measure eval contamination built into a split: of the near-dup
    pairs, how many straddle a split boundary under (a) plain per-id
    hashing and (b) the component-representative split? One row per
    method: ``(method, total_pairs, cross_pairs, leak_ppm)``.

    The audit is the "should I re-split?" diagnostic a pipeline runs
    BEFORE training: plain id-hash splits leak near-dups into eval at a
    rate ≈ 2·p·(1−p) per pair (two independent hash draws), while the
    group-aware split is zero BY CONSTRUCTION — the safe row doubles as
    a machine-checked invariant of :func:`leakage_safe_split`.

    Scale shape: the plain row needs NO join at all — the split is a
    pure function of the id, so both endpoints' splits are inline CASE
    projections of the pair row itself. The safe row joins pairs to the
    component map twice (hash joins on the pair graph, never the
    corpus). Both rows are single aggregates."""
    from tickdb_spark.operators.cluster import connected_components

    # the pair frame is usually an EXPENSIVE detector (ngram Jaccard,
    # LSH) and this plan references it three times (plain agg, safe
    # join, the CC edge build) — truncate lineage so it runs once
    # (the triangle-counting lesson; 4.3 s -> ~1.5 s at sf0.1)
    pairs = pairs.localCheckpoint(eager=False)
    sa = split_expr(F.col(src_col), splits)
    sb = split_expr(F.col(dst_col), splits)
    plain = pairs.agg(
        F.lit("plain").alias("method"),
        F.count(F.lit(1)).cast("long").alias("total_pairs"),
        F.count(F.when(sa != sb, 1)).cast("long").alias("cross_pairs"),
    )
    comp = connected_components(
        docs.select(id_col), pairs, id_col=id_col, src_col=src_col, dst_col=dst_col
    ).select(F.col("id"), F.col("component"))
    ca = comp.select(
        F.col("id").alias(src_col), F.col("component").alias("_comp_a")
    )
    cb = comp.select(
        F.col("id").alias(dst_col), F.col("component").alias("_comp_b")
    )
    sca = split_expr(F.col("_comp_a"), splits)
    scb = split_expr(F.col("_comp_b"), splits)
    safe = (
        pairs.join(ca, src_col)
        .join(cb, dst_col)
        .agg(
            F.lit("safe").alias("method"),
            F.count(F.lit(1)).cast("long").alias("total_pairs"),
            F.count(F.when(sca != scb, 1)).cast("long").alias("cross_pairs"),
        )
    )
    return (
        plain.unionAll(safe)
        .withColumn(
            "leak_ppm",
            F.expr(
                "CASE WHEN total_pairs = 0 THEN CAST(0 AS BIGINT) "
                "ELSE (1000000 * cross_pairs) div total_pairs END"
            ).cast("long"),
        )
    )


def split_leakage_audit_sql(
    pairs_sql: str,
    table: str,
    id_col: str,
    splits: list[tuple[str, float]],
) -> str:
    """DuckDB twin: same pair set (MATERIALIZED — referenced by both
    method rows AND the recursive closure), same split CASEs, same
    integer leak rate."""
    sa = split_expr_sql("id_a", splits)
    sb = split_expr_sql("id_b", splits)
    sca = split_expr_sql("_comp_a", splits)
    scb = split_expr_sql("_comp_b", splits)
    return f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({pairs_sql}),
    edges AS MATERIALIZED (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT {id_col}::BIGINT, {id_col}::BIGINT FROM {table}
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS MATERIALIZED (
      SELECT u AS id, min(v) AS component FROM reach GROUP BY u
    ),
    both_rows AS (
      SELECT 'plain' AS method,
             CAST(count(*) AS BIGINT) AS total_pairs,
             CAST(count(*) FILTER ({sa} <> {sb}) AS BIGINT) AS cross_pairs
      FROM pairs
      UNION ALL
      SELECT 'safe',
             CAST(count(*) AS BIGINT),
             CAST(count(*) FILTER ({sca} <> {scb}) AS BIGINT)
      FROM (
        SELECT p.id_a, p.id_b, a.component AS _comp_a, b.component AS _comp_b
        FROM pairs p
        JOIN comp a ON p.id_a = a.id
        JOIN comp b ON p.id_b = b.id
      )
    )
    SELECT method, total_pairs, cross_pairs,
           CASE WHEN total_pairs = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST((1000000 * cross_pairs) // total_pairs AS BIGINT)
           END AS leak_ppm
    FROM both_rows
    """


def token_budget_sample(
    df: DataFrame, strata_col: str, id_col: str, token_col: str, budget: int
) -> DataFrame:
    """Token-budget mixing: from each stratum (source/domain/language),
    take documents in id-hash order until the stratum's cumulative token
    count reaches ``budget`` — how production mixes are actually specified
    ("20B tokens of web, 5B of code"), since document counts don't control
    what the model sees. The first document that *crosses* the budget is
    kept (budgets are floors, matching quota semantics elsewhere: a
    stratum smaller than its budget is taken whole).

    One window per stratum (``partitionBy`` — scales with stratum count,
    never a global sort) over integer token counts: the running sum is
    exact, deterministic under repartitioning, identical on any engine.
    """
    w = (
        Window.partitionBy(strata_col)
        .orderBy(id_hash(F.col(id_col)), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # NULL token counts contribute 0 on BOTH engines (ADVICE r6: a bare
    # `cum - token` is NULL for a NULL-token row — the row would be
    # silently dropped here while the SQL twin's 1-PRECEDING frame keeps
    # it).
    tok = F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    cum = F.sum(tok).over(w)
    prev = cum - tok
    return df.withColumn("_prev", prev).where(F.col("_prev") < budget).drop("_prev")


def token_budget_sample_sql(
    table: str, strata_col: str, id_col: str, token_col: str, budget: int
) -> str:
    return f"""
    SELECT * EXCLUDE (_prev) FROM (
      SELECT *, CAST(COALESCE(sum({token_col}) OVER (
        PARTITION BY {strata_col}
        ORDER BY {id_hash_sql(id_col)}, {id_col}
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      ), 0) AS BIGINT) AS _prev FROM {table}
    ) WHERE _prev < {int(budget)}
    """


def reservoir_per_key(
    df: DataFrame, key_col: str, id_col: str, k: int
) -> DataFrame:
    """Deterministic uniform-k-per-key sample ("reservoir" semantics
    without the sequential reservoir): the k rows whose id-hash ranks
    lowest within each key. The multiplicative hash is a uniform random
    order that is a pure function of the id, so the selected set is the
    same on any engine, partitioning, or arrival order — the property a
    true streaming reservoir can't give you — while staying one
    key-partitioned window over the data, no global state.

    Ties on the 32-bit hash break on the id itself, so the output is a
    deterministic set even under hash collisions."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        id_hash(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= k)
    )


def reservoir_per_key_sql(table: str, key_col: str, id_col: str, k: int) -> str:
    return f"""
    SELECT * FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY {key_col}
        ORDER BY {id_hash_sql(id_col)}, {id_col}
      ) AS BIGINT) AS sample_rank FROM {table}
    ) WHERE sample_rank <= {int(k)}
    """


def global_shuffle_index(
    df: DataFrame, id_col: str, n_buckets: int = 32
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    contiguous 1-based ``global_idx`` in multiplicative-hash order of its
    id — the "shuffle the corpus before training" step, reproducible on
    any engine/partitioning because the permutation is a pure function
    of the ids.

    The scale pattern is the point: a global ``row_number`` would be one
    partition-less window over the corpus. Instead the hash space is cut
    into ``n_buckets`` RANGES (so global order = (bucket, within-bucket
    order)), and the index is assembled from (1) per-bucket counts — a
    tiny directory, (2) a prefix-sum window over that directory (bounded
    by ``n_buckets``, never by data), broadcast back, and (3) a
    bucket-partitioned ``row_number`` plus the bucket's offset. Shuffle
    volume: the data once on bucket, plus ``n_buckets`` directory rows.
    """
    bucket_width = MOD // n_buckets
    h = id_hash(F.col(id_col))
    src = df.withColumn("_h", h).withColumn(
        "_bkt",
        F.least(F.expr(f"_h div {bucket_width}"), F.lit(n_buckets - 1)).cast("long"),
    )
    counts = src.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    dir_w = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_bkt", F.coalesce(F.sum("_cnt").over(dir_w), F.lit(0)).alias("_off")
    )
    data_w = Window.partitionBy("_bkt").orderBy("_h", id_col)
    return (
        src.withColumn("_rn", F.row_number().over(data_w).cast("long"))
        .join(F.broadcast(offsets), "_bkt")
        .withColumn("global_idx", F.col("_off") + F.col("_rn"))
        .drop("_h", "_bkt", "_rn", "_off")
    )


def global_shuffle_index_sql(table: str, id_col: str) -> str:
    """DuckDB twin of :func:`global_shuffle_index` — the permutation is
    hash order, so the twin is simply a global ROW_NUMBER over it (the
    bucket decomposition is an execution detail, not a semantic)."""
    return f"""
    SELECT *, CAST(ROW_NUMBER() OVER (
      ORDER BY {id_hash_sql(id_col)}, {id_col}
    ) AS BIGINT) AS global_idx FROM {table}
    """
