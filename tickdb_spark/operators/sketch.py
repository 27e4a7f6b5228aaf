"""HyperLogLog distinct-count sketch with a DETERMINISTIC, oracle-
checkable estimate (Flajolet et al. 2007 — public algorithm).

Spark's ``approx_count_distinct`` is a black-box HLL++: correct, but its
registers and estimate are engine-internal, so the gate can only check
it rows-only. This module builds the sketch from PORTABLE primitives —
the md5-prefix integer hash the dedup family already shares with DuckDB
— so the registers AND the estimate replay bit-identically:

* h = 60-bit md5-prefix int (``conv(substr(md5(x),1,15),16,10)``);
  bucket = top ``p`` bits, w = low ``60-p`` bits;
* ρ(w) = leading-zero count + 1, computed EXACTLY via the binary-string
  length both engines agree on (``length(bin(w))`` — no log2 anywhere);
* the harmonic denominator Σ 2^{-ρ_j} is kept EXACT by scaling: each
  term 2^{W-ρ} is a BIGINT — ρ is CLAMPED to ≤ W (the all-zero-word
  case, probability ~2^-50/value, registers W instead of W+1, since a
  2^{-1} term would not be an integer after scaling and shiftleft(1,-1)
  wraps on the JVM / raises on DuckDB), so with m ≤ 2^14 the sum fits
  int64 with headroom, summed order-independently;
* the estimate α_m·m²/Σ2^{-ρ} becomes ``α_m · m² · 2^W / S`` — ONE IEEE
  division of exactly-representable values, bit-identical cross-engine.

This is the RAW HLL estimator (no small/large-range corrections: the
linear-counting branch needs ``ln``, which differs in the last ulp
between libms — the one part that cannot be hash-checked; callers
needing corrected estimates apply them to the returned registers).
Typical raw-HLL relative error ~1.04/√m (±3.2% at m=1024) — asserted
against the exact count in tests.

Scale shape: ONE hash aggregate to (group, bucket) registers (max is
map-side combinable and mergeable — the registers ARE the mergeable
sketch state), one m-row-per-group aggregate for the estimate. The
register table is ``groups × m`` small ints regardless of cardinality —
the whole point at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: md5-prefix hash width (the dedup family's shared 60-bit portable hash)
_HASH_BITS = 60


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def _hll_bucket_rho(value_col: str, p: int):
    """``(bucket, rho)`` expressions of the house portable HLL hash.

    rho = leading zeros of the w-bit word + 1
        = w_bits - len(bin(w)) + 1 for w >= 1; the w == 0 case is
    CLAMPED to w_bits (true HLL says w_bits+1, but then the scaled sum's
    2^{W-rho} term would be 1/2 — Spark shiftleft(1, -1) silently wraps
    to Long.MIN_VALUE and DuckDB raises; probability ~2^-50 per value,
    estimate impact far below raw-HLL error). Clamped identically in
    hll_estimate_sql. bin() gives minimal binary digits on both
    engines — integer-exact."""
    w_bits = _HASH_BITS - p
    h = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    bucket = F.shiftright(h, w_bits)
    w = h % F.lit(1 << w_bits)
    rho = F.when(w == 0, F.lit(w_bits)).otherwise(
        F.lit(w_bits) - F.length(F.bin(w)) + 1
    )
    return bucket, rho


def hll_hit_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 10,
) -> DataFrame:
    """Per-group SPARSE HLL registers: ``(group_cols..., bucket,
    register)`` with rows only for HIT buckets (register ≥ 1; absent
    buckets are implicitly 0). This is the storage-efficient mergeable
    state for a register LOG (the group-by MV face's distinct-count
    states): max-merge on (group, bucket) with implicit zeros, estimate
    via :func:`hll_estimate_from_sparse`. NULL values are skipped (they
    hash to NULL) — a group with no non-null values has NO rows here,
    so its estimate is absent rather than the all-zero sketch's α·m
    floor (:func:`hll_registers` keeps such groups for twin-parity with
    ``hll_estimate_sql``'s hashed-stream group derivation)."""
    bucket, rho = _hll_bucket_rho(value_col, p)
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, bucket.alias("bucket"), rho.alias("_rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_rho").cast("long").alias("register"))
    )


def hll_estimate_from_sparse(
    regs: DataFrame,
    group_cols: list[str],
    p: int = 10,
) -> DataFrame:
    """Estimate from a SPARSE register table (hit buckets only — the
    :func:`hll_hit_registers` shape): the never-hit buckets contribute
    ``2^W`` each to the scaled sum, so ``sum_scaled = Σ_hit 2^{W−ρ} +
    (m − n_hit)·2^W`` — BIT-IDENTICAL to the dense
    :func:`hll_estimate_from_registers` sum (each dense zero register
    is exactly one ``2^W`` term), all in exact BIGINTs before the one
    division."""
    m = 1 << p
    w_bits = _HASH_BITS - p
    s = (
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {w_bits} - register)"))
        + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << w_bits)
    ).cast("long").alias("hll_sum_scaled")
    num = float(_alpha(m)) * float(m) * float(m) * float(2**w_bits)
    return regs.groupBy(*group_cols).agg(s).select(
        *group_cols,
        "hll_sum_scaled",
        (F.lit(num) / F.col("hll_sum_scaled").cast("double")).alias(
            "hll_estimate"
        ),
    )


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 10,
) -> DataFrame:
    """Per-group HLL registers: ``(group_cols..., bucket, register)``,
    dense over [0, 2^p) with 0 for never-hit buckets. The register table
    is the mergeable sketch state (max-combine on bucket). Groups whose
    values are ALL NULL keep an all-zero sketch (the NULL hash lands a
    (group, NULL-bucket) row that the dense grid join drops) — matching
    ``hll_estimate_sql``'s group derivation from the hashed stream."""
    m = 1 << p
    bucket, rho = _hll_bucket_rho(value_col, p)
    hit = (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("_rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_rho").alias("register"))
    )
    # derive the group list from the AGGREGATE (≤ groups·m rows), not a
    # second scan of the raw data
    groups = hit.select(*group_cols).distinct()
    grid = groups.crossJoin(
        df.sparkSession.range(m).select(F.col("id").alias("bucket"))
    )
    return grid.join(hit, [*group_cols, "bucket"], "left").select(
        *group_cols,
        "bucket",
        F.coalesce(F.col("register"), F.lit(0)).cast("long").alias("register"),
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: list[str],
    p: int = 10,
) -> DataFrame:
    """Estimate from a REGISTER table ``(group_cols..., bucket,
    register)`` — the read side of register-as-stored-state maintenance
    (registers are max-mergeable, so an append log of per-batch registers
    max-merges to exactly the batch-built sketch)."""
    m = 1 << p
    w_bits = _HASH_BITS - p
    # python-API shiftleft only takes an int literal; the SQL form
    # accepts an expression on both engines
    s = F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {w_bits} - register)")).alias(
        "hll_sum_scaled"
    )
    num = float(_alpha(m)) * float(m) * float(m) * float(2**w_bits)
    return regs.groupBy(*group_cols).agg(
        s,
        (F.lit(num) / F.col("hll_sum_scaled").cast("double")).alias("hll_estimate"),
    )


def hll_estimate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 10,
) -> DataFrame:
    """Per-group raw HLL estimate from :func:`hll_registers`. Returns
    ``(group_cols..., hll_sum_scaled, hll_estimate)`` where
    ``hll_sum_scaled = Σ 2^{W-ρ_j}`` (the exact BIGINT sketch
    denominator) and ``hll_estimate = α_m·m²·2^W / hll_sum_scaled``."""
    return hll_estimate_from_registers(
        hll_registers(df, group_cols, value_col, p), group_cols, p
    )


def hll_estimate_sql(
    table_sql: str,
    group_cols: list[str],
    value_col: str,
    p: int = 10,
) -> str:
    """DuckDB twin: identical hash, identical bin-length ρ, identical
    scaled BIGINT sum and single-division estimate."""
    m = 1 << p
    w_bits = _HASH_BITS - p
    gc = ", ".join(group_cols)
    num = repr(float(_alpha(m)) * float(m) * float(m) * float(2**w_bits))
    return f"""
    WITH hashed AS (
      SELECT {gc},
             CAST(('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM ({table_sql})
    ),
    parts AS (
      SELECT {gc}, h >> {w_bits} AS bucket, h % {1 << w_bits} AS w FROM hashed
    ),
    hit AS (
      SELECT {gc}, bucket,
             MAX(CASE WHEN w = 0 THEN {w_bits}
                      ELSE {w_bits} - length(bin(w)) + 1 END) AS register
      FROM parts GROUP BY {gc}, bucket
    ),
    grid AS (
      SELECT g.*, r.range AS bucket
      FROM (SELECT DISTINCT {gc} FROM hashed) g, range({m}) r
    ),
    regs AS (
      SELECT grid.*, COALESCE(hit.register, 0) AS register
      FROM grid LEFT JOIN hit USING ({gc}, bucket)
    )
    SELECT {gc},
           CAST(SUM(CAST(1 AS BIGINT) << ({w_bits} - register)) AS BIGINT)
             AS hll_sum_scaled,
           {num} / CAST(SUM(CAST(1 AS BIGINT) << ({w_bits} - register)) AS DOUBLE)
             AS hll_estimate
    FROM regs GROUP BY {gc}
    """


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — frequency estimation
# in d×w integer counters regardless of vocabulary size. Unlike HLL's
# float estimate, CMS is ALL-INTEGER end to end (counters are exact sums,
# the point estimate is an integer min over d counters), so the whole
# sketch — build AND query — hash-checks with no quantization story at
# all. Guarantees: est ≥ true always (one-sided), est ≤ true + εN with
# probability 1−δ at w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
#
# Hash family: the dedup module's portable universal family over the
# 44-bit md5-prefix integer (one md5 per item, d integer mul-add-mods —
# both engines compute identical integers).
#
# Scale shape: the build is ONE hash aggregate to (depth, bucket) — d·w
# counters per group regardless of cardinality, map-side combinable and
# mergeable by ADDITION (sketch property, proven in tests). The probe
# broadcasts the d·w table.
# ---------------------------------------------------------------------------


def _cms_hashes(value_col: str, depth: int, width):
    """``width`` may be an int literal or a Column (e.g. a width-plan
    value crossJoined onto the key frame — ``planner.choose_join_auto``
    threads the derived width as a column so the whole plan stays lazy).
    Integer modulo is exact either way, so the buckets are identical."""
    from pyspark.sql import Column

    from tickdb_spark.operators.dedup import MH_COEF, MINHASH_P

    h = (
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 11), 16, 10)
        .cast("long")
    )
    w = width if isinstance(width, Column) else F.lit(width)
    return [
        ((h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P) % w)
        for a, b in MH_COEF[:depth]
    ]


def _cms_hashes_sql(value_expr: str, depth: int, width: int | str) -> list[str]:
    """``width`` may be an int literal or an SQL expression string (e.g. a
    scalar subquery against a width-plan CTE — ``planner.choose_join_auto``
    derives the width in-query from an HLL key-cardinality estimate).
    Integer modulo is exact either way, so the buckets match the Spark
    side's collected-literal build bit for bit."""
    from tickdb_spark.operators.dedup import MH_COEF, MINHASH_P

    h = f"CAST(('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 11)) AS BIGINT)"
    return [
        f"((({h}) * {a} + {b}) % {MINHASH_P} % ({width}))"
        for a, b in MH_COEF[:depth]
    ]


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Build the sketch: ``(depth, bucket, cnt)`` — d·w exact BIGINT
    counters (absent (depth, bucket) pairs are implicitly 0; estimates
    must COALESCE). Mergeable by summing cnt on (depth, bucket)."""
    hashes = _cms_hashes(value_col, depth, width)
    # ONE scan: explode the d (depth, bucket) pairs per row instead of a
    # d-branch union that rescans the item stream d times
    pairs = F.array(
        *[
            F.struct(F.lit(i).alias("depth"), hh.alias("bucket"))
            for i, hh in enumerate(hashes)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.depth").alias("depth"), F.col("p.bucket").alias("bucket"))
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def key_counts(df: DataFrame, value_col: str) -> DataFrame:
    """Exact per-key counts ``(k, c)`` — the one-scan aggregate that
    side stats, the CMS sketch, AND the exact join size all derive
    from (see :func:`cms_join_size_estimate` / ``planner.choose_join``:
    sharing this frame replaces three scans per side with one)."""
    return df.groupBy(F.col(value_col).alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def cms_build_from_key_counts(
    kc: DataFrame, depth: int = 4, width=512
) -> DataFrame:
    """Build the sketch from a :func:`key_counts` frame instead of raw
    rows: counter values are BIT-IDENTICAL to :func:`cms_build` (each
    counter is a sum of integer key counts either way) but the explode
    runs over |keys| rows, not |rows|. ``width`` may be a Column over
    ``kc``'s own columns (see :func:`_cms_hashes`) — the lazy-planner
    path carries the derived width as a crossJoined column."""
    hashes = _cms_hashes("k", depth, width)
    pairs = F.array(
        *[
            F.struct(F.lit(i).alias("depth"), hh.alias("bucket"))
            for i, hh in enumerate(hashes)
        ]
    )
    return (
        kc.select(F.explode(pairs).alias("p"), F.col("c"))
        .select(
            F.col("p.depth").alias("depth"),
            F.col("p.bucket").alias("bucket"),
            "c",
        )
        .groupBy("depth", "bucket")
        .agg(F.sum("c").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-estimate each query value against the sketch:
    ``(value_col, cms_est)`` with ``cms_est = min_i cnt[i, h_i(v)]``
    (0-coalesced). The d·w sketch broadcasts."""
    hashes = _cms_hashes(value_col, depth, width)
    q = queries.select(
        F.col(value_col),
        *[hh.alias(f"_b{i}") for i, hh in enumerate(hashes)],
    )
    for i in range(depth):
        s_i = sketch.where(F.col("depth") == i).select(
            F.col("bucket").alias(f"_b{i}"), F.col("cnt").alias(f"_c{i}")
        )
        q = q.join(F.broadcast(s_i), f"_b{i}", "left")
    est = F.least(
        *[F.coalesce(F.col(f"_c{i}"), F.lit(0).cast("long")) for i in range(depth)]
    )
    return q.select(value_col, est.alias("cms_est"))


def cms_topk_check_sql(
    items_sql: str,
    value_expr: str,
    k: int = 20,
    depth: int = 4,
    width: int = 512,
) -> str:
    """DuckDB twin of the gate shape: build the sketch over the item
    stream, take the top-k exact values (tie-broken on the value), emit
    ``(value, exact_cnt, cms_est)`` — est ≥ exact always; the gap is the
    collision mass the ε·N bound governs."""
    hs = _cms_hashes_sql("v", depth, width)
    layers = "\nUNION ALL\n".join(
        f"SELECT {i} AS depth, {h} AS bucket FROM items" for i, h in enumerate(hs)
    )
    qhs = _cms_hashes_sql("v", depth, width)
    mins = ", ".join(
        f"(SELECT COALESCE((SELECT cnt FROM cms WHERE depth = {i} "
        f"AND bucket = {qh.replace('items.', '')}), 0))"
        for i, qh in enumerate(qhs)
    )
    return f"""
    WITH items AS MATERIALIZED (
      SELECT {value_expr} AS v FROM ({items_sql})
    ),
    cms AS MATERIALIZED (
      SELECT depth, bucket, CAST(count(*) AS BIGINT) AS cnt FROM (
        {layers}
      ) GROUP BY depth, bucket
    ),
    topk AS (
      SELECT v, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM items GROUP BY v
      ORDER BY exact_cnt DESC, v LIMIT {k}
    )
    SELECT t.v AS token, t.exact_cnt,
           CAST(least({mins}) AS BIGINT) AS cms_est
    FROM topk t
    """


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketch (Bar-Yossef et al. 2002; Beyer et al.
# 2007) — fixed-size distinct-set summaries supporting SET OPERATIONS:
# the k smallest distinct hash values of a set. Two sketches combine by
# taking the k smallest of their union (k-min(A ∪ B) = k-min(k-min(A) ∪
# k-min(B))), and the Jaccard estimate is the fraction of the combined
# sketch's members present in both sides — all INTEGER work except the
# final ratio (one IEEE division), so the whole pipeline hash-checks.
#
# Scale shape: per-group sketch state is k BIGINTs regardless of set
# size; the pairwise combine touches only sketches (pairs × 2k rows),
# never the underlying sets — the property that makes all-pairs corpus
# similarity tractable at 100 TB.
# ---------------------------------------------------------------------------


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV sketch: the k smallest distinct 60-bit md5-prefix
    hashes — ``(group, h)``, ≤ k rows per group."""
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    hashes = (
        df.select(F.col(group_col).alias("grp"), h.alias("h")).distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    return (
        hashes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("grp", "h")
    )


def kmv_pairwise_jaccard(
    sketches: DataFrame,
    k: int = 256,
) -> DataFrame:
    """All-pairs Jaccard estimates from per-group KMV sketches alone
    (the sets themselves are never touched): for each group pair a < b,
    combine the two sketches, keep the k smallest of the union, and
    estimate J = |members in both| / |combined sketch|. Returns
    ``(grp_a, grp_b, kmv_common, kmv_size, kmv_jaccard)``."""
    from pyspark.sql import Window

    a = sketches.select(
        F.col("grp").alias("grp_a"), F.col("h").alias("h"), F.lit(1).alias("in_a")
    )
    b = sketches.select(
        F.col("grp").alias("grp_b"), F.col("h").alias("h"), F.lit(1).alias("in_b")
    )
    pairs = (
        sketches.select(F.col("grp").alias("grp_a"))
        .distinct()
        .crossJoin(sketches.select(F.col("grp").alias("grp_b")).distinct())
        .where(F.col("grp_a") < F.col("grp_b"))
    )
    left = pairs.join(a, "grp_a").select("grp_a", "grp_b", "h", "in_a")
    right = pairs.join(b, "grp_b").select("grp_a", "grp_b", "h", "in_b")
    member = (
        left.join(right, ["grp_a", "grp_b", "h"], "full")
        .select(
            "grp_a",
            "grp_b",
            "h",
            F.coalesce(F.col("in_a"), F.lit(0)).alias("in_a"),
            F.coalesce(F.col("in_b"), F.lit(0)).alias("in_b"),
        )
    )
    w = Window.partitionBy("grp_a", "grp_b").orderBy("h")
    top = member.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return top.groupBy("grp_a", "grp_b").agg(
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("kmv_common"),
        F.count(F.lit(1)).alias("kmv_size"),
        (
            F.sum(F.col("in_a") * F.col("in_b")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("kmv_jaccard"),
    )


def kmv_pairwise_jaccard_sql(
    items_sql: str,
    group_col: str,
    value_expr: str,
    k: int = 256,
) -> str:
    """DuckDB twin: identical hash, identical k-min windows, identical
    combine and single-division estimate, plus the EXACT Jaccard per
    pair (gate-scale evidence column the sketch path never needs)."""
    return f"""
    WITH hashes AS MATERIALIZED (
      SELECT DISTINCT {group_col} AS grp,
             CAST(('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM ({items_sql})
    ),
    sk AS MATERIALIZED (
      SELECT grp, h FROM (
        SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM hashes
      ) WHERE rn <= {k}
    ),
    pairs AS (
      SELECT a.grp AS grp_a, b.grp AS grp_b
      FROM (SELECT DISTINCT grp FROM sk) a, (SELECT DISTINCT grp FROM sk) b
      WHERE a.grp < b.grp
    ),
    member2 AS (
      SELECT grp_a, grp_b, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
        SELECT p.grp_a, p.grp_b, s.h, 1 AS in_a, 0 AS in_b
        FROM pairs p JOIN sk s ON s.grp = p.grp_a
        UNION ALL
        SELECT p.grp_a, p.grp_b, s.h, 0, 1
        FROM pairs p JOIN sk s ON s.grp = p.grp_b
      ) GROUP BY grp_a, grp_b, h
    ),
    top AS (
      SELECT * FROM (
        SELECT m.*, ROW_NUMBER() OVER (PARTITION BY grp_a, grp_b ORDER BY h) AS rn
        FROM member2 m
      ) WHERE rn <= {k}
    ),
    est AS (
      SELECT grp_a, grp_b,
             CAST(SUM(in_a * in_b) AS BIGINT) AS kmv_common,
             CAST(count(*) AS BIGINT) AS kmv_size,
             CAST(SUM(in_a * in_b) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS kmv_jaccard
      FROM top GROUP BY grp_a, grp_b
    ),
    exact AS (
      SELECT p.grp_a, p.grp_b,
             CAST(SUM(CASE WHEN ha.h IS NOT NULL AND hb.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS inter,
             CAST(count(*) AS BIGINT) AS uni
      FROM pairs p
      JOIN (
        SELECT grp_a, grp_b, h FROM (
          SELECT p2.grp_a, p2.grp_b, x.h
          FROM pairs p2 JOIN hashes x ON x.grp IN (p2.grp_a, p2.grp_b)
        ) GROUP BY grp_a, grp_b, h
      ) u ON u.grp_a = p.grp_a AND u.grp_b = p.grp_b
      LEFT JOIN hashes ha ON ha.grp = p.grp_a AND ha.h = u.h
      LEFT JOIN hashes hb ON hb.grp = p.grp_b AND hb.h = u.h
      GROUP BY p.grp_a, p.grp_b
    )
    SELECT * FROM (
      SELECT e.grp_a, e.grp_b, e.kmv_common, e.kmv_size, e.kmv_jaccard,
             CAST(x.inter AS DOUBLE) / CAST(x.uni AS DOUBLE) AS exact_jaccard
      FROM est e JOIN exact x ON x.grp_a = e.grp_a AND x.grp_b = e.grp_b
    )
    """


def value_hash_60(col):
    """The family's shared portable 60-bit md5-prefix hash of any value
    (cast to string first) — one expression both engines compute
    identically."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def kmv_sketch_from_hashes(hashes: DataFrame, k: int = 256) -> DataFrame:
    """KMV sketch from an already-distinct ``(grp, h)`` frame — lets a
    caller that also needs the hash set for other work (exact evidence,
    sizes) scan it ONCE instead of re-deriving it inside the sketch."""
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("h")
    return (
        hashes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("grp", "h")
    )


# ---------------------------------------------------------------------------
# CMS join-size estimation — the classic sketch inner product (Cormode &
# Muthukrishnan 2005, §4.2): |A ⋈_k B| is estimated WITHOUT running the
# join as min_d Σ_w cmsA[d,w]·cmsB[d,w]. Like the point estimate it is
# one-sided (est ≥ true: colliding keys only ADD cross products) and
# ALL-INTEGER — counters are exact sums, the dot is an exact BIGINT sum,
# the estimate an integer min — so it hash-checks with no quantization.
#
# Why it matters at 100 TB: this is the planner-side diagnostic you run
# BEFORE committing to a join strategy (broadcast vs shuffle vs salted —
# pairs with diag_key_skew_gini). Cost: two one-scan sketch builds of
# d·w counters each; the dot joins two broadcast-sized tables. The join
# itself never runs.
# ---------------------------------------------------------------------------


def cms_join_size_estimate(
    a: DataFrame,
    a_col: str,
    b: DataFrame,
    b_col: str,
    depth: int = 4,
    width: int = 512,
    a_keys: DataFrame | None = None,
    b_keys: DataFrame | None = None,
) -> DataFrame:
    """One row ``(est_rows, exact_rows)``: the CMS inner-product
    estimate of ``|a ⋈ b|`` on the given key columns next to the exact
    size (computed from per-key counts — Σ cA(k)·cB(k), never the
    materialized join). est ≥ exact always.

    ``a_keys``/``b_keys`` accept pre-aggregated :func:`key_counts`
    frames (``planner.choose_join`` shares them with its side stats —
    one scan per side instead of three); the sketch counters and both
    row counts are bit-identical either way."""
    ka = a_keys if a_keys is not None else key_counts(a, a_col)
    kb = b_keys if b_keys is not None else key_counts(b, b_col)
    sa = cms_build_from_key_counts(ka, depth, width).withColumnRenamed(
        "cnt", "cnt_a"
    )
    sb = cms_build_from_key_counts(kb, depth, width).withColumnRenamed(
        "cnt", "cnt_b"
    )
    dots = (
        sa.join(sb, ["depth", "bucket"])
        .groupBy("depth")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("dot"))
    )
    # A depth with NO overlapping buckets has a true dot of 0 (which
    # certifies exact_rows == 0) but vanishes from the inner join; left
    # join from the depth spine with dot defaulted to 0 so min() sees it
    # (ADVICE r10 — previously est_rows came back NULL / overestimated).
    spine = a.sparkSession.range(depth).select(
        F.col("id").cast("int").alias("depth")
    )
    dots = spine.join(dots, "depth", "left").select(
        F.coalesce(F.col("dot"), F.lit(0)).alias("dot")
    )
    est = dots.agg(F.min("dot").cast("long").alias("est_rows"))
    exact = (
        ka.select("k", F.col("c").alias("ca"))
        .join(kb.select("k", F.col("c").alias("cb")), "k")
        .agg(
            F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0))
            .cast("long")
            .alias("exact_rows")
        )
    )
    return est.crossJoin(F.broadcast(exact))


def cms_join_size_estimate_sql(
    a_sql: str,
    a_expr: str,
    b_sql: str,
    b_expr: str,
    depth: int = 4,
    width: int | str = 512,
) -> str:
    """DuckDB twin: same hash family, same layered build, same integer
    dot + min, exact size from per-key counts. ``width`` may be an SQL
    expression (see :func:`_cms_hashes_sql`)."""

    def layers(src: str) -> str:
        hs = _cms_hashes_sql("v", depth, width)
        return "\nUNION ALL\n".join(
            f"SELECT {i} AS depth, {h} AS bucket FROM {src}"
            for i, h in enumerate(hs)
        )

    return f"""
    WITH a_items AS MATERIALIZED (SELECT {a_expr} AS v FROM ({a_sql})),
    b_items AS MATERIALIZED (SELECT {b_expr} AS v FROM ({b_sql})),
    cms_a AS MATERIALIZED (
      SELECT depth, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM ({layers('a_items')}) GROUP BY depth, bucket
    ),
    cms_b AS MATERIALIZED (
      SELECT depth, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM ({layers('b_items')}) GROUP BY depth, bucket
    ),
    dots AS (
      SELECT a.depth, SUM(a.cnt * b.cnt) AS dot
      FROM cms_a a JOIN cms_b b USING (depth, bucket) GROUP BY a.depth
    ),
    dots_full AS (
      SELECT COALESCE(d.dot, 0) AS dot
      FROM range({depth}) s LEFT JOIN dots d ON d.depth = s.range
    ),
    est AS (SELECT CAST(min(dot) AS BIGINT) AS est_rows FROM dots_full),
    exact AS (
      SELECT CAST(COALESCE(SUM(ca.c * cb.c), 0) AS BIGINT) AS exact_rows
      FROM (SELECT v, count(*) AS c FROM a_items GROUP BY v) ca
      JOIN (SELECT v, count(*) AS c FROM b_items GROUP BY v) cb USING (v)
    )
    SELECT est_rows, exact_rows FROM est, exact
    """


# ---------------------------------------------------------------------------
# Bottom-k quantile sketch — the RANK/quantile member of the mergeable
# sketch family (next to HLL counts, CMS frequencies, KMV similarity).
# A deterministic hash-uniform sample: keep the k rows whose 60-bit
# md5-prefix key hash is smallest (the KMV idea applied to ROWS instead
# of distinct values), then read quantiles off the sample's order
# statistics. Standard sample-quantile error is O(1/sqrt(k)) in rank
# (±~1.6 rank-percent at k=1024) — asserted vs exact ranks in tests.
#
# Why this shape at 100 TB: the sample is MERGEABLE state (union two
# bottom-k samples, keep the k smallest hashes — same law as KMV), and
# Spark's orderBy(h).limit(k) plans as TakeOrderedAndProject: each task
# keeps its local bottom-k and only k-row partials merge — no data-wide
# sort, no data-wide window, state is k rows regardless of input size.
# Exact percentile_disc over the corpus would be a full shuffle+sort per
# query; the sketch is one scan and replays bit-identically in SQL (the
# estimate is a SELECTED raw value, not arithmetic — hash-exact).
# ---------------------------------------------------------------------------


def bottomk_sample(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: int = 1024,
) -> DataFrame:
    """The sketch state: ``(_h, _key, _v)`` — the k rows with smallest
    key hash. ``key_col`` must be a unique row key (the hash carries the
    sampling randomness; ties broken on the key itself). Mergeable:
    union samples, keep the k smallest again (see tests)."""
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    return (
        df.select(
            h.alias("_h"),
            F.col(key_col).cast("long").alias("_key"),
            F.col(value_col).alias("_v"),
        )
        .orderBy("_h", "_key")
        .limit(k)
    )


def bottomk_quantiles(
    sample: DataFrame,
    permille: tuple[int, ...] = (500, 900, 990),
) -> DataFrame:
    """Quantile estimates from the sample's order statistics:
    ``(permille, est_value, sample_size)``. Rank selection is pure
    integer math — ``1 + (p·(m−1)) div 1000`` — so both engines pick
    the identical sample member. The window below runs over ≤ k rows by
    construction (the sample IS the bounded state), never the corpus."""
    from pyspark.sql import Window

    spark = sample.sparkSession
    # m via count-over-window (as the grouped variant does), NOT a
    # crossJoin with sample.agg(count): a second reference to the sample
    # plan re-executes the full-input TakeOrderedAndProject scan per
    # query (r9 lesson — count aggregates are plans, not values).
    sized = sample.withColumn(
        "m", F.count(F.lit(1)).over(Window.partitionBy(F.lit(1)))
    )
    ranked = sized.withColumn(
        "rnk", F.row_number().over(Window.orderBy("_v", "_key"))
    )
    perms = F.broadcast(
        spark.createDataFrame([(int(p),) for p in permille], "permille long")
    )
    return (
        ranked.join(
            perms,
            F.col("rnk") == 1 + F.expr("(permille * (m - 1)) div 1000"),
        )
        .select(
            "permille",
            F.col("_v").alias("est_value"),
            F.col("m").cast("long").alias("sample_size"),
        )
    )


def bottomk_quantile_sketch(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: int = 1024,
    permille: tuple[int, ...] = (500, 900, 990),
) -> DataFrame:
    """One-scan build + estimate: see ``bottomk_sample`` /
    ``bottomk_quantiles``."""
    return bottomk_quantiles(bottomk_sample(df, key_col, value_col, k), permille)


def bottomk_quantile_sketch_sql(
    src_sql: str,
    key_expr: str,
    value_expr: str,
    k: int = 1024,
    permille: tuple[int, ...] = (500, 900, 990),
) -> str:
    """DuckDB twin: same hash, same bottom-k selection, same integer
    rank formula — the emitted estimate is the same selected raw value."""
    pvals = ", ".join(f"({int(p)})" for p in permille)
    return f"""
    WITH sample AS MATERIALIZED (
      SELECT CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 15)) AS BIGINT) AS _h,
             CAST({key_expr} AS BIGINT) AS _key, {value_expr} AS _v
      FROM ({src_sql})
      ORDER BY _h, _key LIMIT {k}
    ),
    sized AS (SELECT count(*) AS m FROM sample),
    ranked AS (
      SELECT _v, _key, row_number() OVER (ORDER BY _v, _key) AS rnk
      FROM sample
    ),
    perms(permille) AS (VALUES {pvals})
    SELECT CAST(p.permille AS BIGINT) AS permille, r._v AS est_value,
           CAST(s.m AS BIGINT) AS sample_size
    FROM perms p
    CROSS JOIN sized s
    JOIN ranked r ON r.rnk = 1 + (p.permille * (s.m - 1)) // 1000
    ORDER BY permille
    """


def bottomk_sample_grouped(
    df: DataFrame,
    group_col: str,
    key_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group bottom-k row sample: ``(grp, _h, _key, _v)``, ≤ k rows
    per group — the grouped twin of :func:`bottomk_sample` (same hash,
    same merge law per group). The rank-≤-k filter compiles to Spark's
    WindowGroupLimit: per-task partial top-k per group, no full
    per-group sort materializes. Groups are the scale-out axis."""
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = Window.partitionBy("grp").orderBy("_h", "_key")
    return (
        df.select(
            F.col(group_col).alias("grp"),
            h.alias("_h"),
            F.col(key_col).cast("long").alias("_key"),
            F.col(value_col).alias("_v"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def bottomk_quantiles_grouped(
    sample: DataFrame,
    permille: tuple[int, ...] = (500, 900, 990),
) -> DataFrame:
    """Per-group quantiles from the grouped sample:
    ``(grp, permille, est_value, sample_size)`` — the same pure integer
    rank selection per group; every window here runs over ≤ k rows per
    group by construction."""
    from pyspark.sql import Window

    spark = sample.sparkSession
    sized = sample.withColumn(
        "m", F.count(F.lit(1)).over(Window.partitionBy("grp"))
    )
    ranked = sized.withColumn(
        "rnk",
        F.row_number().over(Window.partitionBy("grp").orderBy("_v", "_key")),
    )
    perms = F.broadcast(
        spark.createDataFrame([(int(p),) for p in permille], "permille long")
    )
    return ranked.join(
        perms, F.col("rnk") == 1 + F.expr("(permille * (m - 1)) div 1000")
    ).select(
        "grp",
        "permille",
        F.col("_v").alias("est_value"),
        F.col("m").cast("long").alias("sample_size"),
    )


def bottomk_quantile_sketch_grouped_sql(
    src_sql: str,
    group_expr: str,
    key_expr: str,
    value_expr: str,
    k: int = 256,
    permille: tuple[int, ...] = (500, 900, 990),
) -> str:
    """DuckDB twin of the grouped sketch: identical hash, per-group
    rank-≤-k selection, identical integer rank formula."""
    pvals = ", ".join(f"({int(p)})" for p in permille)
    return f"""
    WITH hashed AS (
      SELECT {group_expr} AS grp,
             CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 15)) AS BIGINT) AS _h,
             CAST({key_expr} AS BIGINT) AS _key, {value_expr} AS _v
      FROM ({src_sql})
    ),
    sample AS MATERIALIZED (
      SELECT grp, _h, _key, _v FROM (
        SELECT *, row_number() OVER (PARTITION BY grp ORDER BY _h, _key) AS _rn
        FROM hashed
      ) WHERE _rn <= {k}
    ),
    ranked AS (
      SELECT grp, _v, _key,
             count(*) OVER (PARTITION BY grp) AS m,
             row_number() OVER (PARTITION BY grp ORDER BY _v, _key) AS rnk
      FROM sample
    ),
    perms(permille) AS (VALUES {pvals})
    SELECT r.grp, CAST(p.permille AS BIGINT) AS permille, r._v AS est_value,
           CAST(r.m AS BIGINT) AS sample_size
    FROM ranked r JOIN perms p
      ON r.rnk = 1 + (p.permille * (r.m - 1)) // 1000
    """


# ---------------------------------------------------------------------------
# KMV set-operation cardinalities — the sketch algebra on top of the
# per-group KMV sketches: estimate |A ∪ B|, |A ∩ B|, |A \ B|, |B \ A|
# from the two k-min sets ALONE (Beyer et al., SIGMOD 2007; the theta-
# sketch estimator family). The audience-overlap / segment-sizing
# question answered without ever touching the underlying sets.
#
# Estimator discipline (cross-engine bit-stability): the union estimate
# is the classic (k−1)/h_k read over the combined sketch — computed as
# floor((k−1) · 2^60 / h_k) where (k−1)·2^60 is EXACT in a double (≤ 8
# significant bits) and int64→double for h_k is the hardware correctly-
# rounded conversion, so the one divide + floor is bit-identical on any
# engine. When the combined sketch holds fewer than k hashes the union
# was fully enumerated — the estimate IS the exact count. The subset
# estimates scale est_union by the sketch-member fractions in pure
# BIGINT arithmetic ((cnt · est_union) // k_eff — non-negative, so
# Spark div == DuckDB //).
# ---------------------------------------------------------------------------

#: The 60-bit hash space size as an exact double literal.
_KMV_SPACE = float(1 << 60)


def kmv_set_cardinalities(
    sketches: DataFrame,
    k: int = 256,
) -> DataFrame:
    """All-pairs set-operation cardinality estimates from per-group KMV
    sketches (``kmv_sketch`` output). Returns per pair a < b:
    ``(grp_a, grp_b, kmv_size, common, only_a, only_b, est_union,
    est_intersect, est_only_a, est_only_b)`` — counts over the combined
    k-min sketch plus the scaled estimates, all BIGINT."""
    from pyspark.sql import Window

    a = sketches.select(
        F.col("grp").alias("grp_a"), F.col("h").alias("h"), F.lit(1).alias("in_a")
    )
    b = sketches.select(
        F.col("grp").alias("grp_b"), F.col("h").alias("h"), F.lit(1).alias("in_b")
    )
    # all-pairs of GROUPS, not of data: the crossJoin (a nested-loop
    # plan) runs over the distinct group lists — |groups|² rows, never
    # corpus-sized; everything downstream touches only sketch rows
    # (≤ 2k per pair). Same deliberate shape as kmv_pairwise_jaccard.
    pairs = (
        sketches.select(F.col("grp").alias("grp_a"))
        .distinct()
        .crossJoin(sketches.select(F.col("grp").alias("grp_b")).distinct())
        .where(F.col("grp_a") < F.col("grp_b"))
    )
    left = pairs.join(a, "grp_a").select("grp_a", "grp_b", "h", "in_a")
    right = pairs.join(b, "grp_b").select("grp_a", "grp_b", "h", "in_b")
    member = left.join(right, ["grp_a", "grp_b", "h"], "full").select(
        "grp_a",
        "grp_b",
        "h",
        F.coalesce(F.col("in_a"), F.lit(0)).alias("in_a"),
        F.coalesce(F.col("in_b"), F.lit(0)).alias("in_b"),
    )
    w = Window.partitionBy("grp_a", "grp_b").orderBy("h")
    top = member.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    agg = top.groupBy("grp_a", "grp_b").agg(
        F.count(F.lit(1)).cast("long").alias("kmv_size"),
        F.max("h").alias("_hk"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("common"),
        F.sum(F.col("in_a") * (1 - F.col("in_b"))).cast("long").alias("only_a"),
        F.sum(F.col("in_b") * (1 - F.col("in_a"))).cast("long").alias("only_b"),
    )
    est_union = F.when(
        F.col("kmv_size") < k, F.col("kmv_size")
    ).otherwise(
        F.floor(
            F.lit(float(k - 1) * _KMV_SPACE) / F.col("_hk").cast("double")
        ).cast("long")
    )
    stats = agg.withColumn("est_union", est_union)
    scaled = lambda cnt: F.call_function(  # noqa: E731
        "div", F.col(cnt) * F.col("est_union"), F.col("kmv_size")
    )
    return stats.select(
        "grp_a",
        "grp_b",
        "kmv_size",
        "common",
        "only_a",
        "only_b",
        "est_union",
        scaled("common").alias("est_intersect"),
        scaled("only_a").alias("est_only_a"),
        scaled("only_b").alias("est_only_b"),
    )


def kmv_set_cardinalities_sql(
    items_sql: str,
    group_col: str,
    value_expr: str,
    k: int = 256,
) -> str:
    """DuckDB twin: identical hash, k-min windows, combine, and the same
    exact-double union estimate + BIGINT subset scaling."""
    num = float(k - 1) * _KMV_SPACE
    return f"""
    WITH hashes AS MATERIALIZED (
      SELECT DISTINCT {group_col} AS grp,
             CAST(('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM ({items_sql})
    ),
    sk AS MATERIALIZED (
      SELECT grp, h FROM (
        SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM hashes
      ) WHERE rn <= {k}
    ),
    pairs AS (
      SELECT a.grp AS grp_a, b.grp AS grp_b
      FROM (SELECT DISTINCT grp FROM sk) a, (SELECT DISTINCT grp FROM sk) b
      WHERE a.grp < b.grp
    ),
    member2 AS (
      SELECT grp_a, grp_b, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
        SELECT p.grp_a, p.grp_b, s.h, 1 AS in_a, 0 AS in_b
        FROM pairs p JOIN sk s ON s.grp = p.grp_a
        UNION ALL
        SELECT p.grp_a, p.grp_b, s.h, 0, 1
        FROM pairs p JOIN sk s ON s.grp = p.grp_b
      ) GROUP BY grp_a, grp_b, h
    ),
    top AS (
      SELECT * FROM (
        SELECT m.*, ROW_NUMBER() OVER (PARTITION BY grp_a, grp_b ORDER BY h) AS rn
        FROM member2 m
      ) WHERE rn <= {k}
    ),
    agg AS (
      SELECT grp_a, grp_b,
             CAST(count(*) AS BIGINT) AS kmv_size,
             CAST(MAX(h) AS BIGINT) AS _hk,
             CAST(SUM(in_a * in_b) AS BIGINT) AS common,
             CAST(SUM(in_a * (1 - in_b)) AS BIGINT) AS only_a,
             CAST(SUM(in_b * (1 - in_a)) AS BIGINT) AS only_b
      FROM top GROUP BY grp_a, grp_b
    ),
    est AS (
      SELECT *, CASE WHEN kmv_size < {k} THEN kmv_size
                     ELSE CAST(floor({num!r} / CAST(_hk AS DOUBLE)) AS BIGINT)
                END AS est_union
      FROM agg
    )
    SELECT grp_a, grp_b, kmv_size, common, only_a, only_b, est_union,
           (common * est_union) // kmv_size AS est_intersect,
           (only_a * est_union) // kmv_size AS est_only_a,
           (only_b * est_union) // kmv_size AS est_only_b
    FROM est
    """
