"""K-means (Lloyd) centroid training — the missing trainer for the IVF
ANN index (``similarity.ann_topk_ivf`` ships fixed pseudo-centroids so
the gate query stays oracle-checkable; production cells should be
k-means of the corpus).

Spark-first iterative shape (the same discipline as
``operators/cluster.py``):

* **assignment pass**: one corpus scan per iteration. Centroids are a
  k×d float matrix — broadcast, never joined; each Arrow batch computes
  all k squared distances in one GEMM (``|v-c|² = |v|² − 2v·c + |c|²``,
  argmin over the cell axis).
* **update pass**: per-cell mean via one hash aggregate on the cell id
  (map-side partial sums — k·d doubles per task, not per row).
* **driver loop**: centroids are k·d ≈ KBs — collecting them per
  iteration is broadcast-build, not a driver-side data loop. Convergence
  = max centroid shift < tol.
* **determinism**: init picks the k corpus vectors with the smallest
  multiplicative id-hash (uniform over the corpus, no RNG, stable under
  repartitioning — ``operators/sampling.id_hash``). Every later step is
  numpy float64 on sorted cell ids, so refits reproduce bit-identically.

At 100 TB: train on a hash_sample (1-10M vectors is plenty for k≤65k
cells — standard IVF practice), then one final assignment pass over the
full corpus. Each iteration is one scan + one k-row shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tickdb_spark.operators.sampling import id_hash


#: Hard ceiling for :func:`_corpus_matrix` — a driver-side collect exists
#: ONLY for test/monitoring use (inertia of a small evaluation set). A
#: pipeline must never route corpus-sized data through here.
_CORPUS_MATRIX_MAX_ROWS = 2_000_000


def _corpus_matrix(emb: DataFrame, id_col: str, vec_col: str):
    """TEST/MONITORING ONLY — collects the full frame to the driver.

    Used solely by :func:`inertia` to score a (sampled) evaluation set;
    never call it from a pipeline path. Guarded by a row-count ceiling so
    a misuse fails loudly instead of OOM-ing the driver at scale — the
    production assignment path is the distributed GEMM in
    :func:`kmeans_assign`.
    """
    import numpy as np

    n = emb.count()
    if n > _CORPUS_MATRIX_MAX_ROWS:
        raise ValueError(
            f"_corpus_matrix is test-only (driver-side collect): got {n} rows "
            f"> ceiling {_CORPUS_MATRIX_MAX_ROWS}; use kmeans_assign for "
            "corpus-scale scoring"
        )
    pdf = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).toPandas()
    ids = pdf["id"].to_numpy()
    mat = np.vstack(pdf["v"].to_numpy()).astype("float64")
    return ids, mat


def kmeans_fit(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 20,
    tol: float = 1e-6,
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """Train k centroids; returns them as plain Python lists (broadcast-
    able literals, directly usable by ``ann_topk_ivf``-style cell
    routing). Deterministic: hash-min seeding + float64 means.

    ``sample_fraction`` trains on a deterministic ``hash_sample`` of the
    corpus — the 100-TB path (1-10M vectors is plenty for k≤65k cells;
    each Lloyd iteration then scans the sample, not the corpus). The
    final full-corpus assignment stays with the caller (``assign_cells``).
    Sampling is by id-hash, so the trained centroids are still exactly
    reproducible run-to-run and partitioning-independent."""
    import numpy as np

    from tickdb_spark.operators.sampling import hash_sample

    train = emb
    if sample_fraction is not None and sample_fraction < 1.0:
        train = hash_sample(emb, id_col, sample_fraction)

    seeds = (
        train.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(id_hash(F.col("id")), F.col("id"))
        .limit(k)
        .toPandas()
    )
    if len(seeds) < k:  # sample too thin for k seeds — train on the corpus
        train = emb
        seeds = (
            emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .orderBy(id_hash(F.col("id")), F.col("id"))
            .limit(k)
            .toPandas()
        )
    centroids = np.vstack(seeds["v"].to_numpy()).astype("float64")

    for _ in range(max_iter):
        assigned = assign_cells(train, centroids.tolist(), id_col, vec_col)
        # per-cell running sums: k·d longs of state per task (map-side
        # combine), one k-row shuffle. Components are quantized to 1e-10
        # by floor(x*1e10 + 0.5) — pure IEEE double ops, so the same value
        # quantizes identically on any engine (a DECIMAL cast here would
        # hit engine-specific tie-rounding: Spark HALF_UP vs DuckDB
        # HALF_EVEN, measured on this corpus) — and BIGINT sums are exact
        # and order-independent, so the trained centroids are bit-stable
        # across partitionings AND replayable by the DuckDB oracle
        # (kmeans_replay_ctes).
        sums = (
            assigned.groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(
                        F.floor(
                            F.col(vec_col).getItem(j).cast("double") * F.lit(1e10)
                            + F.lit(0.5)
                        ).cast("long")
                    ).alias(f"s{j}")
                    for j in range(centroids.shape[1])
                ],
            )
            .collect()
        )
        new = centroids.copy()
        for row in sums:
            c = row["cell"]
            # (long -> double) / 1e10 / n: every step is the identical
            # IEEE op sequence the oracle's SQL runs.
            new[c] = np.array(
                [float(row[f"s{j}"]) / 1e10 for j in range(centroids.shape[1])]
            ) / row["n"]
        shift = float(np.abs(new - centroids).max())
        centroids = new
        if shift < tol:
            break
    return [[float(x) for x in c] for c in centroids]


def assign_cells(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid cell per vector (one GEMM per Arrow batch).
    Returns the input columns plus ``cell: int``."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    C = np.asarray(centroids, dtype="float64")
    # left-assoc self-dot (see gen): matches the oracle's c[1]*c[1] + ...
    c_norm2 = np.zeros(C.shape[0])
    for i in range(C.shape[1]):
        c_norm2 += C[:, i] * C[:, i]
    bc = spark.sparkContext.broadcast((C, c_norm2))
    cols = emb.columns

    def gen(batches):
        Cb, n2 = bc.value
        for batch in batches:
            if len(batch) == 0:
                continue
            V = np.vstack(batch[vec_col].to_numpy()).astype("float64")
            # |v-c|² up to the constant |v|²: -2 v·c + |c|².
            # The dot is a vectorized dim-loop, NOT a BLAS GEMM: the
            # 0.0-seeded left fold is the exact summation order of the
            # oracle's v[1]*c[1] + v[2]*c[2] + ... chain, so scores (and
            # therefore argmin cells) are bit-identical cross-engine.
            dots = np.zeros((V.shape[0], Cb.shape[0]))
            for i in range(V.shape[1]):
                dots += V[:, i : i + 1] * Cb[None, :, i]
            scores = -2.0 * dots + n2[None, :]
            out = batch.copy()
            out["cell"] = scores.argmin(axis=1).astype("int32")
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in emb.schema.fields)
    return emb.mapInPandas(gen, f"{schema}, cell int")


# ---------------------------------------------------------------------------
# DuckDB oracle replay.
#
# kmeans_fit is deterministic end-to-end: hash-sampled train set, hash-min
# seeding, left-assoc fold scoring (assign_cells), IEEE-quantized BIGINT
# centroid sums (floor(x*1e10 + 0.5)), identical-op-order division. Every
# one of those steps has an exact SQL equivalent, so a bounded unroll of the
# Lloyd loop (the gate trains max_iter=3, tol=0) replays the trainer
# bit-identically in DuckDB — upgrading both k-means gate entries from
# rows-only to hash-checked.
# ---------------------------------------------------------------------------


def _dot_chain_sql(a: str, b: str, dim: int) -> str:
    """Left-associative dot of two list expressions (1-based lists)."""
    terms = [
        f"CAST({a}[{i + 1}] AS DOUBLE) * CAST({b}[{i + 1}] AS DOUBLE)"
        for i in range(dim)
    ]
    return "(" + " + ".join(terms) + ")"


def _score_sql(vec: str, cent: str, dim: int) -> str:
    """-2<v,c> + |c|^2 — assign_cells' score, same op order."""
    return f"((-2.0 * {_dot_chain_sql(vec, cent, dim)}) + {_dot_chain_sql(cent, cent, dim)})"


def kmeans_replay_ctes(
    table: str,
    k: int,
    iters: int,
    dim: int,
    sample_fraction: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefix: str = "",
) -> str:
    """CTE chain (no leading WITH) replaying ``kmeans_fit(k, max_iter=iters,
    tol=0, sample_fraction)``; the final centroids land in ``{P}cents(cell,
    c)``. Unrolled (not recursive): the gate trains a fixed small number of
    iterations, and an unrolled chain keeps every step a plain
    join+aggregate DuckDB can plan. ``prefix`` namespaces every CTE so
    several chains (e.g. one per PQ subspace) coexist in one query."""
    from tickdb_spark.operators.sampling import MOD, id_hash_sql

    P = prefix + "km_"

    cut = int(sample_fraction * MOD)
    # AS MATERIALIZED everywhere: DuckDB inlines single-reference CTEs, and
    # inlining this chain re-expands every 64-term dot chain at each of the
    # iters levels — planner memory grows geometrically (measured: OOM at
    # 3 iterations under session memory pressure, always-OOM at 5).
    # Materialization keeps each step a small intermediate table.
    ctes = [
        f"""{P}train AS MATERIALIZED (
      SELECT {id_col} AS id, CAST({vec_col} AS DOUBLE[]) AS v
      FROM {table} WHERE {id_hash_sql(id_col)} < {cut}
    )""",
        f"""{P}c0 AS MATERIALIZED (
      SELECT cell, v AS c FROM (
        SELECT ROW_NUMBER() OVER (ORDER BY {id_hash_sql('id')}, id) - 1 AS cell, v
        FROM {P}train
      ) WHERE cell < {k}
    )""",
    ]
    means = ", ".join(
        f"CAST(SUM(CAST(floor(CAST(v[{j + 1}] AS DOUBLE) * 1e10 + 0.5) AS BIGINT))"
        f" AS DOUBLE) / 1e10 / COUNT(*) AS m{j}"
        for j in range(dim)
    )
    rebuilt = ", ".join(f"u.m{j}" for j in range(dim))
    for t in range(1, iters + 1):
        prev = f"{P}c{t - 1}"
        ctes.append(
            f"""{P}a{t} AS MATERIALIZED (
      SELECT id, v FROM (
        SELECT t.id, t.v, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY t.id
                 ORDER BY {_score_sql('t.v', 'c.c', dim)}, c.cell) AS rn
        FROM {P}train t CROSS JOIN {prev} c
      ) WHERE rn = 1
    )"""
        )
        # {P}a{t} drops cell from the outer select on purpose? No — keep it.
        ctes[-1] = ctes[-1].replace("SELECT id, v FROM (", "SELECT id, v, cell FROM (")
        ctes.append(
            f"""{P}u{t} AS MATERIALIZED (
      SELECT cell, COUNT(*) AS n, {means}
      FROM {P}a{t} GROUP BY cell
    )"""
        )
        ctes.append(
            f"""{P}c{t} AS MATERIALIZED (
      SELECT p.cell, CASE WHEN u.n IS NULL THEN p.c ELSE [{rebuilt}] END AS c
      FROM {prev} p LEFT JOIN {P}u{t} u USING (cell)
    )"""
        )
    ctes.append(f"{P}cents AS (SELECT cell, c FROM {P}c{iters})")
    return ",\n    ".join(ctes)


def kmeans_cells_sql(
    table: str,
    k: int,
    iters: int,
    dim: int,
    sample_fraction: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle for the full-corpus cell histogram (``sim_ivf_kmeans_cells``)."""
    ctes = kmeans_replay_ctes(table, k, iters, dim, sample_fraction, id_col, vec_col)
    return f"""
    WITH {ctes},
    km_all AS (
      SELECT {id_col} AS id, CAST({vec_col} AS DOUBLE[]) AS v FROM {table}
    ),
    km_fin AS (
      SELECT id, cell FROM (
        SELECT a.id, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY a.id
                 ORDER BY {_score_sql('a.v', 'c.c', dim)}, c.cell) AS rn
        FROM km_all a CROSS JOIN km_cents c
      ) WHERE rn = 1
    )
    SELECT CAST(cell AS INT) AS cell, COUNT(*) AS n_vectors
    FROM km_fin GROUP BY cell ORDER BY cell
    """


def ann_topk_ivf_trained_sql(
    table: str,
    query_ids: list[int],
    k: int,
    k_cells: int,
    iters: int,
    dim: int,
    sample_fraction: float,
    margin: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle for ``ann_topk_ivf`` over trainer-produced centroids
    (``sim_ann_topk_ivf_trained``): the km_cents replay feeds the same
    scores -> cell/probes -> cosine-rank pipeline as the static-centroid
    IVF oracle."""
    from tickdb_spark.operators.similarity import (
        cosine_expr,
        ivf_cell_from_scores,
        ivf_probes_from_scores,
    )

    ctes = kmeans_replay_ctes(table, k_cells, iters, dim, sample_fraction, id_col, vec_col)
    ids = ", ".join(str(i) for i in query_ids)
    cell = ivf_cell_from_scores(sql=True)
    probes = ivf_probes_from_scores(margin, n=k_cells, sql=True)
    cos = cosine_expr("q.qvec", "c.cvec", sql=True)
    return f"""
    WITH {ctes},
    s AS (
      SELECT e.{id_col} AS vid, any_value(e.{vec_col}) AS vec,
             list({_score_sql(f'e.{vec_col}', 'kc.c', dim)} ORDER BY kc.cell)
               AS scores
      FROM {table} e CROSS JOIN km_cents kc
      GROUP BY e.{id_col}
    ),
    c AS (
      SELECT vid AS neighbor_id, vec AS cvec, {cell} AS cell FROM s
    ),
    q AS (
      SELECT vid AS query_id, vec AS qvec, unnest({probes}) AS cell
      FROM s WHERE vid IN ({ids})
    ),
    scored AS (
      SELECT query_id, neighbor_id, {cos} AS cosine
      FROM c JOIN q USING (cell) WHERE query_id <> neighbor_id
    ), ranked AS (
      SELECT query_id, neighbor_id, round(cosine, 6) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, cosine, rnk FROM ranked
    WHERE rnk <= {k} ORDER BY query_id, rnk
    """


def inertia(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Σ min_c |v−c|² — the k-means objective, for tests/monitoring."""
    import numpy as np

    ids, mat = _corpus_matrix(emb, id_col, vec_col)
    C = np.asarray(centroids, dtype="float64")
    d2 = ((mat * mat).sum(axis=1)[:, None]
          - 2.0 * (mat @ C.T)
          + (C * C).sum(axis=1)[None, :])
    return float(d2.min(axis=1).sum())


def cosine_pairs_ivf_trained_sql(
    table: str,
    threshold: float,
    k_cells: int,
    iters: int,
    dim: int,
    sample_fraction: float,
    margin: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Oracle for ``similarity.cosine_neardup_pairs_ivf`` over
    trainer-produced centroids — the TRAINED SemDeDup operating point:
    the km_cents replay feeds the same scores → probes → min-common-
    probe-anchored pair mine → exact cosine as the static-centroid
    pairs oracle. Same norm-precompute + MATERIALIZED-candidate cost
    shape as ``cosine_neardup_pairs_ivf_sql``."""
    from tickdb_spark.operators.similarity import (
        dot_expr,
        ivf_probes_from_scores,
    )

    ctes = kmeans_replay_ctes(
        table, k_cells, iters, dim, sample_fraction, id_col, vec_col
    )
    probes = ivf_probes_from_scores(margin, n=k_cells, sql=True)
    dot = dot_expr("a.va", "b.vb", dim, sql=True)
    selfdot = dot_expr("v", "v", dim, sql=True)
    return f"""
    WITH {ctes},
    s AS (
      SELECT e.{id_col} AS id, any_value(e.{vec_col}) AS v,
             list({_score_sql(f'e.{vec_col}', 'kc.c', dim)} ORDER BY kc.cell)
               AS scores
      FROM {table} e CROSS JOIN km_cents kc
      GROUP BY e.{id_col}
    ),
    p AS MATERIALIZED (
      SELECT id, v, sqrt({selfdot}) AS nrm, {probes} AS pr FROM s
    ),
    a AS (SELECT id AS id_a, v AS va, nrm AS na, pr AS pa, unnest(pr) AS cell FROM p),
    b AS (SELECT id AS id_b, v AS vb, nrm AS nb, pr AS pb, unnest(pr) AS cell FROM p),
    cand AS MATERIALIZED (
      SELECT id_a, id_b, ({dot} / (a.na * b.nb)) AS _cos
      FROM a JOIN b USING (cell)
      WHERE id_a < id_b
        AND cell = list_aggregate(list_intersect(pa, pb), 'min')
    )
    SELECT id_a, id_b, round(_cos, 6) AS cosine
    FROM cand WHERE _cos >= {threshold}
    """
