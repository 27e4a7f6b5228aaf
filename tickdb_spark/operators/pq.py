"""Product quantization (PQ) for embedding search: compress each
``dim``-dimensional vector to ``m_sub`` one-byte codes (here 64 float32
dims → 8 codes: 32× memory) and answer top-k queries with asymmetric
distance computation (ADC) against the codes — the standard memory tier
for billion-vector ANN (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011). The reference engine has no vector
surface at all (``/root/reference/query.go:12-18``); this extends the
ANN family (brute / LSH / multi-table / IVF / int8-rerank) with the
compressed-storage operating point.

Determinism end-to-end (what makes it gate-checkable):

* **Training**: one :func:`~tickdb_spark.operators.kmeans.kmeans_fit`
  per subspace over the SLICED vectors — hash-sampled train set,
  hash-min seeding, left-assoc fold scoring, IEEE-quantized BIGINT
  centroid sums. Every subspace chain replays bit-identically in DuckDB
  (``kmeans_replay_ctes(prefix=...)``).
* **Encoding**: nearest sub-centroid per (vector, subspace) via the same
  ``assign_cells`` score (``-2·v·c + |c|²``, 0.0-seeded dim loop =
  the oracle's left-assoc chain), ties to the lowest code.
* **ADC**: per (query, subspace, code) the score quantizes to BIGINT
  (``floor(x·1e10 + 0.5)``) so the per-vector total is an exact
  ORDER-INDEPENDENT integer sum — no float accumulation anywhere in the
  ranking. The per-query constant ``|q_m|²`` is omitted on both engines
  (it shifts every candidate equally; ranking is invariant).

Scale shape: codes are the stored table (corpus × m_sub bytes); a query
broadcasts its m_sub×k LUT (128 BIGINTs), the probe is one equi-join of
the exploded codes against the LUT and one map-side-combinable BIGINT
sum — shuffle is corpus × m_sub rows of (query, vec, partial), never
raw vectors. (A per-row array-fold over a broadcast LUT literal avoids
even the explode; the join form keeps the plan all-JVM and readable.)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tickdb_spark.operators.kmeans import (
    _score_sql,
    assign_cells,
    kmeans_replay_ctes,
)


def pq_train(
    emb: DataFrame,
    dim: int = 64,
    m_sub: int = 8,
    k: int = 16,
    iters: int = 2,
    sample_fraction: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train the ``m_sub`` sub-codebooks; returns
    ``codebooks[m][code] -> centroid (dim/m_sub floats)``.

    All subspaces train in lockstep: ONE seed collect (the k seed ids
    are the same rows for every subspace — the hash-min order ignores
    the vector) and ONE Spark job per Lloyd iteration covering all
    ``m_sub`` chains (a long-form ``(m, cell, sub)`` assignment kernel +
    a single ``GROUP BY (m, cell)`` of the quantized BIGINT sums). This
    is 1+iters actions instead of m_sub·(1+iters) — per-action overhead
    dominates at gate scale, and at 100 TB it is m_sub-fold fewer
    training scans. Bit-identical to per-subspace
    :func:`~tickdb_spark.operators.kmeans.kmeans_fit` (tol=0): same
    float32 slices, same 0.0-seeded left-assoc dim loop per subspace,
    same floor(x·1e10+0.5) BIGINT sums — the DuckDB replay
    (``kmeans_replay_ctes`` per subspace) still matches hash-for-hash.
    """
    import numpy as np

    from tickdb_spark.operators.sampling import hash_sample, id_hash

    d_sub = dim // m_sub
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
    # float32 → float64 before slicing == slicing then converting:
    # per-element exact widening, so per-subspace seeds are bit-identical
    # to the old per-m F.slice collects.
    seed_mat = np.vstack(seeds["v"].to_numpy()).astype("float64")
    cents = [seed_mat[:, m * d_sub : (m + 1) * d_sub].copy() for m in range(m_sub)]

    spark = train.sparkSession
    src = train.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))

    for _ in range(iters):
        bc = spark.sparkContext.broadcast(
            [np.ascontiguousarray(c) for c in cents]
        )

        def gen(batches):
            Cs = bc.value
            import pandas as pd

            norms = []
            for C in Cs:
                n2 = np.zeros(C.shape[0])
                for i in range(C.shape[1]):
                    n2 += C[:, i] * C[:, i]  # left-assoc self-dot
                norms.append(n2)
            for batch in batches:
                if len(batch) == 0:
                    continue
                V32 = np.vstack(batch["v"].to_numpy())
                out = []
                for m, (C, n2) in enumerate(zip(Cs, norms)):
                    Vs32 = V32[:, m * d_sub : (m + 1) * d_sub]
                    Vs = Vs32.astype("float64")
                    dots = np.zeros((Vs.shape[0], C.shape[0]))
                    for i in range(Vs.shape[1]):
                        # 0.0-seeded left fold = the oracle's
                        # v[1]*c[1] + v[2]*c[2] + ... chain
                        dots += Vs[:, i : i + 1] * C[None, :, i]
                    scores = -2.0 * dots + n2[None, :]
                    out.append(
                        pd.DataFrame(
                            {
                                "m": np.full(Vs.shape[0], m, dtype="int32"),
                                "cell": scores.argmin(axis=1).astype("int32"),
                                # raw float32 slice: the Spark-side
                                # floor(cast double · 1e10 + .5) below then
                                # sees the exact values kmeans_fit saw
                                "sub": list(Vs32),
                            }
                        )
                    )
                yield pd.concat(out, ignore_index=True)

        sums = (
            src.mapInPandas(gen, "m int, cell int, sub array<float>")
            .groupBy("m", "cell")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(
                        F.floor(
                            F.col("sub").getItem(j).cast("double") * F.lit(1e10)
                            + F.lit(0.5)
                        ).cast("long")
                    ).alias(f"s{j}")
                    for j in range(d_sub)
                ],
            )
            .collect()
        )
        new = [c.copy() for c in cents]
        for row in sums:
            # (long -> double) / 1e10 / n: the identical IEEE op sequence
            # kmeans_fit runs and the oracle's SQL replays.
            new[row["m"]][row["cell"]] = (
                np.array([float(row[f"s{j}"]) / 1e10 for j in range(d_sub)])
                / row["n"]
            )
        cents = new

    return [c.tolist() for c in cents]


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus → codes: one row per (vector, subspace) with the nearest
    sub-centroid's index. Long form (``vec_id, m, code``) — the shape the
    ADC join consumes; at rest you'd pivot to an array<tinyint> column."""
    m_sub = len(codebooks)
    d_sub = len(codebooks[0][0])
    parts = []
    for m in range(m_sub):
        sub = emb.select(
            F.col(id_col), F.slice(F.col(vec_col), m * d_sub + 1, d_sub).alias("_sub")
        )
        parts.append(
            assign_cells(sub, codebooks[m], id_col=id_col, vec_col="_sub")
            .select(id_col, F.lit(m).alias("m"), F.col("cell").cast("long").alias("code"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pq_adc_topk(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    query_ids: list[int],
    k_top: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k for each query id (queries drawn from the corpus, self
    excluded): build each query's quantized LUT driver-side (m_sub × k
    BIGINTs — the broadcast), join the exploded codes, rank by the exact
    integer sum. Returns ``(q_id, rank, vec_id, adc_q)``.

    ``codes`` takes the stored ``(id, m, code)`` table from
    :func:`pq_encode` — the production shape: codes ARE the compressed
    index at rest, written once at ingest; re-encoding the corpus per
    query rescans raw vectors for work that never changes. Omitted, the
    codes are derived inline from ``emb``."""
    spark = emb.sparkSession
    m_sub = len(codebooks)
    d_sub = len(codebooks[0][0])

    qrows = (
        emb.where(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
        .collect()
    )
    lut_rows = []
    for r in qrows:
        qv = [float(x) for x in r["qv"]]
        for m in range(m_sub):
            qm = qv[m * d_sub : (m + 1) * d_sub]
            for code, cent in enumerate(codebooks[m]):
                # -2·q·c + |c|² with 0.0-seeded left-assoc folds — the
                # exact op order of the oracle's _score_sql chain — then
                # IEEE-quantized to BIGINT.
                dot = 0.0
                cc = 0.0
                for j in range(d_sub):
                    dot += qm[j] * cent[j]
                    cc += cent[j] * cent[j]
                score = -2.0 * dot + cc
                lut_rows.append((r["q_id"], m, code, int(math.floor(score * 1e10 + 0.5))))
    lut = spark.createDataFrame(lut_rows, "q_id long, m long, code long, dq long")

    if codes is None:
        codes = pq_encode(emb, codebooks, id_col=id_col, vec_col=vec_col)
    adc = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .where(F.col(id_col) != F.col("q_id"))
        .groupBy("q_id", id_col)
        .agg(F.sum("dq").alias("adc_q"))
    )
    w = Window.partitionBy("q_id").orderBy("adc_q", id_col)
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k_top)
        .select("q_id", "rank", F.col(id_col).alias("vec_id"), "adc_q")
    )


def pq_adc_topk_sql(
    table: str,
    dim: int = 64,
    m_sub: int = 8,
    k: int = 16,
    iters: int = 2,
    sample_fraction: float = 0.5,
    query_ids: list[int] | None = None,
    k_top: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of train → encode → ADC: one ``kmeans_replay_ctes``
    chain per subspace (namespaced by prefix), sliced-vector encode with
    the same score chain, quantized-BIGINT LUT join, identical ranking."""
    d_sub = dim // m_sub
    qids = ", ".join(str(int(q)) for q in (query_ids or []))
    chains = []
    cb_parts = []
    code_parts = []
    lut_parts = []
    for m in range(m_sub):
        pre = f"s{m}_"
        sub_table = (
            f"(SELECT {id_col}, list_slice(CAST({vec_col} AS DOUBLE[]), "
            f"{m * d_sub + 1}, {(m + 1) * d_sub}) AS sub FROM {table})"
        )
        chains.append(
            kmeans_replay_ctes(
                sub_table, k, iters, d_sub, sample_fraction,
                id_col=id_col, vec_col="sub", prefix=pre,
            )
        )
        cb_parts.append(f"SELECT {m} AS m, cell AS code, c FROM {pre}km_cents")
        code_parts.append(
            f"""SELECT {id_col}, {m} AS m, code FROM (
      SELECT e.{id_col}, cb.code,
             ROW_NUMBER() OVER (
               PARTITION BY e.{id_col}
               ORDER BY {_score_sql('e.sub', 'cb.c', d_sub)}, cb.code) AS rn
      FROM {sub_table} e CROSS JOIN (SELECT code, c FROM pq_cb WHERE m = {m}) cb
    ) WHERE rn = 1"""
        )
        lut_parts.append(
            f"""SELECT q.{id_col} AS q_id, {m} AS m, cb.code,
           CAST(floor({_score_sql('q.sub', 'cb.c', d_sub)} * 1e10 + 0.5) AS BIGINT) AS dq
    FROM {sub_table} q CROSS JOIN (SELECT code, c FROM pq_cb WHERE m = {m}) cb
    WHERE q.{id_col} IN ({qids})"""
        )
    all_chains = ",\n    ".join(chains)
    cb = " UNION ALL ".join(cb_parts)
    codes = " UNION ALL ".join(code_parts)
    lut = " UNION ALL ".join(lut_parts)
    return f"""
    WITH {all_chains},
    pq_cb AS MATERIALIZED ({cb}),
    pq_codes AS MATERIALIZED ({codes}),
    pq_lut AS MATERIALIZED ({lut}),
    pq_adc AS (
      SELECT l.q_id, c.{id_col},
             CAST(SUM(l.dq) AS BIGINT) AS adc_q
      FROM pq_codes c JOIN pq_lut l ON l.m = c.m AND l.code = c.code
      WHERE c.{id_col} <> l.q_id
      GROUP BY l.q_id, c.{id_col}
    )
    SELECT q_id, rank, vec_id, adc_q FROM (
      SELECT q_id, {id_col} AS vec_id, adc_q,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY adc_q, {id_col}) AS BIGINT) AS rank
      FROM pq_adc
    ) WHERE rank <= {k_top}
    """


def pq_adc_rerank_topk(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    query_ids: list[int],
    shortlist: int = 50,
    k_top: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """The production PQ operating point: ADC over the codes SHORTLISTS
    ``shortlist`` candidates per query (the compressed tier scans the
    corpus), then the raw vectors of the shortlist alone are exactly
    re-scored (left-assoc fold, quantized to BIGINT) — recall comes back
    (measured 0.28 → 0.76 @5 on the gate corpus at a 10% shortlist)
    while the exact tier touches ``queries × shortlist`` vectors, not
    the corpus. Returns ``(q_id, rank, vec_id, exact_q)``."""
    from tickdb_spark.operators.similarity import dot_expr

    short = pq_adc_topk(
        emb, codebooks, query_ids, k_top=shortlist, id_col=id_col,
        vec_col=vec_col, codes=codes,
    ).select("q_id", "vec_id")
    vecs = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    qvecs = emb.where(F.col(id_col).isin([int(q) for q in query_ids])).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")
    )
    exact = F.expr(
        f"CAST(floor(((-2.0 * {dot_expr('qv', 'v')}) + {dot_expr('v', 'v')})"
        " * 1e10 + 0.5) AS BIGINT)"
    )
    cand = (
        short.join(vecs, "vec_id")
        .join(F.broadcast(qvecs), "q_id")
        .withColumn("exact_q", exact)
    )
    w = Window.partitionBy("q_id").orderBy("exact_q", "vec_id")
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k_top)
        .select("q_id", "rank", "vec_id", "exact_q")
    )


def pq_adc_rerank_topk_sql(
    table: str,
    dim: int = 64,
    m_sub: int = 8,
    k: int = 16,
    iters: int = 2,
    sample_fraction: float = 0.5,
    query_ids: list[int] | None = None,
    shortlist: int = 50,
    k_top: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of ``pq_adc_rerank_topk``: the full ADC query nests
    as the shortlist CTE, then the exact chain re-scores it."""
    from tickdb_spark.operators.similarity import dot_expr

    inner = pq_adc_topk_sql(
        table, dim=dim, m_sub=m_sub, k=k, iters=iters,
        sample_fraction=sample_fraction, query_ids=query_ids,
        k_top=shortlist, id_col=id_col, vec_col=vec_col,
    )
    qids = ", ".join(str(int(q)) for q in (query_ids or []))
    chain = (
        f"((-2.0 * {dot_expr('q.qv', 'e.v', dim, sql=True)})"
        f" + {dot_expr('e.v', 'e.v', dim, sql=True)})"
    )
    return f"""
    WITH short AS MATERIALIZED ({inner}),
    vecs AS MATERIALIZED (
      SELECT {id_col} AS vec_id, CAST({vec_col} AS DOUBLE[]) AS v FROM {table}
    ),
    qvecs AS MATERIALIZED (
      SELECT {id_col} AS q_id, CAST({vec_col} AS DOUBLE[]) AS qv
      FROM {table} WHERE {id_col} IN ({qids})
    ),
    cand AS (
      SELECT s.q_id, s.vec_id,
             CAST(floor({chain} * 1e10 + 0.5) AS BIGINT) AS exact_q
      FROM short s
      JOIN vecs e ON e.vec_id = s.vec_id
      JOIN qvecs q ON q.q_id = s.q_id
    )
    SELECT q_id, rank, vec_id, exact_q FROM (
      SELECT q_id, vec_id, exact_q,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY exact_q, vec_id) AS BIGINT) AS rank
      FROM cand
    ) WHERE rank <= {k_top}
    """


def ivfadc_topk(
    emb: DataFrame,
    coarse_cents: list[list[float]],
    codebooks: list[list[list[float]]],
    query_ids: list[int],
    n_probe: int = 2,
    shortlist: int = 30,
    k_top: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
    cell_assign: DataFrame | None = None,
) -> DataFrame:
    """The full FAISS-shape index (IVFADC, Jégou et al. §IV): a coarse
    quantizer prunes the corpus to the query's ``n_probe`` nearest cells,
    ADC over the PQ codes ranks ONLY those cells' members, and the
    shortlist is exactly re-scored. Three cost tiers at 100 TB: the cell
    assignment is an ingest-time precompute (a stored column), the ADC
    tier scans codes of ~n_probe/k_cells of the corpus, and the exact
    tier touches ``queries × shortlist`` raw vectors.

    Returns ``(q_id, rank, vec_id, exact_q)``. Same determinism
    contract as the rest of the module: every ranking key is either an
    integer or a shared left-assoc-fold double."""
    # both the cell assignment and the PQ codes are ingest-time stored
    # columns at scale (tier 1 below); accept them precomputed
    cells = (
        cell_assign
        if cell_assign is not None
        else assign_cells(
            emb.select(id_col, vec_col), coarse_cents, id_col=id_col, vec_col=vec_col
        ).select(id_col, F.col("cell").cast("long").alias("cell"))
    )

    # per-query probe set: rank the coarse cells by the same score chain,
    # driver-side (k_cells × n_queries scalars)
    qrows = (
        emb.where(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
        .collect()
    )
    probe_rows = []
    for r in qrows:
        qv = [float(x) for x in r["qv"]]
        scored = []
        for ci, cent in enumerate(coarse_cents):
            dot = 0.0
            cc = 0.0
            for j in range(len(cent)):
                dot += qv[j] * cent[j]
                cc += cent[j] * cent[j]
            scored.append((-2.0 * dot + cc, ci))
        scored.sort()
        probe_rows += [(r["q_id"], ci) for _, ci in scored[:n_probe]]
    spark = emb.sparkSession
    probes = spark.createDataFrame(probe_rows, "q_id long, cell long")

    cand = cells.join(F.broadcast(probes), "cell").select("q_id", id_col)

    # ADC over the candidates only: codes ⋈ candidate set ⋈ broadcast LUT
    m_sub = len(codebooks)
    d_sub = len(codebooks[0][0])
    lut_rows = []
    for r in qrows:
        qv = [float(x) for x in r["qv"]]
        for m in range(m_sub):
            qm = qv[m * d_sub : (m + 1) * d_sub]
            for code, cent in enumerate(codebooks[m]):
                dot = 0.0
                cc = 0.0
                for j in range(d_sub):
                    dot += qm[j] * cent[j]
                    cc += cent[j] * cent[j]
                lut_rows.append(
                    (r["q_id"], m, code, int(math.floor((-2.0 * dot + cc) * 1e10 + 0.5)))
                )
    lut = spark.createDataFrame(lut_rows, "q_id long, m long, code long, dq long")
    if codes is None:
        codes = pq_encode(emb, codebooks, id_col=id_col, vec_col=vec_col)
    adc = (
        codes.join(cand, id_col)
        .join(F.broadcast(lut), ["q_id", "m", "code"])
        .where(F.col(id_col) != F.col("q_id"))
        .groupBy("q_id", id_col)
        .agg(F.sum("dq").alias("adc_q"))
    )
    w = Window.partitionBy("q_id").orderBy("adc_q", id_col)
    short = (
        adc.withColumn("srank", F.row_number().over(w))
        .where(F.col("srank") <= shortlist)
        .select("q_id", F.col(id_col).alias("vec_id"))
    )

    from tickdb_spark.operators.similarity import dot_expr

    vecs = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    qvecs = emb.where(F.col(id_col).isin([int(q) for q in query_ids])).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv")
    )
    exact = F.expr(
        f"CAST(floor(((-2.0 * {dot_expr('qv', 'v')}) + {dot_expr('v', 'v')})"
        " * 1e10 + 0.5) AS BIGINT)"
    )
    reranked = (
        short.join(vecs, "vec_id")
        .join(F.broadcast(qvecs), "q_id")
        .withColumn("exact_q", exact)
    )
    w2 = Window.partitionBy("q_id").orderBy("exact_q", "vec_id")
    return (
        reranked.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k_top)
        .select("q_id", "rank", "vec_id", "exact_q")
    )


def ivfadc_topk_sql(
    table: str,
    dim: int = 64,
    k_cells: int = 4,
    coarse_iters: int = 3,
    m_sub: int = 8,
    k: int = 16,
    iters: int = 2,
    sample_fraction: float = 0.5,
    query_ids: list[int] | None = None,
    n_probe: int = 2,
    shortlist: int = 30,
    k_top: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of ``ivfadc_topk``: the coarse trainer replays under
    the ``coarse_`` prefix, the m_sub PQ trainers under ``s{m}_``, and
    the probe / candidate / ADC / rerank stages mirror the engine
    stage-for-stage."""
    d_sub = dim // m_sub
    qids = ", ".join(str(int(q)) for q in (query_ids or []))
    coarse = kmeans_replay_ctes(
        table, k_cells, coarse_iters, dim, sample_fraction,
        id_col=id_col, vec_col=vec_col, prefix="coarse_",
    )
    pq_chains = []
    cb_parts = []
    code_parts = []
    lut_parts = []
    for m in range(m_sub):
        pre = f"s{m}_"
        sub_table = (
            f"(SELECT {id_col}, list_slice(CAST({vec_col} AS DOUBLE[]), "
            f"{m * d_sub + 1}, {(m + 1) * d_sub}) AS sub FROM {table})"
        )
        pq_chains.append(
            kmeans_replay_ctes(
                sub_table, k, iters, d_sub, sample_fraction,
                id_col=id_col, vec_col="sub", prefix=pre,
            )
        )
        cb_parts.append(f"SELECT {m} AS m, cell AS code, c FROM {pre}km_cents")
        code_parts.append(
            f"""SELECT {id_col}, {m} AS m, code FROM (
      SELECT e.{id_col}, cb.code,
             ROW_NUMBER() OVER (
               PARTITION BY e.{id_col}
               ORDER BY {_score_sql('e.sub', 'cb.c', d_sub)}, cb.code) AS rn
      FROM {sub_table} e CROSS JOIN (SELECT code, c FROM pq_cb WHERE m = {m}) cb
    ) WHERE rn = 1"""
        )
        lut_parts.append(
            f"""SELECT q.{id_col} AS q_id, {m} AS m, cb.code,
           CAST(floor({_score_sql('q.sub', 'cb.c', d_sub)} * 1e10 + 0.5) AS BIGINT) AS dq
    FROM {sub_table} q CROSS JOIN (SELECT code, c FROM pq_cb WHERE m = {m}) cb
    WHERE q.{id_col} IN ({qids})"""
        )
    from tickdb_spark.operators.similarity import dot_expr

    exact_chain = (
        f"((-2.0 * {dot_expr('q.qv', 'e.v', dim, sql=True)})"
        f" + {dot_expr('e.v', 'e.v', dim, sql=True)})"
    )
    pq_all = ",\n    ".join(pq_chains)
    cb_all = " UNION ALL ".join(cb_parts)
    codes_all = " UNION ALL ".join(code_parts)
    lut_all = " UNION ALL ".join(lut_parts)
    return f"""
    WITH {coarse},
    {pq_all},
    ivf_all AS MATERIALIZED (
      SELECT {id_col} AS id, CAST({vec_col} AS DOUBLE[]) AS v FROM {table}
    ),
    ivf_cells AS MATERIALIZED (
      SELECT id, cell FROM (
        SELECT a.id, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY a.id
                 ORDER BY {_score_sql('a.v', 'c.c', dim)}, c.cell) AS rn
        FROM ivf_all a CROSS JOIN coarse_km_cents c
      ) WHERE rn = 1
    ),
    ivf_probe AS MATERIALIZED (
      SELECT q_id, cell FROM (
        SELECT q.id AS q_id, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY q.id
                 ORDER BY {_score_sql('q.v', 'c.c', dim)}, c.cell) AS rn
        FROM ivf_all q CROSS JOIN coarse_km_cents c
        WHERE q.id IN ({qids})
      ) WHERE rn <= {n_probe}
    ),
    ivf_cand AS MATERIALIZED (
      SELECT p.q_id, m.id FROM ivf_probe p JOIN ivf_cells m ON m.cell = p.cell
    ),
    pq_cb AS MATERIALIZED ({cb_all}),
    pq_codes AS MATERIALIZED ({codes_all}),
    pq_lut AS MATERIALIZED ({lut_all}),
    ivf_adc AS (
      SELECT l.q_id, c.{id_col} AS id,
             CAST(SUM(l.dq) AS BIGINT) AS adc_q
      FROM pq_codes c
      JOIN ivf_cand d ON d.id = c.{id_col}
      JOIN pq_lut l ON l.q_id = d.q_id AND l.m = c.m AND l.code = c.code
      WHERE c.{id_col} <> l.q_id
      GROUP BY l.q_id, c.{id_col}
    ),
    ivf_short AS MATERIALIZED (
      SELECT q_id, id FROM (
        SELECT q_id, id,
               ROW_NUMBER() OVER (
                 PARTITION BY q_id ORDER BY adc_q, id) AS srank
        FROM ivf_adc
      ) WHERE srank <= {shortlist}
    ),
    ivf_rr AS (
      SELECT s.q_id, s.id AS vec_id,
             CAST(floor({exact_chain} * 1e10 + 0.5) AS BIGINT) AS exact_q
      FROM ivf_short s
      JOIN ivf_all e ON e.id = s.id
      JOIN (SELECT id AS qid2, v AS qv FROM ivf_all WHERE id IN ({qids})) q
        ON q.qid2 = s.q_id
    )
    SELECT q_id, rank, vec_id, exact_q FROM (
      SELECT q_id, vec_id, exact_q,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY exact_q, vec_id) AS BIGINT) AS rank
      FROM ivf_rr
    ) WHERE rank <= {k_top}
    """


def pq_codes_sql(
    table: str,
    dim: int = 64,
    m_sub: int = 8,
    k: int = 16,
    iters: int = 2,
    sample_fraction: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of train → :func:`pq_encode` alone: the batch-built
    stored code table ``(vec_id, m, code)`` with the trainers replayed —
    the oracle for INCREMENTAL code maintenance (the maintained table
    must equal this, because codes are a pure per-vector function of the
    frozen codebooks)."""
    d_sub = dim // m_sub
    chains = []
    cb_parts = []
    code_parts = []
    for m in range(m_sub):
        pre = f"s{m}_"
        sub_table = (
            f"(SELECT {id_col}, list_slice(CAST({vec_col} AS DOUBLE[]), "
            f"{m * d_sub + 1}, {(m + 1) * d_sub}) AS sub FROM {table})"
        )
        chains.append(
            kmeans_replay_ctes(
                sub_table, k, iters, d_sub, sample_fraction,
                id_col=id_col, vec_col="sub", prefix=pre,
            )
        )
        cb_parts.append(f"SELECT {m} AS m, cell AS code, c FROM {pre}km_cents")
        code_parts.append(
            f"""SELECT {id_col}, {m} AS m, code FROM (
      SELECT e.{id_col}, cb.code,
             ROW_NUMBER() OVER (
               PARTITION BY e.{id_col}
               ORDER BY {_score_sql('e.sub', 'cb.c', d_sub)}, cb.code) AS rn
      FROM {sub_table} e CROSS JOIN (SELECT code, c FROM pq_cb WHERE m = {m}) cb
    ) WHERE rn = 1"""
        )
    all_chains = ",\n    ".join(chains)
    cb = " UNION ALL ".join(cb_parts)
    codes = " UNION ALL ".join(code_parts)
    return f"""
    WITH {all_chains},
    pq_cb AS MATERIALIZED ({cb}),
    pq_codes AS MATERIALIZED ({codes})
    SELECT {id_col}, CAST(m AS BIGINT) AS m, CAST(code AS BIGINT) AS code
    FROM pq_codes
    """
