"""Embedding covariance + PCA projection — the preprocessing tier for
embedding pipelines (decorrelate/whiten/reduce before ANN indexing; PQ
in particular quantizes better on decorrelated axes — Jégou et al. §V).

Two-stage split along the determinism boundary:

* :func:`embedding_covariance` — the DISTRIBUTED part, fully
  hash-checkable: per-dim linear sums and per-pair product sums as
  quantized BIGINTs (each product ``v_i·v_j`` is ONE IEEE multiply of
  float32-widened doubles, then ``floor(x·1e10+0.5)`` — exact integer
  sums, order-independent, bit-identical cross-engine). The covariance
  value is the pinned expression
  ``(P/1e10 − (Si/1e10)·(Sj/1e10)/n)/n`` — four IEEE ops on exact
  integers. One corpus scan, d·(d+1)/2 + d partial rows per Arrow batch
  (the shuffle is O(d²·partitions), never O(rows)).
* :func:`pca_fit` / :func:`pca_project` — the driver-side eigen part
  (numpy ``eigh`` on the d×d matrix: d=64 ⇒ microseconds; LAPACK is not
  SQL-replayable, so this half is proven by property tests — projected
  variance equals eigenvalues, components orthonormal, reconstruction
  error bounded — instead of an oracle hash). Projection itself is the
  literal-fold chain (`dot_literal_expr`), so PROJECTED columns are
  again deterministic given the fitted components.

At 100 TB: the covariance aggregate is map-side combinable (each task
emits one d²/2 partial), the eigensolve is O(d³) on the driver once,
and projection is a stored ingest-time column like JL/PQ/LSH state.
The BIGINT partials hold to ~1e9 rows at |v·v|≈10 (5e14 units/row);
beyond that, rescale the quantum or sum as DECIMAL(38,0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1e10


def embedding_covariance(
    emb: DataFrame,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact quantized covariance: ``(i, j, n, cov)`` for the upper
    triangle 0 ≤ i ≤ j < dim (0-based)."""
    import numpy as np
    import pandas as pd

    iu, ju = np.triu_indices(dim)

    def partials(batches):
        for batch in batches:
            if len(batch) == 0:
                continue
            V = np.vstack(batch["v"].to_numpy()).astype("float64")
            # per-pair product sums: elementwise double multiply (the
            # oracle's CAST(v[i])*CAST(v[j])), quantize, exact int sum
            rows_i, rows_j, rows_s = [], [], []
            for i, j in zip(iu, ju):
                prod = V[:, i] * V[:, j]
                q = np.floor(prod * QUANT + 0.5).astype("int64")
                rows_i.append(int(i))
                rows_j.append(int(j))
                rows_s.append(int(q.sum()))
            # linear sums ride along as j = -1 rows
            for i in range(dim):
                q = np.floor(V[:, i] * QUANT + 0.5).astype("int64")
                rows_i.append(i)
                rows_j.append(-1)
                rows_s.append(int(q.sum()))
            # row count as (-1, -1)
            rows_i.append(-1)
            rows_j.append(-1)
            rows_s.append(int(V.shape[0]))
            yield pd.DataFrame({"i": rows_i, "j": rows_j, "s": rows_s})

    agg = (
        emb.select(F.col(vec_col).alias("v"))
        .mapInPandas(partials, "i int, j int, s long")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        # r16 opt: this d²/2+d+1-row aggregate (2,145 rows at d=64) is
        # referenced FOUR times below (n, lin as i-side, lin as j-side,
        # prod) and each broadcast build re-ran the whole corpus
        # mapInPandas pass (guide §2.4 / CLAUDE.md multiply-referenced-
        # subtree class). Eager checkpoint = one corpus scan total; the
        # checkpointed state is dimension-sized, never corpus-sized.
        .localCheckpoint(eager=True)
    )
    n = agg.where((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("s").alias("_n")
    )
    lin = agg.where(F.col("j") == -1).where(F.col("i") >= 0).select(
        F.col("i").alias("_li"), F.col("s").alias("_ls")
    )
    prod = agg.where(F.col("j") >= 0)
    out = (
        prod.crossJoin(F.broadcast(n))
        .join(F.broadcast(lin.withColumnRenamed("_li", "i").withColumnRenamed("_ls", "_si")), "i")
        .join(F.broadcast(lin.withColumnRenamed("_li", "j").withColumnRenamed("_ls", "_sj")), "j")
    )
    # pinned op order: (P/1e10 - (Si/1e10) * (Sj/1e10) / n) / n
    cov = (
        F.col("s").cast("double") / F.lit(QUANT)
        - (F.col("_si").cast("double") / F.lit(QUANT))
        * (F.col("_sj").cast("double") / F.lit(QUANT))
        / F.col("_n").cast("double")
    ) / F.col("_n").cast("double")
    return out.select(
        "i", "j", F.col("_n").cast("long").alias("n"), cov.alias("cov")
    )


def embedding_covariance_sql(
    table: str,
    dim: int = 64,
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin: same quantized sums via a dim-pair lateral walk."""
    q = f"{QUANT!r}"
    return f"""
    WITH src AS MATERIALIZED (
      SELECT {vec_col} AS v FROM {table}
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM src),
    lin AS MATERIALIZED (
      SELECT g.i,
             CAST(SUM(CAST(floor(CAST(v[g.i + 1] AS DOUBLE) * {q} + 0.5)
                           AS BIGINT)) AS BIGINT) AS si
      FROM src, (SELECT range AS i FROM range({dim})) g
      GROUP BY g.i
    ),
    prod AS (
      SELECT p.i, p.j,
             CAST(SUM(CAST(floor(
               CAST(v[p.i + 1] AS DOUBLE) * CAST(v[p.j + 1] AS DOUBLE)
               * {q} + 0.5) AS BIGINT)) AS BIGINT) AS s
      FROM src, (
        SELECT a.range AS i, b.range AS j
        FROM range({dim}) a, range({dim}) b WHERE a.range <= b.range
      ) p
      GROUP BY p.i, p.j
    )
    SELECT * FROM (
      SELECT prod.i AS i, prod.j AS j, nn.n AS n,
             (CAST(prod.s AS DOUBLE) / {q}
              - (CAST(la.si AS DOUBLE) / {q})
                * (CAST(lb.si AS DOUBLE) / {q}) / CAST(nn.n AS DOUBLE))
             / CAST(nn.n AS DOUBLE) AS cov
      FROM prod, nn
      JOIN lin la ON la.i = prod.i
      JOIN lin lb ON lb.i = prod.j
    )
    """


def pca_fit(
    emb: DataFrame,
    k: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Top-k principal components from the exact covariance (driver-side
    ``eigh`` on the d×d matrix). Returns ``(components[k][dim],
    eigenvalues[k], means[dim])`` — KBs of state, broadcastable."""
    import numpy as np

    rows = embedding_covariance(emb, dim, id_col, vec_col).collect()
    n = rows[0]["n"]
    C = np.zeros((dim, dim))
    for r in rows:
        C[r["i"], r["j"]] = r["cov"]
        C[r["j"], r["i"]] = r["cov"]
    # means from the same quantized linear sums (re-aggregated cheaply)
    mdf = (
        emb.select(F.col(vec_col).alias("v"))
        .select(
            *[
                F.sum(
                    F.floor(
                        F.col("v").getItem(i).cast("double") * F.lit(QUANT)
                        + F.lit(0.5)
                    ).cast("long")
                ).alias(f"s{i}")
                for i in range(dim)
            ]
        )
        .first()
    )
    means = np.array([float(mdf[f"s{i}"]) / QUANT / n for i in range(dim)])
    w, vecs = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:k]
    return vecs[:, order].T.tolist(), w[order].tolist(), means.tolist()


def pca_project(
    emb: DataFrame,
    components: list[list[float]],
    means: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project (centered) vectors onto the fitted components:
    ``(id, pc: array<double>)`` — each coordinate a literal fold like
    the JL/LSH chains, deterministic given the components."""
    from tickdb_spark.operators.similarity import dot_literal_expr

    coords = []
    for comp in components:
        # (v - mean)·comp = v·comp - mean·comp; fold the first, fold the
        # constant offset driver-side
        off = 0.0
        for m, c in zip(means, comp):
            off += m * c
        coords.append(f"({dot_literal_expr(vec_col, comp)} - ({off!r}))")
    return emb.select(
        F.col(id_col), F.expr("array(" + ", ".join(coords) + ")").alias("pc")
    )
