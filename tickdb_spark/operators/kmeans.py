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


def _corpus_matrix(emb: DataFrame, id_col: str, vec_col: str):
    import numpy as np

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
        # per-cell running sums: k·d doubles of state per task (map-side
        # combine), one k-row shuffle
        sums = (
            assigned.groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.col(vec_col).getItem(j).cast("double")).alias(f"s{j}")
                    for j in range(centroids.shape[1])
                ],
            )
            .collect()
        )
        new = centroids.copy()
        for row in sums:
            c = row["cell"]
            new[c] = np.array([row[f"s{j}"] for j in range(centroids.shape[1])]) / row["n"]
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
    c_norm2 = (C * C).sum(axis=1)
    bc = spark.sparkContext.broadcast((C, c_norm2))
    cols = emb.columns

    def gen(batches):
        Cb, n2 = bc.value
        for batch in batches:
            if len(batch) == 0:
                continue
            V = np.vstack(batch[vec_col].to_numpy()).astype("float64")
            # |v-c|² up to the constant |v|²: -2 v·c + |c|²
            scores = -2.0 * (V @ Cb.T) + n2[None, :]
            out = batch.copy()
            out["cell"] = scores.argmin(axis=1).astype("int32")
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in emb.schema.fields)
    return emb.mapInPandas(gen, f"{schema}, cell int")


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
