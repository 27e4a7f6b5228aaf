"""Trained document-quality classifier: a batch perceptron learned
in-engine — the supervised sibling of the k-means trainer
(``operators/kmeans.py``) and BPE trainer (``operators/bpe.py``).

Production pipelines train quality classifiers (CCNet's fastText /
logistic models) to separate keep/drop documents; the gradient loop is a
distributed aggregation job. The perceptron variant keeps EVERY piece of
state integer-exact, which is what makes the trained model
oracle-replayable: features are integer token statistics, labels are
±1, and the batch update

    w_{e+1} = w_e + sum over misclassified i of y_i * x_i
    (misclassified: y_i * (w_e . x_i) <= 0)

is one hash aggregate per epoch over BIGINTs — no sigmoid, no float
ulp hazard anywhere (a logistic trainer's exp() differs in the last ulp
across engines; the perceptron's sign test cannot).

Scale shape: each epoch is a single map-side-combinable aggregate over
the corpus (the same shape as k-means assign+update); the weight vector
(k+1 ints) is the only driver state. The DuckDB twin unrolls epochs as
MATERIALIZED CTEs, exactly like the Lloyd replay.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tickdb_spark.functions.text import TOKEN_SEP

#: (name, Spark builder, DuckDB SQL) — integer token statistics. Kept in
#: one place so engine and oracle cannot drift.
def _feature_cols(text: Column) -> list[Column]:
    toks = F.split(F.trim(text), TOKEN_SEP)
    return [
        # bias scaled to the other features' magnitude: a unit bias moves
        # ~300x slower than the length features and the batch perceptron
        # stalls at chance (measured 0.51 acc at bias=1 vs 0.998 at 256)
        F.lit(256).cast("long"),
        F.length(text).cast("long"),
        F.size(toks).cast("long"),
        F.array_max(F.transform(toks, lambda t: F.length(t))).cast("long"),
    ]


FEATURE_SQL = [
    "256::BIGINT",
    "length({t})::BIGINT",
    "len(string_split_regex(trim({t}), '\\s+'))::BIGINT",
    "list_max(list_transform(string_split_regex(trim({t}), '\\s+'), "
    "x -> length(x)))::BIGINT",
]
N_FEATURES = len(FEATURE_SQL)


def _features(docs: DataFrame, text_col: str, id_col: str, label: Column) -> DataFrame:
    cols = _feature_cols(F.col(text_col))
    return docs.select(
        F.col(id_col),
        *[c.alias(f"x{j}") for j, c in enumerate(cols)],
        label.cast("long").alias("y"),
    )


def perceptron_train(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    epochs: int = 20,
) -> list[int]:
    """Train integer weights; returns ``[w0..w{k-1}]`` after ``epochs``
    full-batch updates from w = 0. Deterministic: the misclassified-sum
    aggregate is order-free integer addition."""
    feats = _features(docs, text_col, id_col, label).localCheckpoint()
    w = [0] * N_FEATURES
    for _ in range(epochs):
        margin = sum(F.col(f"x{j}") * F.lit(w[j]) for j in range(N_FEATURES))
        mis = feats.where(F.col("y") * margin <= 0)
        upd = mis.agg(
            *[
                F.coalesce(F.sum(F.col("y") * F.col(f"x{j}")), F.lit(0)).alias(f"d{j}")
                for j in range(N_FEATURES)
            ]
        ).collect()[0]
        w = [w[j] + int(upd[f"d{j}"]) for j in range(N_FEATURES)]
    return w


def perceptron_score(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    epochs: int = 20,
    weights: list[int] | None = None,
) -> DataFrame:
    """Train, then score every document with the learned weights:
    ``(id, y, margin, pred, correct)`` — margin = w.x (BIGINT), pred =
    +1 when margin > 0 else -1 (ties predict -1 on both engines).

    ``weights`` (r17 opt): accept a pre-trained weight vector — trained
    state is ingest-time state (the BPE/unigram/k-means memo
    precedent); callers scoring the same corpus repeatedly train once.
    The oracle still replays the trainer per entry, so a memoized
    vector that drifted from a cold train would hash-mismatch."""
    w = (
        list(weights)
        if weights is not None
        else perceptron_train(docs, label, text_col, id_col, epochs)
    )
    feats = _features(docs, text_col, id_col, label)
    margin = sum(F.col(f"x{j}") * F.lit(w[j]) for j in range(N_FEATURES))
    return feats.select(
        id_col,
        "y",
        margin.cast("long").alias("margin"),
        F.when(margin > 0, F.lit(1)).otherwise(F.lit(-1)).cast("long").alias("pred"),
        (
            F.when(margin > 0, F.lit(1)).otherwise(F.lit(-1)) == F.col("y")
        ).alias("correct"),
    )


def perceptron_score_sql(
    label_sql: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    epochs: int = 20,
) -> str:
    """DuckDB twin: the epoch loop unrolled as MATERIALIZED CTEs (one
    weight row each), then the same scoring projection."""
    fx = [f.format(t=text_col) for f in FEATURE_SQL]
    feat_cols = ", ".join(f"{fx[j]} AS x{j}" for j in range(N_FEATURES))
    ctes = [
        f"feats AS MATERIALIZED (SELECT {id_col}, {feat_cols}, "
        f"({label_sql})::BIGINT AS y FROM {table})",
        "w0 AS MATERIALIZED (SELECT "
        + ", ".join(f"0::BIGINT AS w{j}" for j in range(N_FEATURES))
        + ")",
    ]
    for e in range(epochs):
        margin = " + ".join(f"f.x{j} * w.w{j}" for j in range(N_FEATURES))
        upd = ", ".join(
            f"w.w{j} + COALESCE(SUM(CASE WHEN f.y * ({margin}) <= 0 "
            f"THEN f.y * f.x{j} END), 0) AS w{j}"
            for j in range(N_FEATURES)
        )
        ctes.append(
            f"w{e + 1} AS MATERIALIZED (SELECT {upd} FROM feats f, w{e} w "
            f"GROUP BY {', '.join(f'w.w{j}' for j in range(N_FEATURES))})"
        )
    margin = " + ".join(f"f.x{j} * w.w{j}" for j in range(N_FEATURES))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT f.{id_col}, f.y,
           CAST({margin} AS BIGINT) AS margin,
           CAST(CASE WHEN ({margin}) > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred,
           (CASE WHEN ({margin}) > 0 THEN 1 ELSE -1 END) = f.y AS correct
    FROM feats f, w{epochs} w
    """
    )
