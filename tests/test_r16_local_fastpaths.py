"""r16 optimization: the size-gated LOCAL fast paths must be
bit-identical to the distributed loops they shortcut.

Each test runs the same operator twice — once through the local path
(default ceilings) and once with the ceiling monkeypatched to 0 so the
distributed loop runs — and compares the full sorted row sets.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tickdb_spark.operators import cluster as _cluster
from tickdb_spark.operators import diversify as _diversify


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# a dense 5-clique + a 2-core ring + pendant chain: exercises several
# peel rounds and distinct core numbers
_EDGES = (
    [(a, b) for a in range(5) for b in range(a + 1, 5)]
    + [(10, 11), (11, 12), (12, 13), (13, 10)]
    + [(13, 20), (20, 21)]
)


def test_kcore_nodes_local_matches_distributed(spark, monkeypatch):
    pairs = _pairs(spark, _EDGES)
    local = _rows(_cluster.kcore_nodes(pairs, k=2))
    monkeypatch.setattr(_cluster, "KCORE_LOCAL_MAX_EDGES", 0)
    dist = _rows(_cluster.kcore_nodes(pairs, k=2))
    assert local == dist
    assert local  # the clique + ring survive k=2


def test_kcore_decompose_local_matches_distributed(spark, monkeypatch):
    pairs = _pairs(spark, _EDGES)
    local = _rows(_cluster.kcore_decompose(pairs))
    monkeypatch.setattr(_cluster, "KCORE_LOCAL_MAX_EDGES", 0)
    dist = _rows(_cluster.kcore_decompose(pairs))
    assert local == dist
    cores = dict(local)
    assert cores[0] == 4 and cores[10] == 2 and cores[21] == 1


def test_cc_local_matches_distributed(spark, monkeypatch):
    # chain + clique + singletons: exercises multi-round label flow and
    # the singleton coalesce
    edges = [(1, 2), (2, 3), (3, 4)] + [(a, b) for a in (20, 21, 22) for b in (21, 22, 23) if a < b]
    pairs = _pairs(spark, edges)
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 20, 21, 22, 23, 99]], "doc_id long"
    )
    local = _rows(_cluster.connected_components(nodes, pairs, id_col="doc_id"))
    monkeypatch.setattr(_cluster, "CC_LOCAL_MAX_EDGES", 0)
    dist = _rows(_cluster.connected_components(nodes, pairs, id_col="doc_id"))
    assert local == dist
    comp = dict(local)
    assert comp[4] == 1 and comp[23] == 20 and comp[99] == 99


def test_cc_local_empty_edges(spark):
    nodes = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    pairs = _pairs(spark, [])
    rows = _rows(_cluster.connected_components(nodes, pairs, id_col="doc_id"))
    assert rows == [(i, i) for i in range(5)]


def _emb(spark, n=40, dim=8, seed=7):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1.0, 1.0) for _ in range(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kcenter_local_matches_distributed(spark, monkeypatch):
    emb = _emb(spark)
    local = _rows(_diversify.kcenter_select(emb, k=5))
    monkeypatch.setattr(_diversify, "KCENTER_LOCAL_MAX_VECS", 0)
    dist = _rows(_diversify.kcenter_select(emb, k=5))
    assert local == dist
    assert len(local) == 5


def test_kcenter_local_matches_distributed_with_floor(spark, monkeypatch):
    emb = _emb(spark, n=30)
    local = _rows(
        _diversify.kcenter_select(emb, k=4, query_id=0, rel_floor_ppm=-1_000_000)
    )
    monkeypatch.setattr(_diversify, "KCENTER_LOCAL_MAX_VECS", 0)
    dist = _rows(
        _diversify.kcenter_select(emb, k=4, query_id=0, rel_floor_ppm=-1_000_000)
    )
    assert local == dist
    assert all(vid != 0 for _, vid, _ in local)


def test_kcenter_local_undersized_and_empty(spark):
    emb = _emb(spark, n=3)
    rows = _rows(_diversify.kcenter_select(emb, k=8))
    assert len(rows) == 3  # corpus smaller than k: selection is the corpus
    empty = _emb(spark, n=0)
    assert _rows(_diversify.kcenter_select(empty, k=4)) == []
