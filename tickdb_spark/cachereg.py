"""Bounded lifecycle for corpus-token-sized cached substrates.

r17 (VERDICT r16 ask #4 / ADVICE): the r16 detector/gram caches are
corpus-TOKEN-volume frames (exploded shingles, n-gram streams) persisted
with ``DataFrame.cache()`` and never unpersisted. Within one entry that
is the right call — the substrate feeds 5–12 consumer subtrees and nine
registry entries share the same detector plan verbatim, so the
InMemoryRelation reuse is the optimization. Across a long multi-entry
session, though, every DISTINCT corpus substrate accumulates in storage
memory and (at the default MEMORY_AND_DISK level) spills to local disk
under pressure — at 100 TB that is ~the corpus written to executor
disks, with nothing ever reclaiming it.

The contract here makes both decisions explicit:

* **Storage level**: ``MEMORY_AND_DISK`` (deserialized), stated rather
  than inherited — evicted blocks spill instead of being recomputed,
  because every holder feeds multiple parallel consumer stages of one
  action (the r13 lazy-cache lesson: a recompute-on-miss level pays the
  tokenize per consumer exactly when memory is tight).
* **Lifecycle**: at most ``SPARKTICK_CORPUS_CACHE_SLOTS`` (default 8)
  corpus substrates are held; materializing a new one unpersists the
  oldest beyond the cap (FIFO — the oldest is the least likely to be
  shared by upcoming entries). Total cache footprint is therefore
  bounded by ``slots x substrate size`` regardless of session length.
  The gate/bench session creates ~6 distinct substrates, so locally the
  cap never evicts and plans are unchanged; a production session over
  many corpora sets the env var lower — or materializes the substrate
  as an intermediate TABLE, which is the documented 100 TB shape.

Dimension-sized frames (per-doc ``sizes``, τ-reduced ``prefix``,
doc x band ``banded``, query-term-filtered tf) stay on plain
``cache()`` — their footprint does not scale with token volume.
"""

from __future__ import annotations

import os
from collections import OrderedDict

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def _slots() -> int:
    return int(os.environ.get("SPARKTICK_CORPUS_CACHE_SLOTS", "8"))


#: Live corpus-sized substrates, insertion-ordered. Keyed by the plan's
#: SEMANTIC HASH, not id(df): detector helpers are called once per
#: consumer entry and every call builds a new DataFrame over the SAME
#: plan — Spark's CacheManager dedupes those to one InMemoryRelation,
#: so per-object keys would (a) burn a slot per call and (b) on
#: eviction unpersist a relation other registered handles still serve
#: (measured r17: nine τ=0.5 detector calls evicted the shared corpus
#: gram table mid-bench and its next consumer re-derived it at RUN
#: time). One slot per distinct substrate; a re-registration refreshes
#: recency instead of evicting.
_LIVE: "OrderedDict[int, DataFrame]" = OrderedDict()


def _plan_key(df: DataFrame) -> int:
    try:
        return int(df._jdf.queryExecution().analyzed().semanticHash())
    except Exception:
        return id(df)  # degraded mode: per-object key (still bounded)


def corpus_persist(df: DataFrame, materialize: bool = True) -> DataFrame:
    """Persist a corpus-token-sized substrate under the bounded contract
    above. Returns ``df`` (persisted, and materialized by default so
    parallel consumer stages of the first action read the cache instead
    of re-running the tokenize — the r13/r16 eager-cache discipline)."""
    df.persist(StorageLevel.MEMORY_AND_DISK)
    if materialize:
        df.count()
    key = _plan_key(df)
    _LIVE.pop(key, None)  # re-registration refreshes recency
    _LIVE[key] = df
    while len(_LIVE) > _slots():
        _, old = _LIVE.popitem(last=False)
        try:
            old.unpersist()
        except Exception:
            pass  # session torn down; nothing to reclaim
    return df


def evict_all() -> None:
    """Unpersist every registered substrate (tests / session teardown)."""
    while _LIVE:
        _, old = _LIVE.popitem(last=False)
        try:
            old.unpersist()
        except Exception:
            pass
