"""Diversity-aware selection — MMR (maximal marginal relevance,
Carbonell & Goldstein 1998): greedily pick the item maximizing
``λ·relevance(i) − (1−λ)·max_{j∈selected} sim(i, j)`` — the standard
retrieval/curation operator for "relevant but not redundant" top-k
(RAG context assembly, diverse few-shot example selection, dedup-aware
sampling of a training slice). The reference engine has no embedding
ops at all; this extends the similarity family (brute/LSH/IVF/PQ ANN)
with the selection step that consumes their scores.

Scale shape: the CORPUS-sized work is one distributed scan — cosine
relevance against the broadcast query plus a top-``prefilter`` take
(TakeOrderedAndProject: per-task local top-N, k-row partials merge, no
data-wide sort). The greedy tail is inherently sequential, so it runs
on the ``prefilter``-bounded candidate set as driver-side planner
state (the kmeans-centroids / PQ-books precedent: driver holds only
k-sized or prefilter-sized state, never the corpus) with k·N quantized
integer scores.

Cross-engine determinism (the house float discipline): relevance and
pairwise cosines quantize to BIGINT ppm via ``floor(cos·1e6 + 0.5)``,
where every cosine is the shared left-associative fold
(``similarity.cosine_expr`` — Spark's 0.0-seeded ``aggregate`` ==
DuckDB's explicit literal term chain == python's seeded loop, one IEEE
expression tree) — so selection, tie-breaks (candidate id), and every
emitted column are exact integers on any engine. The DuckDB twin
replays the greedy as a recursive-CTE per-level argmax (the
LTTB/packing precedent), no driver loop.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tickdb_spark.operators.similarity import EMB_DIM, cosine_expr

#: MMR trade-off λ as ppm: 700000 ≙ λ=0.7 (relevance-leaning, the
#: common default in retrieval literature).
MMR_LAM_PPM = 700_000


def _cos_ppm(a, b) -> int:
    """Python replay of ``floor(cosine_expr(a, b)·1e6 + 0.5)`` — the
    SAME left-associative fold order and expression shape (python
    floats are IEEE doubles; float32 inputs upcast exactly), so the
    driver-side greedy is bit-identical to the SQL twin's scores."""
    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + float(x) * float(y)
    na = 0.0
    for x in a:
        na = na + float(x) * float(x)
    nb = 0.0
    for y in b:
        nb = nb + float(y) * float(y)
    return math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1000000.0 + 0.5)


def mmr_select(
    emb: DataFrame,
    query_id: int,
    k: int = 8,
    lam_ppm: int = MMR_LAM_PPM,
    prefilter: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """MMR top-k for one query vector: ``(rnk, vec_id, rel_q, maxsim_q,
    mmr_q)`` — the selection order, each item's ppm relevance to the
    query, its ppm max-similarity to the items picked BEFORE it, and
    the integer MMR score it won with (``lam_ppm·rel_q −
    (1e6−lam_ppm)·maxsim_q``; the first pick has ``maxsim_q = 0`` by
    convention). Ties break on the smaller candidate id at every step.

    ``prefilter`` gates the greedy to the top-N most relevant
    candidates — the knob that bounds driver state and, at corpus
    scale, the knob a caller raises with an ANN candidate source
    instead of the brute-force scan used here."""
    q = emb.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("qvec")
    )
    rel = F.expr(
        f"CAST(floor(({cosine_expr('qvec', 'vec')}) * 1000000.0 + 0.5)"
        " AS BIGINT)"
    )
    cand = (
        emb.where(F.col(id_col) != query_id)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("vec"))
        .crossJoin(F.broadcast(q))
        .select("cid", "vec", rel.alias("rel_q"))
    )
    # TakeOrderedAndProject: local top-N per task, N-row merge — the
    # only corpus-sized stage
    top = cand.orderBy(F.desc("rel_q"), "cid").limit(int(prefilter)).collect()
    out = _greedy_mmr(
        [(int(r["cid"]), list(r["vec"]), int(r["rel_q"])) for r in top],
        int(k),
        int(lam_ppm),
    )
    from tickdb_spark.session import local_frame

    return local_frame(
        emb.sparkSession,
        out,
        "rnk int, vec_id long, rel_q long, maxsim_q long, mmr_q long",
    )


def _greedy_mmr(cands, k: int, lam_ppm: int):
    """The sequential MMR tail over a prefilter-bounded candidate list
    ``[(cid, vec, rel_q)]`` → ``[(rnk, cid, rel_q, maxsim_q, mmr_q)]``
    in exact integer arithmetic (shared by the single- and batch-query
    fronts)."""
    remaining = {cid: (vec, rq) for cid, vec, rq in cands}
    out: list[tuple[int, int, int, int, int]] = []
    # -inf sentinel, NOT 0: max-similarity to the selected set can be
    # NEGATIVE (anti-aligned vectors), and flooring it at 0 would both
    # misreport maxsim_q and under-rank such candidates
    maxsim: dict[int, int] = {cid: -(2**62) for cid in remaining}
    last_vec = None
    for rnk in range(1, min(k, len(remaining)) + 1):
        if last_vec is not None:
            # incremental max: only the newest pick can raise max-sim
            for cid, (vec, _) in remaining.items():
                s = _cos_ppm(vec, last_vec)
                if s > maxsim[cid]:
                    maxsim[cid] = s
        if rnk == 1:
            pick = max(remaining, key=lambda c: (remaining[c][1], -c))
            ms = 0
        else:
            pick = max(
                remaining,
                key=lambda c: (
                    lam_ppm * remaining[c][1]
                    - (1_000_000 - lam_ppm) * maxsim[c],
                    -c,
                ),
            )
            ms = maxsim[pick]
        vec, rq = remaining.pop(pick)
        out.append(
            (rnk, pick, rq, ms, lam_ppm * rq - (1_000_000 - lam_ppm) * ms)
        )
        last_vec = vec
    return out


#: output schema of the batch-MMR fronts (shared so the brute and
#: index-sourced variants can never drift)
_BATCH_MMR_SCHEMA = (
    "query_id long, rnk int, vec_id long, rel_q long,"
    " maxsim_q long, mmr_q long"
)


def _salted_topn(scored: DataFrame, prefilter: int) -> DataFrame:
    """Two-phase grouped top-N over ``(qid, cid, vec, rel_q)`` rows
    (exact: the global top-N is a subset of the union of per-salt
    top-Ns): a single per-query window would put each query's WHOLE
    candidate set on one task — salting keeps parallelism Q×S on the
    big pass, and the final per-query window sees only Q·S·prefilter
    rows. Shared by the brute and index-sourced batch fronts."""
    from pyspark.sql import Window

    salts = 16
    wloc = Window.partitionBy("qid", "_salt").orderBy(F.desc("rel_q"), "cid")
    wglob = Window.partitionBy("qid").orderBy(F.desc("rel_q"), "cid")
    return (
        scored.withColumn("_salt", F.pmod(F.col("cid"), F.lit(salts)))
        .withColumn("_rn", F.row_number().over(wloc))
        .where(F.col("_rn") <= int(prefilter))
        .drop("_rn")
        .withColumn("_rn", F.row_number().over(wglob))
        .where(F.col("_rn") <= int(prefilter))
        .drop("_rn", "_salt")
    )


def _greedy_tail_rows(top, k: int, lam_ppm: int) -> list[tuple]:
    """Run the per-query sequential greedy over collected candidate
    rows — the driver-state tail shared by both batch fronts."""
    by_q: dict[int, list] = {}
    for r in top:
        by_q.setdefault(int(r["qid"]), []).append(
            (int(r["cid"]), list(r["vec"]), int(r["rel_q"]))
        )
    rows: list[tuple] = []
    for qid in sorted(by_q):
        for rnk, cid, rq, ms, sc in _greedy_mmr(
            by_q[qid], int(k), int(lam_ppm)
        ):
            rows.append((qid, rnk, cid, rq, ms, sc))
    return rows


def mmr_select_batch(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 8,
    lam_ppm: int = MMR_LAM_PPM,
    prefilter: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch MMR: ``(query_id, rnk, vec_id, rel_q, maxsim_q, mmr_q)``
    for every query in ONE shared corpus pass — the queries broadcast,
    the corpus is scanned once, and per-query top-``prefilter``
    candidate sets come from ONE window over (query, rel) instead of a
    scan per query (Q× fewer corpus reads than looping
    :func:`mmr_select`). The greedy tails run per query on the
    collected Q·prefilter candidate rows — still bounded driver
    planner state."""
    q = emb.where(F.col(id_col).isin([int(x) for x in query_ids])).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    rel = F.expr(
        f"CAST(floor(({cosine_expr('qvec', 'vec')}) * 1000000.0 + 0.5)"
        " AS BIGINT)"
    )
    scored = (
        emb.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("vec"))
        .join(F.broadcast(q), F.col("qid") != F.col("cid"))
        .select("qid", "cid", "vec", rel.alias("rel_q"))
    )
    top = _salted_topn(scored, prefilter).collect()
    from tickdb_spark.session import local_frame

    return local_frame(
        emb.sparkSession, _greedy_tail_rows(top, k, lam_ppm), _BATCH_MMR_SCHEMA
    )


def mmr_select_batch_sql(
    table: str,
    query_ids: list[int],
    k: int = 8,
    lam_ppm: int = MMR_LAM_PPM,
    prefilter: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMB_DIM,
) -> str:
    """DuckDB twin: the per-query recursive-CTE greedy of
    :func:`mmr_select_sql`, one block per query, UNION ALL'd through
    derived-table wraps (WITH inside a derived table — the house
    multi-twin recipe)."""
    blocks = [
        f"SELECT CAST({int(qid)} AS BIGINT) AS query_id, * FROM ("
        + mmr_select_sql(
            table, qid, k, lam_ppm, prefilter, id_col, vec_col, dim
        )
        + ")"
        for qid in query_ids
    ]
    return " UNION ALL ".join(blocks)


def mmr_select_batch_from_index(
    emb: DataFrame,
    sig: DataFrame,
    query_ids: list[int],
    k: int = 8,
    lam_ppm: int = MMR_LAM_PPM,
    prefilter: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch MMR with candidates sourced from a STORED LSH-signature
    index instead of a brute corpus cosine scan (VERDICT r15 ask #3 —
    the ann_topk_filtered routing idea applied to selection). ``sig`` is
    the ``(vec_id, table_id, bucket)`` multi-table signature frame —
    either batch-built (:func:`similarity.lsh_signature_table`) or the
    maintained streaming face's index table: the candidate set for each
    query is every vector sharing ≥ 1 band bucket with it, so the ONLY
    per-query corpus work is equi-joins on (table_id, bucket) — exact
    cosines are computed for candidates alone, never the corpus (no
    BroadcastNestedLoopJoin stage; plan-pinned in tests). Recall < 1 by
    LSH design — the documented trade of every index-routed ANN path.

    Output schema and greedy semantics are identical to
    :func:`mmr_select_batch` (same integer scores, same tie-breaks), so
    the two differ only in candidate sourcing."""
    top = _index_candidates(
        emb, sig, query_ids, prefilter, id_col, vec_col
    ).collect()
    from tickdb_spark.session import local_frame

    return local_frame(
        emb.sparkSession, _greedy_tail_rows(top, k, lam_ppm), _BATCH_MMR_SCHEMA
    )


def _index_candidates(
    emb: DataFrame,
    sig: DataFrame,
    query_ids: list[int],
    prefilter: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The index-probe candidate frame of
    :func:`mmr_select_batch_from_index`, exposed so plan tests can pin
    the no-full-corpus-cosine property (the only corpus-sized stages
    are equi-joins on the stored (table_id, bucket) column and on cid —
    never a BroadcastNestedLoopJoin scoring every row)."""
    qids = [int(x) for x in query_ids]
    q = emb.where(F.col(id_col).isin(qids)).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    qsig = sig.where(F.col(id_col).isin(qids)).select(
        F.col(id_col).alias("qid"), "table_id", "bucket"
    )
    cand_ids = (
        sig.join(F.broadcast(qsig), ["table_id", "bucket"])
        .where(F.col(id_col) != F.col("qid"))
        .select("qid", F.col(id_col).alias("cid"))
        .distinct()
    )
    rel = F.expr(
        f"CAST(floor(({cosine_expr('qvec', 'vec')}) * 1000000.0 + 0.5)"
        " AS BIGINT)"
    )
    # the candidate set is bucket-bounded, but keep the two-phase salted
    # top-N anyway: a hot bucket must not serialize one query's scoring
    # onto a single task (the grouped-top-k pattern, same as the brute
    # batch front)
    scored = (
        cand_ids.join(
            emb.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("vec")),
            "cid",
        )
        .join(F.broadcast(q), "qid")
        .select("qid", "cid", "vec", rel.alias("rel_q"))
    )
    return _salted_topn(scored, prefilter)


def mmr_select_batch_from_index_sql(
    table: str,
    query_ids: list[int],
    k: int = 8,
    lam_ppm: int = MMR_LAM_PPM,
    prefilter: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMB_DIM,
) -> str:
    """DuckDB twin of :func:`mmr_select_batch_from_index`: replays the
    index PROBE (signatures recomputed with the literal bucket
    expansions — bit-identical to the stored column, the house LSH
    recipe) and then the same per-query recursive-CTE greedy, with the
    cand CTE restricted to bucket-mates before the top-``prefilter``."""
    from tickdb_spark.operators.similarity import lsh_signature_table_sql

    sigs = lsh_signature_table_sql(table, id_col, vec_col)
    cosq = cosine_expr("q.qvec", "c.vec", dim, sql=True)
    cosp = cosine_expr("c.vec", "c2.vec", dim, sql=True)
    blocks = []
    for qid in query_ids:
        ms = (
            f"(SELECT MAX(CAST(floor(({cosp}) * 1000000.0 + 0.5) AS BIGINT)) "
            f"FROM cand c2 WHERE list_contains(s.ids, c2.vec_id))"
        )
        blocks.append(f"""
    SELECT CAST({int(qid)} AS BIGINT) AS query_id, * FROM (
    WITH RECURSIVE sigs AS MATERIALIZED ({sigs}),
    cids AS MATERIALIZED (
      SELECT DISTINCT s.{id_col} AS vec_id
      FROM sigs s JOIN sigs qs
        ON s.table_id = qs.table_id AND s.bucket = qs.bucket
      WHERE qs.{id_col} = {int(qid)} AND s.{id_col} <> {int(qid)}
    ),
    cand AS MATERIALIZED (
      SELECT vec_id, vec, rel_q FROM (
        SELECT c.vec_id, c.vec,
               CAST(floor(({cosq}) * 1000000.0 + 0.5) AS BIGINT) AS rel_q
        FROM (SELECT t.{id_col} AS vec_id, t.{vec_col} AS vec FROM {table} t
              JOIN cids ON t.{id_col} = cids.vec_id) c,
             (SELECT {vec_col} AS qvec FROM {table}
              WHERE {id_col} = {int(qid)}) q
      ) QUALIFY ROW_NUMBER() OVER (ORDER BY rel_q DESC, vec_id)
                  <= {int(prefilter)}
    ),
    sel AS (
      (SELECT 1 AS rnk, vec_id, rel_q,
              CAST(0 AS BIGINT) AS maxsim_q,
              {int(lam_ppm)} * rel_q AS mmr_q,
              [vec_id] AS ids
       FROM cand ORDER BY rel_q DESC, vec_id LIMIT 1)
      UNION ALL
      SELECT s.rnk + 1, p.vec_id, p.rel_q, p.maxsim_q, p.mmr_q,
             list_append(s.ids, p.vec_id)
      FROM sel s, LATERAL (
        SELECT c.vec_id, c.rel_q, {ms} AS maxsim_q,
               {int(lam_ppm)} * c.rel_q
                 - (1000000 - {int(lam_ppm)}) * {ms} AS mmr_q
        FROM cand c
        WHERE NOT list_contains(s.ids, c.vec_id)
        ORDER BY mmr_q DESC, c.vec_id LIMIT 1
      ) p
      WHERE s.rnk < {int(k)}
    )
    SELECT rnk, vec_id, rel_q, maxsim_q, mmr_q FROM sel ORDER BY rnk
    )""")
    return " UNION ALL ".join(blocks)


#: Candidate-count ceiling for the LOCAL k-center greedy (r16 opt; the
#: k-core KCORE_LOCAL_MAX_EDGES pattern). ~100k 64-dim float32 vectors
#: collect to ~30 MB of driver state — far under any corpus scale, and
#: below it the distributed loop's 2 fixed jobs/step dominate. Above,
#: the distributed per-step loop runs unchanged.
KCENTER_LOCAL_MAX_VECS = 100_000


def _py_cos_ppm(u, v) -> int:
    """floor(cosine(u, v) * 1e6 + 0.5) with the EXACT Spark op sequence:
    0.0-seeded left folds over per-element float64 casts (== zip_with/
    aggregate foldLeft), correctly-rounded sqrt, one division, one
    multiply+add+floor. Bit-identical to ``cosine_expr`` + the ppm cast."""
    d = 0.0
    for x, y in zip(u, v):
        d += float(x) * float(y)
    na = 0.0
    for x in u:
        na += float(x) * float(x)
    nb = 0.0
    for y in v:
        nb += float(y) * float(y)
    return int(math.floor((d / (math.sqrt(na) * math.sqrt(nb))) * 1000000.0 + 0.5))


def _kcenter_local(spark, rows, k: int) -> DataFrame:
    """Driver-side mirror of the distributed greedy below: same seed
    convention (smallest id), same running-max accumulation from the
    ``-(2**62)`` floor, same (maxsim, id) argmin tie-break — emitted
    values are bit-identical because every arithmetic step is
    (:func:`_py_cos_ppm`)."""
    out_schema = "rnk int, vec_id long, maxsim_q long"
    if not rows:
        return spark.createDataFrame([], out_schema)
    cands = sorted(((int(r["cid"]), list(r["vec"])) for r in rows), key=lambda t: t[0])
    by_id = dict(cands)
    seed_id, seed_vec = cands[0]
    out = [(1, seed_id, 0)]
    picked = {seed_id}
    maxsim = {cid: -(2**62) for cid, _ in cands}
    last_vec = seed_vec
    for rnk in range(2, int(k) + 1):
        best = None
        for cid, vec in cands:
            s = _py_cos_ppm(vec, last_vec)
            if s > maxsim[cid]:
                maxsim[cid] = s
            if cid not in picked:
                key = (maxsim[cid], cid)
                if best is None or key < best:
                    best = key
        if best is None:  # corpus smaller than k: selection is the corpus
            break
        ms, cid = best
        picked.add(cid)
        last_vec = by_id[cid]
        out.append((rnk, cid, int(ms)))
    from tickdb_spark.session import local_frame

    return local_frame(spark, out, out_schema)


def kcenter_select(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: int | None = None,
    rel_floor_ppm: int | None = None,
) -> DataFrame:
    """Farthest-first (Gonzalez 1985 k-center greedy) coreset selection:
    seed with the smallest id (a fixed, documented convention — any
    deterministic seed works for the 2-approximation), then repeatedly
    pick the point whose MAX similarity to the selected set is SMALLEST
    (= farthest in cosine terms), tie-broken on the smaller id. The
    landmark/coreset selector that needs no trained state — IVF cell
    seeding, eval-set anchor picking, diverse subsample without kmeans
    iterations. Returns ``(rnk, vec_id, maxsim_q)`` with ``maxsim_q``
    the ppm max-similarity to the EARLIER picks (0 for the seed, by the
    MMR convention).

    Unlike :func:`mmr_select` (sequential tail on a prefiltered set),
    every step here is DISTRIBUTED: one corpus-wide aggregate picks the
    argmin (TakeOrderedAndProject — per-task local min, 1-row merge),
    with the newest center shipped as a broadcast 1-row crossJoin (a
    64-dim literal expansion would cost ~2 s of janino compile PER STEP
    and breach the 64 KB codegen method limit — the r9 foreachBatch
    lesson). Driver state is k ids + k vectors. The running max-sim
    column is LOCALCHECKPOINTED each step, so every step's plan is one
    crossJoin + one fold deep regardless of k — without it the
    accumulated greatest() chain re-analyzes and re-compiles per step
    (measured ~1.4 s/step of pure plan overhead at any data size) and
    each action recomputes all earlier folds.

    ``query_id`` + ``rel_floor_ppm`` (r16): the QUALITY-GATED coreset —
    drop candidates whose ppm cosine relevance to the anchor vector
    falls below the floor BEFORE the greedy (and exclude the anchor
    itself), so the coreset spreads over the relevant slice only. The
    floor filter is one broadcast crossJoin + fold on the corpus scan
    it already pays; the seed convention (smallest surviving id) and
    tie-breaks are unchanged."""
    if (query_id is None) != (rel_floor_ppm is None):
        raise ValueError(
            "kcenter_select: query_id and rel_floor_ppm must be passed "
            "together — a half-configured quality floor would be "
            "silently ignored"
        )
    cand = emb.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("vec"))
    if query_id is not None and rel_floor_ppm is not None:
        anchor = emb.where(F.col(id_col) == int(query_id)).select(
            F.col(vec_col).alias("qvec")
        )
        rel = F.expr(
            f"CAST(floor(({cosine_expr('qvec', 'vec')}) * 1000000.0 + 0.5)"
            " AS BIGINT)"
        )
        cand = (
            cand.where(F.col("cid") != int(query_id))
            .crossJoin(F.broadcast(anchor))
            .where(rel >= int(rel_floor_ppm))
            .select("cid", "vec")
        )
    # r16 opt: size-GATED local greedy (the k-core local-fixpoint
    # pattern). Each distributed step costs two fixed driver jobs
    # (checkpoint + argmin collect) — ~4 s of pure per-step overhead for
    # a 2000-vector corpus. Below the ceiling the whole greedy runs on
    # the collected candidate set with BIT-IDENTICAL arithmetic: the
    # Python left fold over float32→float64 casts IS the zip_with/
    # aggregate fold order, math.sqrt is correctly rounded like Spark's,
    # and floor(x*1e6+0.5) is the same IEEE op sequence — so every
    # emitted (rnk, vec_id, maxsim_q) matches the distributed loop and
    # the recursive-CTE oracle. Above the ceiling the distributed
    # per-step loop below runs unchanged (the 100 TB path).
    head = cand.limit(KCENTER_LOCAL_MAX_VECS + 1).collect()
    if len(head) <= KCENTER_LOCAL_MAX_VECS:
        return _kcenter_local(emb.sparkSession, head, k)
    seed_rows = cand.orderBy("cid").limit(1).collect()
    out_schema = "rnk int, vec_id long, maxsim_q long"
    if not seed_rows:
        # empty corpus: an empty selection, not an IndexError (the
        # planner empty-input lesson applied here)
        return emb.sparkSession.createDataFrame([], out_schema)
    seed = seed_rows[0]
    centers = [(int(seed["cid"]), list(seed["vec"]))]
    out = [(1, centers[0][0], 0)]
    spark = emb.sparkSession
    cur = cand.withColumn("maxsim_q", F.lit(-(2**62)).cast("long"))
    sim = F.expr(
        f"CAST(floor(({cosine_expr('vec', 'cvec')}) * 1000000.0 + 0.5)"
        " AS BIGINT)"
    )
    from tickdb_spark.session import local_frame

    for rnk in range(2, int(k) + 1):
        # one slice: a 32-slice single-row frame pays 32 Python worker
        # round-trips per broadcast build, once per greedy step
        cvec = local_frame(spark, [(centers[-1][1],)], "cvec array<float>")
        # same plan shape every step (only the broadcast row changes) →
        # constant analysis/codegen cost per step, one fold per row
        cur = (
            cur.crossJoin(F.broadcast(cvec))
            .select("cid", "vec", F.greatest("maxsim_q", sim).alias("maxsim_q"))
            .localCheckpoint()
        )
        picked_ids = [c for c, _ in centers]
        picks = (
            cur.where(~F.col("cid").isin(picked_ids))
            .orderBy("maxsim_q", "cid")
            .limit(1)
            .collect()
        )
        if not picks:  # corpus smaller than k: selection is the corpus
            break
        pick = picks[0]
        centers.append((int(pick["cid"]), list(pick["vec"])))
        out.append((rnk, int(pick["cid"]), int(pick["maxsim_q"])))
    return local_frame(spark, out, out_schema)


def kcenter_select_sql(
    table: str,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMB_DIM,
    query_id: int | None = None,
    rel_floor_ppm: int | None = None,
) -> str:
    """DuckDB twin: the same greedy as a recursive-CTE per-level ARGMIN
    of the correlated max-similarity aggregate; with a quality floor the
    cand CTE carries the same anchor-relevance filter."""
    if (query_id is None) != (rel_floor_ppm is None):
        raise ValueError(
            "kcenter_select_sql: query_id and rel_floor_ppm must be "
            "passed together"
        )
    cosp = cosine_expr("c.vec", "c2.vec", dim, sql=True)
    ms = (
        f"(SELECT MAX(CAST(floor(({cosp}) * 1000000.0 + 0.5) AS BIGINT)) "
        f"FROM cand c2 WHERE list_contains(s.ids, c2.vec_id))"
    )
    if query_id is not None and rel_floor_ppm is not None:
        cosq = cosine_expr("q.qvec", "c.vec", dim, sql=True)
        cand_body = f"""
      SELECT vec_id, vec FROM (
        SELECT c.vec_id, c.vec,
               CAST(floor(({cosq}) * 1000000.0 + 0.5) AS BIGINT) AS rel_q
        FROM (SELECT {id_col} AS vec_id, {vec_col} AS vec FROM {table}
              WHERE {id_col} <> {int(query_id)}) c,
             (SELECT {vec_col} AS qvec FROM {table}
              WHERE {id_col} = {int(query_id)}) q
      ) WHERE rel_q >= {int(rel_floor_ppm)}
        """
    else:
        cand_body = f"SELECT {id_col} AS vec_id, {vec_col} AS vec FROM {table}"
    return f"""
    WITH RECURSIVE cand AS MATERIALIZED (
      {cand_body}
    ),
    sel AS (
      (SELECT 1 AS rnk, vec_id, CAST(0 AS BIGINT) AS maxsim_q,
              [vec_id] AS ids
       FROM cand ORDER BY vec_id LIMIT 1)
      UNION ALL
      SELECT s.rnk + 1, p.vec_id, p.maxsim_q, list_append(s.ids, p.vec_id)
      FROM sel s, LATERAL (
        SELECT c.vec_id, {ms} AS maxsim_q
        FROM cand c
        WHERE NOT list_contains(s.ids, c.vec_id)
        ORDER BY maxsim_q ASC, c.vec_id LIMIT 1
      ) p
      WHERE s.rnk < {int(k)}
    )
    SELECT rnk, vec_id, maxsim_q FROM sel ORDER BY rnk
    """


def mmr_select_sql(
    table: str,
    query_id: int,
    k: int = 8,
    lam_ppm: int = MMR_LAM_PPM,
    prefilter: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMB_DIM,
) -> str:
    """DuckDB twin: the same prefilter, then the greedy as a recursive
    CTE — each level's LATERAL picks the argmax of the SAME integer MMR
    score over candidates outside the carried selected-id list, with
    max-sim as a correlated aggregate over the selected rows."""
    cosq = cosine_expr("q.qvec", "c.vec", dim, sql=True)
    cosp = cosine_expr("c.vec", "c2.vec", dim, sql=True)
    ms = (
        f"(SELECT MAX(CAST(floor(({cosp}) * 1000000.0 + 0.5) AS BIGINT)) "
        f"FROM cand c2 WHERE list_contains(s.ids, c2.vec_id))"
    )
    return f"""
    WITH RECURSIVE cand AS MATERIALIZED (
      SELECT vec_id, vec, rel_q FROM (
        SELECT c.vec_id, c.vec,
               CAST(floor(({cosq}) * 1000000.0 + 0.5) AS BIGINT) AS rel_q
        FROM (SELECT {id_col} AS vec_id, {vec_col} AS vec FROM {table}
              WHERE {id_col} <> {int(query_id)}) c,
             (SELECT {vec_col} AS qvec FROM {table}
              WHERE {id_col} = {int(query_id)}) q
      ) QUALIFY ROW_NUMBER() OVER (ORDER BY rel_q DESC, vec_id)
                  <= {int(prefilter)}
    ),
    sel AS (
      (SELECT 1 AS rnk, vec_id, rel_q,
              CAST(0 AS BIGINT) AS maxsim_q,
              {int(lam_ppm)} * rel_q AS mmr_q,
              [vec_id] AS ids
       FROM cand ORDER BY rel_q DESC, vec_id LIMIT 1)
      UNION ALL
      SELECT s.rnk + 1, p.vec_id, p.rel_q, p.maxsim_q, p.mmr_q,
             list_append(s.ids, p.vec_id)
      FROM sel s, LATERAL (
        SELECT c.vec_id, c.rel_q, {ms} AS maxsim_q,
               {int(lam_ppm)} * c.rel_q
                 - (1000000 - {int(lam_ppm)}) * {ms} AS mmr_q
        FROM cand c
        WHERE NOT list_contains(s.ids, c.vec_id)
        ORDER BY mmr_q DESC, c.vec_id LIMIT 1
      ) p
      WHERE s.rnk < {int(k)}
    )
    SELECT rnk, vec_id, rel_q, maxsim_q, mmr_q FROM sel ORDER BY rnk
    """
