"""Property-based tests for the round-12 operator additions: python
reference implementations checked against the Spark plans on
hypothesis-generated adversarial inputs (the SURVEY.md §5 strategy
applied to linkage / SCD2 / sketch algebra)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# small alphabet → dense edit-distance-1 neighborhoods (the adversarial
# case for blocking completeness)
word_st = st.text(alphabet="abc", min_size=1, max_size=5)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    dirty=st.lists(word_st, min_size=1, max_size=12, unique=True),
    clean=st.lists(word_st, min_size=1, max_size=12, unique=True),
)
def test_fuzzy_link_equals_bruteforce(spark, dirty, clean):
    """Deletion-neighborhood blocking is COMPLETE for edit distance 1:
    the equi-join candidate set, after the exact verify, equals the
    all-pairs brute force on any input — including dense 1-edit
    neighborhoods over a 3-letter alphabet."""
    from tickdb_spark.operators.linkage import fuzzy_link

    d = spark.createDataFrame([(w,) for w in dirty], ["noisy"])
    c = spark.createDataFrame([(w,) for w in clean], ["w"])
    got = {
        (r["noisy"], r["w"]): r["edit_dist"]
        for r in fuzzy_link(d, c, "noisy", "w").collect()
    }
    want = {
        (a, b): _lev(a, b)
        for a in set(dirty)
        for b in set(clean)
        if _lev(a, b) <= 1
    }
    assert got == want


event_st = st.tuples(
    st.integers(min_value=1, max_value=3),      # key
    st.sampled_from(["A", "B", "C"]),           # attr
    st.integers(min_value=0, max_value=20),     # ts (dup-heavy)
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(log=st.lists(event_st, min_size=1, max_size=20))
def test_scd2_history_equals_python_reference(spark, log):
    """SCD2 intervals equal a straightforward python collapse of the
    (ts, row_id)-ordered log — duplicate timestamps (tie-broken on row
    id) and repeated values included."""
    from tickdb_spark.operators.scd2 import scd2_history

    rows = [(k, a, t, i) for i, (k, a, t) in enumerate(log)]
    df = spark.createDataFrame(rows, ["k", "attr", "ts", "rid"])
    got = {
        (r["k"], r["valid_from"], r["attr"]): (r["valid_to"], r["is_current"])
        for r in scd2_history(df, "k", "attr", "ts", "rid").collect()
    }
    want = {}
    for k in {r[0] for r in rows}:
        seq = sorted([r for r in rows if r[0] == k], key=lambda r: (r[2], r[3]))
        runs = []
        for _, a, t, _i in seq:
            if not runs or runs[-1][0] != a:
                runs.append([a, t])
        for i, (a, t) in enumerate(runs):
            nxt = runs[i + 1][1] if i + 1 < len(runs) else None
            want[(k, t, a)] = (nxt, 1 if nxt is None else 0)
    assert got == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    a=st.sets(st.integers(min_value=0, max_value=100), min_size=1, max_size=30),
    b=st.sets(st.integers(min_value=0, max_value=100), min_size=1, max_size=30),
)
def test_kmv_setops_exact_below_k_property(spark, a, b):
    """Whenever the combined sketch holds fewer than k hashes the union
    was fully enumerated — every estimate must be EXACT set arithmetic."""
    from tickdb_spark.operators.sketch import kmv_set_cardinalities, kmv_sketch

    rows = [("a", v) for v in a] + [("b", v) for v in b]
    sk = kmv_sketch(spark.createDataFrame(rows, ["grp", "v"]), "grp", "v", k=256)
    r = kmv_set_cardinalities(sk, k=256).collect()[0]
    assert r["est_union"] == len(a | b)
    assert r["est_intersect"] == len(a & b)
    assert r["est_only_a"] == len(a - b)
    assert r["est_only_b"] == len(b - a)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.floats(min_value=-500, max_value=500, allow_nan=False, width=32),
        min_size=8, max_size=40,
    )
)
def test_lag_autocorrelation_matches_numpy_reference(spark, vals):
    """The integer-statistics Pearson equals a float64 numpy Pearson of
    the SAME quantized series to ~1e-9 (the quantization is shared; the
    only divergence left is float summation order, bounded well below
    any analytic use)."""
    import numpy as np

    from tickdb_spark.operators.timeseries import lag_autocorrelation

    rows = [("s", i, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["series", "ts", "id", "v"])
    out = {
        r["lag"]: r
        for r in lag_autocorrelation(
            df, "series", "ts", "id", "v", lags=(1, 2)
        ).collect()
    }
    q = np.floor(np.array(vals, dtype="float64") * 100 + 0.5)
    for k in (1, 2):
        x, y = q[:-k], q[k:]
        den = np.sqrt(((x - x.mean()) ** 2).sum() * ((y - y.mean()) ** 2).sum())
        if den == 0:
            # constant side: correlation undefined → NULL on both engines
            assert out[k]["acf"] is None
            assert out[k]["den_x"] == 0 or out[k]["den_y"] == 0
            continue
        ref = ((x - x.mean()) * (y - y.mean())).sum() / den
        assert out[k]["acf"] == pytest.approx(ref, abs=1e-9)
        assert out[k]["n"] == len(x)


step_ev_st = st.tuples(
    st.integers(min_value=1, max_value=2),            # key
    st.sampled_from(["view", "click", "purchase"]),   # type
    st.integers(min_value=0, max_value=30),           # ts
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(log=st.lists(step_ev_st, min_size=1, max_size=25), gap=st.integers(2, 10))
def test_sequence_match_equals_python_scan(spark, log, gap):
    """The lead-compiled matcher equals a direct python scan over the
    (ts, row_id)-ordered per-key stream, gaps included."""
    from tickdb_spark.operators.sequence import sequence_match

    rows = [(k, e, t, i) for i, (k, e, t) in enumerate(log)]
    df = spark.createDataFrame(rows, ["k", "etype", "t", "rid"])
    out = sequence_match(
        df, "k", "t", "rid",
        steps=[
            F.col("etype") == "view",
            F.col("etype") == "click",
            F.col("etype") == "purchase",
        ],
        max_gap=gap,
    )
    got = sorted((r["k"], list(r["step_ts"])) for r in out.collect())
    want = []
    for k in {r[0] for r in rows}:
        seq = sorted([r for r in rows if r[0] == k], key=lambda r: (r[2], r[3]))
        for i in range(len(seq) - 2):
            e = seq[i : i + 3]
            if (
                [x[1] for x in e] == ["view", "click", "purchase"]
                and e[1][2] - e[0][2] <= gap
                and e[2][2] - e[1][2] <= gap
            ):
                want.append((k, [x[2] for x in e]))
    assert got == sorted(want)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.one_of(st.none(), st.floats(min_value=-10, max_value=110,
                                           allow_nan=False)),
        ),
        min_size=1, max_size=30,
    )
)
def test_dq_counts_equal_pandas_reference(spark, rows):
    """Fused-aggregate violation counts equal a direct pandas count —
    nulls, boundary values, and duplicate keys included."""
    from tickdb_spark.operators import dq

    df = spark.createDataFrame(rows, "k long, v double")
    rep = {
        r["check_name"]: (r["violations"], r["total"])
        for r in dq.run_checks(
            df, "t",
            [dq.not_null("nn", "v"), dq.in_range("rng", "v", 0, 100)],
            uniques=[("uq", ["k"])],
        ).collect()
    }
    n = len(rows)
    nn = sum(1 for _, v in rows if v is None)
    rng = sum(1 for _, v in rows if v is None or not (0 <= v <= 100))
    uq = n - len({k for k, _ in rows})
    assert rep == {"nn": (nn, n), "rng": (rng, n), "uq": (uq, n)}


# --- round-13 operator properties -------------------------------------------

tok_st = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
doc_st = st.lists(tok_st, min_size=1, max_size=12)


def _shingles(tokens: list[str], n: int = 5) -> frozenset:
    text = " ".join(tokens)
    toks = text.split()
    if len(toks) < n:
        return frozenset([" ".join(toks)])
    return frozenset(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(doc_st, min_size=1, max_size=8))
def test_containment_pairs_equals_python(spark, docs):
    """Both containment paths (prefix-filtered and plain inverted index)
    equal the python set reference — including mutual duplicates, docs
    shorter than the shingle width, and dense shared-shingle corpora
    (the adversarial case for the asymmetric prefix bound)."""
    from tickdb_spark.operators.dedup import containment_pairs

    tau = 600_000
    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    want = {}
    sets = {i: _shingles(d) for i, d in enumerate(docs)}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b:
                continue
            inter = len(sa & sb)
            if inter * 1_000_000 >= tau * len(sa):
                want[(a, b)] = (inter, len(sa), inter * 1_000_000 // len(sa))
    for pf in (True, False):
        got = {
            (r["id_a"], r["id_b"]): (r["inter"], r["n_a"], r["containment_ppm"])
            for r in containment_pairs(
                df, "text", "doc_id", tau_ppm=tau, prefix_filter=pf
            ).collect()
        }
        assert got == want, (pf, got, want)


basket_row_st = st.tuples(
    st.integers(min_value=1, max_value=4),       # basket key
    st.sampled_from(["x", "y", "z"]),            # item
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(basket_row_st, min_size=1, max_size=25))
def test_association_rules_equal_python(spark, rows):
    """Association metrics equal the python reference — duplicate
    (basket, item) rows collapse, single-item baskets yield no pairs,
    and every ppm is the exact integer division."""
    from tickdb_spark.operators.basket import association_rules

    df = spark.createDataFrame(rows, ["b", "item"])
    got = {
        (r["item_x"], r["item_y"]): (
            r["n_xy"], r["n_x"], r["n_y"], r["n_baskets"],
            r["support_ppm"], r["conf_x_to_y_ppm"], r["conf_y_to_x_ppm"],
            r["lift_ppm"],
        )
        for r in association_rules(df, ["b"], "item").collect()
    }
    baskets = {}
    for b, item in rows:
        baskets.setdefault(b, set()).add(item)
    nb = len(baskets)
    n_item = {}
    for items in baskets.values():
        for i in items:
            n_item[i] = n_item.get(i, 0) + 1
    want = {}
    pair_n = {}
    for items in baskets.values():
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                pair_n[(s[i], s[j])] = pair_n.get((s[i], s[j]), 0) + 1
    for (x, y), nxy in pair_n.items():
        want[(x, y)] = (
            nxy, n_item[x], n_item[y], nb,
            nxy * 1_000_000 // nb,
            nxy * 1_000_000 // n_item[x],
            nxy * 1_000_000 // n_item[y],
            (nxy * 1_000_000 // n_item[x]) * nb // n_item[y],
        )
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=30,
))
def test_benford_digits_equal_python(spark, vals):
    """First-significant-digit extraction equals python on adversarial
    doubles (negatives and sub-quantum values drop; sub-1 values keep
    their first significant digit after quantization)."""
    import math

    from tickdb_spark.operators.dq import benford_first_digit

    df = spark.createDataFrame([("g", v) for v in vals], ["grp", "v"])
    got = {r["digit"]: r["n_d"]
           for r in benford_first_digit(df, "v", ["grp"]).collect()}
    counts = {d: 0 for d in range(1, 10)}
    kept = 0
    for v in vals:
        q = math.floor(v * 1000 + 0.5)
        if q > 0:
            counts[int(str(q)[0])] += 1
            kept += 1
    if kept == 0:
        assert got == {}  # no group row at all — empty spine
    else:
        assert got == counts


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(
    st.floats(min_value=-100, max_value=100,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=25,
))
def test_iqr_fences_equal_python(spark, vals):
    """The IQR entry's rank arithmetic equals python order statistics —
    including all-equal groups (IQR 0: everything off the single value
    is an outlier) and single-row groups."""
    from pyspark.sql import Window

    df = spark.createDataFrame([("g", v) for v in vals], ["grp", "v"])
    q = df.select("grp", F.expr("CAST(floor(v * 1000000 + 0.5) AS BIGINT)").alias("q"))
    w = Window.partitionBy("grp").orderBy("q")
    ranked = q.select(
        "grp", "q", F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("n"),
    )
    quart = ranked.groupBy("grp").agg(
        F.max(F.when(F.expr("rk = (n + 3) div 4"), F.col("q"))).alias("p25"),
        F.max(F.when(F.expr("rk = (3 * n + 3) div 4"), F.col("q"))).alias("p75"),
    )
    row = (
        q.join(quart, "grp")
        .agg(
            F.sum(F.when(F.col("q") * 2 < F.col("p25") * 5 - F.col("p75") * 3, 1)
                  .otherwise(0)).alias("lo"),
            F.sum(F.when(F.col("q") * 2 > F.col("p75") * 5 - F.col("p25") * 3, 1)
                  .otherwise(0)).alias("hi"),
        )
        .first()
    )
    import math

    qs = sorted(math.floor(v * 1_000_000 + 0.5) for v in vals)
    n = len(qs)
    p25 = qs[(n + 3) // 4 - 1]
    p75 = qs[(3 * n + 3) // 4 - 1]
    lo = sum(1 for x in qs if 2 * x < 5 * p25 - 3 * p75)
    hi = sum(1 for x in qs if 2 * x > 5 * p75 - 3 * p25)
    assert (row["lo"], row["hi"]) == (lo, hi)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=st.lists(
    st.tuples(st.integers(min_value=1, max_value=6),     # user
              st.integers(min_value=0, max_value=15)),   # day
    min_size=1, max_size=30,
))
def test_trailing_distinct_equals_python(spark, pairs):
    """Trailing-7d distinct users equals the python window count for
    every day present in the data — sparse days, dup pairs, single-user
    streaks."""
    df = spark.createDataFrame(pairs, ["user_id", "day"])
    p = df.distinct()
    contrib = p.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("t_day"),
    ).distinct()
    days = p.select(F.col("day").alias("t_day")).distinct()
    got = {
        r["t_day"]: r["n"]
        for r in contrib.join(days, "t_day")
        .groupBy("t_day").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {}
    dayset = {d for _, d in pairs}
    for d in dayset:
        want[d] = len({u for u, dd in pairs if d - 6 <= dd <= d})
    assert got == want


rec_st = st.tuples(
    word_st,                                             # name
    st.one_of(st.none(), st.integers(0, 2)),             # field f1 (nullable)
    st.sampled_from(["p", "q"]),                         # field f2
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    dirty=st.lists(rec_st, min_size=1, max_size=8),
    clean=st.lists(rec_st, min_size=1, max_size=8),
)
def test_weighted_link_equals_python(spark, dirty, clean):
    """Fellegi-Sunter-style scoring equals the python reference on
    adversarial records: dense 1-edit name neighborhoods, NULL fields
    (two NULLs agree, one NULL disagrees — IS NOT DISTINCT FROM), and
    duplicate names across records."""
    from tickdb_spark.operators.linkage import weighted_link

    drows = [(i, n, f1, f2) for i, (n, f1, f2) in enumerate(dirty)]
    crows = [(1000 + i, n, f1, f2) for i, (n, f1, f2) in enumerate(clean)]
    d = spark.createDataFrame(drows, "d_id long, d_name string, d_f1 long, d_f2 string")
    c = spark.createDataFrame(crows, "c_id long, c_name string, c_f1 long, c_f2 string")
    fields = [("d_f1", "c_f1", 15, -10), ("d_f2", "c_f2", 10, -5)]
    got = {
        (r["d_id"], r["c_id"]): (r["edit_dist"], r["score"])
        for r in weighted_link(
            d, c, "d_id", "c_id", "d_name", "c_name", fields,
            w_name_exact=40, w_name_fuzzy=25, min_score=30,
        ).collect()
    }
    want = {}
    for di, (dn, df1, df2) in enumerate(dirty):
        for ci, (cn, cf1, cf2) in enumerate(clean):
            dist = _lev(dn, cn)
            if dist > 1:
                continue
            s = 40 if dist == 0 else 25
            s += 15 if df1 == cf1 else -10     # None == None agrees
            s += 10 if df2 == cf2 else -5
            if s >= 30:
                want[(di, 1000 + ci)] = (dist, s)
    assert got == want


seasonal_row_st = st.tuples(
    st.sampled_from(["a", "b"]),                     # group
    st.integers(min_value=0, max_value=23),          # hour bin
    st.one_of(st.none(), st.floats(min_value=-500.0, max_value=500.0,
                                   allow_nan=False, allow_infinity=False)),
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(seasonal_row_st, min_size=1, max_size=40))
def test_seasonal_strength_equal_python(spark, rows):
    """η²_ppm equals a python reference that replays the EXACT op order
    (python floats are IEEE doubles, so same ops in same order are
    bit-identical): BIGINT sufficient statistics, hour-sorted fold of
    S_h²/n_h, convert-then-multiply grand term, zero-variance → NULL.
    NULL values drop on both sides."""
    import math

    from tickdb_spark.operators.timeseries import seasonal_strength_anova

    df = spark.createDataFrame(
        [(g, hr * 3_600_000_000_000, v) for g, hr, v in rows],
        "grp string, ts long, value double",
    )
    got = {
        r["grp"]: (r["n"], r["eta2_ppm"])
        for r in seasonal_strength_anova(
            df, ["grp"], "(ts div 3600000000000) % 24", "value", 1_000
        ).collect()
    }
    bins: dict[str, dict[int, list[int]]] = {}
    for g, hr, v in rows:
        if v is None:
            continue
        q = math.floor(v * 1_000 + 0.5)
        cell = bins.setdefault(g, {}).setdefault(hr, [0, 0, 0])
        cell[0] += 1
        cell[1] += q
        cell[2] += q * q
    want = {}
    for g, cells in bins.items():
        n = sum(c[0] for c in cells.values())
        s = sum(c[1] for c in cells.values())
        ssq = sum(c[2] for c in cells.values())
        fold = 0.0
        for hr in sorted(cells):
            _, s_h, _ = cells[hr]
            fold = fold + float(s_h) * float(s_h) / float(cells[hr][0])
        grand = float(s) * float(s) / float(n)
        sst = float(ssq) - grand
        eta = (int(math.floor((fold - grand) / sst * 1_000_000.0 + 0.5))
               if sst > 0.0 else None)
        want[g] = (n, eta)
    assert got == want


mv_row_st = st.tuples(
    st.sampled_from(["x", "y", "z"]),
    st.floats(min_value=-2000.0, max_value=2000.0,
              allow_nan=False, allow_infinity=False),
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(mv_row_st, min_size=1, max_size=30),
       cut=st.integers(min_value=0, max_value=30))
def test_mv_partial_merge_equal_python(spark, rows, cut):
    """The MV face's partial-aggregate states merge batching-
    independently to the python batch aggregate, variance states
    included: split the rows at an arbitrary cut, build each slice's
    partial with the stream handler's kernel, merge with the report's
    laws."""
    import math

    from pyspark.sql import functions as F  # noqa: F811

    from tickdb_spark.streaming.index import _mv_partial_agg, groupby_mv_report

    cut = min(cut, len(rows))
    parts = []
    for i, chunk in enumerate((rows[:cut], rows[cut:])):
        if not chunk:
            continue
        cdf = spark.createDataFrame(chunk, "g string, v double")
        parts.append(
            _mv_partial_agg(cdf, ["g"], "v", 1_000_000, 1_000)
            .withColumn("epoch", F.lit(i).cast("long"))
            .withColumn("rebuilt", F.lit(False))
        )
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    got = {
        r["g"]: (r["cnt"], r["sum_q"], r["min_q"], r["max_q"],
                 r["sum_q2"], r["sumsq_q2"], r["avg_q"])
        for r in groupby_mv_report(merged, ["g"], with_variance=True).collect()
    }
    want = {}
    for g, v in rows:
        q = math.floor(v * 1_000_000 + 0.5)
        q2 = math.floor(v * 1_000 + 0.5)
        c, s, mn, mx, s2, ss = want.get(g, (0, 0, None, None, 0, 0))
        want[g] = (c + 1, s + q,
                   q if mn is None else min(mn, q),
                   q if mx is None else max(mx, q),
                   s2 + q2, ss + q2 * q2)
    # Spark's `div` truncates toward zero — and so does DuckDB's `//`
    # (measured; pinned cross-engine by
    # test_mv_avg_q_truncation_cross_engine) — replay trunc
    want = {
        g: (c, s, mn, mx, s2, ss,
            (abs(s) // c) * (1 if s >= 0 else -1))
        for g, (c, s, mn, mx, s2, ss) in want.items()
    }
    assert got == want


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ea=st.floats(min_value=0.0, max_value=1e8, allow_nan=False),
       eb=st.floats(min_value=0.0, max_value=1e8, allow_nan=False))
def test_cms_autowidth_formula_equal_python(spark, ea, eb):
    """width = clamp(next_pow2(10·floor(max(est))), 512, 2^26) — the
    Spark expression equals the python formula on arbitrary HLL-estimate
    doubles."""
    import math

    from tickdb_spark.operators.planner import _width_exprs

    keys_e, width_e = _width_exprs("est_a", "est_b", sql=False)
    r = spark.createDataFrame([(ea, eb)], "est_a double, est_b double").select(
        F.expr(keys_e).alias("k"), F.expr(width_e).alias("w")
    ).first()
    keys = int(math.floor(max(ea, eb)))
    want = min(max(1 << (keys * 10).bit_length(), 512), 1 << 26)
    assert (r["k"], r["w"]) == (keys, want)


def test_mv_variance_overflow_guard_raises(spark):
    """VERDICT r14 ask #3: a mis-sized sq_scale ERRORS loudly (row-level
    assert_true on |q2|) instead of silently wrapping the BIGINT
    sum-of-squares state; a sane scale on the same rows passes."""
    import pytest

    from tickdb_spark.streaming.index import MV_SQ_BOUND, _mv_partial_agg

    df = spark.createDataFrame([("g", 2_000.0)], "g string, v double")
    ok = _mv_partial_agg(df, ["g"], "v", 1_000_000, 1_000).collect()
    assert ok[0]["sumsq_q2"] == 2_000_000 * 2_000_000
    with pytest.raises(Exception, match="overflow-safe"):
        _mv_partial_agg(df, ["g"], "v", 1_000_000, 10**12).collect()
    # the bound itself is exactly the documented contract
    assert MV_SQ_BOUND**2 * (1 << 20) <= 2**63 - 1
    assert (MV_SQ_BOUND + 1) ** 2 * (1 << 20) > 2**63 - 1


def test_mv_report_cnt_guard_raises(spark):
    """The merged-cnt half of the variance overflow contract: a key
    whose merged row count exceeds MV_SQ_MAX_ROWS errors at report time
    (cnt·bound² is the sumsq ceiling, so cnt must stay bounded too)."""
    import pytest

    from tickdb_spark.streaming.index import MV_SQ_MAX_ROWS, groupby_mv_report

    big = spark.createDataFrame(
        [("g", MV_SQ_MAX_ROWS + 1, 10, 1, 9, 10, 20)],
        "g string, cnt long, sum_q long, min_q long, max_q long,"
        " sum_q2 long, sumsq_q2 long",
    )
    with pytest.raises(Exception, match="overflow-safe"):
        groupby_mv_report(big, ["g"], with_variance=True).collect()
    # without variance states the count guard does not apply (no sumsq)
    assert groupby_mv_report(big, ["g"]).collect()[0]["cnt"] > MV_SQ_MAX_ROWS


def test_mv_null_value_skips_sq_guard(spark):
    """ADVICE r15: a NULL value in a variance-tracked MV batch must keep
    its skip-in-SUM behavior, not crash the micro-batch (the bare
    |q2|≤bound condition is NULL for NULL input and assert_true raises
    on NULL — the guard now carries an isNull disjunct)."""
    from tickdb_spark.streaming.index import _mv_partial_agg

    df = spark.createDataFrame(
        [("g", 2.0), ("g", None), ("g", 4.0)], "g string, v double"
    )
    row = _mv_partial_agg(df, ["g"], "v", 1_000_000, 1_000).collect()[0]
    # cnt counts every row (count(lit(1))); the quantized sums skip NULL
    assert row["cnt"] == 3
    assert row["sum_q2"] == 6_000
    assert row["sumsq_q2"] == 2_000**2 + 4_000**2


def test_mv_report_max_rows_override(spark):
    """ADVICE r15: the merged-cnt budget is a caller knob, not a
    hard-coded 2^20 — a >1M-row key with small values passes under a
    raised max_rows, and the partial kernel's per-row bound TIGHTENS to
    isqrt((2^63−1)/max_rows) so the pair stays a sound certificate."""
    import pytest

    from tickdb_spark.streaming.index import (
        MV_SQ_MAX_ROWS,
        _mv_partial_agg,
        _mv_sq_bound,
        groupby_mv_report,
    )

    big = spark.createDataFrame(
        [("g", MV_SQ_MAX_ROWS + 1, 10, 1, 9, 10, 20)],
        "g string, cnt long, sum_q long, min_q long, max_q long,"
        " sum_q2 long, sumsq_q2 long",
    )
    got = groupby_mv_report(
        big, ["g"], with_variance=True, max_rows=1 << 30
    ).collect()
    assert got[0]["cnt"] == MV_SQ_MAX_ROWS + 1
    # soundness: larger row budget ⇒ strictly smaller per-row bound,
    # and the kernel enforces the tightened bound
    assert _mv_sq_bound(1 << 30) < _mv_sq_bound(None)
    assert _mv_sq_bound(1 << 30) ** 2 * (1 << 30) <= 2**63 - 1
    df = spark.createDataFrame([("g", 1_000.0)], "g string, v double")
    ok = _mv_partial_agg(df, ["g"], "v", 1_000_000, 1_000).collect()
    assert ok[0]["sumsq_q2"] == 1_000_000**2  # fine at the default budget
    with pytest.raises(Exception, match="overflow-safe"):
        _mv_partial_agg(
            df, ["g"], "v", 1_000_000, 1_000, max_rows=1 << 30
        ).collect()


def test_seasonal_anova_overflow_guard_raises(spark):
    """Same contract for seasonal_strength_anova's Σq²: oversized scale
    errors on the row bound; an over-long group errors on n ≤ max_n."""
    import pytest

    from tickdb_spark.operators.timeseries import seasonal_strength_anova

    df = spark.createDataFrame(
        [("a", 0, 10.0), ("a", 3_600_000_000_000, 20.0),
         ("a", 7_200_000_000_000, 30.0)],
        "grp string, ts long, value double",
    )
    ok = seasonal_strength_anova(
        df, ["grp"], "(ts div 3600000000000) % 24", "value", 1_000
    ).collect()
    assert ok[0]["n"] == 3
    with pytest.raises(Exception, match="overflow-safe"):
        seasonal_strength_anova(
            df, ["grp"], "(ts div 3600000000000) % 24", "value", 10**15
        ).collect()
    with pytest.raises(Exception, match="max_n"):
        seasonal_strength_anova(
            df, ["grp"], "(ts div 3600000000000) % 24", "value", 1_000,
            max_n=2,
        ).collect()


def test_mv_avg_q_truncation_cross_engine(spark):
    """ADVICE r14 suspected Spark div (truncate) vs DuckDB // (floor)
    diverge on negative sums — measured: BOTH truncate toward zero.
    Pinned here over negative, positive, and mixed-sign sums so the
    avg_q convention is evidence, not assumption."""
    import duckdb

    from tickdb_spark.streaming.index import groupby_mv_report

    rows = [("neg", -7, 2), ("pos", 7, 2), ("negexact", -8, 2)]
    partials = spark.createDataFrame(
        [(g, c, s, s, s, s, s * s) for g, s, c in rows],
        "g string, cnt long, sum_q long, min_q long, max_q long,"
        " sum_q2 long, sumsq_q2 long",
    )
    got = {
        r["g"]: r["avg_q"]
        for r in groupby_mv_report(partials, ["g"], with_variance=True).collect()
    }
    duck = {
        g: duckdb.sql(f"SELECT CAST({s} AS BIGINT) // CAST({c} AS BIGINT)").fetchone()[0]
        for g, s, c in rows
    }
    assert got == duck == {"neg": -3, "pos": 3, "negexact": -4}


def test_mmr_select_equals_bruteforce_python(spark):
    """mmr_select equals a NON-incremental python reference (max-sim
    recomputed from scratch over the full selected set each step) on
    synthetic vectors, and the diversity property holds: the MMR set's
    max pairwise similarity is no higher than the pure-relevance top-k's
    (with clustered fixtures it is strictly lower)."""
    import math

    import numpy as np

    from tickdb_spark.operators.diversify import _cos_ppm, mmr_select

    rng = np.random.RandomState(7)
    # 3 tight clusters + noise: pure top-k collapses into the cluster
    # nearest the query; MMR must spread
    base = rng.randn(3, 16).astype("float32")
    rows = []
    for i in range(60):
        v = base[i % 3] + 0.05 * rng.randn(16).astype("float32")
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [
        (r["rnk"], r["vec_id"], r["rel_q"], r["maxsim_q"], r["mmr_q"])
        for r in mmr_select(df, 0, k=6, prefilter=40).collect()
    ]

    vecs = {i: v for i, v in rows}
    qv = vecs[0]
    cand = sorted(
        ((i, _cos_ppm(qv, v)) for i, v in vecs.items() if i != 0),
        key=lambda t: (-t[1], t[0]),
    )[:40]

    def py_mmr(k, lam):
        sel, want = [], []
        for rnk in range(1, k + 1):
            best = None
            for i, rel in cand:
                if i in sel:
                    continue
                ms = max((_cos_ppm(vecs[i], vecs[j]) for j in sel), default=0)
                score = lam * rel - (1_000_000 - lam) * ms if sel else lam * rel
                key = (score, -i)
                if best is None or key > best[0]:
                    best = (key, i, rel, ms if sel else 0, score)
            _, i, rel, ms, score = best
            sel.append(i)
            want.append((rnk, i, rel, ms, score))
        return sel, want

    assert got == py_mmr(6, 700_000)[1]

    # diversity: at k=3 with a balanced lambda the MMR set's tightest
    # pair is strictly looser than pure relevance's (which collapses
    # into the query's own planted cluster)
    sel3 = [
        r["vec_id"]
        for r in mmr_select(df, 0, k=3, lam_ppm=500_000, prefilter=40).collect()
    ]
    assert sel3 == py_mmr(3, 500_000)[0]
    topk3 = [i for i, _ in cand[:3]]

    def max_pair(ids):
        return max(
            _cos_ppm(vecs[a], vecs[b])
            for ai, a in enumerate(ids) for b in ids[ai + 1:]
        )

    assert max_pair(sel3) < max_pair(topk3)


def test_kcenter_select_equals_python_reference(spark):
    """kcenter_select equals a direct python farthest-first replay
    (seed = smallest id, argmin of max-sim, id tie-break), and its
    selected set's tightest pair is looser than a contiguous-id pick
    of the same size on clustered fixtures."""
    import numpy as np

    from tickdb_spark.operators.diversify import _cos_ppm, kcenter_select

    rng = np.random.RandomState(11)
    base = rng.randn(4, 16).astype("float32")
    rows = [
        (i, [float(x) for x in (base[i % 4] + 0.03 * rng.randn(16).astype("float32"))])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [
        (r["rnk"], r["vec_id"], r["maxsim_q"])
        for r in kcenter_select(df, k=6).collect()
    ]

    vecs = dict(rows)
    sel = [min(vecs)]
    want = [(1, sel[0], 0)]
    for rnk in range(2, 7):
        best = None
        for i in vecs:
            if i in sel:
                continue
            ms = max(_cos_ppm(vecs[i], vecs[j]) for j in sel)
            key = (ms, i)
            if best is None or key < best[0]:
                best = (key, i, ms)
        sel.append(best[1])
        want.append((rnk, best[1], best[2]))
    assert got == want

    def max_pair(ids):
        return max(
            _cos_ppm(vecs[a], vecs[b])
            for ai, a in enumerate(ids) for b in ids[ai + 1:]
        )

    assert max_pair(sel) < max_pair(list(range(6)))


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    edges=st.sets(
        st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(
            lambda t: t[0] < t[1]
        ),
        min_size=1, max_size=30,
    ),
    k=st.integers(min_value=1, max_value=4),
)
def test_kcore_equals_python_peel(spark, edges, k):
    """kcore_nodes equals a direct python peel (iteratively drop
    degree<k vertices until stable) on arbitrary small graphs, with the
    emitted degree equal to the python core's per-node degree."""
    from tickdb_spark.operators.cluster import kcore_nodes

    df = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    got = {
        r["node"]: r["core_deg"] for r in kcore_nodes(df, k).collect()
    }

    alive = {n for e in edges for n in e}
    while True:
        deg = {n: 0 for n in alive}
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        new = {n for n in alive if deg[n] >= k}
        if new == alive:
            break
        alive = new
    want = {}
    for a, b in edges:
        if a in alive and b in alive:
            want[a] = want.get(a, 0) + 1
            want[b] = want.get(b, 0) + 1
    assert got == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    edges=st.sets(
        st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(
            lambda t: t[0] < t[1]
        ),
        min_size=1, max_size=30,
    ),
)
def test_kcore_decompose_equals_python_and_duckdb(spark, edges):
    """Full core decomposition equals (a) a direct python peel-at-
    increasing-k and (b) the single-recursion DuckDB twin, on arbitrary
    small graphs — every edge endpoint gets a core number ≥ 1."""
    import duckdb

    from tickdb_spark.operators.cluster import (
        kcore_decompose,
        kcore_decompose_sql,
    )

    df = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    got = {
        r["node"]: r["core_num"] for r in kcore_decompose(df).collect()
    }

    want = {}
    alive = {n for e in edges for n in e}
    k = 1
    while alive:
        while True:
            deg = {n: 0 for n in alive}
            for a, b in edges:
                if a in alive and b in alive:
                    deg[a] += 1
                    deg[b] += 1
            new = {n for n in alive if deg[n] >= k}
            if new == alive:
                break
            for n in alive - new:
                want[n] = k - 1
            alive = new
        k += 1
    assert got == want

    con = duckdb.connect()
    vals = " UNION ALL ".join(f"SELECT {a} AS id_a, {b} AS id_b"
                              for a, b in sorted(edges))
    duck = {
        n: c
        for n, c in con.execute(kcore_decompose_sql(vals)).fetchall()
    }
    assert duck == want


def test_kcore_max_rounds_exhaustion_raises(spark, monkeypatch):
    """ADVICE r15: exhausting max_rounds without a fixpoint must ERROR,
    not return a partial peel (a path graph at k=2 sheds only its two
    endpoints per round, so nodes with degree < k would leak into the
    'core'). The same graph under enough rounds converges to the true
    (empty) 2-core. The r16 local-fixpoint fast path never exhausts
    rounds (it iterates to the fixpoint in-process), so the ceiling is
    pinned to 0 to exercise the DISTRIBUTED peel this contract governs."""
    import pytest

    from tickdb_spark.operators import cluster as _cluster
    from tickdb_spark.operators.cluster import kcore_nodes

    monkeypatch.setattr(_cluster, "KCORE_LOCAL_MAX_EDGES", 0)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="max_rounds"):
        kcore_nodes(chain, k=2, max_rounds=2)
    assert kcore_nodes(chain, k=2).count() == 0  # a path has no 2-core


def test_mmr_batch_equals_per_query_loop(spark):
    """mmr_select_batch == looping mmr_select per query (the shared
    corpus pass + one window must change nothing), on synthetic
    clustered vectors."""
    import numpy as np
    import pandas as pd

    from tickdb_spark.operators.diversify import mmr_select, mmr_select_batch

    rng = np.random.RandomState(3)
    base = rng.randn(3, 16).astype("float32")
    rows = [
        (i, [float(x) for x in (base[i % 3] + 0.05 * rng.randn(16).astype("float32"))])
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qids = [0, 7, 11]
    batch = mmr_select_batch(df, qids, k=5, prefilter=30).toPandas()
    for qid in qids:
        one = mmr_select(df, qid, k=5, prefilter=30).toPandas()
        sub = batch[batch.query_id == qid][one.columns].reset_index(drop=True)
        pd.testing.assert_frame_equal(sub, one, check_dtype=False)


def test_mmr_indexed_equals_brute_when_buckets_cover(spark):
    """When every vector lands in every query's LSH buckets (clustered
    fixtures with one shared dominant direction), the index-sourced
    batch MMR must equal the brute-scan batch MMR exactly — candidate
    sourcing is the ONLY difference between the two fronts."""
    import numpy as np
    import pandas as pd

    from tickdb_spark.operators.diversify import (
        mmr_select_batch,
        mmr_select_batch_from_index,
    )
    from tickdb_spark.operators.similarity import lsh_signature_table

    # seed 123: min |plane·base| = 0.33 over all 144 hyperplanes — far
    # above float32 rounding, so positively-scaled copies keep every
    # plane dot's sign exactly and all 40 vectors share one bucket per
    # table (full LSH coverage)
    rng = np.random.RandomState(123)
    base = rng.randn(64).astype("float64")
    rows = [
        (i, [float(x) for x in (base * (1.0 + i / 100.0))])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sig = lsh_signature_table(df)
    # same dominant direction ⇒ same sign pattern ⇒ one bucket per table
    # (24 LSH tables of 6 planes each)
    assert sig.select("table_id", "bucket").distinct().count() == 24
    qids = [0, 3]
    brute = mmr_select_batch(df, qids, k=5, prefilter=40).toPandas()
    idx = mmr_select_batch_from_index(df, sig, qids, k=5, prefilter=40).toPandas()
    cols = sorted(brute.columns)
    pd.testing.assert_frame_equal(
        brute[cols].sort_values(cols).reset_index(drop=True),
        idx[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False,
    )


def test_kcenter_floor_drops_low_relevance(spark):
    """Quality-gated k-center: candidates below the relevance floor
    never enter the coreset; the anchor itself is excluded; the
    survivors' greedy equals plain k-center on the filtered corpus."""
    import pandas as pd

    from tickdb_spark.operators.diversify import kcenter_select

    # anchor 0 = e1; ids 1-4 aligned with e1 (rel 1e6); 5-8 orthogonal
    dim = 8
    rows = [(0, [1.0] + [0.0] * (dim - 1))]
    for i in range(1, 5):
        v = [1.0] + [0.0] * (dim - 1)
        v[1] = 0.01 * i
        rows.append((i, v))
    for i in range(5, 9):
        v = [0.0] * dim
        v[2 + (i - 5)] = 1.0
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = kcenter_select(
        df, k=8, query_id=0, rel_floor_ppm=500_000
    ).toPandas()
    assert set(got.vec_id) == {1, 2, 3, 4}  # orthogonals + anchor dropped
    plain = kcenter_select(
        df.where("vec_id IN (1,2,3,4)"), k=8
    ).toPandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), plain.reset_index(drop=True),
        check_dtype=False,
    )


km_subj_st = st.tuples(
    st.sampled_from(["g1", "g2"]),
    st.integers(min_value=1, max_value=6),     # duration (dup-heavy)
    st.booleans(),                             # event observed?
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(subjects=st.lists(km_subj_st, min_size=1, max_size=25))
def test_km_curve_equals_python_reference(spark, subjects):
    """Kaplan-Meier equals a python product-limit replay on arbitrary
    censoring patterns — including the degenerate classes fixtures
    skip: ALL-censored groups (every factor 1.0 → surv stays 1e6),
    single-duration groups, and event pile-ups where n_t == d_t (surv
    hits exactly 0)."""
    import math

    from tickdb_spark.operators.survival import km_curve

    df = spark.createDataFrame(subjects, "grp string, dur long, ev boolean")
    got = {
        (r["grp"], r["duration"]): (
            r["n_risk"], r["d_events"], r["c_censored"], r["surv_ppm"]
        )
        for r in km_curve(df, "grp", "dur", "ev").collect()
    }
    want = {}
    for g in {s[0] for s in subjects}:
        subs = [(d, e) for gg, d, e in subjects if gg == g]
        total = len(subs)
        ended = 0
        surv = 1.0
        for t in sorted({d for d, _ in subs}):
            d_t = sum(1 for d, e in subs if d == t and e)
            c_t = sum(1 for d, e in subs if d == t and not e)
            n_t = total - ended
            surv = surv * (1.0 - float(d_t) / float(n_t))
            want[(g, t)] = (
                n_t, d_t, c_t, int(math.floor(surv * 1_000_000.0 + 0.5))
            )
            ended += d_t + c_t
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(subjects=st.lists(km_subj_st, min_size=1, max_size=25))
def test_km_logrank_equals_python_reference(spark, subjects):
    """Two-sample log-rank equals a python replay of the SAME
    floor-quantized integer sums (the Spark/DuckDB arithmetic is
    truncating integer division on non-negative operands, so python //
    replays it exactly) — including degenerate censoring: all-censored
    cohorts (zero event durations → sums 0, χ² NULL) and single-group
    inputs."""
    import math

    from tickdb_spark.operators.survival import km_logrank

    df = spark.createDataFrame(subjects, "grp string, dur long, ev boolean")
    r = km_logrank(df, "grp", "dur", "ev", "g1", "g2").collect()[0]

    SE, SV = 10**6, 10**4
    per = {}
    totals = {"g1": 0, "g2": 0}
    for g, d, e in subjects:
        cell = per.setdefault(d, {"d_a": 0, "d_b": 0, "end_a": 0, "end_b": 0})
        key = "a" if g == "g1" else "b"
        cell["end_" + key] += 1
        if e:
            cell["d_" + key] += 1
        totals[g] += 1
    o_a = o_b = e_s = v_s = 0
    ended_a = ended_b = 0
    for t in sorted(per):
        c = per[t]
        n_a = totals["g1"] - ended_a
        n_b = totals["g2"] - ended_b
        d = c["d_a"] + c["d_b"]
        n = n_a + n_b
        if d > 0:
            p_se = n_a * SE // n
            p_sv = n_a * SV // n
            o_a += c["d_a"]
            o_b += c["d_b"]
            e_s += d * p_se
            v_s += (d * (n - d) // max(n - 1, 1)) * p_sv * (SV - p_sv)
        ended_a += c["end_a"]
        ended_b += c["end_b"]
    assert (r["o_a"], r["o_b"], r["e_a_scaled"], r["v_scaled"]) == (
        o_a, o_b, e_s, v_s
    )
    if v_s > 0:
        chi2 = (float(o_a) - float(e_s) / 1e6) ** 2 / (float(v_s) / 1e8)
        assert r["chi2_milli"] == int(math.floor(chi2 * 1000.0 + 0.5))
    else:
        assert r["chi2_milli"] is None


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(subjects=st.lists(km_subj_st, min_size=1, max_size=25))
def test_na_cumhaz_equals_python_reference(spark, subjects):
    """Nelson-Aalen cumulative hazard equals a python replay of the same
    truncating-integer term sum on arbitrary censoring patterns."""
    from tickdb_spark.operators.survival import na_cumhaz

    df = spark.createDataFrame(subjects, "grp string, dur long, ev boolean")
    got = {
        (r["grp"], r["duration"]): (
            r["n_risk"], r["d_events"], r["c_censored"], r["cumhaz_scaled"]
        )
        for r in na_cumhaz(df, "grp", "dur", "ev").collect()
    }
    S = 10**9
    want = {}
    for g in {s[0] for s in subjects}:
        subs = [(d, e) for gg, d, e in subjects if gg == g]
        total, ended, ch = len(subs), 0, 0
        for t in sorted({d for d, _ in subs}):
            d_t = sum(1 for d, e in subs if d == t and e)
            c_t = sum(1 for d, e in subs if d == t and not e)
            n_t = total - ended
            ch += d_t * S // n_t
            want[(g, t)] = (n_t, d_t, c_t, ch)
            ended += d_t + c_t
    assert got == want


def test_km_curve_duration_ceiling_raises(spark):
    """VERDICT r15 audit: the running factor-prefix window is O(D²) in
    distinct durations per group, so over-resolution durations must
    ERROR (telling the caller to bucket), not quietly blow the window
    state. A bucketed duration_expr on the same rows passes."""
    import pytest

    from tickdb_spark.operators.survival import km_curve

    df = spark.createDataFrame(
        [("g", i * 1000 + 7, True) for i in range(40)],
        "grp string, secs long, ev boolean",
    )
    with pytest.raises(Exception, match="max_durations"):
        km_curve(df, "grp", "secs", "ev", max_durations=10).collect()
    ok = km_curve(
        df, "grp", "secs div 10000", "ev", max_durations=10
    ).collect()
    assert len(ok) == 4


def test_diversify_tie_breaking_on_identical_vectors(spark):
    """The adversarial tie case: EVERY vector identical → every cosine
    identical → selection is decided purely by the id tie-break. MMR
    must pick ascending ids; k-center must seed at the min id and then
    peel ascending; both must agree with the DuckDB twins."""
    import duckdb
    import pandas as pd

    from tickdb_spark.operators.diversify import (
        kcenter_select,
        kcenter_select_sql,
        mmr_select,
        mmr_select_sql,
    )

    v = [1.0] * 8
    rows = [(i, v) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    m = mmr_select(df, 0, k=4, prefilter=10).toPandas()
    assert list(m.vec_id) == [1, 2, 3, 4]      # pure id order
    kc = kcenter_select(df, k=4).toPandas()
    assert list(kc.vec_id) == [0, 1, 2, 3]

    con = duckdb.connect()
    arr = "[" + ", ".join("1.0" for _ in range(8)) + "]::FLOAT[]"
    con.execute(
        "CREATE VIEW embeddings AS SELECT range AS vec_id, "
        f"{arr} AS embedding FROM range(12)"
    )
    om = con.execute(
        mmr_select_sql("embeddings", 0, k=4, prefilter=10, dim=8)
    ).df()
    cols = sorted(m.columns)
    pd.testing.assert_frame_equal(
        m[cols].sort_values(cols).reset_index(drop=True),
        om[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False,
    )
    ok = con.execute(kcenter_select_sql("embeddings", k=4, dim=8)).df()
    cols = sorted(kc.columns)
    pd.testing.assert_frame_equal(
        kc[cols].sort_values(cols).reset_index(drop=True),
        ok[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False,
    )


def test_kcenter_empty_and_tiny_corpus(spark):
    """Empty/undersized inputs degrade gracefully (the planner
    empty-input lesson): an empty corpus yields an empty selection, a
    corpus smaller than k yields the whole corpus in peel order."""
    from tickdb_spark.operators.diversify import kcenter_select

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kcenter_select(empty, k=4).collect() == []
    tiny = spark.createDataFrame(
        [(5, [1.0, 0.0]), (9, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = [(r["rnk"], r["vec_id"]) for r in kcenter_select(tiny, k=8).collect()]
    assert got == [(1, 5), (2, 9)]
