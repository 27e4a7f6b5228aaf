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
