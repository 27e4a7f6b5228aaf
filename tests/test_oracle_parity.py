"""Replicates the driver's correctness gate locally: every query-bank entry
runs on Spark AND through its DuckDB oracle SQL at sf0.001, then results are
compared order-insensitively with columns sorted by name — exact for ints/
strings, bit-exact expected for doubles thanks to the decimal-sum discipline
(see querybank module docstring)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT, SF_SMOKE, assert_frames_match, oracle_frame
from tickdb_spark.querybank import REGISTRY


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    qd = REGISTRY[name]
    sdf = qd.fn(spark, SF_SMOKE)
    if qd.oracle is None:
        assert sdf.count() >= 0  # rows-only check, like the driver
        return
    odf = oracle_frame(duck, qd.oracle, SF_SMOKE)
    assert_frames_match(sdf, odf)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle_sf001(name, spark, duck):
    """Same gate at sf0.01 — the SF the driver actually runs. sf-dependent
    divergence (dtype drift, tie-breaks that only collide with more rows)
    hides at sf0.001."""
    qd = REGISTRY[name]
    sdf = qd.fn(spark, SF_CORRECT)
    if qd.oracle is None:
        assert sdf.count() >= 0
        return
    odf = oracle_frame(duck, qd.oracle, SF_CORRECT)
    assert_frames_match(sdf, odf)
