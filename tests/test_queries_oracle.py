"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 (fast inner loop; the driver runs sf0.01)."""

from __future__ import annotations

import os

import pytest

from big_data_for_smart_houses_spark.queries import ORACLES, QUERIES

from oracle_harness import assert_match

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

# SPARK_GRAFT_EXACT=1 mirrors the driver's gate: order-insensitive,
# bit-exact values, no float tolerance. Run this at sf0.01 before the
# round ends:
#   SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_EXACT=1 \
#     pytest tests/test_queries_oracle.py
EXACT = os.environ.get("SPARK_GRAFT_EXACT", "0") == "1"

ORACLE_CASES = sorted(n for n in QUERIES if n in ORACLES)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(spark, name):
    res = assert_match(
        name, QUERIES[name], ORACLES[name], spark, SF_DIR, exact=EXACT
    )
    if not EXACT:
        # float jitter margin: worst relative error must sit far below
        # any plausible driver hash rounding
        assert res["max_rel_err"] < 1e-6, res


def test_all_queries_have_callables():
    for name, fn in QUERIES.items():
        assert callable(fn), name


NO_ORACLE_CASES = sorted(n for n in QUERIES if n not in ORACLES)


@pytest.mark.parametrize("name", NO_ORACLE_CASES)
def test_no_oracle_queries_still_run(spark, name):
    """The driver's rows-only check still executes these — a crash
    there is a red row (round 3's NTZ incident). Keep them running
    end-to-end at smoke scale; their VALUE checks live in the gated
    recall-invariant companions and unit tests."""
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
