"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 (fast inner loop; the driver runs sf0.01)."""

from __future__ import annotations

import os

import pytest

from big_data_for_smart_houses_spark.queries import ORACLES, QUERIES

from oracle_harness import assert_match

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

ORACLE_CASES = sorted(n for n in QUERIES if n in ORACLES)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(spark, name):
    res = assert_match(name, QUERIES[name], ORACLES[name], spark, SF_DIR)
    # float jitter margin: worst relative error must sit far below any
    # plausible driver hash rounding
    assert res["max_rel_err"] < 1e-6, res


def test_all_queries_have_callables():
    for name, fn in QUERIES.items():
        assert callable(fn), name
