"""Local pre-verification of every registered query against its DuckDB
oracle twin (SURVEY.md §5.2) — the same row-count + schema +
order-insensitive value check the driver runs, at sf0.001 for speed.

Run the bigger fixture with NAQED_TEST_SF_DIR=/root/testdata/sf0.01.
"""

from __future__ import annotations

import os

import pytest

from naqed_spark.oracle_check import check_key, duck_connect
from naqed_spark.registry import QUERIES, load_all
from naqed_spark.session import get_spark, tune_session

SF_DIR = os.environ.get("NAQED_TEST_SF_DIR", "/root/testdata/sf0.001")

load_all()


@pytest.fixture(scope="session")
def spark():
    s = tune_session(get_spark("naqed-tests"))
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_oracle(spark, duck, key):
    problems = check_key(spark, duck, key, SF_DIR)
    assert not problems, "\n".join(problems)


def test_knn_blocked_multiblock(spark, duck, monkeypatch):
    """Force the blocked-broadcast kernel onto the multi-block path (500
    fixture vectors / 150-row blocks = 4 blocks) and require the same
    hash-exact oracle match as the default single-block run — proves the
    per-block top-k + relational merge is exact, not just the degenerate
    1-block case."""
    monkeypatch.setenv("NAQED_KNN_BLOCK_ROWS", "150")
    for key in ("llm_knn_bruteforce", "llm_similarity_threshold_join"):
        problems = check_key(spark, duck, key, SF_DIR)
        assert not problems, "\n".join(problems)
