"""Focused equivalence tests for the r16 optimization-round rewrites.

Each optimization that changed an operator's internals gets a test pinning
the NEW spelling to the OLD spelling's result on a constructed input —
bench speed must never buy a result change (round contract: every declared
query stays hash-identical to its oracle; these tests guard the shared
helpers the oracle sweep only exercises end-to-end).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from naqed_spark.registry import QUERIES, load_all
from naqed_spark.session import get_spark, tune_session

SF_DIR = os.environ.get("NAQED_TEST_SF_DIR", "/root/testdata/sf0.001")

load_all()

pytestmark = pytest.mark.quick


@pytest.fixture(scope="session")
def spark():
    yield tune_session(get_spark("naqed-r16-opt-tests"))


def test_band_buckets_match_union_spelling(spark):
    """_band_buckets (single explode pass) emits exactly the rows the old
    4-way unionAll spelling emitted."""
    from naqed_spark.queries.llm import _band_buckets, _minhash_sigs

    sigs = _minhash_sigs(spark, SF_DIR)
    new = _band_buckets(sigs)
    old = None
    for b in range(4):
        part = sigs.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.md5(
                F.concat(F.col(f"sig{2 * b}"), F.col(f"sig{2 * b + 1}"))
            ).alias("bh"),
        )
        old = part if old is None else old.unionAll(part)
    assert new.exceptAll(old).isEmpty() and old.exceptAll(new).isEmpty()


def test_ngram_candidates_match_join_spelling(spark):
    """The windowed-posting-list candidate generator yields exactly the
    pair set of the old keep-join + self-join spelling, including the df
    cap cutting in mid-range (cap=3 on a corpus with shingle df 1..4)."""
    from naqed_spark.queries.llm_ext import _ngram_candidates, _shingle_sets

    # doc i repeats a shared 5-word opener for i groups → shingle dfs 1..4
    docs = [
        (i, "alpha beta gamma delta eps%d tail%da tail%db" % (i % 4, i, i))
        for i in range(8)
    ]
    corpus = spark.createDataFrame(docs, "doc_id long, text string")
    sh = _shingle_sets(corpus)
    for cap in (1, 3, 10**9):
        new = _ngram_candidates(sh, cap)
        ex = sh.select("doc_id", F.explode("sset").alias("s"))
        keep = (
            ex.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= cap)
            .select("s")
        )
        exc = ex.join(keep, "s").select("doc_id", "s")
        old = (
            exc.alias("a")
            .join(
                exc.alias("b"),
                (F.col("a.s") == F.col("b.s"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
            )
            .distinct()
        )
        assert sorted(map(tuple, new.collect())) == sorted(
            map(tuple, old.collect())
        ), f"cap={cap}"


def test_knn_fast_path_matches_blocked_path(spark):
    """_blocked_union's estimate-based single-block fast path returns the
    same rows as the forced multi-block path (NAQED_KNN_BLOCK_ROWS)."""
    key = "llm_knn_bruteforce"
    fast = QUERIES[key](spark, SF_DIR)
    fast_rows = sorted(map(tuple, fast.collect()))
    os.environ["NAQED_KNN_BLOCK_ROWS"] = "37"  # forces many blocks
    try:
        blocked = QUERIES[key](spark, SF_DIR)
        blocked_rows = sorted(map(tuple, blocked.collect()))
    finally:
        del os.environ["NAQED_KNN_BLOCK_ROWS"]
    assert fast_rows == blocked_rows


def test_catalog_df_cache_is_per_session_and_lazy(spark):
    """load() returns the SAME analyzed frame within a session (the r16
    build-constant win), events normalization included; the cache holds
    lazy plans only (no InMemoryRelation — nothing is result-cached)."""
    from naqed_spark.catalog import load

    a = load(spark, SF_DIR, "lineitem")
    assert load(spark, SF_DIR, "lineitem") is a
    ev = load(spark, SF_DIR, "events")
    assert str(ev.schema["ts"].dataType) == "TimestampType()"
    assert "InMemoryRelation" not in a._jdf.queryExecution().toString()
    # distinct sf_dirs must never collide
    other = SF_DIR.replace("0.001", "0.01")
    if os.path.isdir(other):
        assert load(spark, other, "lineitem") is not a


def test_scoped_persists_released_on_next_query_build(spark):
    """Builders persist frames their own plan reuses (user_edges, LSH
    sigs, baskets); the registry must release those marks when the NEXT
    query builds, so a long session (oracle sweep, real pipeline) never
    accumulates cached blocks until eviction/GC stalls. Release is safe
    by construction: a persist mark recomputes from lineage."""
    from naqed_spark.queries import _util

    jsc = spark.sparkContext._jsc.sc()

    def n_cached():
        return jsc.getPersistentRDDs().size()

    # build (not run) a graph key: user_edges registers a scoped mark
    df_a = QUERIES["graph_degree"](spark, SF_DIR)
    assert len(_util._SCOPED_PERSISTS) >= 1
    marked = len(_util._SCOPED_PERSISTS)
    # building the next query releases the previous query's marks
    QUERIES["filter_comparison"](spark, SF_DIR)
    assert len(_util._SCOPED_PERSISTS) == 0
    # and the released frame still computes correctly from lineage
    assert df_a.limit(1).count() in (0, 1)
    # a query that persists AND self-unpersists (bfs) must stay green
    # after an interleaved release (CacheManager dedup + re-mark)
    QUERIES["graph_reachability_bfs"](spark, SF_DIR).limit(1).collect()
    QUERIES["filter_comparison"](spark, SF_DIR)
    assert len(_util._SCOPED_PERSISTS) == 0
    assert marked >= 1 and n_cached() >= 0  # API sanity, no leak assertion:
    # localCheckpoint pins (iterative keys) are managed separately
