"""Query registry: the single source of truth wiring SURVEY.md §2 keys to
(a) a PySpark implementation callable and (b) its DuckDB oracle SQL twin.

``__spark_entry__.queries()`` / ``oracle_sql()`` read straight from here, as
does the local pre-verification harness (tests/test_oracle.py), so a key is
implemented exactly once and checked identically locally and by the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
ROWS_ONLY: set[str] = set()  # keys deliberately without a SQL oracle (SURVEY §2)


def query(key: str, oracle: Optional[str] = None, rows_only: bool = False):
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``key``.

    ``oracle`` is the DuckDB ANSI-SQL twin (tables pre-registered as views).
    ``rows_only=True`` declares the weaker rows-only driver check is by
    design (approx/stateful/sink ops — SURVEY.md §2 pre-declares these).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key {key!r}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = " ".join(oracle.split())
        elif rows_only:
            ROWS_ONLY.add(key)
        else:
            raise ValueError(f"{key!r}: provide oracle SQL or set rows_only=True")
        return fn

    return deco


# Driver-facing key order. The driver's correctness harness walks keys in
# the order ``queries()`` yields them and checks ~50 per round, so keys
# with no hard driver signal yet go first. Round-4 rotation (VERDICT r3):
# the 40 keys absent from both r2 and r3 driver runs, then the 5 r3
# hash-FAILs whose oracle CASTs must be re-verified. Everything else keeps
# registration order behind them.
PRIORITY: list[str] = [
    # round-4 E1 compiler extensions ($select computed columns, $collect
    # re-nest) — brand new, need first driver contact
    "compiler_select_computed", "compiler_collect_nested",
    # never driver-checked (r2+r3 gap) — sets/sorts/storage/scans/
    # subqueries/timeseries + join/agg/fn extensions
    "set_union_all", "set_union_distinct", "set_intersect", "set_except",
    "set_intersect_all", "set_except_all",
    "sort_multikey", "limit_topk_global",
    "sink_partitioned_parquet", "join_bucketed_colocated",
    "scan_csv_roundtrip", "scan_jsonl_roundtrip", "scan_orc_roundtrip",
    "scan_schema_evolution",
    "scan_parquet", "scan_all_entities", "sink_parquet_roundtrip",
    "scan_json_props", "sample_hash_deterministic", "sample_stratified_hash",
    "sub_scalar_uncorrelated", "sub_in", "sub_not_in",
    "sub_exists_correlated", "sub_correlated_scalar", "sub_in_grouped_having",
    "ts_gap_fill_ffill", "ts_ohlc_hourly",
    "join_q3_shipping_priority", "join_skew_salted", "join_interval_overlap",
    "join_asof", "join_multiway_star", "join_self", "join_range_bucketed",
    "agg_mode", "agg_bool", "agg_hist_orders_per_cust", "agg_corr_regr",
    "fn_bitwise",
    # r3 hash-FAILs — oracles now CAST their emitted integer sums to BIGINT
    "win_sessionize", "stream_stateful_count", "llm_text_stats",
    "llm_langid_ngram", "llm_doc_fingerprint",
]


def ordered_keys() -> list[str]:
    """All registered keys, PRIORITY first, the rest in registration order."""
    prio = [k for k in PRIORITY if k in QUERIES]
    rest = [k for k in QUERIES if k not in set(prio)]
    return prio + rest


def load_all() -> None:
    """Import every query module so registration side effects run."""
    import naqed_spark.queries  # noqa: F401
