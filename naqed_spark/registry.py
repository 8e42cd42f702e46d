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


def load_all() -> None:
    """Import every query module so registration side effects run."""
    import naqed_spark.queries  # noqa: F401
