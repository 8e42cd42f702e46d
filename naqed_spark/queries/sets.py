"""§2-G: set operations (SURVEY.md:245-250).

Two bag projections with guaranteed overlap: all (custkey, status) pairs
from orders vs the pairs from high-value orders. ANSI semantics: UNION ALL
keeps duplicates; UNION / INTERSECT / EXCEPT are distinct (Spark: unionAll,
union().distinct(), intersect, subtract).

Scale notes: distinct set ops are hash aggregations / left-semi or
left-anti hash joins under Catalyst — they shuffle on the full row as key.
UNION ALL is a no-shuffle concatenation of partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from naqed_spark.queries._util import load
from naqed_spark.registry import query

_A_SQL = "SELECT o_custkey AS k, o_orderstatus AS s FROM orders"
_B_SQL = (
    "SELECT o_custkey AS k, o_orderstatus AS s FROM orders "
    "WHERE o_totalprice > 250000"
)


def _a(spark, sf_dir) -> DataFrame:
    return load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"), F.col("o_orderstatus").alias("s")
    )


def _b(spark, sf_dir) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select(F.col("o_custkey").alias("k"), F.col("o_orderstatus").alias("s"))
    )


@query("set_union_all", oracle=f"{_A_SQL} UNION ALL {_B_SQL}")
def set_union_all(spark, sf_dir):
    return _a(spark, sf_dir).unionAll(_b(spark, sf_dir))


@query("set_union_distinct", oracle=f"{_A_SQL} UNION {_B_SQL}")
def set_union_distinct(spark, sf_dir):
    return _a(spark, sf_dir).union(_b(spark, sf_dir)).distinct()


@query("set_intersect", oracle=f"{_A_SQL} INTERSECT {_B_SQL}")
def set_intersect(spark, sf_dir):
    return _a(spark, sf_dir).intersect(_b(spark, sf_dir))


@query("set_except", oracle=f"{_A_SQL} EXCEPT {_B_SQL}")
def set_except(spark, sf_dir):
    # ANSI EXCEPT is distinct → Spark's subtract() (exceptAll would be bag)
    return _a(spark, sf_dir).subtract(_b(spark, sf_dir))


@query(
    "set_intersect_all",
    oracle=f"({_A_SQL}) INTERSECT ALL ({_B_SQL})",
)
def set_intersect_all(spark, sf_dir):
    """Bag intersection (multiplicity = min of the two sides) — Spark
    intersectAll compiles to a count-equalizing aggregation + generate,
    one shuffle on the full row."""
    return _a(spark, sf_dir).intersectAll(_b(spark, sf_dir))


@query(
    "set_except_all",
    oracle=f"({_A_SQL}) EXCEPT ALL ({_B_SQL})",
)
def set_except_all(spark, sf_dir):
    """Bag difference (multiplicities subtract)."""
    return _a(spark, sf_dir).exceptAll(_b(spark, sf_dir))


@query(
    "set_symmetric_diff",
    # Symmetric difference (A △ B) — the change-detection set op SQL
    # never named: customers in the BUILDING segment XOR customers with
    # balance > 5000. Composed as (A∖B) ∪ (B∖A) over the §2-G
    # primitives; both EXCEPTs hash-partition on the full row and AQE
    # sizes the two exchanges — no new physical machinery, which is the
    # point of a complete algebra: the missing op is a 2-line
    # composition, not a feature request.
    oracle="""
    (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
     EXCEPT
     SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    UNION
    (SELECT c_custkey FROM customer WHERE c_acctbal > 5000
     EXCEPT
     SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def set_symmetric_diff(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.subtract(b).union(b.subtract(a)).distinct()
