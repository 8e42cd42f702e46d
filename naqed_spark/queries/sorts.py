"""§2-F: sort / limit / top-k (SURVEY.md:236-243).

The driver's value hash is order-insensitive, so ordering is asserted via a
row_number() rank column computed over the same total order (unique-key
tiebreaks per §7.3 make the rank deterministic).

Scale notes: orderBy().limit(k) compiles to TakeOrderedAndProject — each
partition keeps its local top-k, the driver merges k×partitions rows; no
global sort materializes. The full sort in sort_multikey is a range
partitioned sort (sampled boundaries) — fine at 100 TB because the filter
cuts the input first.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from naqed_spark.queries._util import load
from naqed_spark.registry import query


@query(
    "sort_multikey",
    # (l_orderkey, l_linenumber) is NOT unique in the fixtures — the order
    # covers every emitted column, so rank ties can only occur between
    # fully-identical rows (where rank assignment is interchangeable and
    # the output multiset is unaffected).
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity,
           row_number() OVER (ORDER BY l_returnflag DESC, l_linestatus ASC,
                              l_orderkey ASC, l_linenumber ASC,
                              l_quantity ASC) AS rnk
    FROM lineitem WHERE l_quantity >= 49
    """,
)
def sort_multikey(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    order = [
        F.col("l_returnflag").desc(),
        F.col("l_linestatus").asc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
        F.col("l_quantity").asc(),
    ]
    return (
        li.orderBy(*order)
        .withColumn("rnk", F.row_number().over(Window.orderBy(*order)))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "rnk",
        )
    )


@query(
    "limit_topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def limit_topk_global(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
