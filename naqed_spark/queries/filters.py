"""§2-B: projection / filter / predicates.

Scale notes: every predicate here is a Catalyst-native expression, so it
reaches the parquet scan as PushedFilters (row-group min/max skipping at
100 TB). No Python executes per row anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from naqed_spark.queries._util import date_str, load, money_row
from naqed_spark.registry import query


@query(
    "project_select_alias",
    # round to 4, not 2: the product of two 2-decimal doubles has an exact
    # ≤4-decimal value, so both engines agree at 4 digits; at 2 digits exact
    # half-cents (38228.5*0.97=37081.645) round differently per engine.
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_quantity AS qty,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    """,
)
def project_select_alias(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("qty"),
        money_row(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "net_price"
        ),
    )


@query(
    "filter_comparison",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      AND l_quantity > 45 AND l_returnflag <> 'A' AND l_discount >= 0.05
    """,
)
def filter_comparison(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp_ntz"))
        & (F.col("l_quantity") > 45)
        & (F.col("l_returnflag") != "A")
        & (F.col("l_discount") >= 0.05)
    ).select(
        "l_orderkey",
        "l_linenumber",
        date_str("l_shipdate").alias("ship_date"),
    )


@query(
    "filter_boolean_logic",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'F' AND o_totalprice > 150000)
       OR (NOT (o_orderpriority = '5-LOW') AND o_totalprice <= 25000)
    """,
)
def filter_boolean_logic(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000))
        | (~(F.col("o_orderpriority") == "5-LOW") & (F.col("o_totalprice") <= 25000))
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


@query(
    "filter_in_between_like",
    oracle="""
    SELECT p_partkey, p_brand, p_type, p_size
    FROM part
    WHERE p_type IN ('PROMO', 'ECONOMY', 'STANDARD')
      AND p_size BETWEEN 10 AND 30
      AND p_brand LIKE 'Brand#1%'
    """,
)
def filter_in_between_like(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").isin("PROMO", "ECONOMY", "STANDARD")
        & F.col("p_size").between(10, 30)
        & F.col("p_brand").like("Brand#1%")
    ).select("p_partkey", "p_brand", "p_type", "p_size")


@query(
    "filter_null_semantics",
    # the fixtures contain no NULLs (FIXTURES.md) — nullif() manufactures
    # them so IS NULL / IS NOT NULL / null-safe equality are genuinely tested
    oracle="""
    SELECT event_id,
           nullif(event_type, 'error') AS et_or_null,
           (nullif(event_type, 'error') IS NULL) AS is_err,
           (nullif(event_type, 'error') IS NOT DISTINCT FROM 'click') AS nse_click
    FROM events
    WHERE nullif(event_type, 'error') IS NULL
       OR nullif(event_type, 'error') IS NOT NULL
    """,
)
def filter_null_semantics(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    etn = F.expr("nullif(event_type, 'error')")
    return ev.filter(etn.isNull() | etn.isNotNull()).select(
        "event_id",
        etn.alias("et_or_null"),
        etn.isNull().alias("is_err"),
        etn.eqNullSafe(F.lit("click")).alias("nse_click"),
    )


@query(
    "project_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def project_distinct(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
    )


@query(
    "filter_dynamic_args",
    # naqed-style parameterized query: args arrive as a plain dict and are
    # compiled to predicates by the QuerySpec engine (SURVEY.md §2-B / §3.2 E1)
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000.0
      AND c_nationkey IN (1, 2, 3, 4, 5)
    """,
)
def filter_dynamic_args(spark, sf_dir):
    from naqed_spark.compiler.engine import Engine

    eng = Engine(spark, sf_dir)
    return eng.query(
        {
            "customer": {
                "$filter": {
                    "c_mktsegment": "BUILDING",
                    "c_acctbal": {"$gt": 1000.0},
                    "c_nationkey": {"$in": [1, 2, 3, 4, 5]},
                },
                "c_custkey": True,
                "c_name": True,
                "c_acctbal": True,
            }
        }
    )
