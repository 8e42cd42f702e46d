"""Subquery surface: scalar, IN / NOT IN, correlated EXISTS, correlated
scalar (the TPC-H Q17 shape) — round-3 extensions beyond SURVEY.md §2.

These run through the SQL entry point (E3): the interesting engine work is
Catalyst's subquery DECORRELATION — a correlated scalar subquery rewrites to
an aggregate + equi-join, EXISTS to a left-semi join, NOT IN to a
null-aware anti join — so the physical plans are the same shuffled/broadcast
joins the §2-C keys already assert, not per-row re-executions. The oracle
twin is the IDENTICAL query text on DuckDB (every construct below is common
ANSI SQL in both dialects).

Determinism: averages are computed as exact DECIMAL sums divided by counts
(the _util.py money discipline), so threshold comparisons against them are
bit-identical across engines.

At 100 TB: decorrelation is what makes these safe — the correlated scalar
in sub_correlated_scalar becomes one partial-aggregated groupBy on
l_partkey plus one join, both shuffling on the same key (co-partitioned);
EXISTS/IN become semi/anti joins that AQE can broadcast when the subquery
side is small.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from naqed_spark.catalog import Catalog
from naqed_spark.queries._util import epoch_us, load
from naqed_spark.registry import query


def _sql(spark, sf_dir: str, text: str):
    Catalog(spark, sf_dir).register_views()
    return spark.sql(text)


_SCALAR_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > 2 * (
  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
  FROM orders)
"""


@query("sub_scalar_uncorrelated", oracle=_SCALAR_SQL)
def sub_scalar_uncorrelated(spark, sf_dir):
    """Uncorrelated scalar subquery: orders above 2x the global exact-average
    price. Plans as a 1-row broadcast into the scan filter."""
    return _sql(spark, sf_dir, _SCALAR_SQL)


_IN_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
"""


@query("sub_in", oracle=_IN_SQL)
def sub_in(spark, sf_dir):
    """IN subquery -> left-semi join on the subquery output."""
    return _sql(spark, sf_dir, _IN_SQL)


_NOT_IN_SQL = """
SELECT n_nationkey, n_name
FROM nation
WHERE n_nationkey NOT IN (SELECT s_nationkey FROM supplier)
"""


@query("sub_not_in", oracle=_NOT_IN_SQL)
def sub_not_in(spark, sf_dir):
    """NOT IN -> null-aware anti join (nations with no supplier). The
    subquery column is non-null here; the null-aware plan shape is what's
    exercised."""
    return _sql(spark, sf_dir, _NOT_IN_SQL)


_EXISTS_SQL = """
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49)
"""


@query("sub_exists_correlated", oracle=_EXISTS_SQL)
def sub_exists_correlated(spark, sf_dir):
    """Correlated EXISTS -> decorrelated left-semi join on l_suppkey."""
    return _sql(spark, sf_dir, _EXISTS_SQL)


_Q17_SQL = """
SELECT l.l_orderkey, l.l_partkey, l.l_quantity
FROM lineitem l
WHERE l.l_quantity < 0.4 * (
  SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)
  FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey)
"""


@query("sub_correlated_scalar", oracle=_Q17_SQL)
def sub_correlated_scalar(spark, sf_dir):
    """Correlated scalar subquery (TPC-H Q17 shape): lineitems under 40% of
    their part's average quantity. Decorrelates to groupBy(l_partkey) +
    equi-join — both sides shuffle once on the same key."""
    return _sql(spark, sf_dir, _Q17_SQL)


_Q18_SQL = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150)
GROUP BY o.o_orderkey, o.o_custkey, o.o_totalprice
"""


@query("sub_in_grouped_having", oracle=_Q18_SQL)
def sub_in_grouped_having(spark, sf_dir):
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery (large-volume
    orders). The subquery is itself an aggregation over the probe-side
    fact table; Catalyst plans it as an aggregate + left-semi join on
    l_orderkey — the same co-partitioned shuffle key as the outer join, so
    at scale the exchange is reused, not repeated."""
    return _sql(spark, sf_dir, _Q18_SQL)


@query(
    "sub_any_all",
    # ANY/ALL quantified comparison subqueries, correlated on nationkey.
    # Spark SQL has no ANY/ALL syntax, so the DataFrame side IS the
    # standard decorrelation: one tiny per-nation min/max aggregate (25
    # rows) broadcast-joined back, with the empty-set semantics the
    # quantifiers demand (ANY over empty -> FALSE, ALL over empty -> TRUE)
    # restored via coalesce on the outer join. At 100 TB this is one scan
    # of each table + a broadcast — the quantifier never becomes a
    # per-row subquery.
    oracle="""
    SELECT s.s_suppkey,
           s.s_acctbal > ANY (SELECT c.c_acctbal FROM customer c
                              WHERE c.c_nationkey = s.s_nationkey) AS beats_any,
           s.s_acctbal > ALL (SELECT c.c_acctbal FROM customer c
                              WHERE c.c_nationkey = s.s_nationkey) AS beats_all
    FROM supplier s
    """,
)
def sub_any_all(spark, sf_dir):
    """Full three-valued ANSI quantifier semantics (the round-9 null
    probe caught the naive min/max rewrite): with NULLs in the set,
    `x > ANY(S)` is TRUE if some non-null member is beaten, else NULL
    (not FALSE) when the set holds a NULL; `x > ALL(S)` is FALSE if some
    member is not beaten, else NULL when the set holds a NULL. min/max
    skip NULLs, so the decorrelated aggregate additionally carries a
    has-null flag and a group marker."""
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    stats = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.min("c_acctbal").alias("mn"),
        F.max("c_acctbal").alias("mx"),
        F.max(F.col("c_acctbal").isNull().cast("int")).alias("hasnull"),
        F.count(F.lit(1)).alias("grp_n"),
    )
    matched = F.col("grp_n").isNotNull()
    unknown = F.lit(None).cast("boolean")
    return (
        s.join(F.broadcast(stats), s.s_nationkey == F.col("nk"), "left")
        .select(
            "s_suppkey",
            F.when(~matched, F.lit(False))  # ANY over empty set → FALSE
            # NULL outer operand vs a non-empty set: every comparison is
            # UNKNOWN, so the quantifier is UNKNOWN (never FALSE).
            .when(F.col("s_acctbal").isNull(), unknown)
            .when(F.col("s_acctbal") > F.col("mn"), F.lit(True))
            .when(F.col("hasnull") == 1, unknown)
            .otherwise(F.lit(False))
            .alias("beats_any"),
            F.when(~matched, F.lit(True))  # ALL over empty set → TRUE
            .when(F.col("s_acctbal").isNull(), unknown)
            .when(F.col("s_acctbal") <= F.col("mx"), F.lit(False))
            .when(F.col("hasnull") == 1, unknown)
            .otherwise(F.lit(True))
            .alias("beats_all"),
        )
    )


@query(
    "sub_division_forall",
    # Relational division — the FOR-ALL subquery: customers whose orders
    # cover EVERY order priority class. SQL's double-NOT-EXISTS spelling
    # decorrelates (in both engines) to: count distinct priorities per
    # customer == total distinct priorities. The DataFrame side IS that
    # rewrite — one map-side-combined distinct-agg per customer + one
    # broadcast scalar — because a literal nested NOT EXISTS would be a
    # per-row subquery at 100 TB.
    oracle="""
    WITH tot AS (SELECT count(DISTINCT o_orderpriority) AS k FROM orders)
    SELECT o_custkey,
           count(DISTINCT o_orderpriority) AS n_prio
    FROM orders
    GROUP BY o_custkey
    HAVING count(DISTINCT o_orderpriority) = (SELECT k FROM tot)
    """,
)
def sub_division_forall(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    tot = o.agg(F.countDistinct("o_orderpriority").alias("k"))
    per = o.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("n_prio")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .filter(F.col("n_prio") == F.col("k"))
        .select("o_custkey", "n_prio")
    )


@query(
    "sub_exists_aggregated",
    # EXISTS over an AGGREGATED subquery — "customers with more than 5
    # urgent orders": the correlated HAVING subquery decorrelates to a
    # filtered pre-aggregate semi-joined back to the outer table (in
    # both engines). The DataFrame side is the rewrite: one map-side-
    # combined count on the filtered orders + one semi join — never a
    # per-customer subquery execution.
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderpriority = '1-URGENT'
      GROUP BY o.o_custkey
      HAVING count(*) > 5
    )
    """,
)
def sub_exists_aggregated(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    heavy = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 5)
        .select("o_custkey")
    )
    return c.join(
        heavy, c["c_custkey"] == heavy["o_custkey"], "left_semi"
    ).select("c_custkey", "c_mktsegment")


@query(
    "sub_in_tuple",
    # Tuple IN-subquery — (custkey, date) IN (SELECT ...): membership on
    # a COMPOSITE key. Spark's DataFrame API has no tuple-IN; the engine
    # rewrite is a left-semi join on both columns at once (which is also
    # what Catalyst rewrites SQL tuple-IN to) — one hash-partitioned
    # semi join on the composite key, map-side-combined distinct on the
    # subquery side. Finds orders placed on a (customer, date) pair that
    # also saw an urgent order. (DuckDB 1.0 lacks multi-column tuple-IN;
    # the oracle spells the equivalent correlated EXISTS, which both
    # engines decorrelate to the same semi join.)
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, epoch_us(o.o_orderdate) AS od_us
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM orders u
      WHERE u.o_orderpriority = '1-URGENT'
        AND u.o_custkey = o.o_custkey
        AND u.o_orderdate = o.o_orderdate
    ) AND o.o_orderpriority != '1-URGENT'
    """,
)
def sub_in_tuple(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            F.col("o_custkey").alias("u_cust"),
            F.col("o_orderdate").alias("u_date"),
        )
        .distinct()
    )
    return (
        o.filter(F.col("o_orderpriority") != "1-URGENT")
        .join(
            urgent,
            (F.col("o_custkey") == F.col("u_cust"))
            & (F.col("o_orderdate") == F.col("u_date")),
            "left_semi",
        )
        .select("o_orderkey", "o_custkey", epoch_us("o_orderdate").alias("od_us"))
    )
