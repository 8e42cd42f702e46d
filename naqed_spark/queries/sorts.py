"""§2-F: sort / limit / top-k (SURVEY.md:236-243).

The driver's value hash is order-insensitive, so ordering is asserted via a
row_number() rank column computed over the same total order (unique-key
tiebreaks per §7.3 make the rank deterministic).

Scale notes: orderBy().limit(k) compiles to TakeOrderedAndProject — each
partition keeps its local top-k, the driver merges k×partitions rows; no
global sort materializes. sort_multikey's global rank is TWO-PHASE: range
partition + sort within partitions, then per-partition row counts (tiny,
one row per partition) turn into rank offsets — no partition-less Window,
so no shuffle-everything-to-one-task stage anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

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
    """Two-phase global rank (the scalable form of row_number() with no
    PARTITION BY — a partition-less Window would move every row to one
    task):

      1. range-partition on the sort key and sort within partitions — the
         concatenation of partitions 0..N-1 IS the total order;
      2. per-partition row counts (one tiny row per partition) become rank
         offsets on the driver;
      3. rank = offset[pid] + position-within-partition + 1, where the
         position comes from monotonically_increasing_id's low bits (a
         per-partition row counter assigned in row order, JVM-side) — no
         extra shuffle, no Python boundary.

    The sorted frame is persisted so phases 2 and 3 read the SAME range
    partitioning (boundary sampling must not re-run between the count job
    and the final job)."""
    order = [
        F.col("l_returnflag").desc(),
        F.col("l_linestatus").asc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
        F.col("l_quantity").asc(),
    ]
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 49)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
        )
        .repartitionByRange(nparts, *order)
        .sortWithinPartitions(*order)
        .persist()
    )
    counts = sorted(
        part.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    )
    offsets, acc = {}, 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    off_map = F.create_map(
        *[F.lit(v) for kv in offsets.items() for v in kv]
    )
    # monotonically_increasing_id() = (pid << 33) + row-position-in-partition
    pid = F.spark_partition_id().cast("long")
    local = F.monotonically_increasing_id() - F.shiftleft(pid, 33)
    return part.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        (F.element_at(off_map, F.spark_partition_id()) + local + 1)
        .cast("int")
        .alias("rnk"),
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
