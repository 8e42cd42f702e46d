"""§2-A: scans / sources / sinks.

Scale notes: every query here is a bare parquet scan + narrow projection, so
Catalyst pushes filters into the scan and prunes columns (verify with
``.explain`` → PushedFilters / ReadSchema). At 100 TB these stay
embarrassingly parallel — no shuffle except the final tiny aggregation.
"""

from __future__ import annotations

import os
import tempfile
from functools import reduce

from pyspark.sql import functions as F

from naqed_spark.catalog import TABLES
from naqed_spark.queries._util import load
from naqed_spark.registry import query


@query(
    "scan_parquet",
    oracle="""
    SELECT count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
)
def scan_parquet(spark, sf_dir):
    return load(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "scan_all_entities",
    oracle=" UNION ALL ".join(
        f"SELECT '{t}' AS entity, count(*) AS n FROM {t}" for t in TABLES
    ),
)
def scan_all_entities(spark, sf_dir):
    parts = [
        load(spark, sf_dir, t).agg(
            F.lit(t).alias("entity"), F.count(F.lit(1)).alias("n")
        )
        for t in TABLES
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


@query(
    "sink_parquet_roundtrip",
    # the re-read must equal the source projection exactly, which IS
    # SQL-expressible — upgraded from rows-only in round 2.
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    """,
)
def sink_parquet_roundtrip(spark, sf_dir):
    """Write a projection out as parquet, re-read it — sink correctness."""
    src = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # fixed scratch path (overwritten each run, no per-run leak). On a real
    # cluster this must be a shared filesystem (HDFS/S3) path — executors
    # write it, the driver re-reads it; configurable via NAQED_SCRATCH_DIR.
    out = os.environ.get("NAQED_SCRATCH_DIR", tempfile.gettempdir())
    out = f"{out}/naqed_scratch/orders_rt"
    src.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


@query(
    "source_csv_roundtrip",
    # round 7: CSV source with an EXPLICIT schema — write a projection out
    # as headered CSV, re-read it typed. Schema inference is deliberately
    # off: at 100 TB inference is a full extra pass over the files before
    # the real scan even starts; a declared StructType makes the re-read
    # single-pass and analysis-time-typed. Columns are int/string only —
    # CSV is not a binary-exact float carrier, parquet stays the format
    # for numeric-critical data (sink_parquet_roundtrip covers that).
    oracle="""
    SELECT c_custkey, c_nationkey, c_mktsegment, c_name FROM customer
    """,
)
def source_csv_roundtrip(spark, sf_dir):
    src = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_name"
    )
    out = os.environ.get("NAQED_SCRATCH_DIR", tempfile.gettempdir())
    out = f"{out}/naqed_scratch/customer_csv"
    src.write.mode("overwrite").option("header", True).csv(out)
    return spark.read.schema(
        "c_custkey bigint, c_nationkey bigint, c_mktsegment string,"
        " c_name string"
    ).option("header", True).csv(out)


@query(
    "source_json_roundtrip",
    # round 7: JSON-lines source with an explicit schema (same
    # no-inference discipline as source_csv_roundtrip — Spark would
    # otherwise scan every file twice). ndjson is the interchange format
    # for document/corpus drops; int/string columns keep the roundtrip
    # byte-exact.
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority FROM orders
    """,
)
def source_json_roundtrip(spark, sf_dir):
    src = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    out = os.environ.get("NAQED_SCRATCH_DIR", tempfile.gettempdir())
    out = f"{out}/naqed_scratch/orders_json"
    src.write.mode("overwrite").json(out)
    return spark.read.schema(
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_orderpriority string"
    ).json(out)


@query(
    "scan_json_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    """,
)
def scan_json_props(spark, sf_dir):
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@query(
    "sample_hash_deterministic",
    # reproducible ~25% sample by KEY: rows where the first md5 hex digit
    # of the key is 0-3. Unlike rand()-based TABLESAMPLE this is stable
    # across engines, runs, partitionings, and re-executions — the form you
    # want at 100 TB so every pipeline stage sees the SAME sample, and the
    # sample of a join is the join of the samples (key-consistent).
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE instr('0123', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) > 0
    """,
)
def sample_hash_deterministic(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.expr("instr('0123', substr(md5(CAST(o_orderkey AS STRING)), 1, 1)) > 0")
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "sample_stratified_hash",
    # stratified deterministic sample: top-20 customers PER market segment
    # ranked by md5 of the key (+ key tiebreak) — every stratum contributes
    # the same count regardless of stratum skew, and the ranking is stable
    # across engines/runs/partitionings like sample_hash_deterministic.
    # Plans with WindowGroupLimit: each partition keeps its local top-20
    # per segment BEFORE the shuffle, so the exchange carries
    # O(k x segments x partitions) rows, not the table.
    oracle="""
    SELECT c_custkey, c_mktsegment FROM (
      SELECT c_custkey, c_mktsegment,
             row_number() OVER (
               PARTITION BY c_mktsegment
               ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn
      FROM customer)
    WHERE rn <= 20
    """,
)
def sample_stratified_hash(spark, sf_dir):
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.md5(F.col("c_custkey").cast("string")), F.col("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("c_custkey", "c_mktsegment")
    )


@query(
    "scan_count_star_metadata",
    # count(*) with no filter — the scan must read ZERO data columns
    # (ReadSchema struct<>, asserted in test_plans): Spark answers from
    # parquet row-group metadata plus row reconstruction, never
    # materializing a column. Per-table row counts are the cheapest
    # catalog statistic and the first sanity check of any ingest.
    oracle="""
    SELECT 'lineitem' AS tbl, (SELECT count(*) FROM lineitem) AS n
    UNION ALL SELECT 'orders', (SELECT count(*) FROM orders)
    UNION ALL SELECT 'customer', (SELECT count(*) FROM customer)
    ORDER BY tbl
    """,
)
def scan_count_star_metadata(spark, sf_dir):
    from functools import reduce

    frames = [
        load(spark, sf_dir, t)
        .agg(F.count("*").alias("n"))
        .select(F.lit(t).alias("tbl"), "n")
        for t in ("lineitem", "orders", "customer")
    ]
    return reduce(lambda a, b: a.unionAll(b), frames).orderBy("tbl")


@query(
    "scan_expectations_check",
    # Declarative data-quality expectations (the dbt-test /
    # expectations-suite shape): each rule is a predicate evaluated as a
    # conditional count over ONE scan — not-null, positive-range,
    # accepted-values, referential bounds — emitted as a (rule,
    # n_violations, passed) report. The ingest contract a table must
    # pass before downstream queries trust it.
    oracle="""
    WITH o AS (SELECT * FROM orders), checks AS (
      SELECT
        CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT)
          AS v_custkey_null,
        CAST(count(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT)
          AS v_price_nonpos,
        CAST(count(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END)
          AS BIGINT) AS v_status_domain,
        CAST(count(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01 00:00:00'
                         OR o_orderdate >= TIMESTAMP '2005-01-01 00:00:00'
                        THEN 1 END) AS BIGINT) AS v_date_range,
        CAST(count(*) AS BIGINT) AS n_rows
      FROM o
    )
    SELECT r.rule, r.n_violations, (r.n_violations = 0) AS passed,
           checks.n_rows
    FROM checks, LATERAL (VALUES
      ('custkey_not_null', v_custkey_null),
      ('totalprice_positive', v_price_nonpos),
      ('status_in_domain', v_status_domain),
      ('orderdate_in_range', v_date_range)
    ) AS r(rule, n_violations)
    ORDER BY r.rule
    """,
)
def scan_expectations_check(spark, sf_dir):
    """All rules share ONE scan (conditional counts in a single
    aggregate — N rules never means N passes), then unpivot to the
    report rows. At 100 TB this is the cheapest possible contract:
    one pass, constant output."""
    o = load(spark, sf_dir, "orders")
    checks = o.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1))
        .cast("bigint")
        .alias("custkey_not_null"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1))
        .cast("bigint")
        .alias("totalprice_positive"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
        )
        .cast("bigint")
        .alias("status_in_domain"),
        F.count(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp_ntz"))
                | (
                    F.col("o_orderdate")
                    >= F.lit("2005-01-01").cast("timestamp_ntz")
                ),
                1,
            )
        )
        .cast("bigint")
        .alias("orderdate_in_range"),
        F.count("*").cast("bigint").alias("n_rows"),
    )
    rules = ["custkey_not_null", "totalprice_positive", "status_in_domain",
             "orderdate_in_range"]
    stack = ", ".join(f"'{r}', {r}" for r in rules)
    return (
        checks.select(
            F.expr(
                f"stack({len(rules)}, {stack}) AS (rule, n_violations)"
            ),
            "n_rows",
        )
        .select(
            "rule",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
            "n_rows",
        )
        .orderBy("rule")
    )
