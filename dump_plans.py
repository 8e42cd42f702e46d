#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named query keys.

Usage: python dump_plans.py <tag> <key> [<key> ...]
Writes plans/$NAQED_PLAN_ROUND/<key>_<tag>.txt (round dir defaults to
r16; set NAQED_PLAN_ROUND=r17 next round) for each key
(tag = before|after).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    tag = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    from naqed_spark.registry import QUERIES, load_all
    from naqed_spark.session import tune_session

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("naqed-dump-plans")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune_session(spark)
    load_all()

    round_dir = os.environ.get("NAQED_PLAN_ROUND", "r16")
    os.makedirs(f"plans/{round_dir}", exist_ok=True)
    for key in keys:
        try:
            df = QUERIES[key](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:
            txt = f"FAILED: {ex}"
        path = f"plans/{round_dir}/{key}_{tag}.txt"
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
