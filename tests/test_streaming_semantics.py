"""Direct streaming-semantics assertions that the oracle comparison can't
express: the watermark must actually DROP the late rows (state-operator
metrics), not merely produce a result that happens to match."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from naqed_spark.queries import streaming as stq
from naqed_spark.session import get_spark, tune_session

SF_DIR = os.environ.get("NAQED_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    yield tune_session(get_spark("naqed-stream-sem-tests"))


def test_watermark_drops_late_rows_per_metrics(spark):
    base = stq._stage(spark, SF_DIR)
    s = stq._read_stream(
        spark, os.path.join(base, "late"), one_file_per_batch=True
    )
    agg = (
        s.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_metrics_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    # the metric counts rows arriving at the stateful operator, i.e. AFTER
    # the map-side partial aggregation — late events collapse to one row
    # per (window) first, so expect one dropped row per distinct late window
    late = spark.read.parquet(os.path.join(base, "late", "002.parquet"))
    n_late_windows = (
        late.select(F.date_trunc("hour", "ts").alias("w")).distinct().count()
    )
    assert late.count() > 0
    assert dropped == n_late_windows


def test_dedup_state_removes_all_duplicates(spark):
    base = stq._stage(spark, SF_DIR)
    s = stq._read_stream(spark, os.path.join(base, "dup"))
    out = (
        s.withWatermark("ts", "10 minutes")
        .dropDuplicates(["event_id", "ts"])
        .select("event_id")
    )
    result = stq._run_to_memory(out, spark, "append")
    n_in = spark.read.parquet(os.path.join(base, "dup")).count()
    n_out = result.count()
    assert n_in == 2 * n_out  # replay delivered everything exactly twice
    assert result.select("event_id").distinct().count() == n_out


def test_late_drop_oracle_models_unadvanced_watermark(spark, tmp_path):
    """Round-9 single-row probe regression: when the whole corpus fits
    inside ~1h10m, the on-time replay chunk is empty, the watermark never
    advances past the first hour, and NOTHING is late — Spark keeps the
    first-hour window. The batch twin must model that (its original
    spelling dropped the first hour unconditionally); this pins spark ==
    oracle == 1 kept window on a single-event corpus."""
    import pyarrow.parquet as pq

    from naqed_spark.catalog import TABLES
    from naqed_spark.oracle_check import check_key, duck_connect

    d = tmp_path / "sf_one_event"
    d.mkdir()
    for t in TABLES:
        tbl = pq.read_table(os.path.join(SF_DIR, t + ".parquet"))
        pq.write_table(tbl.slice(0, 1), str(d / (t + ".parquet")))
    con = duck_connect(str(d))
    try:
        problems = check_key(
            spark, con, "stream_watermark_late_drop", str(d)
        )
        assert not problems, "\n".join(problems)
        rows = (
            stq.stream_watermark_late_drop(spark, str(d)).collect()
        )
        assert len(rows) == 1 and rows[0]["n_events"] == 1
    finally:
        con.close()
