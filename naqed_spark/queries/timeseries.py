"""Time-series / hypertable operators over the `events` stream table —
round-3 extensions: gap-filled resampling with forward-fill, and OHLC
rollups. These are the batch twins of what a hypertable continuous
aggregate maintains incrementally.

Scale notes: both keys aggregate to (entity, hour) grain FIRST — state
after the first shuffle is |entities| x |hours| rows, tiny relative to the
event stream, so the window passes that follow run over the rolled-up
frame, not the raw events. The gap-fill sequence explode is bounded by each
entity's time span; per-entity windows shuffle once on the entity key.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from naqed_spark.queries._util import load
from naqed_spark.registry import query


@query(
    "ts_gap_fill_ffill",
    # hourly per-user resample over a dense generated hour spine (min..max
    # hour per user), missing hours forward-filled from the last observed
    # value; is_gap marks synthesized rows. Cents as BIGINT keeps the
    # filled measure integer-exact. IGNORE NULLS last_value is the ffill
    # on both engines.
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             count(*) AS n_events,
             CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE user_id <= 50
      GROUP BY 1, 2
    ),
    spine AS (
      SELECT user_id, unnest(generate_series(min(h), max(h),
                                             INTERVAL 1 HOUR)) AS h
      FROM hourly GROUP BY user_id
    )
    SELECT s.user_id,
           epoch_us(s.h) AS hour_us,
           coalesce(hourly.n_events, 0) AS n_events,
           last_value(hourly.cents IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_ffill,
           CAST(hourly.user_id IS NULL AS INTEGER) AS is_gap
    FROM spine s
    LEFT JOIN hourly ON hourly.user_id = s.user_id AND hourly.h = s.h
    """,
)
def ts_gap_fill_ffill(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents"),
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    joined = spine.join(
        hourly.withColumnRenamed("user_id", "h_user"),
        (spine.user_id == F.col("h_user")) & (spine.h == hourly.h),
        "left",
    ).select(
        spine.user_id,
        spine.h,
        "n_events",
        "cents",
        F.col("h_user").isNull().cast("int").alias("is_gap"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.unix_micros("h").alias("hour_us"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("cents", ignorenulls=True).over(w).alias("cents_ffill"),
        "is_gap",
    )


@query(
    "ts_ohlc_hourly",
    # OHLC candle per (hour, event_type): open/close = first/last value in
    # (ts, event_id) order — the unique event_id tiebreak makes both ends
    # deterministic — high/low = max/min, cents-exact volume. Expressed as
    # ordered windows over the raw rows, then one aggregation; at scale
    # open/close ride the same WindowGroupLimit pruning as any per-key
    # first/last.
    oracle="""
    WITH seq AS (
      SELECT date_trunc('hour', ts) AS h, event_type, value,
             row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_z
      FROM events
    )
    SELECT epoch_us(h) AS hour_us, event_type,
           CAST(round(max(CASE WHEN rn_a = 1 THEN value END) * 100, 0) AS BIGINT)
             AS open_cents,
           CAST(round(max(value) * 100, 0) AS BIGINT) AS high_cents,
           CAST(round(min(value) * 100, 0) AS BIGINT) AS low_cents,
           CAST(round(max(CASE WHEN rn_z = 1 THEN value END) * 100, 0) AS BIGINT)
             AS close_cents,
           count(*) AS n_trades
    FROM seq GROUP BY h, event_type
    """,
)
def ts_ohlc_hourly(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("h"), "event_type", "ts",
        "event_id", "value",
    )
    wa = Window.partitionBy("h", "event_type").orderBy("ts", "event_id")
    wz = Window.partitionBy("h", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    seq = ev.select(
        "h",
        "event_type",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wz).alias("rn_z"),
    )
    cents = lambda c: F.round(c * 100, 0).cast("bigint")  # noqa: E731
    return seq.groupBy("h", "event_type").agg(
        cents(F.max(F.when(F.col("rn_a") == 1, F.col("value")))).alias(
            "open_cents"
        ),
        cents(F.max("value")).alias("high_cents"),
        cents(F.min("value")).alias("low_cents"),
        cents(F.max(F.when(F.col("rn_z") == 1, F.col("value")))).alias(
            "close_cents"
        ),
        F.count(F.lit(1)).alias("n_trades"),
    ).select(
        F.unix_micros("h").alias("hour_us"),
        "event_type",
        "open_cents",
        "high_cents",
        "low_cents",
        "close_cents",
        "n_trades",
    )
