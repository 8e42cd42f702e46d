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


@query(
    "ts_funnel_stages",
    # Ordered funnel view -> click -> purchase per user: each stage's
    # timestamp is the user's FIRST qualifying event STRICTLY AFTER the
    # previous stage (the product-analytics funnel, not a bag-of-events
    # count). Emits one row per user who entered the funnel: the stage
    # reached and the µs timestamps (NULL past the reached stage).
    oracle="""
    WITH t1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND e.ts > t1.t1
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.t2
      GROUP BY e.user_id
    )
    SELECT t1.user_id,
           CAST(1 + CAST(t2.user_id IS NOT NULL AS INT)
                  + CAST(t3.user_id IS NOT NULL AS INT) AS INT) AS stage,
           epoch_us(t1.t1) AS view_us,
           epoch_us(t2.t2) AS click_us,
           epoch_us(t3.t3) AS purchase_us
    FROM t1
    LEFT JOIN t2 ON t1.user_id = t2.user_id
    LEFT JOIN t3 ON t1.user_id = t3.user_id
    """,
)
def ts_funnel_stages(spark, sf_dir):
    """Scale shape: three conditional min-aggregations and two left joins,
    ALL keyed on user_id — one hash partitioning serves every stage (no
    re-shuffle between stages), each stage's frame is one row per
    surviving user. Stage windows never scan events more than once per
    stage, and nothing is quadratic in events or users."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.col("t2").isNotNull().cast("int")
                + F.col("t3").isNotNull().cast("int")
            ).alias("stage"),
            F.unix_micros("t1").alias("view_us"),
            F.unix_micros("t2").alias("click_us"),
            F.unix_micros("t3").alias("purchase_us"),
        )
    )


@query(
    "ts_cohort_retention",
    # Cohort retention: users grouped by first-seen day; how many of each
    # cohort were active again k days later (k = 0..7). Row counts are
    # exact ints; (user, day) is deduped before counting so multiple
    # same-day events count once.
    oracle="""
    WITH firstseen AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort FROM events
      GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', f.cohort, a.d) AS INT) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM active a JOIN firstseen f ON a.user_id = f.user_id
    WHERE date_diff('day', f.cohort, a.d) BETWEEN 0 AND 7
    GROUP BY f.cohort, date_diff('day', f.cohort, a.d)
    """,
)
def ts_cohort_retention(spark, sf_dir):
    """Scale shape: first-seen and distinct-activity are both map-side-
    combined aggregations on user_id; the join reuses the user_id
    partitioning; the final rollup groups a (cohorts x 8) key space.
    (user, day) dedup bounds the join fan-out to active-days, not raw
    events."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    firstseen = ev.groupBy("user_id").agg(F.min("d").alias("cohort"))
    active = ev.distinct()
    return (
        active.join(firstseen, "user_id")
        .withColumn("day_offset", F.datediff("d", "cohort"))
        .filter(F.col("day_offset").between(0, 7))
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.col("day_offset").cast("int").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@query(
    "ts_anomaly_zscore",
    # Trailing-window z-score anomaly flag per event_type: each event's
    # value against the mean/std of the preceding 50 events of its type
    # (ts, event_id order). Determinism discipline: the window sums run
    # over EXACT decimals (value is 2-dec; value² rounded at 4 is exact
    # per the money_row rule), so both engines hold identical sums and
    # the identical float formula (var = (Σx² − (Σx)²/n)/(n−1)) computes
    # bit-equal doubles; z is rounded 6 on emit.
    oracle="""
    WITH w AS (
      SELECT event_id, event_type, value,
             CAST(count(*) OVER tw AS BIGINT) AS n,
             CAST(sum(CAST(value AS DECIMAL(14,2))) OVER tw AS DOUBLE) AS sx,
             CAST(sum(CAST(round(value * value, 4) AS DECIMAL(20,4))) OVER tw
                  AS DOUBLE) AS sx2
      FROM events
      WINDOW tw AS (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, event_type, value,
           round((value - sx / n)
                 / sqrt((sx2 - sx * sx / n) / (n - 1)), 6) AS z
    FROM w WHERE n >= 10 AND (sx2 - sx * sx / n) / (n - 1) > 0
    """,
)
def ts_anomaly_zscore(spark, sf_dir):
    """Scale shape: one window partitioned by event_type (the monitoring
    key) — shuffles once, trailing frames are rows-bounded so state per
    row is O(1); events with fewer than 10 predecessors are warm-up and
    emit nothing. Skewed event_type volumes map to window-partition skew;
    production adds a coarse time bucket to the partition key."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    tw = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-50, -1)
    )
    w = ev.select(
        "event_id",
        "event_type",
        "value",
        F.count(F.lit(1)).over(tw).alias("n"),
        F.sum(F.col("value").cast("decimal(14,2)")).over(tw)
        .cast("double").alias("sx"),
        F.sum(F.round(F.col("value") * F.col("value"), 4)
              .cast("decimal(20,4)")).over(tw)
        .cast("double").alias("sx2"),
    )
    # Guard variance > 0 identically on both engines (ADVICE r6): a window
    # of identical values gives var 0, where Spark's Divide yields NULL but
    # DuckDB yields inf/NaN — filtering the degenerate rows out keeps the
    # cross-engine hash stable and drops rows no monitor would flag anyway.
    var = (F.col("sx2") - F.col("sx") * F.col("sx") / F.col("n")) / (
        F.col("n") - 1
    )
    z = (F.col("value") - F.col("sx") / F.col("n")) / F.sqrt(var)
    return (
        w.filter((F.col("n") >= 10) & (var > 0))
        .select("event_id", "event_type", "value", F.round(z, 6).alias("z"))
    )
