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

from naqed_spark.queries._util import load, r6
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
    """OVERLAP-STITCHED trailing window (round 9): the monitoring key
    (event_type) has a handful of values at any scale, so partitioning
    on it alone funnels a type's whole history through one task. The
    window now partitions on (event_type, day) with each day's frame
    seeded by a CARRY-IN of the 50 most recent prior-day rows: per-day
    tail-50s (a WindowGroupLimit partial top-k) joined to the bounded
    calendar grid give exactly the rows any trailing-50 frame can reach
    across a day boundary, tagged as context and dropped after the
    window — every real row sees the identical preceding-50 frame, so
    results are bit-equal to the single-partition spelling (oracle
    unchanged). Rows with fewer than 10 predecessors are warm-up and
    emit nothing."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    evd = ev.withColumn("day", F.col("ts").cast("date"))
    # per-(type, day) last-50 rows — the only rows a later day's trailing
    # frame can reach; rn<=50 compiles to a WindowGroupLimit partial top-k
    r_tail = F.row_number().over(
        Window.partitionBy("event_type", "day").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
    )
    tails = evd.withColumn("rt", r_tail).filter(F.col("rt") <= 50).drop("rt")
    days = evd.select("event_type", "day").distinct()
    # calendar-grid join (types × days² × 50 — bounded by the calendar,
    # never by event volume): for each day, the 50 most recent prior rows
    carry = (
        tails.alias("t")
        .join(
            days.alias("d"),
            # null-safe type match: a NULL event_type is a monitoring
            # group like any other and must receive its carry-in context
            F.col("t.event_type").eqNullSafe(F.col("d.event_type"))
            & (F.col("t.day") < F.col("d.day")),
        )
        .select(
            F.col("t.event_id").alias("event_id"),
            F.col("d.event_type").alias("event_type"),
            F.col("t.ts").alias("ts"),
            F.col("t.value").alias("value"),
            F.col("d.day").alias("day"),
        )
    )
    r_carry = F.row_number().over(
        Window.partitionBy("event_type", "day").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
    )
    carry50 = (
        carry.withColumn("rc", r_carry)
        .filter(F.col("rc") <= 50)
        .drop("rc")
        .withColumn("is_ctx", F.lit(True))
    )
    u = evd.withColumn("is_ctx", F.lit(False)).unionByName(carry50)
    tw = (
        Window.partitionBy("event_type", "day")
        .orderBy("ts", "event_id")
        .rowsBetween(-50, -1)
    )
    w = u.select(
        "event_id",
        "event_type",
        "value",
        "is_ctx",
        F.count(F.lit(1)).over(tw).alias("n"),
        F.sum(F.col("value").cast("decimal(14,2)")).over(tw)
        .cast("double").alias("sx"),
        F.sum(F.round(F.col("value") * F.col("value"), 4)
              .cast("decimal(20,4)")).over(tw)
        .cast("double").alias("sx2"),
    ).filter(~F.col("is_ctx"))
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


@query(
    "ts_gaps_islands",
    # Activity-streak detection (gaps-and-islands): per user, collapse the
    # distinct calendar days with activity into maximal runs of CONSECUTIVE
    # days. The classic trick — day minus row_number() is constant within a
    # run — turns an order-dependent problem into a plain groupBy, so no
    # iterative logic and no self-join is ever needed.
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
      FROM events WHERE event_type IN ('click', 'view', 'purchase')
    ),
    runs AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS anchor
      FROM days
    )
    SELECT user_id,
           strftime(min(d), '%Y-%m-%d') AS streak_start,
           strftime(max(d), '%Y-%m-%d') AS streak_end,
           count(*) AS streak_days
    FROM runs GROUP BY user_id, anchor
    """,
)
def ts_gaps_islands(spark, sf_dir):
    """Scale shape: distinct-day dedup is a map-side-combined groupBy on
    (user_id, day) — state is |users| x |days|, tiny vs the event stream;
    the row_number window and the run groupBy both partition on user_id,
    so after the first shuffle the run detection is shuffle-free (the
    groupBy on (user_id, anchor) is AQE-coalesced re-use of the same
    hash partitioning). Nothing here depends on global order."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    runs = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    return runs.groupBy("user_id", "anchor").agg(
        F.date_format(F.min("d"), "yyyy-MM-dd").alias("streak_start"),
        F.date_format(F.max("d"), "yyyy-MM-dd").alias("streak_end"),
        F.count(F.lit(1)).alias("streak_days"),
    ).drop("anchor")


@query(
    "ts_scd2_ranges",
    # Slowly-changing-dimension type-2 compaction: per customer, collapse
    # the order-priority history into validity ranges [valid_from,
    # valid_to) — consecutive orders with the same priority merge into one
    # range; valid_to is the next range's start (NULL = current). This is
    # the change-data-capture -> dimension-table build every warehouse
    # runs: change flag via lag(), run id via running sum, one groupBy.
    oracle="""
    WITH flagged AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             CASE WHEN lag(o_orderpriority) OVER w IS DISTINCT FROM
                       o_orderpriority THEN 1 ELSE 0 END AS chg
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    runs AS (
      SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged
    ),
    ranges AS (
      SELECT o_custkey, o_orderpriority, run_id,
             min(o_orderdate) AS vf, count(*) AS n_orders
      FROM runs GROUP BY o_custkey, o_orderpriority, run_id
    )
    SELECT o_custkey, o_orderpriority,
           epoch_us(vf) AS valid_from_us,
           epoch_us(lead(vf) OVER (PARTITION BY o_custkey ORDER BY run_id))
             AS valid_to_us,
           n_orders,
           CAST(lead(vf) OVER (PARTITION BY o_custkey ORDER BY run_id)
                IS NULL AS INTEGER) AS is_current
    FROM ranges
    """,
)
def ts_scd2_ranges(spark, sf_dir):
    """Scale shape: every window and the groupBy partition on o_custkey —
    ONE shuffle on the dimension's natural key carries the whole build
    (lag -> running-sum -> groupBy -> lead all reuse it; AQE coalesces the
    exchange reuse). State per key is the key's history, never the table.
    At 100 TB this runs as an incremental MERGE of new CDC rows against
    the open (is_current=1) ranges only — same plan, delta-sized input."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = o.withColumn(
        "chg",
        F.when(
            ~F.lag("o_orderpriority").over(w).eqNullSafe(
                F.col("o_orderpriority")
            ),
            1,
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "run_id", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    ranges = runs.groupBy("o_custkey", "o_orderpriority", "run_id").agg(
        F.min("o_orderdate").alias("vf"), F.count(F.lit(1)).alias("n_orders")
    )
    wr = Window.partitionBy("o_custkey").orderBy("run_id")
    nxt = F.lead("vf").over(wr)
    return ranges.select(
        "o_custkey",
        "o_orderpriority",
        F.unix_micros(F.col("vf").cast("timestamp")).alias("valid_from_us"),
        F.unix_micros(nxt.cast("timestamp")).alias("valid_to_us"),
        "n_orders",
        nxt.isNull().cast("int").alias("is_current"),
    )


@query(
    "ts_ewma_bounded",
    # Exponentially-weighted moving average over a bounded trailing frame
    # (K=10, decay 0.7): y_i = sum_j w^(i-j) x_j / sum_j w^(i-j) for j in
    # [i-9, i]. Bounding the frame makes EWMA expressible declaratively on
    # both engines (true infinite-history EWMA is a recursive scan); with
    # w=0.7 the dropped tail weighs < 0.03 of the total. The oracle spells
    # it as a bounded rn-range self-join; the Spark side uses an ordered
    # frame + higher-order array fold — same math, O(n*K) both ways.
    oracle="""
    WITH r AS (
      SELECT user_id, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events WHERE user_id <= 30 AND value IS NOT NULL
    )
    SELECT a.user_id, a.event_id, a.value,
           round(SUM(b.value * pow(0.7, a.rn - b.rn))
                 / SUM(pow(0.7, a.rn - b.rn)), 6) AS ewma
    FROM r a JOIN r b
      ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 9 AND a.rn
    GROUP BY a.user_id, a.event_id, a.value
    """,
)
def ts_ewma_bounded(spark, sf_dir):
    """Scale shape: ONE shuffle on user_id, then a rows-bounded window
    whose frame is collected as a K-element array and folded JVM-side with
    higher-order functions (aggregate/zip_with — no Python, no UDF). Cost
    is O(n*K) with K=10 constant; the oracle's self-join spelling would be
    O(n_user^2) scanned per user in Spark's SMJ, which is exactly why the
    window-array form is the engine's plan. round(6) hedges the
    summation-order ulps between the fold and the oracle's SUM."""
    # EWMA is over OBSERVED values: missing (NULL) observations carry
    # neither weight nor value (collect_list would silently drop them
    # from the array while the oracle's frame kept the rows — the round-9
    # null-probe divergence), so both engines filter them up front.
    ev = (
        load(spark, sf_dir, "events")
        .filter((F.col("user_id") <= 30) & F.col("value").isNotNull())
        .select("user_id", "event_id", "ts", "value")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    arr = F.collect_list("value").over(w.rowsBetween(-9, 0))
    out = ev.withColumn("arr", arr).select(
        "user_id",
        "event_id",
        "value",
        F.round(
            F.expr(
                """
                aggregate(zip_with(arr, sequence(1, size(arr)),
                                   (x, i) -> x * pow(0.7D, size(arr) - i)),
                          0D, (acc, v) -> acc + v)
                / aggregate(sequence(1, size(arr)),
                            0D, (acc, i) -> acc + pow(0.7D, size(arr) - i))
                """
            ),
            6,
        ).alias("ewma"),
    )
    return out


@query(
    "ts_interval_merge",
    # Interval union (merge overlapping/adjacent intervals): each order
    # opens a 7-day service window [orderdate, orderdate+7d); per customer,
    # overlapping windows coalesce into maximal covered spans. The classic
    # sweep: an interval starts a new span iff its start exceeds the
    # running max of all previous ends; spans group by the running count
    # of such starts.
    oracle="""
    WITH iv AS (
      SELECT o_custkey,
             epoch_us(o_orderdate) AS s,
             epoch_us(o_orderdate) + CAST(604800000000 AS BIGINT) AS e
      FROM orders
    ),
    flagged AS (
      SELECT o_custkey, s, e,
             CASE WHEN s > max(e) OVER (PARTITION BY o_custkey ORDER BY s, e
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING)
                  OR max(e) OVER (PARTITION BY o_custkey ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) IS NULL
             THEN 1 ELSE 0 END AS new_span
      FROM iv
    ),
    spans AS (
      SELECT o_custkey, s, e,
             SUM(new_span) OVER (PARTITION BY o_custkey ORDER BY s, e
                                 ROWS UNBOUNDED PRECEDING) AS span_id
      FROM flagged
    )
    SELECT o_custkey, CAST(span_id AS BIGINT) AS span_id,
           min(s) AS span_start_us, max(e) AS span_end_us,
           count(*) AS n_intervals
    FROM spans GROUP BY o_custkey, span_id
    """,
)
def ts_interval_merge(spark, sf_dir):
    """Scale shape: one shuffle on the entity key; the running-max /
    running-sum windows and the span groupBy all reuse that partitioning.
    Integer-µs bounds keep the overlap comparisons exact. This is the
    coverage/uptime primitive (union of maintenance windows, session
    spans, lease intervals) that a naive approach self-joins
    quadratically."""
    o = load(spark, sf_dir, "orders")
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    iv = o.select(
        "o_custkey",
        us.alias("s"),
        (us + F.lit(7 * 86400 * 1000000)).alias("e"),
    )
    w = Window.partitionBy("o_custkey").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_span",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(
            0
        ),
    )
    spans = flagged.withColumn(
        "span_id",
        F.sum("new_span").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return spans.groupBy("o_custkey", "span_id").agg(
        F.min("s").alias("span_start_us"),
        F.max("e").alias("span_end_us"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


@query(
    "ts_rollup_incremental_merge",
    # Incremental materialized-view maintenance (the hypertable
    # continuous-aggregate pattern): an existing hourly rollup absorbs a
    # late-arriving delta batch by MERGING partial aggregates (counts and
    # exact-cent sums add; no group recomputes from raw events). The
    # oracle is the from-scratch rollup — merged partials must equal it
    # exactly, which is the algebraic property that makes the pattern
    # safe at 100 TB.
    oracle="""
    SELECT user_id, epoch_us(date_trunc('hour', ts)) AS hour_us,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS cents
    FROM events GROUP BY 1, 2
    """,
)
def ts_rollup_incremental_merge(spark, sf_dir):
    """Scale shape: the base rollup is |users|x|hours| — tiny vs raw
    events — and the delta rollup is delta-sized; the merge is a full
    outer join on the GROUP KEY (group-local, no raw-event reread) with
    coalesce+add of the partials. count and exact-integer cent sums are
    the mergeable forms (avg would be maintained as sum+count). At 100 TB
    the base never re-scans: only delta partitions are read per refresh."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    is_late = F.col("user_id") % 17 == 0  # the simulated late-arriving slice

    def rollup(df):
        return df.groupBy(
            "user_id",
            F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_us"),
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
                "cents"
            ),
        )

    base = rollup(ev.filter(~is_late))
    delta = rollup(ev.filter(is_late))
    b = base.select(
        "user_id", "hour_us",
        F.col("n_events").alias("b_n"), F.col("cents").alias("b_c"),
    )
    d = delta.select(
        "user_id", "hour_us",
        F.col("n_events").alias("d_n"), F.col("cents").alias("d_c"),
    )
    return b.join(d, ["user_id", "hour_us"], "full_outer").select(
        "user_id",
        "hour_us",
        (F.coalesce("b_n", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias(
            "n_events"
        ),
        # NULL is the identity of the partial-sum merge, but a group whose
        # EVERY value is NULL must stay NULL (sum-over-all-null), not 0 —
        # coalesce alone fabricated a 0 there (round-9 null probe)
        F.when(
            F.col("b_c").isNull() & F.col("d_c").isNull(),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.coalesce("b_c", F.lit(0)) + F.coalesce("d_c", F.lit(0))
        )
        .alias("cents"),
    )

@query(
    "ts_interpolate_linear",
    # Linear interpolation of interior gaps in an hourly per-user series —
    # the numeric sibling of ts_gap_fill_ffill's last-observation-carried-
    # forward. Same spine construction (per-user hour range, exploded
    # JVM-side), then FOUR ignore-nulls window passes (prev/next value,
    # prev/next observed hour) that all share ONE (user_id, hidx)
    # ordering — Catalyst plans a single hash exchange on user_id with
    # stacked Window operators, so the 100 TB cost is one shuffle.
    # Arithmetic is exact-integer cents → double at the end, round(6)
    # hedge (SURVEY.md §7.3); the hour index is exact integer division of
    # epoch-µs so both engines interpolate over identical abscissae.
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events WHERE user_id <= 50
      GROUP BY 1, 2),
    spine AS (
      SELECT user_id, unnest(generate_series(min(h), max(h),
                                             INTERVAL 1 HOUR)) AS h
      FROM hourly GROUP BY user_id),
    j AS (
      SELECT s.user_id, s.h, hourly.cents,
             epoch_us(s.h) // 3600000000 AS hidx
      FROM spine s
      LEFT JOIN hourly ON hourly.user_id = s.user_id AND hourly.h = s.h),
    w AS (
      SELECT user_id, h, cents, hidx,
        last_value(cents IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY hidx
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN cents IS NOT NULL THEN hidx END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY hidx
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        first_value(cents IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY hidx
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN cents IS NOT NULL THEN hidx END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY hidx
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM j)
    SELECT user_id, epoch_us(h) AS hour_us, cents,
           CASE WHEN cents IS NOT NULL THEN round(CAST(cents AS DOUBLE), 6)
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                  round(CAST(pv AS DOUBLE)
                        + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                          * (hidx - pt) / (nt - pt), 6)
           END AS cents_interp
    FROM w
    """,
)
def ts_interpolate_linear(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents")
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
    j = (
        spine.join(
            hourly.select(
                F.col("user_id").alias("h_user"),
                F.col("h").alias("h_h"),
                "cents",
            ),
            (spine.user_id == F.col("h_user")) & (spine.h == F.col("h_h")),
            "left",
        )
        .select(
            spine.user_id,
            spine.h,
            "cents",
            F.expr("unix_micros(h) div 3600000000").alias("hidx"),
        )
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("hidx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("hidx")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hidx = F.when(F.col("cents").isNotNull(), F.col("hidx"))
    w = (
        j.withColumn("pv", F.last("cents", ignorenulls=True).over(w_prev))
        .withColumn("pt", F.last(obs_hidx, ignorenulls=True).over(w_prev))
        .withColumn("nv", F.first("cents", ignorenulls=True).over(w_next))
        .withColumn("nt", F.first(obs_hidx, ignorenulls=True).over(w_next))
    )
    interp = (
        F.when(
            F.col("cents").isNotNull(),
            F.round(F.col("cents").cast("double"), 6),
        )
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.round(
                F.col("pv").cast("double")
                + (F.col("nv").cast("double") - F.col("pv").cast("double"))
                * (F.col("hidx") - F.col("pt"))
                / (F.col("nt") - F.col("pt")),
                6,
            ),
        )
    )
    return w.select(
        "user_id",
        F.unix_micros("h").alias("hour_us"),
        "cents",
        interp.alias("cents_interp"),
    )


@query(
    "ts_time_bucket_arbitrary",
    # Arbitrary-interval time bucketing (the hypertable time_bucket
    # primitive): date_trunc only offers calendar units, so 15-minute and
    # 6-hour buckets come from exact integer epoch arithmetic —
    # (epoch_µs ÷ span) × span — identical in both engines, no timezone
    # or calendar dependence. One scan, one map-side-combined groupBy on
    # the (coarse bucket, type) pair; cents stay exact integers.
    oracle="""
    SELECT (epoch_us(ts) // 21600000000) * 21600000000 AS bucket6h_us,
           event_type,
           count(*) AS n_events,
           count(DISTINCT (epoch_us(ts) // 900000000)) AS n_active_15m,
           CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS cents
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_time_bucket_arbitrary(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    b6h = (us - (us % (21600 * 1_000_000))).alias("bucket6h_us")
    b15 = F.expr("unix_micros(ts) div 900000000")
    return ev.groupBy(b6h, F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(b15).alias("n_active_15m"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents"),
    )


@query(
    "ts_outlier_mad",
    # Robust outlier detection: median/MAD instead of mean/stddev (the
    # ts_anomaly_zscore sibling that outliers themselves cannot poison).
    # Per event_type: med = median(value), MAD = median(|v − med|),
    # flag |v − med| > 3·1.4826·MAD. Exact percentiles here (hash-
    # matchable); at 100 TB swap approx_percentile — same two-pass plan:
    # tiny per-type stats broadcast back into a codegen filter, the fact
    # table never shuffles. Both interpolated medians are rounded to 6
    # decimals BEFORE the comparison arithmetic so the engines threshold
    # identical doubles (the llm_length_filter_percentile hedge).
    oracle="""
    WITH med AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS ad
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, round(quantile_cont(ad, 0.5), 6) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value,
           round(d.ad / (1.4826 * x.mad), 6) AS robust_z
    FROM dev d JOIN mad x USING (event_type)
    WHERE d.ad > 3 * 1.4826 * x.mad
    """,
)
def ts_outlier_mad(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.abs(F.col("value") - F.col("med")).alias("ad"),
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(ad, 0.5)"), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("ad") > 3 * 1.4826 * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(F.col("ad") / (1.4826 * F.col("mad")), 6).alias(
                "robust_z"
            ),
        )
    )


@query(
    "ts_period_over_period",
    # Week-over-week comparison: daily per-type totals joined to their
    # value 7 days earlier (calendar-aligned lag — NOT row-lag, which
    # breaks on missing days). Growth is a ratio of exact integer cents →
    # double at the end (round 6). Plan: one rollup groupBy, then a
    # self-equi-join on (type, day−7) — both sides the SAME tiny rollup,
    # reusing one partitioning; the fact table is scanned once.
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(epoch_us(date_trunc('day', ts)) AS BIGINT)
               AS day_us,
             CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type, a.day_us, a.cents,
           b.cents AS cents_prev_week,
           round(CAST(a.cents AS DOUBLE) / b.cents - 1.0, 6) AS wow_growth
    FROM daily a
    LEFT JOIN daily b
      ON a.event_type = b.event_type
     AND b.day_us = a.day_us - 604800000000
    """,
)
def ts_period_over_period(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.unix_micros(F.date_trunc("day", "ts")).alias("day_us"),
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents")
    )
    prev = daily.select(
        F.col("event_type").alias("p_type"),
        F.col("day_us").alias("p_day"),
        F.col("cents").alias("cents_prev_week"),
    )
    return daily.join(
        prev,
        (daily["event_type"] == prev["p_type"])
        & (prev["p_day"] == daily["day_us"] - 604800000000),
        "left",
    ).select(
        "event_type",
        "day_us",
        "cents",
        "cents_prev_week",
        F.round(
            F.col("cents").cast("double") / F.col("cents_prev_week") - 1.0, 6
        ).alias("wow_growth"),
    )


@query(
    "ts_forecast_naive_eval",
    # Seasonal-naive forecasting + backtest — the baseline every real
    # forecast must beat: predict each day's per-type total as the value
    # 7 days earlier, then score MAE/MAPE over the evaluable region. Two
    # uses of ONE tiny daily rollup (self-join on day−7, the
    # ts_period_over_period shape) + one grid-sized aggregate; the raw
    # events table is scanned once. Errors are exact integer cents;
    # MAE/MAPE go double only at the end (round 6).
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(epoch_us(date_trunc('day', ts)) AS BIGINT)
               AS day_us,
             CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type,
           count(*) AS n_days,
           CAST(sum(abs(a.cents - b.cents)) AS BIGINT) AS abs_err_cents,
           round(CAST(sum(abs(a.cents - b.cents)) AS DOUBLE) / count(*), 6)
             AS mae_cents,
           round(avg(CAST(abs(a.cents - b.cents) AS DOUBLE)
                     / nullif(a.cents, 0)), 6) AS mape
    FROM daily a
    JOIN daily b
      ON a.event_type = b.event_type
     AND b.day_us = a.day_us - 604800000000
    GROUP BY a.event_type
    """,
)
def ts_forecast_naive_eval(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.unix_micros(F.date_trunc("day", "ts")).alias("day_us"),
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents")
    )
    prev = daily.select(
        F.col("event_type").alias("p_type"),
        F.col("day_us").alias("p_day"),
        F.col("cents").alias("p_cents"),
    )
    joined = daily.join(
        prev,
        (daily["event_type"] == prev["p_type"])
        & (prev["p_day"] == daily["day_us"] - 604800000000),
    )
    err = F.abs(F.col("cents") - F.col("p_cents"))
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(err).alias("abs_err_cents"),
        F.round(F.sum(err).cast("double") / F.count(F.lit(1)), 6).alias(
            "mae_cents"
        ),
        F.round(
            F.avg(err.cast("double") / F.nullif(F.col("cents"), F.lit(0))), 6
        ).alias("mape"),
    )


@query(
    "ts_changepoint_cusum",
    # CUSUM drift detection: per event_type, the running cumulative sum
    # of deviations from the type's overall daily mean; the day where
    # |CUSUM| peaks is the changepoint estimate. All arithmetic on exact
    # integer cents (deviation = day_cents·n_days − total_cents, scaled
    # to avoid division) — no float until the final report. One daily
    # rollup + a broadcast of the 4-row type stats + one window pass
    # ordered by day; the changepoint pick is WindowGroupLimit (rank 1).
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(epoch_us(date_trunc('day', ts)) AS BIGINT)
               AS day_us,
             CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, CAST(sum(cents) AS BIGINT) AS total,
             count(*) AS nd
      FROM daily GROUP BY event_type
    ),
    cusum AS (
      SELECT d.event_type, d.day_us,
             CAST(sum(d.cents * s.nd - s.total) OVER (
               PARTITION BY d.event_type ORDER BY d.day_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS c
      FROM daily d JOIN stats s USING (event_type)
    )
    SELECT event_type, day_us AS changepoint_day_us, c AS peak_cusum
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY event_type
               ORDER BY abs(c) DESC, day_us) AS rn
      FROM cusum
    ) WHERE rn = 1
    """,
)
def ts_changepoint_cusum(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.unix_micros(F.date_trunc("day", "ts")).alias("day_us"),
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents")
    )
    stats = daily.groupBy("event_type").agg(
        F.sum("cents").alias("total"), F.count(F.lit(1)).alias("nd")
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("day_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = (
        daily.join(F.broadcast(stats), "event_type")
        .withColumn(
            "c",
            F.sum(
                F.col("cents") * F.col("nd") - F.col("total")
            ).over(w_run).cast("bigint"),
        )
    )
    w_pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("c")).desc(), F.col("day_us")
    )
    return (
        cusum.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day_us").alias("changepoint_day_us"),
            F.col("c").alias("peak_cusum"),
        )
    )


@query(
    "ts_rolling_active_users",
    # Rolling 7-day distinct active users (the DAU/WAU product metric):
    # per day, the distinct user count over [d−6, d]. A sliding DISTINCT
    # cannot use a plain window sum (distinct doesn't decompose), so the
    # exact form joins the per-(day, user) grid to the 7-day offset range
    # and re-counts — at fixture scale that is |days|×7 narrow rows. At
    # 100 TB the exact form becomes the HLL-partial pattern
    # (agg_hll_partial_merge): per-day sketches union-merged over the
    # window — same plan, mergeable state; documented here, exact kept
    # for the oracle.
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT)
               AS day_us, user_id
      FROM events
    ),
    days AS (SELECT DISTINCT day_us FROM du),
    win AS (
      SELECT d.day_us, du.user_id
      FROM days d JOIN du
        ON du.day_us BETWEEN d.day_us - 518400000000 AND d.day_us
    )
    SELECT day_us,
           count(DISTINCT user_id) AS wau,
           (SELECT count(DISTINCT u2.user_id) FROM du u2
            WHERE u2.day_us = win.day_us) AS dau
    FROM win GROUP BY day_us
    """,
)
def ts_rolling_active_users(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    du = ev.select(
        F.unix_micros(F.date_trunc("day", "ts")).alias("day_us"), "user_id"
    ).distinct()
    days = du.select("day_us").distinct()
    win = days.alias("d").join(
        du.alias("u"),
        F.col("u.day_us").between(
            F.col("d.day_us") - 518400000000, F.col("d.day_us")
        ),
    ).select(F.col("d.day_us").alias("day_us"), F.col("u.user_id"))
    wau = win.groupBy("day_us").agg(F.countDistinct("user_id").alias("wau"))
    dau = du.groupBy("day_us").agg(F.countDistinct("user_id").alias("dau"))
    return wau.join(dau, "day_us").select("day_us", "wau", "dau")


@query(
    "ts_histogram_equi_width",
    # Equi-width value histogram per event_type (the profiling primitive
    # behind every dashboard distribution plot): 10 fixed bins over
    # [0, 500) in exact integer cents — bin = min(cents ÷ 5000, 9), no
    # floats anywhere, so bins are unambiguous on both engines. One scan,
    # one map-side-combined groupBy on (type, bin); output is
    # grid-sized. At 100 TB this replaces collecting values to plot.
    oracle="""
    SELECT event_type,
           least(CAST(round(value * 100, 0) AS BIGINT) // 5000, 9) AS bin,
           count(*) AS n,
           CAST(min(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS min_cents,
           CAST(max(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS max_cents
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_histogram_equi_width(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    bin_ = F.least(F.expr("CAST(round(value * 100, 0) AS BIGINT) div 5000"),
                   F.lit(9))
    return ev.groupBy("event_type", bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(cents).alias("min_cents"),
        F.max(cents).alias("max_cents"),
    )


@query(
    "ts_autocorrelation",
    # Autocorrelation of the daily per-type series at lags 1 and 7 (the
    # seasonality detector feeding ts_forecast_naive_eval's lag choice).
    # Numerator/denominator are built from exact integer cents: with
    # m = n·Σxy − Σx·Σy over the lag-aligned pairs, r = m / √(dx·dy) —
    # every Σ is an exact integer (DECIMAL(38,0) to survive the x·y
    # products), so both engines assemble identical doubles; round(6).
    # One daily rollup + two self-equi-joins on (type, day−lag).
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(epoch_us(date_trunc('day', ts)) AS BIGINT)
               AS day_us,
             CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS c
      FROM events GROUP BY 1, 2
    ),
    lags AS (SELECT unnest([1, 7]) AS lag),
    pairs AS (
      SELECT a.event_type, l.lag, a.c AS x, b.c AS y
      FROM daily a
      JOIN lags l ON true
      JOIN daily b ON b.event_type = a.event_type
                  AND b.day_us = a.day_us - l.lag * 86400000000
    ),
    m AS (
      SELECT event_type, lag, count(*) AS n,
             CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                  AS DOUBLE) AS sxy,
             CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
                  AS DOUBLE) AS sxx,
             CAST(sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                  AS DOUBLE) AS syy
      FROM pairs GROUP BY event_type, lag
    )
    SELECT event_type, lag, n,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS acf
    FROM m
    """,
)
def ts_autocorrelation(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.unix_micros(F.date_trunc("day", "ts")).alias("day_us"),
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("c")
    )
    lags = daily.sparkSession.createDataFrame([(1,), (7,)], "lag int")
    b = daily.select(
        F.col("event_type").alias("b_type"),
        F.col("day_us").alias("b_day"),
        F.col("c").alias("y"),
    )
    pairs = (
        daily.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("b_type") == F.col("event_type"))
            & (
                F.col("b_day")
                == F.col("day_us") - F.col("lag") * 86400000000
            ),
        )
        .select("event_type", "lag", F.col("c").alias("x"), "y")
    )
    x, y = F.col("x"), F.col("y")
    d19 = lambda col: col.cast("decimal(19,0)")  # noqa: E731
    m = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(y.cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum(d19(x) * d19(y)).cast("double").alias("sxy"),
        F.sum(d19(x) * d19(x)).cast("double").alias("sxx"),
        F.sum(d19(y) * d19(y)).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return m.select(
        "event_type",
        "lag",
        "n",
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("acf"),
    )


@query(
    "ts_inter_event_stats",
    # Inter-arrival-time distribution per user (the traffic-model /
    # anomaly primitive behind session-gap choices like win_sessionize's
    # 30 min): per-user consecutive gaps via lag, then per-user median /
    # p90 / max gap. Percentiles are DISCRETE (the exact element at rank
    # ⌈p·n⌉ — percentile_disc semantics spelled as row_number = rank):
    # continuous interpolation left the engines one double-ulp apart on
    # ~1e11-µs values (measured at sf0.1), and any fixed rounding has a
    # boundary flip risk — exact integer selection has none. Two window
    # passes + one groupBy, all sharing the user_id partitioning.
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               AS gap_us
      FROM events
    ),
    ranked AS (
      SELECT user_id, gap_us,
             row_number() OVER (PARTITION BY user_id ORDER BY gap_us)
               AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM gaps WHERE gap_us IS NOT NULL
    )
    SELECT user_id,
           CAST(max(n) AS BIGINT) AS n_gaps,
           CAST(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                         THEN gap_us END) AS BIGINT) AS median_gap_us,
           CAST(max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                         THEN gap_us END) AS BIGINT) AS p90_gap_us,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us
    FROM ranked
    GROUP BY user_id
    """,
)
def ts_inter_event_stats(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = ev.withColumn(
        "gap_us", F.col("ts_us") - F.lag("ts_us").over(w)
    ).filter(F.col("gap_us").isNotNull())
    w_rank = Window.partitionBy("user_id").orderBy("gap_us")
    w_all = Window.partitionBy("user_id")
    ranked = gaps.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "n", F.count(F.lit(1)).over(w_all)
    )
    pick = lambda p: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
            F.col("gap_us"),
        )
    ).cast("bigint")
    return ranked.groupBy("user_id").agg(
        F.max("n").cast("bigint").alias("n_gaps"),
        pick(0.5).alias("median_gap_us"),
        pick(0.9).alias("p90_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
    )


@query(
    "ts_coverage_ratio",
    # Coverage / uptime ratio — "what share of its active window does
    # this source actually report": per user, hours-with-data over the
    # hour-spine between first and last event (the ts_gap_fill_ffill
    # spine, reduced to one ratio per key). The SLA-dashboard primitive;
    # low coverage is the trigger for the interpolation/gap-fill ops.
    # Exact integer hour counts; one ratio divide at the end (round 6).
    oracle="""
    WITH hours AS (
      SELECT user_id, epoch_us(date_trunc('hour', ts)) AS h
      FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           count(*) AS hours_with_data,
           CAST((max(h) - min(h)) / 3600000000 + 1 AS BIGINT)
             AS span_hours,
           round(CAST(count(*) AS DOUBLE)
                 / ((max(h) - min(h)) / 3600000000 + 1), 6) AS coverage
    FROM hours GROUP BY user_id
    """,
)
def ts_coverage_ratio(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    hours = ev.select(
        "user_id",
        F.unix_micros(F.date_trunc("hour", "ts")).alias("h"),
    ).distinct()
    span = (F.max("h") - F.min("h")) / 3600000000 + 1
    return hours.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("hours_with_data"),
        span.cast("bigint").alias("span_hours"),
        F.round(F.count(F.lit(1)).cast("double") / span, 6).alias(
            "coverage"
        ),
    )


@query(
    "ts_psi_drift",
    # Population Stability Index of the event-value distribution between
    # the first and second half of the month, per event type — the
    # standard serving-drift monitor. Fixed equal-width buckets (0..400
    # by 40, derived from the declared domain, NOT from the data — a
    # data-derived range re-bins every run and breaks comparability) and
    # add-one smoothing so empty buckets stay finite. All counts exact;
    # the ≤10-term PSI sum carries the round(6) ln hedge.
    oracle="""
    WITH b AS (
      SELECT event_type,
             CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                  THEN 'a' ELSE 'b' END AS win,
             LEAST(CAST(floor(value / 40.0) AS INT), 9) AS bucket
      FROM events
    ), c AS (
      SELECT event_type, bucket,
             1 + sum(CASE WHEN win = 'a' THEN 1 ELSE 0 END) AS ca,
             1 + sum(CASE WHEN win = 'b' THEN 1 ELSE 0 END) AS cb
      FROM b GROUP BY 1, 2
    ), t AS (
      SELECT event_type, CAST(sum(ca) AS DOUBLE) AS ta,
             CAST(sum(cb) AS DOUBLE) AS tb
      FROM c GROUP BY 1
    )
    SELECT c.event_type,
           round(sum((ca / ta - cb / tb) * ln((ca / ta) / (cb / tb))), 6)
             AS psi
    FROM c JOIN t ON c.event_type = t.event_type
    GROUP BY c.event_type ORDER BY c.event_type
    """,
)
def ts_psi_drift(spark, sf_dir):
    """One scan, two stacked aggregates on the event_type key (the
    second reuses the first's partitioning), final grid =
    |event types| × 10 buckets — constant state at any event volume."""
    b = load(spark, sf_dir, "events").select(
        "event_type",
        F.when(
            F.col("ts") < F.lit("2024-01-16").cast("timestamp_ntz"), "a"
        ).otherwise("b").alias("win"),
        F.least(
            F.floor(F.col("value") / 40.0).cast("int"), F.lit(9)
        ).alias("bucket"),
    )
    c = b.groupBy("event_type", "bucket").agg(
        (1 + F.sum(F.when(F.col("win") == "a", 1).otherwise(0))).alias("ca"),
        (1 + F.sum(F.when(F.col("win") == "b", 1).otherwise(0))).alias("cb"),
    )
    t = c.groupBy(F.col("event_type").alias("t_type")).agg(
        F.sum("ca").cast("double").alias("ta"),
        F.sum("cb").cast("double").alias("tb"),
    )
    pa = F.col("ca") / F.col("ta")
    pb = F.col("cb") / F.col("tb")
    from naqed_spark.queries._util import r6 as _r6

    return (
        c.join(t, c["event_type"] == t["t_type"])
        .groupBy("event_type")
        .agg(_r6(F.sum((pa - pb) * F.log(pa / pb))).alias("psi"))
        .orderBy("event_type")
    )


@query(
    "ts_seasonal_profile",
    # Hour-of-week seasonality fingerprint: event count and exact-decimal
    # mean value per (ISO weekday, hour) cell — the profile that feeds
    # expected-load baselines and the seasonal term of anomaly scores.
    # ISO weekday (Monday=1) on both engines: Spark weekday()+1 ==
    # DuckDB isodow() — the engines' default dayofweek origins differ.
    oracle="""
    SELECT CAST(isodow(ts) AS INT) AS dow,
           CAST(hour(ts) AS INT) AS hod,
           count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
                 / count(*), 6) AS mean_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def ts_seasonal_profile(spark, sf_dir):
    """One scan, one hash aggregate onto a fixed 7×24 grid — constant
    result size and map-side partials at any event volume."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.weekday("ts") + 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hod"),
        )
        .agg(
            F.count("*").alias("n_events"),
            r6(
                F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
                / F.count("*")
            ).alias("mean_value"),
        )
        .orderBy("dow", "hod")
    )


@query(
    "ts_seasonal_anomaly",
    # Seasonally-adjusted anomaly detection: an event is anomalous when
    # its value deviates more than 2σ from ITS OWN (ISO weekday, hour)
    # cell — the seasonal twin of ts_anomaly_zscore (which a daily load
    # peak would fool). Moments are exact: values are 2-decimal, so
    # Σx (DECIMAL 12,2) and Σx² (DECIMAL 24,4 products) are
    # order-independent on both engines; sqrt is IEEE-correctly-rounded
    # (identical), so even the >2σ comparison is engine-stable. Cells
    # with <10 events or zero variance are excluded identically.
    oracle="""
    WITH c AS (
      SELECT CAST(isodow(ts) AS INT) AS dow, CAST(hour(ts) AS INT) AS hod,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sx,
             CAST(sum(CAST(value AS DECIMAL(12,2))
                      * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sxx
      FROM events GROUP BY 1, 2 HAVING count(*) >= 10
    ), s AS (
      SELECT dow, hod, n, sx / n AS mean,
             sqrt((sxx - sx * sx / n) / (n - 1)) AS sd
      FROM c WHERE (sxx - sx * sx / n) > 0
    )
    SELECT e.event_id, e.value,
           CAST(isodow(e.ts) AS INT) AS dow, CAST(hour(e.ts) AS INT) AS hod,
           round(s.mean, 6) AS cell_mean,
           round((e.value - s.mean) / s.sd, 6) AS z
    FROM events e
    JOIN s ON s.dow = CAST(isodow(e.ts) AS INT)
          AND s.hod = CAST(hour(e.ts) AS INT)
    WHERE abs(e.value - s.mean) > 2 * s.sd
    ORDER BY e.event_id
    """,
)
def ts_seasonal_anomaly(spark, sf_dir):
    """The seasonal model is a 7×24-cell aggregate (constant state)
    broadcast back onto the event stream — one scan to fit, one scan to
    score, no window over raw events at all; at 100 TB the same two
    passes hold with the model still grid-sized."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "value",
        (F.weekday("ts") + 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    )
    dv = F.col("value").cast("decimal(12,2)")
    c = (
        ev.groupBy(F.col("dow").alias("c_dow"), F.col("hod").alias("c_hod"))
        .agg(
            F.count("*").alias("n"),
            F.sum(dv).cast("double").alias("sx"),
            F.sum(dv * dv).cast("double").alias("sxx"),
        )
        .filter(F.col("n") >= 10)
        .filter((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) > 0)
        .select(
            "c_dow",
            "c_hod",
            (F.col("sx") / F.col("n")).alias("mean"),
            F.sqrt(
                (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
                / (F.col("n") - 1)
            ).alias("sd"),
        )
    )
    return (
        ev.join(
            F.broadcast(c),
            (F.col("dow") == F.col("c_dow")) & (F.col("hod") == F.col("c_hod")),
        )
        .filter(F.abs(F.col("value") - F.col("mean")) > 2 * F.col("sd"))
        .select(
            "event_id",
            "value",
            "dow",
            "hod",
            r6(F.col("mean")).alias("cell_mean"),
            r6((F.col("value") - F.col("mean")) / F.col("sd")).alias("z"),
        )
        .orderBy("event_id")
    )


@query(
    "ts_mann_kendall",
    # Mann-Kendall trend test per event type over the DAILY revenue
    # series: S = Σ_{i<j} sign(x_j − x_i) and Kendall's tau = S / C(n,2)
    # — the nonparametric "is there a monotonic trend" test that needs
    # no distribution assumption. The pair join is DOMAIN-bounded (the
    # ~30-day grid per type, ≤435 pairs), daily sums are exact decimals,
    # so S is an exact integer and tau one exact division.
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS rev
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT a.event_type,
             CAST(sum(CASE WHEN b.rev > a.rev THEN 1
                           WHEN b.rev < a.rev THEN -1 ELSE 0 END)
                  AS BIGINT) AS s_stat,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM d a JOIN d b
        ON a.event_type = b.event_type AND a.day < b.day
      GROUP BY 1
    )
    SELECT event_type, s_stat, n_pairs,
           round(s_stat / CAST(n_pairs AS DOUBLE), 6) AS tau
    FROM s ORDER BY event_type
    """,
)
def ts_mann_kendall(spark, sf_dir):
    """The quadratic pair join runs on the DAILY aggregate (calendar-
    bounded, never event-bounded) partitioned by event_type — the
    pre-aggregate-then-pair shape that keeps nonparametric tests
    feasible at any event volume."""
    d = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("rev")
        )
    )
    a = d.select(
        "event_type", F.col("day").alias("da"), F.col("rev").alias("ra")
    )
    b = d.select(
        F.col("event_type").alias("et_b"),
        F.col("day").alias("db"),
        F.col("rev").alias("rb"),
    )
    sgn = F.when(F.col("rb") > F.col("ra"), 1).when(
        F.col("rb") < F.col("ra"), -1
    ).otherwise(0)
    return (
        a.join(
            b,
            (F.col("event_type") == F.col("et_b"))
            & (F.col("da") < F.col("db")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(sgn).cast("bigint").alias("s_stat"),
            F.count("*").cast("bigint").alias("n_pairs"),
        )
        .select(
            "event_type",
            "s_stat",
            "n_pairs",
            r6(F.col("s_stat") / F.col("n_pairs").cast("double")).alias(
                "tau"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "ts_time_weighted_avg",
    # Time-weighted average of the event value per user — the TWAP/IoT
    # aggregate where a value holds until the next observation: each
    # value is weighted by the microseconds until the user's next event
    # (the final, open-ended event carries no weight). Weights are
    # exact integer micros and values exact 2-decimal decimals, so
    # every product and both sums are exact — one final division, no
    # rounding hedge needed beyond round(6) on the emitted average.
    oracle="""
    WITH seq AS (
      SELECT user_id, CAST(value AS DECIMAL(12,2)) AS v,
             epoch_us(ts) AS t,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id)
               AS t_next
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_weighted,
           CAST(sum(t_next - t) AS BIGINT) AS total_us,
           round(CAST(sum(v * (t_next - t)) AS DOUBLE)
                 / CAST(sum(t_next - t) AS DOUBLE), 6) AS twap
    FROM seq WHERE t_next IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
)
def ts_time_weighted_avg(spark, sf_dir):
    """One per-user sort exchange shared by the lead window and the
    final aggregate (same partitioning) — the hold-until-next weighting
    that a plain AVG silently gets wrong on irregular streams."""
    from pyspark.sql import Window

    from naqed_spark.queries._util import epoch_us

    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    seq = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.col("value").cast("decimal(12,2)").alias("v"),
            epoch_us("ts").alias("t"),
        )
        .withColumn("t_next", F.lead("t").over(w))
        .filter(F.col("t_next").isNotNull())
    )
    dt = F.col("t_next") - F.col("t")
    return (
        seq.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_weighted"),
            F.sum(dt).cast("bigint").alias("total_us"),
            r6(
                F.sum(F.col("v") * dt).cast("double")
                / F.sum(dt).cast("double")
            ).alias("twap"),
        )
        .orderBy("user_id")
    )


@query(
    "ts_max_drawdown",
    # Maximum drawdown of the cumulative daily revenue curve per event
    # type: max over days of (running peak − running value) — the
    # risk/robustness metric for any monotone-ish KPI. Cumulative sums
    # and running maxima stay EXACT DECIMAL through the whole window
    # chain (order-independent), cast double only at the final
    # subtraction — no rounding hedge needed, but round(6) applied to
    # match the emission convention.
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(value AS DECIMAL(12,2))) AS rev
      FROM events GROUP BY 1, 2
    ), c AS (
      SELECT event_type, day,
             sum(rev) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM d
    ), p AS (
      SELECT event_type,
             max(cum) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS peak,
             cum
      FROM c
    )
    SELECT event_type,
           round(CAST(max(peak - cum) AS DOUBLE), 6) AS max_drawdown,
           round(CAST(max(peak) AS DOUBLE), 6) AS final_peak
    FROM p GROUP BY event_type ORDER BY event_type
    """,
)
def ts_max_drawdown(spark, sf_dir):
    """Daily pre-aggregation first (calendar-bounded), then one
    event_type-partitioned sort exchange shared by the cumulative sum
    and the running peak; the final rollup is grid-sized."""
    from pyspark.sql import Window

    d = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(12,2)")).alias("rev"))
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = d.withColumn("cum", F.sum("rev").over(w)).withColumn(
        "peak", F.max(F.col("cum")).over(w)
    )
    return (
        c.groupBy("event_type")
        .agg(
            r6(
                F.max(F.col("peak") - F.col("cum")).cast("double")
            ).alias("max_drawdown"),
            r6(F.max("peak").cast("double")).alias("final_peak"),
        )
        .orderBy("event_type")
    )


@query(
    "ts_bollinger_bands",
    # Bollinger bands over the daily revenue series per event type:
    # 7-day rolling mean ± 2σ with breakout flags. Moments stay exact
    # (decimal Σx, Σx² in the rows-bounded frame), sqrt is IEEE-exact,
    # so even the breakout comparisons are engine-stable; only full
    # 7-row windows emit (partial head windows are not comparable).
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS rev,
             sum(CAST(value AS DECIMAL(12,2))) AS rev_dec
      FROM events GROUP BY 1, 2
    ), w AS (
      SELECT event_type, day, rev,
             CAST(sum(rev_dec) OVER win AS DOUBLE) AS sx,
             CAST(sum(rev_dec * rev_dec) OVER win AS DOUBLE) AS sxx,
             count(*) OVER win AS n
      FROM d
      WINDOW win AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day_s, rev,
           round(sx / n, 6) AS mid,
           round(sx / n - 2 * sqrt((sxx - sx * sx / n) / (n - 1)), 6)
             AS lower_band,
           round(sx / n + 2 * sqrt((sxx - sx * sx / n) / (n - 1)), 6)
             AS upper_band,
           (rev > sx / n + 2 * sqrt((sxx - sx * sx / n) / (n - 1)))
             AS above_upper,
           (rev < sx / n - 2 * sqrt((sxx - sx * sx / n) / (n - 1)))
             AS below_lower
    FROM w WHERE n = 7 AND (sxx - sx * sx / n) > 0
    ORDER BY event_type, day_s
    """,
)
def ts_bollinger_bands(spark, sf_dir):
    """Calendar-bounded daily pre-aggregate, then ONE partitioned sort
    exchange carrying both rolling moments (rows-bounded frame = O(7)
    state per row at any volume)."""
    from pyspark.sql import Window

    from naqed_spark.queries._util import date_str

    d = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(12,2)")).alias("rev_dec"))
        .withColumn("rev", F.col("rev_dec").cast("double"))
    )
    win = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    w = d.select(
        "event_type",
        "day",
        "rev",
        F.sum("rev_dec").over(win).cast("double").alias("sx"),
        F.sum(F.col("rev_dec") * F.col("rev_dec"))
        .over(win)
        .cast("double")
        .alias("sxx"),
        F.count("*").over(win).alias("n"),
    ).filter(
        (F.col("n") == 7)
        & ((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) > 0)
    )
    mid = F.col("sx") / F.col("n")
    sd = F.sqrt(
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        / (F.col("n") - 1)
    )
    return w.select(
        "event_type",
        date_str("day").alias("day_s"),
        "rev",
        r6(mid).alias("mid"),
        r6(mid - 2 * sd).alias("lower_band"),
        r6(mid + 2 * sd).alias("upper_band"),
        (F.col("rev") > mid + 2 * sd).alias("above_upper"),
        (F.col("rev") < mid - 2 * sd).alias("below_lower"),
    ).orderBy("event_type", "day_s")


@query(
    "ts_cohort_ltv",
    # Cohort lifetime value: users grouped by first-seen week, tracked
    # by week offset, with per-cohort cumulative revenue per user — the
    # LTV curve that retention counts (ts_cohort_retention) don't give.
    # Exact decimal revenue; cumulative sums stay decimal through the
    # cohort window; one exact division per cell.
    oracle="""
    WITH first AS (
      SELECT user_id, min(epoch_us(ts) // 604800000000) AS cohort_w
      FROM events GROUP BY user_id
    ), sized AS (
      SELECT cohort_w, count(*) AS cohort_users FROM first GROUP BY 1
    ), cell AS (
      SELECT f.cohort_w,
             (epoch_us(e.ts) // 604800000000) - f.cohort_w AS w_off,
             sum(CAST(e.value AS DECIMAL(12,2))) AS rev
      FROM events e JOIN first f ON e.user_id = f.user_id
      GROUP BY 1, 2
    ), cum AS (
      SELECT cohort_w, w_off,
             sum(rev) OVER (PARTITION BY cohort_w ORDER BY w_off
                            ROWS UNBOUNDED PRECEDING) AS cum_rev
      FROM cell
    )
    SELECT CAST(c.cohort_w AS BIGINT) AS cohort_w,
           CAST(c.w_off AS BIGINT) AS w_off,
           CAST(s.cohort_users AS BIGINT) AS cohort_users,
           round(CAST(c.cum_rev AS DOUBLE) / s.cohort_users, 6)
             AS ltv_per_user
    FROM cum c JOIN sized s ON c.cohort_w = s.cohort_w
    ORDER BY cohort_w, w_off
    """,
)
def ts_cohort_ltv(spark, sf_dir):
    """One user-key aggregate for cohort assignment (re-joined on the
    user key — same partitioning), a calendar-grid cell aggregate, and
    a cohort-partitioned cumulative window over the tiny (cohort ×
    offset) grid — per-event work is two hash aggregates."""
    from pyspark.sql import Window

    from naqed_spark.queries._util import epoch_us

    WEEK = 604800000000
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("value").cast("decimal(12,2)").alias("v"),
        ((epoch_us("ts") - epoch_us("ts") % WEEK) / WEEK)
        .cast("bigint")
        .alias("w"),
    )
    first = ev.groupBy(F.col("user_id").alias("f_user")).agg(
        F.min("w").alias("cohort_w")
    )
    sized = first.groupBy("cohort_w").agg(
        F.count("*").alias("cohort_users")
    ).withColumnRenamed("cohort_w", "s_cohort")
    cell = (
        ev.join(first, ev["user_id"] == first["f_user"])
        .groupBy("cohort_w", (F.col("w") - F.col("cohort_w")).alias("w_off"))
        .agg(F.sum("v").alias("rev"))
    )
    cw = Window.partitionBy("cohort_w").orderBy("w_off").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        cell.withColumn("cum_rev", F.sum("rev").over(cw))
        .join(F.broadcast(sized), F.col("cohort_w") == F.col("s_cohort"))
        .select(
            F.col("cohort_w").cast("bigint").alias("cohort_w"),
            F.col("w_off").cast("bigint").alias("w_off"),
            F.col("cohort_users").cast("bigint").alias("cohort_users"),
            r6(
                F.col("cum_rev").cast("double") / F.col("cohort_users")
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_w", "w_off")
    )
