"""§2-A `source_stream_events` + §2-J streaming operators (SURVEY.md:286-295).

Every key here runs a REAL Structured Streaming query — file source →
transformations → memory / foreachBatch sink, `Trigger.AvailableNow` — and
returns the sink contents as a batch DataFrame so the driver can collect and
oracle-check it. The oracle for each key is the batch twin (SURVEY §2-J): the
streaming result of a bounded replay must equal the batch computation over the
same rows, which is exactly Structured Streaming's correctness contract.

Replay staging: `events.parquet` is re-written once per scale factor into a
scratch directory as deterministic chunk files (ts converted ns→µs, see
catalog.load). This is TEST-REPLAY PLUMBING ONLY — in production the source is
Kafka / cloud-storage file drops and no staging exists; the streaming plans
themselves are what scale:

  - windowed aggregations keep state per (window, key) in the state store —
    bounded by watermarks (demonstrated in `stream_watermark_late_drop`);
  - `stream_static_join` broadcasts the dim side per micro-batch (stream-side
    stays partitioned, no stream shuffle for the join);
  - dedup state is evicted by watermark when the event-time column is part of
    the dedup key (demonstrated in `stream_dedup`);
  - `applyInPandasWithState` state is per-group, shuffled once on the group
    key — the same hash partitioning a batch groupBy would use. (Spark 4's
    successor API, transformWithStateInPandas, needs the protobuf-backed
    Python state server; google.protobuf is absent in this container, so
    the custom-state surface is covered by applyInPandasWithState.)

Chunk ordering is pinned with explicit mtimes (`os.utime`) because the file
source orders files by modification time; `maxFilesPerTrigger=1` turns chunks
into micro-batches where multi-batch semantics (watermark advance, late-drop)
are the thing under test.
"""

from __future__ import annotations

import hashlib
import itertools
import os
import shutil
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from naqed_spark.queries._util import dec, dsum, epoch_us, load
from naqed_spark.registry import query

_COUNTER = itertools.count()
_GAP_US = 30 * 60 * 1_000_000  # 30-min session gap
_STAGE_MARKER = "_STAGED_v2"


def _scratch_base() -> str:
    return os.path.join(
        os.environ.get("NAQED_SCRATCH_DIR", tempfile.gettempdir()),
        "naqed_scratch",
        "stream_stage",
    )


def _events_fingerprint(sf_dir: str) -> str:
    """Content fingerprint (file names + sizes + mtimes) of events.parquet.

    Folded into the staging directory name so that regenerating the testdata
    in place invalidates stale staged chunks instead of silently replaying
    old data against a fresh batch oracle."""
    path = os.path.join(sf_dir, "events.parquet")
    parts = []
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            st = os.stat(os.path.join(path, name))
            parts.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(path):
        st = os.stat(path)
        parts.append(f"{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def _write_chunk(df: DataFrame, stage_dir: str, seq: int) -> None:
    """Write one deterministic single-file parquet chunk as {seq:03d}.parquet
    with a pinned, strictly-increasing mtime (file-source processing order)."""
    tmp = os.path.join(stage_dir, f"_tmp_{seq}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
    dst = os.path.join(stage_dir, f"{seq:03d}.parquet")
    os.replace(os.path.join(tmp, part), dst)
    shutil.rmtree(tmp)
    t = 1_700_000_000 + seq  # pinned epoch seconds, strictly increasing
    os.utime(dst, (t, t))


def _stage(spark: SparkSession, sf_dir: str) -> str:
    """Stage events once per scale factor; returns the staging root holding
    `all/` (1 chunk), `dup/` (same chunk twice) and `late/` (on-time chunk,
    empty chunk, late first-hour chunk, far-future flush chunk).

    Built in a pid-suffixed temp root and published with an atomic rename so
    concurrent callers (a harness running keys in parallel) either see the
    complete staging or build their own and lose the rename race harmlessly.
    """
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    final = os.path.join(_scratch_base(), f"{tag}-{_events_fingerprint(sf_dir)}")
    if os.path.exists(os.path.join(final, _STAGE_MARKER)):
        return final
    base = f"{final}.build-{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    for sub in ("all", "dup", "late"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)

    ev = load(spark, sf_dir, "events").orderBy("ts", "event_id")
    _write_chunk(ev, os.path.join(base, "all"), 0)
    dup0 = os.path.join(base, "dup", "000.parquet")
    shutil.copy2(os.path.join(base, "all", "000.parquet"), dup0)
    os.utime(dup0, (1_700_000_000, 1_700_000_000))  # same pinned scheme as _write_chunk seq=0
    _write_chunk(ev, os.path.join(base, "dup"), 1)

    # late-replay layout: everything after the first hour arrives first (so
    # the watermark advances past the first hour), then an EMPTY chunk —
    # Spark 3.4+ dual watermarks filter late events with the watermark from
    # one batch earlier (eviction uses the current one; see the two values on
    # StateStoreSave in the plan), so the empty micro-batch lets the
    # late-event watermark catch up — then the first-hour rows arrive late,
    # then a flush row advances the watermark far enough that every
    # surviving window is emitted by the trailing no-data batch.
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    late_dir = os.path.join(base, "late")
    if lo is None:
        # Zero-row events: no late/flush choreography is possible (there is
        # no min/max timestamp) or needed — a single empty chunk gives every
        # replay an empty stream with the right schema, and each streaming
        # key's batch oracle is empty over the same zero rows.
        _write_chunk(ev, late_dir, 0)
    else:
        cut = pd.Timestamp(lo).floor("h") + pd.Timedelta(hours=1)
        flush_ts = pd.Timestamp(hi) + pd.Timedelta(hours=2)
        _write_chunk(ev.filter(F.col("ts") >= F.lit(cut)), late_dir, 0)
        _write_chunk(ev.filter(F.lit(False)), late_dir, 1)
        _write_chunk(ev.filter(F.col("ts") < F.lit(cut)), late_dir, 2)
        flush = spark.createDataFrame(
            pd.DataFrame(
                {
                    "event_id": [-1],
                    "ts": [flush_ts],
                    "user_id": [-1],
                    "event_type": ["flush"],
                    "value": [0.0],
                    "props": ["{}"],
                }
            ),
            schema=ev.schema,
        )
        _write_chunk(flush, late_dir, 3)
    with open(os.path.join(base, _STAGE_MARKER), "w") as f:
        f.write("ok")
    try:
        os.rename(base, final)
    except OSError:
        # another process published first; its staging is complete (marker
        # is written last) and byte-identical — use it.
        shutil.rmtree(base, ignore_errors=True)
    return final


def _read_stream(
    spark: SparkSession, path: str, one_file_per_batch: bool = False
) -> DataFrame:
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if one_file_per_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    return reader.parquet(path)


def _run_to_memory(sdf: DataFrame, spark: SparkSession, mode: str) -> DataFrame:
    """Execute the streaming query to completion into a memory sink and
    return the sink contents as a batch DataFrame.

    Stateful operators create one state store per shuffle partition per
    micro-batch; at replay scale that fixed cost dominates, so the shuffle
    partition count is dropped for the run and restored after (on a real
    cluster the state partition count is sized to state volume instead).

    The conf mutation is session-global: this assumes keys run serially on
    the session, which both the driver harness and oracle_check do. A
    parallel harness must give each streaming key its own ``spark.newSession()``
    (isolated conf, shared catalog) or serialize the streaming family."""
    name = f"naqed_sink_{next(_COUNTER)}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


_EVENTS_COLS_SQL = """
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props
    FROM events
"""


@query("source_stream_events", oracle=_EVENTS_COLS_SQL)
def source_stream_events(spark, sf_dir):
    """§2-A: the events table replayed through a file stream, append mode —
    the bounded replay must reproduce the batch scan exactly."""
    base = _stage(spark, sf_dir)
    s = _read_stream(spark, os.path.join(base, "all"))
    out = s.select(
        "event_id",
        epoch_us("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    return _run_to_memory(out, spark, "append")


@query(
    "stream_tumbling_window",
    oracle="""
    SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark, sf_dir):
    """1-h tumbling count+sum per event_type. Complete mode: the final
    output equals the batch date_trunc group-by (the oracle twin). At scale
    the production form is watermark+append (see stream_watermark_late_drop);
    state is per (window × event_type) — small and bounded."""
    base = _stage(spark, sf_dir)
    s = _read_stream(spark, os.path.join(base, "all"))
    agg = s.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(dec("value")).alias("sum_value"),
    )
    out = agg.select(
        F.unix_micros(F.col("window.start")).alias("win_start_us"),
        "event_type",
        "n_events",
        "sum_value",
    )
    return _run_to_memory(out, spark, "complete")


@query(
    "stream_sliding_window",
    # batch twin: each event belongs to exactly 4 sliding windows whose
    # starts are its 15-min bucket minus k*15min, k ∈ 0..3.
    oracle="""
    WITH offs AS (SELECT CAST(unnest([0, 1, 2, 3]) AS BIGINT) AS k)
    SELECT (epoch_us(ts) // 900000000) * 900000000 - k * 900000000
             AS win_start_us,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events CROSS JOIN offs
    GROUP BY 1
    """,
)
def stream_sliding_window(spark, sf_dir):
    """1-h window sliding every 15 min, complete mode. 4× row amplification
    by construction — at scale the slide/length ratio bounds it."""
    base = _stage(spark, sf_dir)
    s = _read_stream(spark, os.path.join(base, "all"))
    agg = s.groupBy(F.window("ts", "1 hour", "15 minutes")).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(dec("value")).alias("sum_value"),
    )
    out = agg.select(
        F.unix_micros(F.col("window.start")).alias("win_start_us"),
        "n_events",
        "sum_value",
    )
    return _run_to_memory(out, spark, "complete")


@query(
    "stream_session_window",
    # batch twin of the native session_window: lag → break flag (gap >= 30
    # min starts a new session: session range is [start, last+gap), so an
    # event exactly at last+gap does not overlap) → running-sum session id.
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS prev_us
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN prev_us IS NULL
                       OR ts_us - prev_us >= 1800000000 THEN 1 ELSE 0 END
                  AS is_new
      FROM seq
    ), sess AS (
      SELECT user_id, ts_us,
             sum(is_new) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id, min(ts_us) AS session_start_us, count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def stream_session_window(spark, sf_dir):
    """Native gap-based session windows per user (30-min gap), complete
    mode (update mode is unsupported for session windows). State is merged
    session ranges per user — watermark-bounded in the append-mode
    production form."""
    base = _stage(spark, sf_dir)
    s = _read_stream(spark, os.path.join(base, "all"))
    agg = s.groupBy(
        F.session_window("ts", "30 minutes"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    out = agg.select(
        "user_id",
        F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
        "n_events",
    )
    return _run_to_memory(out, spark, "complete")


@query(
    "stream_watermark_late_drop",
    # Deterministic late-drop twin. Replay order (staged `late/` chunks, one
    # micro-batch each): (1) every event from the second hour on → watermark
    # advances to max(ts)-10min, far past the first hour; (2) empty chunk so
    # the dual late-event watermark catches up; (3) the first-hour rows
    # arrive late — their window end <= watermark, so ALL are dropped;
    # (4) a flush row at max(ts)+2h advances the watermark so every
    # surviving window is emitted (the flush's own window never closes and
    # is never emitted). Batch twin: hourly aggregation excluding the first
    # hour — but ONLY when the on-time replay actually advanced the
    # watermark past the first hour's window end (max on-time ts − 10 min
    # ≥ cut). When the whole corpus fits inside ~1h10m (degenerate small
    # inputs), no event is late under real watermark semantics and the
    # first-hour window is kept by BOTH engines.
    oracle="""
    WITH cut AS (
      SELECT date_trunc('hour', min(ts)) + INTERVAL 1 HOUR AS c FROM events
    )
    SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events, cut
    WHERE ts >= cut.c
       OR coalesce((SELECT max(ts) FROM events, cut WHERE ts >= cut.c)
                     - INTERVAL 10 MINUTE < cut.c, TRUE)
    GROUP BY 1
    """,
)
def stream_watermark_late_drop(spark, sf_dir):
    """10-min watermark + append mode: rows older than the watermark are
    dropped and their (already-evicted) windows never re-open — the watermark
    is exactly what bounds state at 100 TB (without it, every window ever
    seen stays in the state store forever)."""
    base = _stage(spark, sf_dir)
    s = _read_stream(
        spark, os.path.join(base, "late"), one_file_per_batch=True
    )
    agg = (
        s.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(dec("value")).alias("sum_value"),
        )
    )
    out = agg.select(
        F.unix_micros(F.col("window.start")).alias("win_start_us"),
        "n_events",
        "sum_value",
    )
    return _run_to_memory(out, spark, "append")


@query(
    "stream_dedup",
    oracle=_EVENTS_COLS_SQL,
)
def stream_dedup(spark, sf_dir):
    """Streaming dedup over a replay that delivers every event TWICE
    (staged `dup/`): dropDuplicates on (event_id, ts) with a 10-min
    watermark — ts in the dedup key lets the watermark evict dedup state,
    the thing that keeps this bounded on an infinite stream."""
    base = _stage(spark, sf_dir)
    s = _read_stream(spark, os.path.join(base, "dup"))
    out = (
        s.withWatermark("ts", "10 minutes")
        .dropDuplicates(["event_id", "ts"])
        .select(
            "event_id",
            epoch_us("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    )
    return _run_to_memory(out, spark, "append")


@query(
    "stream_stateful_count",
    # single replayed micro-batch → the emitted per-key state equals the
    # batch group-by twin. Cents as BIGINT: exact integer arithmetic on both
    # engines (value is a 2-decimal double).
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_count(spark, sf_dir):
    """Custom stateful op via applyInPandasWithState: running per-user
    (count, cents-sum) kept in GroupState. State is hash-partitioned by
    user_id — the same single shuffle a batch groupBy needs; Arrow-batched
    pandas on both sides of the boundary."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    base = _stage(spark, sf_dir)
    s = _read_stream(spark, os.path.join(base, "all"))

    def upd(key, pdfs, state):
        # NULL values: count(*) counts the row, SUM skips it — and a key
        # that has never seen a non-null value must emit NULL cents (not
        # 0), so the state carries the non-null contribution count. The
        # naive astype("int64") also CRASHED on NaN (round-9 null probe).
        n, nv, cents = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            vals = pdf["value"].dropna()
            nv += len(vals)
            cents += int(vals.mul(100).round().astype("int64").sum())
        state.update((n, nv, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_cents": [cents if nv else None],
            }
        )

    out = s.groupBy("user_id").applyInPandasWithState(
        upd,
        outputStructType="user_id long, n_events long, total_cents long",
        stateStructType="n long, nv long, cents long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(out, spark, "update")


@query(
    "stream_static_join",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment, e.value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def stream_static_join(spark, sf_dir):
    """Stream ⋈ static dim. The static side is broadcast per micro-batch
    (explicit hint — customer at replay scale is dim-sized; at 100 TB the
    stream side NEVER shuffles for this join, which is the point)."""
    base = _stage(spark, sf_dir)
    s = _read_stream(spark, os.path.join(base, "all"))
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    out = s.join(
        F.broadcast(cust), s["user_id"] == cust["c_custkey"], "inner"
    ).select("event_id", "user_id", "c_mktsegment", "value")
    return _run_to_memory(out, spark, "append")


@query(
    "stream_foreachbatch_sink",
    oracle=_EVENTS_COLS_SQL,
)
def stream_foreachbatch_sink(spark, sf_dir):
    """foreachBatch → parquet-append sink, then re-read: the arbitrary-sink
    escape hatch (upserts, multi-sink fan-out). Exactly-once comes from the
    (batch_id, partition) idempotence contract — here each batch appends its
    rows once; the re-read must equal the source. On a cluster the sink path
    must be a shared filesystem."""
    base = _stage(spark, sf_dir)
    out_dir = os.path.join(
        _scratch_base(), f"febs_out_{os.path.basename(base)}"
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    s = _read_stream(spark, os.path.join(base, "all"))
    proj = s.select(
        "event_id",
        epoch_us("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        bdf.write.mode("append").parquet(out_dir)

    q = (
        proj.writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)



@query(
    "stream_stream_join",
    # stream-stream inner join: each click joined to the same user's
    # purchases within the following hour. Both sides carry watermarks and
    # the join condition bounds event time on both sides — that pair is
    # what lets Spark expire join state instead of buffering both streams
    # forever (the 100 TB requirement for stream-stream joins). Batch twin:
    # the identical self-join on the events table.
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS purchase_id,
           a.user_id,
           epoch_us(a.ts) AS click_us, epoch_us(b.ts) AS purchase_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    """,
)
def stream_stream_join(spark, sf_dir):
    base = _stage(spark, sf_dir)
    path = os.path.join(base, "all")
    clicks = (
        _read_stream(spark, path)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        _read_stream(spark, path)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
        ),
        "inner",
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
    )
    return _run_to_memory(joined, spark, "append")


@query(
    "stream_complete_topk",
    # complete-mode streaming leaderboard: top-5 users by event count,
    # deterministic user_id tiebreak at the cut. Sorting + limit are legal
    # in complete mode only — exactly this leaderboard shape; the batch
    # twin ranks with the same total order.
    oracle="""
    SELECT user_id, n_events FROM (
      SELECT user_id, count(*) AS n_events,
             row_number() OVER (ORDER BY count(*) DESC, user_id ASC) AS rn
      FROM events GROUP BY user_id)
    WHERE rn <= 5
    """,
)
def stream_complete_topk(spark, sf_dir):
    base = _stage(spark, sf_dir)
    s = _read_stream(spark, os.path.join(base, "all"))
    out = (
        s.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.col("n_events").desc(), F.col("user_id").asc())
        .limit(5)
    )
    return _run_to_memory(out, spark, "complete")


# Conservative end-of-replay cutoff for APPEND-mode outer/chained results:
# rows whose emission depends on watermark expiry are only deterministic
# once the final watermark is guaranteed past them. 3 h clears the 1 h
# join/window span + 10 min delay + one micro-batch of cascade lag with
# margin; both the streaming result and the batch oracle filter to the
# same region, so the compare is exact. (Production doesn't have this
# cutoff — the stream simply keeps running; it is an artifact of replaying
# a BOUNDED stream and comparing against batch.)
_TAIL_CUTOFF_US = 3 * 3600 * 1_000_000


def _max_ts_us(spark: SparkSession, sf_dir: str) -> int:
    m = (
        load(spark, sf_dir, "events")
        .agg(F.max(epoch_us("ts")).alias("m"))
        .collect()[0]["m"]
    )
    # max over zero rows is NULL: any cutoff works — the sink is empty too.
    return m if m is not None else 0


def _join_wm_floor_us(spark: SparkSession, sf_dir: str) -> int:
    """Deterministic floor of the FINAL global watermark for the
    click/purchase join: Spark's global watermark is the MIN across all
    watermarked inputs, and each input's watermark derives from the max
    event time THAT INPUT has seen — so the bound must come from
    min(max click ts, max purchase ts), not the global max (at small SFs
    the purchase stream can end hours before the last event)."""
    r = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.max(epoch_us("ts")).alias("m"))
        .agg(F.min("m").alias("wm"))
        .collect()
    )
    wm = r[0]["wm"] if r else None
    return wm if wm is not None else 0


@query(
    "stream_left_outer_join",
    # Stream-stream LEFT OUTER join: every click, with its purchase within
    # the following hour OR nulls. The outer semantics are the hard part:
    # Spark buffers the left row until the watermark proves no match can
    # still arrive, THEN emits the null-padded row — so unmatched results
    # are late by construction, and state is evicted the moment the
    # time-bound + watermark window closes (the 100 TB requirement: state
    # is O(in-flight window), not O(stream)). Batch twin: the identical
    # LEFT JOIN, both sides filtered to the deterministic region (see
    # _TAIL_CUTOFF_US).
    oracle="""
    WITH m AS (SELECT min(mx) AS mx FROM (
           SELECT event_type, max(epoch_us(ts)) AS mx FROM events
           WHERE event_type IN ('click', 'purchase') GROUP BY event_type))
    SELECT a.event_id AS click_id, a.user_id,
           epoch_us(a.ts) AS click_us,
           b.event_id AS purchase_id,
           epoch_us(b.ts) AS purchase_us
    FROM events a
    LEFT JOIN events b
      ON a.user_id = b.user_id
     AND b.event_type = 'purchase'
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    CROSS JOIN m
    WHERE a.event_type = 'click'
      AND epoch_us(a.ts) <= m.mx - 10800000000
    """,
)
def stream_left_outer_join(spark, sf_dir):
    base = _stage(spark, sf_dir)
    path = os.path.join(base, "all")
    clicks = (
        _read_stream(spark, path)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        _read_stream(spark, path)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
        ),
        "leftOuter",
    ).select(
        "click_id",
        "user_id",
        F.unix_micros("click_ts").alias("click_us"),
        "purchase_id",
        F.unix_micros("purchase_ts").alias("purchase_us"),
    )
    sink = _run_to_memory(joined, spark, "append")
    cutoff = _join_wm_floor_us(spark, sf_dir) - _TAIL_CUTOFF_US
    return sink.filter(F.col("click_us") <= cutoff)


@query(
    "stream_chained_agg",
    # Chained stateful aggregations in ONE streaming query (Spark ≥3.4
    # multiple-stateful-operator support): hourly events per user → hourly
    # active-user count + event total. The second aggregation windows over
    # window_time() of the first — each level keeps its own watermark-
    # bounded state store, and finalized level-1 rows cascade into level 2
    # without leaving the query (no intermediate sink — at 100 TB that's
    # one job, one state lifecycle, instead of two pipelines with a
    # storage hop between them). Batch twin: the same two-level group-by.
    oracle="""
    WITH m AS (SELECT max(epoch_us(ts)) AS mx FROM events),
    per_user AS (
      SELECT date_trunc('hour', ts) AS h, user_id, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT epoch_us(h) AS win_start_us,
           count(*) AS n_active_users,
           CAST(sum(n) AS BIGINT) AS n_events
    FROM per_user CROSS JOIN m
    WHERE epoch_us(h) <= m.mx - 10800000000
    GROUP BY h, m.mx
    """,
)
def stream_chained_agg(spark, sf_dir):
    base = _stage(spark, sf_dir)
    s = _read_stream(spark, os.path.join(base, "all"))
    lvl1 = (
        s.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    lvl2 = lvl1.groupBy(
        F.window(F.window_time("window"), "1 hour").alias("w2")
    ).agg(
        F.count(F.lit(1)).alias("n_active_users"),
        F.sum("n").alias("n_events"),
    )
    out = lvl2.select(
        F.unix_micros(F.col("w2.start")).alias("win_start_us"),
        "n_active_users",
        "n_events",
    )
    sink = _run_to_memory(out, spark, "append")
    cutoff = _max_ts_us(spark, sf_dir) - _TAIL_CUTOFF_US
    return sink.filter(F.col("win_start_us") <= cutoff)


@query(
    "stream_file_sink_exactly_once",
    # Exactly-once file sink: the stream writes parquet through a
    # checkpointed file sink, then the SAME query is started AGAIN on the
    # same checkpoint — the restart must process nothing (offsets are
    # committed) and the sink must contain each input row exactly once
    # (the sink's transaction log, _spark_metadata, makes uncommitted
    # files invisible to readers). This is THE production property for
    # file-based pipelines at 100 TB: crash/restart cannot duplicate or
    # drop data. Batch twin: the plain projection of events.
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(round(value * 100, 0) AS BIGINT) AS cents
    FROM events
    """,
)
def stream_file_sink_exactly_once(spark, sf_dir):
    base = _stage(spark, sf_dir)
    src = os.path.join(base, "all")
    out = os.path.join(base, "..", "file_sink_out")
    ckpt = os.path.join(base, "..", "file_sink_ckpt")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    def run_once():
        s = _read_stream(spark, src, one_file_per_batch=True).select(
            "event_id",
            "user_id",
            "event_type",
            F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # full replay, one micro-batch per chunk file
    run_once()  # restart on the same checkpoint: must be a no-op
    return spark.read.parquet(out).select(
        "event_id", "user_id", "event_type", "cents"
    )


@query(
    "stream_union_two_sources",
    # Multi-source streaming union — the "several topics, one pipeline"
    # shape: two INDEPENDENT file streams (clicks vs everything else,
    # staged as separate directories) unioned inside one streaming query
    # and aggregated together. Spark tracks offsets PER SOURCE in one
    # checkpoint, so exactly-once holds across both; at 100 TB this is
    # N kafka topics feeding one job without an intermediate merge hop.
    # Batch twin: the same aggregate over the whole table.
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS cents
    FROM events GROUP BY event_type
    """,
)
def stream_union_two_sources(spark, sf_dir):
    base = _stage(spark, sf_dir)
    src = os.path.join(base, "all")
    # split the staged chunks into two source dirs by event_type at
    # stage-split time (plumbing, like _stage itself)
    # inside the per-SF staging dir (base embeds the sf fingerprint) so
    # different scale factors never share a split
    split_base = os.path.join(base, "union_split")
    # v2: null-safe split (old splits dropped null event_type rows)
    marker = os.path.join(split_base, "_SPLIT_OK_v2")
    if not os.path.exists(marker):
        shutil.rmtree(split_base, ignore_errors=True)
        os.makedirs(split_base, exist_ok=True)
        full = spark.read.parquet(src)
        # null-safe complement: `!= 'click'` alone silently DROPS null
        # event_type rows (they fail both predicates) — a split must
        # PARTITION the stream, never lose rows
        is_click = F.col("event_type").eqNullSafe(F.lit("click"))
        full.filter(is_click).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(split_base, "clicks"))
        full.filter(~is_click).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(split_base, "rest"))
        open(marker, "w").close()
    clicks = _read_stream(spark, os.path.join(split_base, "clicks"))
    rest = _read_stream(spark, os.path.join(split_base, "rest"))
    both = clicks.unionByName(rest)
    agg = both.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
            "cents"
        ),
    )
    return _run_to_memory(agg, spark, "complete")
