"""Shared helpers enforcing the oracle-determinism rules (SURVEY.md §7.3).

Cross-engine hash-match conventions used by every checked query:
  - dates      → ISO 'yyyy-MM-dd' strings   (pandas date/datetime ambiguity)
  - timestamps → epoch microseconds bigint  (both engines truncate ns → µs)
  - money/measure SUMS → exact DECIMAL arithmetic, cast to double at the end
    (order-independent: both engines compute the identical exact decimal, so
    the final doubles are bit-identical — no rounding needed). Mirror in SQL
    with CAST(x AS DECIMAL(p,s)) on the same ingredients.
  - per-row money products (2-dec × 2-dec) → round(x, 4): the true value has
    ≤4 decimals, and the double product is within 1 ulp of it, so both
    engines agree. round(x, 2) here is a determinism bug (half-cent values
    like 38228.5*0.97 = 37081.645 round differently per engine).
  - inherently-float results (stddev/corr/ln/cosine) → round(x, 6) hedge
  - arrays → flatten to (id, pos, value) scalar rows, or sort + join
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Column, functions as F

from naqed_spark.catalog import load  # re-export for query modules

__all__ = [
    "load",
    "date_str",
    "epoch_us",
    "money_row",
    "dec",
    "dsum",
    "r4",
    "r6",
    "low_shuffle",
    "scoped_persist",
    "release_scoped_persists",
    "session_fragment",
    "spread",
]


def session_fragment(spark, key, builder):
    """Per-session cache of an ANALYZED lazy helper frame shared by
    several registered keys (r17, VERDICT r16 item 2 — the catalog.py
    analyzed-scan idiom one level up): building a frame like the graph
    edge table or the MinHash signature table costs hundreds of py4j
    round trips per query build, and 5-27 registered keys each rebuild
    the identical plan. The dict lives ON the session object (cannot
    outlive it, one per session); the value is a LAZY DataFrame — no
    data, no results, every action still computes from parquet. Callers
    that persist the fragment must re-mark it on every call (persist
    marks are released between builds by the registry): keep
    ``scoped_persist`` at the call site, never inside ``builder``."""
    cache = getattr(spark, "_naqed_frag_cache", None)
    if cache is None:
        cache = {}
        try:
            spark._naqed_frag_cache = cache
        except Exception:
            return builder()  # session proxy rejects attributes
    if key not in cache:
        cache[key] = builder()
    return cache[key]


def spread(df):
    """Round-robin repartition to the scheduler's default parallelism —
    the fix for heavy per-row compute above a single-split scan (guide
    §2.5 "input skew", r16 fuzzy-probe precedent, r17 items 1/4): the
    fixture parquet files are single-row-group, so a bare scan is ONE
    task no matter what ``maxPartitionBytes`` says, and every downstream
    per-row transform (md5 minhash folds, JSON parsing, regex extraction)
    would run on one core. The knob follows the cluster
    (``defaultParallelism``), never a local constant; at 100 TB a
    well-split input makes this a near-no-op pass relative to the
    per-row work it parallelizes. Use ONLY above genuinely expensive
    per-row work — for plain projections the shuffle costs more than it
    buys (the r16 range-bucket persist lesson, applied to repartition)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)

# r16 opt (guide §5 "unpersist when done"): query builders persist frames
# their OWN plan reuses 2-5×, but a lazy builder never sees the consuming
# action, so it cannot unpersist afterwards — and a session that runs many
# queries (the oracle sweep, a real pipeline) accumulated every mark until
# storage eviction + GC churn showed up as multi-second stalls on
# unrelated keys (measured: 417-key sweep total exec 211 s → 247 s purely
# from accumulation). ``scoped_persist`` registers the mark; the registry
# releases all of the PREVIOUS query's marks when the NEXT query builds.
# Releasing a persist mark is always safe — unlike a checkpoint, the
# lineage recomputes — so the worst case for an unusual caller
# (build A, build B, then run A) is a recompute, never a wrong answer.
# keyed per SparkSession (r16 review): marks registered on session A
# must never be released by a build on session B — the release is a
# same-session lifecycle, not a process-wide one. Entries are popped on
# release, so the dict only holds the current inter-build window's marks.
# r17 (VERDICT r16 item 9 / ADVICE): keyed by the SESSION OBJECT, not
# id(session) — a recycled id() after a session was GC'd could inherit
# another session's mark list. A weak key would not help retention (the
# DataFrame values hold strong references back to their session), so
# abandoned-session cleanup is explicit instead: every release call
# prunes entries whose session has been stopped (their JVM-side caches
# died with the context; holding the Python DataFrames only pinned a
# dead session's object graph).
_SCOPED_PERSISTS: dict = {}


def _session_stopped(spark) -> bool:
    """True only when the context is PROVABLY stopped. An exception from
    the sparkContext accessor means "cannot tell" (e.g. a Connect-style
    session) — keep the entry so its release still unpersists (r17
    review: pruning on 'cannot tell' would pop a live session's marks
    without ever unpersisting them)."""
    try:
        return spark.sparkContext._jsc is None
    except Exception:
        return False


def scoped_persist(df):
    """Persist ``df`` for intra-query subtree reuse; the mark is released
    when the next registered query builds ON THE SAME SESSION (see
    registry.query)."""
    df.persist()
    _SCOPED_PERSISTS.setdefault(df.sparkSession, []).append(df)
    return df


def release_scoped_persists(spark=None) -> None:
    """Release scoped marks — ``spark``'s own when given, else all.
    Also drops entries for sessions that have been stopped since their
    marks were registered (nothing to unpersist — the context is gone)."""
    for s in [s for s in _SCOPED_PERSISTS if _session_stopped(s)]:
        _SCOPED_PERSISTS.pop(s, None)
    if spark is None:
        old = [df for lst in _SCOPED_PERSISTS.values() for df in lst]
        _SCOPED_PERSISTS.clear()
    else:
        old = _SCOPED_PERSISTS.pop(spark, [])
    for df in old:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release


def sorted_pairs_expr(array_col: str, field_a: str, field_b: str) -> str:
    """SQL expression: every i<j element pair of the SORTED array column
    ``array_col`` as ``struct(field_a, field_b)`` — sortedness makes
    field_a < field_b exactly like a self-join's ``a < b`` predicate.
    PRECONDITION (ADVICE r16): the array must also be DUPLICATE-FREE —
    with repeated elements this emits x==y pairs and duplicated pairs
    the old ``a < b`` self-join spelling never produced. Every current
    caller feeds a collect_list over distinct rows (or collect_set);
    a new caller must guarantee the same or filter x < y afterwards.
    The slice arithmetic is 1-based (transform's ``i`` is 0-based, the
    pair partner window starts at element i+2 and has size-i-1
    elements). One definition shared by the basket/adjacency/posting
    pair generators so the off-by-one reasoning lives in one place
    (r16 review)."""
    return (
        f"flatten(transform({array_col}, (x, i) ->"
        f" transform(slice({array_col}, i + 2, size({array_col}) - i - 1),"
        f" y -> struct(x AS {field_a}, y AS {field_b}))))"
    )


def date_str(c: str | Column) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.date_format(c.cast("date"), "yyyy-MM-dd")


def epoch_us(c: str | Column) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(c.cast("timestamp"))


def money_row(c: Column) -> Column:
    """Per-row product of two 2-decimal money doubles → exact at 4 decimals."""
    return F.round(c, 4)


def dec(c: str | Column, prec: str = "decimal(12,2)") -> Column:
    """Cast a stored 2-decimal double to exact decimal for order-independent
    arithmetic. Both engines round the same double to the same decimal
    (the stored value is within 1 ulp of its decimal form, never at a
    rounding boundary). SQL twin: CAST(x AS DECIMAL(12,2))."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(prec)


def dsum(e: Column) -> Column:
    """Exact decimal sum emitted as a double: identical on both engines."""
    return F.sum(e).cast("double")


def r4(c: Column) -> Column:
    return F.round(c, 4)


def r6(c: Column) -> Column:
    return F.round(c, 6)


@contextmanager
def low_shuffle(spark, n: int = 8):
    """Temporarily drop shuffle parallelism for driver-side iterative loops
    (Pregel supersteps, streaming replays) whose per-step data is tiny —
    task-launch overhead dominates there. Only effective for actions that
    EXECUTE inside the block (localCheckpoint/count); the query's final
    lazy DataFrame still runs at the session setting."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
