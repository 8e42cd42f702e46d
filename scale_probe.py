#!/usr/bin/env python
"""Empirical scaling probe: do the headline plans scale with data?

The driver fixtures are single-row-group parquet, so every sf0.1 bench
number carries a serial-scan floor (see SCALE.md "Bench noise
calibration"). This probe answers the question the bench cannot: *when
the data grows K x and the files are splittable, does wall-clock grow
sub-linearly the way the 100 TB argument claims?*

Method: materialize K key-shifted copies of the sf0.1 fact tables
(lineitem/orders/customer/events; fixed-size dims copied unshifted —
dims grow slower than facts in real warehouses) as 32-file parquet under
scratch, then time the registry's own headline queries against the 1x
and Kx scratch datasets (same warm-up + timed-run method as bench.py).
Key shifts keep all join/group cardinalities proportional: copy i adds
i * 10^7 to l_orderkey/o_orderkey, o_custkey/c_custkey, and
event_id/user_id, so K x data has K x orders, K x customers, K x users
— never K duplicate rows colliding on one key.

Prints ONE JSON line:
  {"probe": "scaling", "k": K, "queries": {key: {"t1": s, "tk": s,
   "ratio": tk/t1}}, ...}

ratio << K is the pass condition: the plans parallelize; the bench's
constants are floor, not per-row cost. Run: python scale_probe.py [K]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SHIFT = 10_000_000
DIMS = ["region", "nation", "supplier", "part"]
FACT_SHIFTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    # corpus grows like a fact table; shifted ids give distinct md5
    # buckets, so hash-keyed ops see genuinely new rows, not K collisions
    "documents": ["doc_id"],
    # round 13: embeddings graduates from DIMS to a shifted fact so the
    # M12 vector keys see Kx genuinely-new rows (the embedding arrays
    # repeat across copies, but the per-row HOF work — the thing the
    # probe measures — is value-independent; shifted vec_ids keep the
    # topk tiebreak total). No pre-r13 probe key reads embeddings, so
    # historical ratios are unaffected.
    "embeddings": ["vec_id"],
}
HEADLINE = [
    "agg_groupby_hash",
    "join_q3_shipping_priority",
    "join_multiway_star",
    "win_row_number_topk",
    "win_sessionize",
    "limit_topk_global",
    # round-7 single-partitioning operators: their scale claim is that the
    # one entity-key shuffle dominates and windows add no quadratic term
    "ts_scd2_ranges",
    "ts_gaps_islands",
    "ts_interval_merge",
    "ts_rollup_incremental_merge",
    # round-7 corpus-composition ops: scan-shaped (mixture), broadcast-
    # filter (length percentile), topk+broadcast (vocab), single-exchange
    # window (shuffle_shard). llm_semdedup_cluster is deliberately NOT
    # probed: the fixture's cluster count is fixed at 10, so growing the
    # corpus K x grows within-cluster pairs K^2 — the op's scale story
    # requires k ~ n (SemDeDup's own design), which the fixture can't vary.
    "llm_mixture_sample",
    "llm_length_filter_percentile",
    "llm_vocab_coverage",
    "llm_shuffle_shard",
    # round-7 session 2: winnowing is scan + one doc_id exchange; the
    # windowed distinct-count rewrite is one custkey exchange; DSIR is
    # two vocab builds + one broadcast-join scoring pass
    "llm_winnowing_fingerprint",
    "win_count_distinct_over",
    "llm_importance_resample",
    # round-9 window-state hardening: skyline grid pre-prune, broadcast
    # percentile terciles, and the three two-phase prefix-sum rewrites
    # (KS / ABC / weighted median). Note the fixture's K-copy growth
    # keeps some windows' INPUT constant by construction (duplicated
    # price/value grids collapse in the pre-groupBy) — the probe then
    # measures the scan/aggregate phases, which is exactly where K x the
    # rows land; weighted_median and perplexity_bucket grow the window
    # side too (shifted doc_ids / K x lineitem rows per bucket).
    "agg_skyline_pareto",
    "llm_perplexity_bucket",
    "agg_ks_statistic",
    "agg_abc_classification",
    "agg_weighted_median",
    # round-10 completions: the remaining two-phase rewrites (two-level
    # ntile, per-source packing prefix sums, the range-partitioned global
    # rank) and the quantifier decorrelation fixed this round — probed so
    # every member of the two-phase family has growth evidence, not just
    # the r9 batch.
    "win_ntile",
    "llm_pack_sequences",
    "sort_multikey",
    "sub_any_all",
]

# The adapted TPC-H suite rides the same probe (round 9): its sf0.1
# bench numbers are floor-dominated (see BASELINE.md), so the scaling
# ratio against splittable 8x data is the evidence that the plan
# shapes — semi/anti joins, decorrelated aggregates, broadcast dims,
# TakeOrdered top-k — and not the constants, carry the suite.
HEADLINE += [
    "tpch_q2_min_cost_supplier", "tpch_q4_order_priority",
    "tpch_q6_revenue_change", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q10_returned_items", "tpch_q11_important_values",
    "tpch_q12_priority_class", "tpch_q14_promo_effect",
    "tpch_q15_top_supplier", "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty_revenue", "tpch_q18_large_orders",
    "tpch_q19_disjunctive_pred", "tpch_q20_part_promotion",
    "tpch_q21_waiting_supplier", "tpch_q22_prospects",
]

# Round-11 registrations: the compiler $pivot (events exchange carrying
# 5 longs/user), $unpivot (zero-shuffle Generate), and the stratified
# $sample (WindowGroupLimit partial top-k per stratum) — probed from
# first registration so their growth evidence lands with their first
# driver signal.
HEADLINE += [
    "compiler_pivot",
    "compiler_unpivot",
    "compiler_sample_stratified",
]

# Round-12 registrations: the $asof nearest/tolerance hops (equi-join +
# WindowGroupLimit top-1 — the rank-1 prune is the scale claim) and the
# subtotal grids (one Expand + one exchange, |sets| pre-combined cells
# per key) — probed from first registration, with llm_exact_dedup
# re-probed under its new hex-digest shuffle key and the winnowing
# fingerprint under its fused zero-shuffle rewrite (both TOUCHED r12).
HEADLINE += [
    "compiler_asof_nearest",
    "compiler_asof_tolerance",
    "compiler_rollup",
    "compiler_cube",
    "compiler_grouping_sets",
    "llm_exact_dedup",
    "llm_multimodal_decode",
]

# Round-13 registrations (probed from first registration, same
# discipline): the M11 statistical-aggregate keys (one partial+final
# hash-agg pair, accumulator-width shuffle) and the $asof forward hop
# (the same WindowGroupLimit rank-1 prune as backward/nearest).
HEADLINE += [
    "compiler_agg_stats",
    "compiler_percentile",
    "compiler_asof_forward",
]

# Round-13 M12 registrations: the vector-similarity projection (one
# exchange-free codegen pass — growth should be ~linear map work) and
# the DSL top-k (TakeOrderedAndProject: per-partition 20-row heaps, so
# Kx rows cost Kx scan and O(1) result movement).
HEADLINE += [
    "compiler_vector_similarity",
    "compiler_vector_topk",
]

# Round-13 M13 registrations: the split+explode wordcount (streaming
# Generate + one token exchange carrying (token, n) pairs) and the
# map-only pos+outer row form (zero exchanges; output grows with the
# pushed-filter window, not the corpus).
HEADLINE += [
    "compiler_split_explode_wordcount",
    "compiler_explode_pos_outer",
]

# Round-13 M14 registrations: the post-Generate streaming $where +
# two-phase distinct aggregate, and the sorted-collection aggregates
# (collect_set dedups map-side; the bag is domain-bounded).
HEADLINE += [
    "compiler_where_distinct_docs",
    "compiler_collect_segments",
]

# Round-13 M15 registration: paired-column statistics (one
# accumulator-width exchange, the compiler_agg_stats plan family).
HEADLINE += [
    "compiler_corr_covar",
]

# Round-13 M16 registration: calendar-month rollup (codegen calendar
# projections + one ~120-group exchange of accumulators).
HEADLINE += [
    "compiler_calendar_rollup",
]

# Round-13 M17 registration: normalize-then-group string pipeline
# (codegen normalization + two-phase distinct over 8-char prefixes).
HEADLINE += [
    "compiler_string_normalize",
]

# Round-14 M18 registration: the null-combinator rollup (codegen
# combinator chain + one ≤5-group exchange of decimal accumulators).
HEADLINE += [
    "compiler_null_combinators",
]

# Round-14 M19 registrations: the $traverse Pregel loop. The probe
# measures the per-superstep join cost against a Kx edge build
# (traverse_edges: customer is a shifted fact, so the edge-derivation
# scan grows Kx while the reached set stays the depth-6 subtree — the
# scale claim IS that reachability cost tracks frontier x edges, not
# table size). traverse_reachable walks nation (a DIM) — flat by
# construction, probed for the superstep-constant evidence only.
HEADLINE += [
    "compiler_traverse_reachable",
    "compiler_traverse_edges",
]

# Round-14 M20 registration: the JSON-keys histogram (codegen
# from_json/map_keys + streaming Generate + one bounded-key exchange
# of accumulators — growth should be the linear scan term).
HEADLINE += [
    "compiler_json_keys_histogram",
]

# Round-14 M22 registration: weighted $traverse (frontier Bellman-Ford
# over a Kx multi-edge build; like the BFS keys, the loop cost tracks
# frontier × edges, and the Kx term is the edge-derivation scan). The
# M21 $stream keys follow the §2-J family's precedent: not probed —
# their wall is availableNow replay plumbing, not plan shape.
HEADLINE += [
    "compiler_traverse_cheapest",
]

# Round-14 M23 registration: the scalar-threshold rollup (inner 1-row
# action + pushed-literal scan + one accumulator exchange — growth is
# the pruned scan term).
HEADLINE += [
    "compiler_scalar_threshold",
]

# Round-15 M24 registrations: the approximate-sketch DSL surface. The
# scale claim IS the sketch contract — per-group state is constant
# (HLL registers) / O(accuracy) (quantile sketch) regardless of input
# size, so Kx growth should be the scan + partial-agg term only. Note
# compiler_approx_count_distinct also carries an exact count_distinct
# for its contract column (an Expand, 2x the scan rows map-side).
HEADLINE += [
    "compiler_approx_count_distinct",
    "compiler_approx_percentile",
]

# Round-15 M25 registration: the correlated-$scalar decorrelation
# (per-part mean hash-agg + one equi-join + rollup — growth should be
# the two lineitem scan terms plus the l_partkey exchange).
HEADLINE += [
    "compiler_scalar_correlated",
]

# Round-15 M28 registration: multi-fraction quantiles from one sketch
# (the exact-regime sketch stores every sample at accuracy >= n, so
# growth mirrors compiler_approx_percentile's — the accuracy knob is
# what caps it at production scale).
HEADLINE += [
    "compiler_approx_percentile_multi",
]

# Round-16 M31/M32 registrations. compiler_regex_text is a zero-
# exchange codegen projection (three JVM regex intrinsics on the scan
# — growth should be the pure scan term). compiler_window_nav is one
# (o_custkey) window exchange over FULL partitions — last/nth need
# every partition row, so the $qualify bound deliberately does NOT
# prune pre-shuffle (see the key's docstring) and growth tracks the
# whole orders table through the exchange.
# The M29/M30 $stream keys follow the §2-J precedent: not probed
# (their wall is availableNow replay plumbing, not plan shape).
HEADLINE += [
    "compiler_regex_text",
    "compiler_window_nav",
    # scan-stage regex filter + tiny rollup — growth is the scan term
    "compiler_regex_filter",
    # IGNORE NULLS nav — same single window exchange as the dense key
    "compiler_window_nav_nulls",
]

# Round-16b M36/M37 registrations. compiler_calendar_parts is codegen
# timestamp intrinsics + one hash-agg pair on a ≤28-row grid (growth is
# the scan term; partials collapse before the exchange).
# compiler_math_scalar is a zero-exchange codegen projection — the
# pure feature-engineering pass shape.
HEADLINE += [
    "compiler_calendar_parts",
    "compiler_math_scalar",
]

# Round-16b M34 registrations: both are zero-exchange codegen
# projections (JVM HOF lambdas / array intrinsics on the scan) —
# growth should be the scan term, like compiler_regex_text.
HEADLINE += [
    "compiler_array_hof",
    "compiler_array_vector",
]

# Round-16b M35 registrations ($from composition): agg-of-agg is two
# accumulator-only hash-agg pairs (growth = the scan + the custkey
# exchange); unpivot-filter is a Generate + streaming filter + 2-group
# agg (growth = the scan term).
HEADLINE += [
    "compiler_from_agg_of_agg",
    "compiler_from_unpivot_filter",
]

# Round-16b M38 registrations: string_search_pad and date_arith are
# zero-exchange codegen projections (scan-term growth);
# bool_distinct_agg is a hash-agg pair + the distinct-pair expand on a
# 6-group grid (accumulator growth).
HEADLINE += [
    "compiler_string_search_pad",
    "compiler_date_arith",
    "compiler_bool_distinct_agg",
]

# Round-16b M39 registration: two hash semi/anti joins over the
# customer scan with filter-bounded build sides — growth is the two
# build scans + probe scan, AQE-broadcast at small SF.
HEADLINE += [
    "compiler_in_query_membership",
]

# Round-16b M40 registrations: set_bag_ops is two partial-agg'd joins
# over (row, count) accumulators; order_nulls is TakeOrderedAndProject
# (per-partition heaps — growth is the scan term).
HEADLINE += [
    "compiler_set_bag_ops",
    "compiler_order_nulls",
]

# Round-16b M41 registrations: both are joins of accumulator frames —
# the upstream hash-agg pairs dominate; growth is their scan terms.
HEADLINE += [
    "compiler_join_frames",
    "compiler_join_frames_full",
]

# Round-16b M42 registration: scan-stage ILike filter + tiny hash-agg
# pair — growth is the scan term.
HEADLINE += [
    "compiler_ilike_filter",
]

# Round-16b M43 registration: one hash semi join on two correlation
# keys with a filter-bounded, column-pruned build side.
HEADLINE += [
    "compiler_exists_query_corr",
]


def build(spark, src_dir: str, out_dir: str, k: int) -> None:
    from functools import reduce

    from pyspark.sql import functions as F

    from naqed_spark.catalog import load

    os.makedirs(out_dir, exist_ok=True)
    for t in DIMS:
        shutil.copy(f"{src_dir}/{t}.parquet", f"{out_dir}/{t}.parquet")
    for t, keys in FACT_SHIFTS.items():
        base = load(spark, src_dir, t)
        copies = []
        for i in range(k):
            c = base
            for col in keys:
                c = c.withColumn(col, F.col(col) + F.lit(i * SHIFT))
            copies.append(c)
        df = reduce(lambda a, b: a.unionByName(b), copies)
        # 32 files -> the scan is splittable, unlike the driver fixture
        df.repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )


def timed(spark, key: str, sf_dir: str, sink: "str | None" = None) -> float:
    """Best-of-2 warmed wall-clock. Default action is collect() (the
    bench.py method). ``sink`` switches the action to a parquet write —
    the round-11 result-materialization control: queries whose OUTPUT is
    proportional to their input (unpivot, per-row windows, sessionize)
    pay an O(K) driver-funnel serialization under collect() that no real
    pipeline pays (at scale the result goes to a distributed sink, one
    writer per partition). Measured on the same 8x data: collect ratios
    of 3.5-5.0 for that class drop to 0.99-1.15 under the sink action —
    the compute itself scales flat."""
    import shutil as _sh

    from naqed_spark.registry import QUERIES

    def act():
        df = QUERIES[key](spark, sf_dir)
        if sink is None:
            df.collect()
        else:
            df.write.mode("overwrite").parquet(sink)

    act()  # warm-up: plan + codegen
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        act()
        best = min(best, time.monotonic() - t0)
    if sink is not None:
        _sh.rmtree(sink, ignore_errors=True)
    return best


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--sink"]
    use_sink = "--sink" in sys.argv[1:]
    k = int(args[0]) if args else 8
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    scratch = os.environ.get("NAQED_SCRATCH_DIR", tempfile.gettempdir())
    scratch = f"{scratch}/naqed_scale_probe"

    from pyspark.sql import SparkSession

    from naqed_spark.registry import load_all
    from naqed_spark.session import tune_session

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("naqed-scale-probe")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", cpus)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune_session(spark)
    load_all()

    d1, dk = f"{scratch}/x1", f"{scratch}/x{k}"
    build(spark, src, d1, 1)
    build(spark, src, dk, k)

    # The window/sort family's Kx cost is dominated by per-partition sort
    # size; a real cluster scales shuffle-partition count with data. Probe
    # both configurations at Kx so the claim is measured, not asserted:
    # tk uses the 1x partition count, tk_scaled uses partitions × K.
    sink = f"{scratch}/sink_out" if use_sink else None
    # NAQED_PROBE_KEYS=a,b,c probes a subset — the per-round cadence for
    # NEW registrations (VERDICT r13 item 5: the marginal evidence is in
    # first-contact rows; the full table is expensive).
    only = os.environ.get("NAQED_PROBE_KEYS")
    if only:
        wanted = set(only.split(","))
        unknown = sorted(wanted - set(HEADLINE))
        if unknown:
            # A typo must fail loudly, not probe nothing and print a
            # legitimate-looking empty table.
            raise SystemExit(
                f"NAQED_PROBE_KEYS: unknown keys {unknown}"
                f" (known: {sorted(HEADLINE)})"
            )
        keys = [key for key in HEADLINE if key in wanted]
    else:
        keys = HEADLINE
    out = {}
    for key in keys:
        t1 = timed(spark, key, d1, sink)
        tk = timed(spark, key, dk, sink)
        spark.conf.set("spark.sql.shuffle.partitions", str(int(cpus) * k))
        try:
            tks = timed(spark, key, dk, sink)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", cpus)
        out[key] = {"t1": round(t1, 3), "tk": round(tk, 3),
                    "ratio": round(tk / t1, 2),
                    "tk_scaled": round(tks, 3),
                    "ratio_scaled": round(tks / t1, 2)}
    print(json.dumps({"probe": "scaling", "k": k, "cpus": int(cpus),
                      "action": "sink" if use_sink else "collect",
                      "queries": out}))
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
