#!/usr/bin/env python
"""Headline-query benchmark vs BASELINE.md.

Runs the BASELINE-comparable headline queries at ``$SPARK_GRAFT_SF_DIR``
(default ``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints
the summary JSON line::

    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {"agg_groupby_hash": sec, ...}, "sf": 0.1}

Two stdout lines, same shape: the FULL diagnostic payload first, then a
bounded COMPACT summary as the final line — the driver artifact keeps only
the last ~2000 chars of stdout and parses the last JSON line in it, so the
final line must always fit (VERDICT r11 item 7: BENCH_r11's oversized
single line lost its headline block to that cap).

Method mirrors BASELINE.md exactly: one warm SparkSession, each query is
executed once untimed (warm-up: plans compiled, code-gen'd, files footer-read),
then timed once, wall-clock, with a full result fetch (``collect()``).

Two extra diagnostics separate real work from the fixed per-action cost that
dominates sub-100 ms queries at this scale factor (BASELINE.md caveat):

- ``queries_marginal``: best of two further timed runs of the same query —
  the steady-state per-query cost with everything warm.
- ``queries_compile`` / ``queries_exec``: the constant-bound proof carried
  in the artifact itself (round 10): ``compile`` is the cost of building the
  DataFrame and forcing analysis + Catalyst + physical planning (no job;
  for eagerly-checkpointing kernels like the blocked k-NN it includes their
  construction-time jobs), ``exec`` is the best re-collect of ONE prebuilt
  plan — pure execution + action overhead. ``marginal - exec`` is therefore
  the per-fresh-plan constant (planning + codegen + AQE stage re-planning —
  ``compile`` is the planning share of it), and a query whose ``exec`` sits
  at/below ``floor.action`` is constant-bound by inspection of this JSON
  alone.
- ``floor``: the irreducible per-action constants at this SF — ``action``
  (a 2-stage shuffle job over 1 row: pure scheduling + py4j round trip) and
  ``scan_lineitem`` (count() over the biggest input: the fixtures are
  single-row-group parquet, so Spark cannot split the scan below ONE task
  no matter what ``maxPartitionBytes`` says; that single-threaded scan is a
  floor under every lineitem query). Queries whose marginal time sits at
  ``floor.action + floor.scan_lineitem`` are constant-bound, not plan-bound.

Reading exec for row-heavy keys (VERDICT r15 "what's wrong" 2): the timed
action is a full ``collect()``, so keys returning large result sets
(win_sessionize ~95k rows, win_row_number_topk) are RESULT-FETCH-bound —
their exec gap vs DuckDB is py4j serialization of the answer, not plan
shape (windows.py's sessionize is the single-exchange plan you'd want).
Don't chase those gaps in the plan; compare row-light keys instead.

BASELINE rows covered (BASELINE.md "Measured baseline" table):
  agg_groupby_hash            57 ms  (sf0.1)  TPC-H Q1-style pricing summary
  join_q3_shipping_priority   62 ms  (sf0.1)  Q3-style shipping priority
  join_multiway_star          76 ms  (sf0.1)  Q5-style 6-way star join
  win_row_number_topk  249 ms  (sf0.1)   top-3 orders per customer
  win_sessionize       2074 ms (sf0.1)   30-min-gap sessionization
  llm_knn_bruteforce   273.7 s (sf0.1)   brute-force cosine top-5 k-NN
plus two scale-path representatives with no baseline row:
  llm_neardup_lsh      (MinHash banded near-dup — the 100 TB dedup path)
  limit_topk_global    (Q3-ish global top-k via takeOrdered-style plan)

Round 17 (VERDICT r16 item 3, additions-only): ``queries_heavy_exec`` /
``heavy_exec_total`` time a 5-key heavy-computation cohort with the noop
sink (guide §1.4) — the keys where the real per-round exec wins land,
which the collect-based headline suite never times. Existing maps,
timing loops and the headline metric are untouched.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "agg_groupby_hash",
    "join_q3_shipping_priority",
    "join_multiway_star",
    "win_row_number_topk",
    "win_sessionize",
    "limit_topk_global",
    "llm_neardup_lsh",
    "llm_knn_bruteforce",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    from pyspark.sql import SparkSession

    from naqed_spark.registry import QUERIES, load_all
    from naqed_spark.session import tune_session

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("naqed-bench")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", cpus)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tune_session(spark)
    load_all()

    # JVM warm-up action before any timing.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def timed(thunk) -> float:
        t0 = time.perf_counter()
        thunk()
        return round(time.perf_counter() - t0, 3)

    # irreducible per-action constants at this SF (see module docstring)
    floor_action = min(
        timed(lambda: spark.range(1).groupBy("id").count().collect())
        for _ in range(3)
    )
    li = os.path.join(sf_dir, "lineitem.parquet")
    spark.read.parquet(li).count()
    floor_scan = min(
        timed(lambda: spark.read.parquet(li).count()) for _ in range(3)
    )

    per_query: dict[str, float] = {}
    marginal: dict[str, float] = {}
    compile_t: dict[str, float] = {}
    exec_t: dict[str, float] = {}
    for key in HEADLINE:
        try:
            fn = QUERIES[key]
            fn(spark, sf_dir).collect()  # warm: compile + codegen + footer reads
            per_query[key] = timed(lambda: fn(spark, sf_dir).collect())
            marginal[key] = min(
                timed(lambda: fn(spark, sf_dir).collect()) for _ in range(2)
            )
            # Compile/execute decomposition (round 10, VERDICT r9 item 4):
            # every timed run above REBUILDS the DataFrame, so it pays
            # analysis + Catalyst + physical planning afresh each time.
            # ``compile`` forces exactly that pipeline without running a
            # job; ``exec`` re-collects ONE prebuilt plan (QueryExecution
            # cached on the DataFrame), i.e. pure execution + action
            # overhead. marginal - exec is the per-fresh-plan constant
            # (compile is its planning share; the rest is codegen + AQE
            # stage re-planning, forced only by a real run). A query with
            # exec at/below floor.action is constant-bound — provable
            # from this artifact alone.
            compile_t[key] = min(
                timed(
                    lambda: fn(spark, sf_dir)._jdf.queryExecution().executedPlan()
                )
                for _ in range(2)
            )
            df = fn(spark, sf_dir)
            df.collect()
            exec_t[key] = min(timed(df.collect) for _ in range(2))
            print(
                f"# {key}: {per_query[key]:.3f}s"
                f" (marginal {marginal[key]:.3f}s,"
                f" compile {compile_t[key]:.3f}s, exec {exec_t[key]:.3f}s)",
                file=sys.stderr,
            )
        except Exception as ex:  # one broken query must not lose the run
            print(f"# {key}: FAILED {ex}", file=sys.stderr)

    # TPC-H suite diagnostic (round 8): one warmed timing per adapted
    # query — not part of the headline metric (no BASELINE rows exist),
    # but recorded so plan regressions in the suite are driver-visible.
    # Round 11 (VERDICT r10 item 4): the suite carries the same
    # compile/exec decomposition as the headline block, so the 2x-vs-
    # DuckDB comparison closes from the artifact alone — tpch_exec_total
    # is the pure-execution suite time directly comparable to DuckDB's
    # raw suite seconds, with the per-fresh-plan constant separated out.
    tpch: dict[str, float] = {}
    tpch_exec: dict[str, float] = {}
    for key in sorted(k for k in QUERIES if k.startswith("tpch_")):
        try:
            fn = QUERIES[key]
            fn(spark, sf_dir).collect()
            t_full = timed(lambda: fn(spark, sf_dir).collect())
            df = fn(spark, sf_dir)
            df.collect()
            t_exec = min(timed(df.collect) for _ in range(2))
            # assign both only after both measurements succeed, so
            # tpch_total and tpch_exec_total always sum the SAME key
            # set — a late failure must not skew the comparison
            tpch[key] = t_full
            tpch_exec[key] = t_exec
        except Exception as ex:
            print(f"# {key}: FAILED {ex}", file=sys.stderr)

    # r17 (VERDICT r16 item 3, additions-only): heavy-exec cohort — five
    # keys whose real computation the collect-based headline suite never
    # times (LLM dedup/similarity + graph + the Python-boundary UDAF).
    # Timed with the noop sink (guide §1.4: computes every column of
    # every row, no result-fetch skew): ``exec`` is the best-of-2 noop
    # write of ONE prebuilt plan — pure plan execution, directly
    # comparable round over round. Runs AFTER all existing measurements;
    # nothing above is moved or re-timed.
    HEAVY = [
        "llm_ngram_jaccard",
        "llm_knn_ivf",
        "graph_clustering_coefficient",
        "llm_contamination_ngram",
        "udaf_applyinpandas",
    ]

    def _noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    heavy_exec: dict[str, float] = {}
    for key in HEAVY:
        try:
            df = QUERIES[key](spark, sf_dir)
            _noop(df)  # warm: codegen + first exec + intra-query persists
            heavy_exec[key] = min(timed(lambda: _noop(df)) for _ in range(2))
            print(f"# heavy {key}: exec {heavy_exec[key]:.3f}s", file=sys.stderr)
        except Exception as ex:
            print(f"# heavy {key}: FAILED {ex}", file=sys.stderr)

    total = round(sum(per_query.values()), 3)
    # floor-normalized views (VERDICT r3 item 4): BENCH_r03's 31 s headline
    # was a contended machine, not code — the floor measurements are the
    # tell (idle: action ~0.21 s, scan ~0.33 s; contended: 2-3x that).
    # value_minus_floor subtracts the per-action constant from each query's
    # steady-state marginal so contended runs stay comparable, and
    # "contended" flags a floor that sits far above the idle reference.
    total_marginal = round(sum(marginal.values()), 3)
    minus_floor = round(
        sum(max(0.0, m - floor_action) for m in marginal.values()), 3
    )
    # Artifact discipline (VERDICT r11 item 7): the driver keeps only the
    # LAST ~2000 chars of stdout and parses the last JSON line it finds
    # there — BENCH_r11's single ever-growing line blew that budget and
    # the artifact lost its headline `queries` block (parsed: null). So:
    # the FULL diagnostic payload goes out first (complete in the raw
    # stream and in any tail that still covers it), and a bounded COMPACT
    # summary — headline metric + per-query walls + pure-exec + floors +
    # TPC-H totals — is always the final line, guaranteed to fit the tail.
    full = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "queries_marginal": marginal,
        "queries_compile": compile_t,
        "queries_exec": exec_t,
        "value_marginal": total_marginal,
        "value_minus_floor": minus_floor,
        "floor": {"action": floor_action, "scan_lineitem": floor_scan},
        "contended": floor_action > 0.35 or floor_scan > 0.6,
        "queries_tpch": tpch,
        "queries_tpch_exec": tpch_exec,
        "tpch_total": round(sum(tpch.values()), 3),
        "tpch_exec_total": round(sum(tpch_exec.values()), 3),
        "queries_heavy_exec": heavy_exec,
        "heavy_exec_total": round(sum(heavy_exec.values()), 3),
        "sf": sf,
    }
    print(json.dumps(full))
    # The compact tail line keeps the contract-required ``queries`` map
    # (single-shot walls — the driver parses the last JSON line and the
    # round contract names this key) AND ``queries_marginal`` (VERDICT r15
    # item 5: marginal is best-of-2, so a per-key wall outlier — the r15
    # knn 3.4 s case — is self-diagnosing from the artifact alone). The
    # full payload above still carries every map.
    compact = {
        k: full[k]
        for k in (
            "metric", "value", "unit", "queries", "queries_marginal",
            "queries_exec", "queries_heavy_exec", "value_marginal",
            "value_minus_floor", "floor",
            "contended", "tpch_total", "tpch_exec_total",
            "heavy_exec_total", "sf",
        )
    }
    line = json.dumps(compact)
    if len(line) > 1900:  # never regress the tail budget again
        for drop in ("queries_heavy_exec", "queries_exec", "queries_marginal"):
            compact.pop(drop, None)
            line = json.dumps(compact)
            if len(line) <= 1900:
                break
    if len(line) > 1900:
        # last-ditch guard (ADVICE r12): if future scalar blocks inflate
        # the line past the tail budget even with both maps dropped,
        # emit the minimal parseable artifact rather than an oversized
        # line the driver's ~2000-char tail would truncate mid-JSON.
        line = json.dumps(
            {"metric": "headline_total", "value": total, "unit": "sec",
             "sf": sf}
        )
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
