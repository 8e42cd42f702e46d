"""Query registry: the single source of truth wiring SURVEY.md §2 keys to
(a) a PySpark implementation callable and (b) its DuckDB oracle SQL twin.

``__spark_entry__.queries()`` / ``oracle_sql()`` read straight from here, as
does the local pre-verification harness (tests/test_oracle.py), so a key is
implemented exactly once and checked identically locally and by the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
ROWS_ONLY: set[str] = set()  # keys deliberately without a SQL oracle (SURVEY §2)


def query(key: str, oracle: Optional[str] = None, rows_only: bool = False):
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``key``.

    ``oracle`` is the DuckDB ANSI-SQL twin (tables pre-registered as views).
    ``rows_only=True`` declares the weaker rows-only driver check is by
    design (approx/stateful/sink ops — SURVEY.md §2 pre-declares these).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key {key!r}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = " ".join(oracle.split())
        elif rows_only:
            ROWS_ONLY.add(key)
        else:
            raise ValueError(f"{key!r}: provide oracle SQL or set rows_only=True")
        return fn

    return deco


# Driver-facing key order. The driver's correctness harness walks keys in
# the order ``queries()`` yields them and checks exactly the first 50, so
# keys with the OLDEST (or no) driver signal go first. Round-7 rotation
# (VERDICT r6 items 2+6): the brand-new r7 compiler keys, then the
# staleness queue oldest-first — the r2-era remainder r6's window did NOT
# reach (agg_string_concat_ordered, scalar fns, graph core), then the
# r3-era keys (windows, streaming, llm, udfs). The 30 r2-era keys r6's
# window DID re-verify (filters/projection, core joins, core aggs —
# CORRECTNESS_r06 keys 21-50) rotate to the back with everything else
# re-verified r4–r6.
# NOTE for round 8: the 60 session-2 keys (registered after this list —
# they appear in ordered_keys() AFTER the PRIORITY block, in registration
# order) have sf0.001+sf0.01+sf0.1 local oracle evidence but NO driver
# signal yet; they should lead round 8's PRIORITY, followed by the r3-era
# staleness remainder (the llm tail + udfs below).
PRIORITY: list[str] = [
    # round-7 additions — brand new, need first driver contact
    "compiler_set_ops", "compiler_exists_child",
    "source_csv_roundtrip", "source_json_roundtrip",
    "ts_gaps_islands", "ts_scd2_ranges", "ts_ewma_bounded",
    "join_lateral_topn", "fn_regex", "sink_merge_upsert",
    "compiler_agg_having", "fn_url", "join_dpp_partition_pruned",
    "join_runtime_bloom_filter", "llm_bm25_score", "ts_interval_merge",
    "ts_rollup_incremental_merge", "llm_unigram_logprob",
    "llm_mixture_sample", "llm_length_filter_percentile", "sub_any_all",
    "fn_struct", "sink_sorted_clustered", "llm_semdedup_cluster",
    "llm_vocab_coverage", "join_null_safe", "compiler_params",
    "llm_shuffle_shard", "llm_perplexity_bucket",
    # last driver signal r2 (missed r6's window): ordered string agg
    "agg_string_concat_ordered",
    # last driver signal r2 (missed r6's window): scalar functions
    "fn_string", "fn_date", "fn_math", "fn_conditional", "fn_array",
    "fn_explode", "fn_map", "fn_json", "fn_cast",
    # last driver signal r2 (missed r6's window): graph
    "graph_degree", "graph_1hop", "graph_2hop", "graph_khop_fixed",
    "graph_reachability_bfs", "graph_shortest_path_weighted",
    "graph_connected_components", "graph_pagerank_fixed",
    "graph_triangle_count", "graph_aggregate_messages",
    # last driver signal r3: windows
    "win_row_number_topk", "win_rank_dense", "win_ntile", "win_lag_lead",
    "win_running_sum", "win_moving_avg", "win_range_frame",
    "win_percent_cume", "win_first_last_nth",
    # last driver signal r3: streaming
    "stream_session_window", "stream_watermark_late_drop", "stream_dedup",
    "stream_static_join", "stream_foreachbatch_sink", "stream_complete_topk",
    "stream_stream_join", "source_stream_events",
    # last driver signal r3: llm pipeline (first 17 fit round 7's window;
    # the remainder + udfs lead round 8's)
    "llm_exact_dedup", "llm_tokenize_wordcount", "llm_tfidf",
    "llm_shingle_minhash", "llm_neardup_lsh", "llm_knn_bruteforce",
    "llm_knn_centroid", "llm_embed_normalize",
    "llm_similarity_threshold_join", "llm_multimodal_struct", "llm_simhash",
    "llm_quality_score", "llm_knn_ivf", "llm_multimodal_binary",
    "llm_ngram_jaccard", "llm_pii_scrub", "llm_dedup_groups",
    "llm_simhash_neardup", "llm_chunk_windows", "llm_train_split",
    "llm_tokenize_bpe_regex",
    # last driver signal r3: UDF surface
    "udf_python_scalar", "udf_pandas_vectorized", "udaf_applyinpandas",
    "udtf_python", "udf_arrow_optimized",
    # re-verified in r6's window (CORRECTNESS_r06): filters/projection,
    # core joins, core aggregations — freshest of the old guard
    "project_select_alias", "filter_comparison", "filter_boolean_logic",
    "filter_in_between_like", "filter_null_semantics", "project_distinct",
    "filter_dynamic_args",
    "join_inner_equi", "join_broadcast", "join_left_outer", "join_full_outer",
    "join_left_semi", "join_left_anti", "join_cross", "join_theta_range",
    "agg_global", "agg_groupby_hash", "agg_count_distinct",
    "agg_approx_count_distinct", "agg_having", "agg_filtered", "agg_rollup",
    "agg_cube", "agg_grouping_sets", "agg_stats", "agg_percentile_exact",
    "agg_collect_set", "agg_min_max_by", "agg_pivot", "agg_unpivot",
]


def ordered_keys() -> list[str]:
    """All registered keys, PRIORITY first, the rest in registration order."""
    prio = [k for k in PRIORITY if k in QUERIES]
    rest = [k for k in QUERIES if k not in set(prio)]
    return prio + rest


def load_all() -> None:
    """Import every query module so registration side effects run."""
    import naqed_spark.queries  # noqa: F401
