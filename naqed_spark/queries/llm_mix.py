"""Corpus-composition operators, round 7: deterministic dataset-mixture
sampling and per-language length-percentile filtering (SURVEY.md §2-K).

Both are standard knobs in a pretraining data pipeline:

- ``llm_mixture_sample`` — rebalance the language mixture by
  deterministically downsampling over-represented languages (the
  DoReMi/Pile-style mixture weight applied at the data layer). The keep
  decision is a pure function of the doc id (md5 bucket vs a per-language
  integer threshold), so it is stable across engines, runs, partitionings,
  and cluster sizes, and the sample of a join is the join of the samples.
  Plan shape: one scan, one codegen filter — NO shuffle, NO randomness.
  At 100 TB this is a map-only pass; rand()-based sampling would be
  neither reproducible nor key-consistent.
- ``llm_length_filter_percentile`` — drop length outliers per language:
  keep docs whose n_chars lies within the integer envelope
  [ceil(p5), floor(p95)] of their language's length distribution. Two
  scans: a tiny per-language bounds aggregate (5 rows) broadcast back
  into a codegen filter. The bounds are rounded to 6 decimals before the
  int envelope is taken so a sub-ulp interpolation difference between
  engines cannot flip a boundary. At 100 TB swap the exact percentile
  for approx_percentile(…, 10000) — same plan shape, documented ±0.01%%
  rank tolerance; exact is used here so the oracle can hash-match.

No reference file:line possible — ``/root/reference`` is empty (SURVEY.md
§0); keys extend the §2-K training-data toolkit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from naqed_spark.queries._util import load
from naqed_spark.registry import query

# Per-language keep thresholds out of 256 md5 buckets: downsample English
# to ~40% and Chinese to ~80%, keep the rest whole. Integer thresholds so
# the compare is int-vs-int in both engines.
_MIX_CASE_SQL = (
    "CASE lang WHEN 'en' THEN 102 WHEN 'zh' THEN 205 ELSE 256 END"
)
# 0-255 bucket from the first two md5 hex digits of the doc id — the same
# engine-stable construction llm_train_split uses (llm_dedup.py).
_BUCKET_SQL = (
    "((instr('0123456789abcdef',"
    " {substr}(md5(CAST(doc_id AS {vt})), 1, 1)) - 1) * 16"
    " + instr('0123456789abcdef',"
    " {substr}(md5(CAST(doc_id AS {vt})), 2, 1)) - 1)"
)


@query(
    "llm_mixture_sample",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_BUCKET_SQL.format(substr="substr", vt="VARCHAR")}
          < {_MIX_CASE_SQL}
    """,
)
def llm_mixture_sample(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    bucket = F.expr(_BUCKET_SQL.format(substr="substring", vt="STRING"))
    return d.filter(bucket < F.expr(_MIX_CASE_SQL)).select(
        "doc_id", "lang", "source"
    )


@query(
    "llm_length_filter_percentile",
    oracle="""
    WITH b AS (
      SELECT lang,
             CAST(ceil(round(quantile_cont(n_chars, 0.05), 6)) AS BIGINT) AS lo,
             CAST(floor(round(quantile_cont(n_chars, 0.95), 6)) AS BIGINT) AS hi
      FROM documents GROUP BY lang)
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d JOIN b USING (lang)
    WHERE d.n_chars BETWEEN b.lo AND b.hi
    """,
)
def llm_length_filter_percentile(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    bounds = d.groupBy("lang").agg(
        F.ceil(F.round(F.expr("percentile(n_chars, 0.05)"), 6)).alias("lo"),
        F.floor(F.round(F.expr("percentile(n_chars, 0.95)"), 6)).alias("hi"),
    )
    return (
        d.join(F.broadcast(bounds), "lang")
        .filter(F.col("n_chars").between(F.col("lo"), F.col("hi")))
        .select("doc_id", "lang", "n_chars")
    )
