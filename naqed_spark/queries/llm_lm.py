"""Corpus language-model statistics (round 8): bigram-LM document
scoring, int8 embedding quantization, Zipf power-law fit, and hapax
vocabulary health — the model-side complements to the unigram scorer
(llm_ext.llm_unigram_logprob) and the corpus-health rollup.

Scale doctrine: every operator is a constant number of token-level or
vector-level aggregates with map-side combine; LM vocabularies and
scalar fit results travel as broadcasts; nothing collects to the driver.
Determinism: counts stay exact integers end to end; ln/avg/regression
outputs carry the round(6) libm hedge (_util docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from naqed_spark.queries._util import load, r6
from naqed_spark.registry import query

_TOKS_SQL = """
  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS tok
  FROM documents
"""


@query(
    "llm_bigram_logprob",
    # Add-one-smoothed bigram LM trained on the corpus itself, scoring
    # every document: mean over its bigrams of
    # ln((c(w1,w2)+1)/(c(w1)+V)). The fluency signal one step up from
    # unigram NLL — repeated-boilerplate docs score high, shuffled-word
    # docs score low, which the unigram model cannot distinguish.
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    big AS (
      SELECT doc_id, tok AS w1,
             lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM toks
    ), bo AS (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL),
    uni AS (SELECT tok, count(*) AS c1 FROM toks GROUP BY tok),
    bc  AS (SELECT w1, w2, count(*) AS c2 FROM bo GROUP BY w1, w2),
    v   AS (SELECT CAST(count(*) AS DOUBLE) AS vocab FROM uni)
    SELECT bo.doc_id, count(*) AS n_bigrams,
           round(avg(ln((bc.c2 + 1.0) / (uni.c1 + v.vocab))), 6)
             AS mean_ll
    FROM bo
    JOIN bc  ON bc.w1 = bo.w1 AND bc.w2 = bo.w2
    JOIN uni ON uni.tok = bo.w1
    CROSS JOIN v
    GROUP BY bo.doc_id
    """,
)
def llm_bigram_logprob(spark, sf_dir):
    """One tokenize pass feeds three aggregates (bigram occurrences via a
    per-doc lead window, bigram counts, unigram counts) that all combine
    map-side; the vocab size is a 1-row broadcast. The scoring join
    shuffles occurrences and counts on the same bigram key once —
    state is vocabulary-sized, never corpus-sized."""
    from pyspark.sql import Window

    toks = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "tok"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bo = (
        toks.withColumn("w2", F.lead("tok").over(w))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", F.col("tok").alias("w1"), "w2")
    )
    uni = toks.groupBy("tok").agg(F.count("*").alias("c1"))
    bc = (
        bo.groupBy(F.col("w1").alias("b1"), F.col("w2").alias("b2"))
        .agg(F.count("*").alias("c2"))
    )
    v = uni.agg(F.count("*").cast("double").alias("vocab"))
    return (
        bo.join(bc, (bo["w1"] == bc["b1"]) & (bo["w2"] == bc["b2"]))
        .join(uni, bo["w1"] == uni["tok"])
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            r6(
                F.avg(
                    F.log(
                        (F.col("c2") + F.lit(1.0))
                        / (F.col("c1") + F.col("vocab"))
                    )
                )
            ).alias("mean_ll"),
        )
    )


@query(
    "llm_embedding_quantize_int8",
    # Symmetric per-vector int8 quantization — the product-quantization /
    # storage-compression building block for ANN at scale: scale =
    # 127/max|x|, q = floor(x*scale + 0.5) (floor is exact on both
    # engines where round-half ties are not), reconstruction = q/scale.
    # The integer checksums (sum q, sum |q|) are hash-exact evidence the
    # quantized codes match bit-for-bit; the max reconstruction error is
    # the quality metric.
    oracle="""
    WITH vals AS (
      SELECT vec_id,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE)))
               AS v
      FROM embeddings
    ), sc AS (
      SELECT vec_id, 127.0 / max(abs(v)) AS scale FROM vals
      GROUP BY vec_id HAVING max(abs(v)) > 0
    )
    SELECT vals.vec_id,
           round(sc.scale, 6) AS scale_r,
           CAST(SUM(CAST(floor(v * sc.scale + 0.5) AS BIGINT)) AS BIGINT)
             AS qsum,
           CAST(SUM(abs(CAST(floor(v * sc.scale + 0.5) AS BIGINT)))
                AS BIGINT) AS q_l1,
           round(max(abs(v - floor(v * sc.scale + 0.5) / sc.scale)), 6)
             AS max_abs_err
    FROM vals JOIN sc ON vals.vec_id = sc.vec_id
    GROUP BY vals.vec_id, sc.scale
    """,
)
def llm_embedding_quantize_int8(spark, sf_dir):
    """Pure JVM-side array math: the per-vector max and the quantize +
    checksum pass are two codegen aggregates over exploded values that
    re-group on vec_id (one exchange, reused). At 100 TB this is the
    compression sweep that runs before ANN index build — no Python, no
    driver state."""
    vals = (
        load(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.explode(
                F.expr("transform(embedding, x -> cast(x as double))")
            ).alias("v"),
        )
    )
    sc = (
        vals.groupBy("vec_id")
        .agg(F.max(F.abs("v")).alias("mx"))
        .filter(F.col("mx") > 0)
        .select("vec_id", (F.lit(127.0) / F.col("mx")).alias("scale"))
        .withColumnRenamed("vec_id", "sc_vec_id")
    )
    q = F.floor(F.col("v") * F.col("scale") + F.lit(0.5)).cast("bigint")
    return (
        vals.join(sc, vals["vec_id"] == sc["sc_vec_id"])
        .groupBy("vec_id", "scale")
        .agg(
            F.sum(q).cast("bigint").alias("qsum"),
            F.sum(F.abs(q)).cast("bigint").alias("q_l1"),
            r6(
                F.max(F.abs(F.col("v") - q / F.col("scale")))
            ).alias("max_abs_err"),
        )
        .select(
            "vec_id",
            r6(F.col("scale")).alias("scale_r"),
            "qsum",
            "q_l1",
            "max_abs_err",
        )
    )


@query(
    "llm_zipf_fit",
    # Zipf power-law fit over the top-100 word frequencies: slope and
    # intercept of ln(freq) ~ ln(rank) by least squares. Natural corpora
    # sit near slope -1; synthetic or template-heavy corpora flatten —
    # the corpus-level naturalness check (per-doc twin: word entropy).
    # Rank ties break by token text so the rank assignment is a total
    # order on both engines.
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
    top AS (
      SELECT cnt,
             row_number() OVER (ORDER BY cnt DESC, tok) AS rank
      FROM freq ORDER BY cnt DESC, tok LIMIT 100
    )
    SELECT CAST(count(*) AS BIGINT) AS n_points,
           round(regr_slope(ln(CAST(cnt AS DOUBLE)),
                            ln(CAST(rank AS DOUBLE))), 6) AS slope,
           round(regr_intercept(ln(CAST(cnt AS DOUBLE)),
                                ln(CAST(rank AS DOUBLE))), 6) AS intercept
    FROM top
    """,
)
def llm_zipf_fit(spark, sf_dir):
    """The frequency table aggregates map-side; the top-100 is
    TakeOrdered (per-partition heaps — the vocabulary is never globally
    sorted); ranking + regression then run on a 100-row frame, so the
    single-partition window is bounded by the constant k, not the
    corpus."""
    from pyspark.sql import Window

    toks = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    top = freq.orderBy(F.col("cnt").desc(), "tok").limit(100)
    ranked = top.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), "tok"))
        .alias("rank"),
    )
    y = F.log(F.col("cnt").cast("double"))
    x = F.log(F.col("rank").cast("double"))
    return ranked.agg(
        F.count("*").cast("bigint").alias("n_points"),
        r6(F.regr_slope(y, x)).alias("slope"),
        r6(F.regr_intercept(y, x)).alias("intercept"),
    )


@query(
    "llm_hapax_ratio",
    # Per-language vocabulary health: vocabulary size, hapax legomena
    # (words occurring once), the hapax share, and total tokens. High
    # hapax share = rich/noisy long tail (OCR garbage also lands here);
    # low = template repetition. All-integer until the single exact
    # division.
    oracle=f"""
    WITH toks AS (
      SELECT d.lang, t.tok
      FROM ({_TOKS_SQL}) t JOIN documents d ON d.doc_id = t.doc_id
    ), wf AS (
      SELECT lang, tok, count(*) AS cnt FROM toks GROUP BY 1, 2
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax,
           CAST(sum(cnt) AS BIGINT) AS total_tokens,
           round(CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS hapax_share
    FROM wf GROUP BY lang ORDER BY lang
    """,
)
def llm_hapax_ratio(spark, sf_dir):
    """One tokenize pass, one (lang, token) aggregate with map-side
    combine, one language-grid rollup — state is vocabulary-sized and
    the language key keeps the final group tiny at any corpus size."""
    toks = (
        load(spark, sf_dir, "documents")
        .select("lang", F.explode(F.split("text", " ")).alias("tok"))
    )
    wf = toks.groupBy("lang", "tok").agg(F.count("*").alias("cnt"))
    hap = F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
    return (
        wf.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("vocab"),
            hap.cast("bigint").alias("hapax"),
            F.sum("cnt").cast("bigint").alias("total_tokens"),
            r6(hap.cast("double") / F.count("*")).alias("hapax_share"),
        )
        .orderBy("lang")
    )


@query(
    "llm_js_divergence",
    # Jensen-Shannon divergence (nats) between the token distributions
    # of every language pair — the corpus-drift / source-similarity
    # matrix. Zero-frequency terms contribute 0 by JSD's own definition
    # (no smoothing needed); every p, q, m is an exact integer ratio so
    # each term is engine-identical and only the vocabulary-sized sum
    # order differs → round(6) hedge.
    oracle=f"""
    WITH toks AS (
      SELECT d.lang, t.tok
      FROM ({_TOKS_SQL}) t JOIN documents d ON d.doc_id = t.doc_id
    ), wf AS (
      SELECT lang, tok, count(*) AS cnt FROM toks GROUP BY 1, 2
    ), tot AS (
      SELECT lang, CAST(sum(cnt) AS DOUBLE) AS t FROM wf GROUP BY 1
    ), pairs AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b
      FROM tot a JOIN tot b ON a.lang < b.lang
    ), grid AS (
      SELECT p.lang_a, p.lang_b, v.tok,
             coalesce(wa.cnt, 0) / ta.t AS pa,
             coalesce(wb.cnt, 0) / tb.t AS pb
      FROM pairs p
      CROSS JOIN (SELECT DISTINCT tok FROM wf) v
      JOIN tot ta ON ta.lang = p.lang_a
      JOIN tot tb ON tb.lang = p.lang_b
      LEFT JOIN wf wa ON wa.lang = p.lang_a AND wa.tok = v.tok
      LEFT JOIN wf wb ON wb.lang = p.lang_b AND wb.tok = v.tok
    )
    SELECT lang_a, lang_b,
           round(sum(
             CASE WHEN pa > 0
                  THEN 0.5 * pa * ln(pa / ((pa + pb) / 2)) ELSE 0 END
           + CASE WHEN pb > 0
                  THEN 0.5 * pb * ln(pb / ((pa + pb) / 2)) ELSE 0 END),
             6) AS jsd
    FROM grid GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def llm_js_divergence(spark, sf_dir):
    """The (lang, token) frequency table is built once; the pair grid is
    |langs|²/2 × vocab — vocabulary-sized state fanned out by a
    broadcast pair list, never corpus-sized. Per-language totals ride
    along as a broadcast. At 100 TB the token agg is the only wide
    shuffle; the JSD matrix itself is grid-sized."""
    toks = (
        load(spark, sf_dir, "documents")
        .select("lang", F.explode(F.split("text", " ")).alias("tok"))
    )
    wf = toks.groupBy("lang", "tok").agg(F.count("*").alias("cnt"))
    tot = wf.groupBy("lang").agg(F.sum("cnt").cast("double").alias("t"))
    pairs = (
        tot.select(F.col("lang").alias("lang_a"))
        .join(
            tot.select(F.col("lang").alias("lang_b")),
            F.col("lang_a") < F.col("lang_b"),
        )
    )
    vocab = wf.select("tok").distinct()
    wa = wf.select(
        F.col("lang").alias("wa_lang"),
        F.col("tok").alias("wa_tok"),
        F.col("cnt").alias("ca"),
    )
    wb = wf.select(
        F.col("lang").alias("wb_lang"),
        F.col("tok").alias("wb_tok"),
        F.col("cnt").alias("cb"),
    )
    ta = tot.select(F.col("lang").alias("ta_lang"), F.col("t").alias("ta"))
    tb = tot.select(F.col("lang").alias("tb_lang"), F.col("t").alias("tb"))
    grid = (
        F.broadcast(pairs)
        .crossJoin(vocab)
        .join(ta, F.col("lang_a") == F.col("ta_lang"))
        .join(tb, F.col("lang_b") == F.col("tb_lang"))
        .join(
            wa,
            (F.col("wa_lang") == F.col("lang_a"))
            & (F.col("wa_tok") == F.col("tok")),
            "left",
        )
        .join(
            wb,
            (F.col("wb_lang") == F.col("lang_b"))
            & (F.col("wb_tok") == F.col("tok")),
            "left",
        )
        .select(
            "lang_a",
            "lang_b",
            (F.coalesce(F.col("ca"), F.lit(0)) / F.col("ta")).alias("pa"),
            (F.coalesce(F.col("cb"), F.lit(0)) / F.col("tb")).alias("pb"),
        )
    )
    m = (F.col("pa") + F.col("pb")) / 2
    term = F.when(
        F.col("pa") > 0, 0.5 * F.col("pa") * F.log(F.col("pa") / m)
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("pb") > 0, 0.5 * F.col("pb") * F.log(F.col("pb") / m)
    ).otherwise(F.lit(0.0))
    return (
        grid.groupBy("lang_a", "lang_b")
        .agg(r6(F.sum(term)).alias("jsd"))
        .orderBy("lang_a", "lang_b")
    )


@query(
    "llm_collocation_pmi",
    # Top-20 bigram collocations by pointwise mutual information —
    # the phrase-mining primitive (vocabulary building for tokenizers,
    # stop-phrase lists). PMI = ln(p(w1,w2)/(p(w1)p(w2))) with a min
    # support of 5; every probability is an exact integer ratio so each
    # PMI input is engine-identical, and the ranking orders by the
    # ROUNDED score with a (w1, w2) tiebreak — a total order stable
    # against libm's last-ulp ln differences.
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    big AS (
      SELECT doc_id, tok AS w1,
             lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM toks
    ), bo AS (SELECT w1, w2 FROM big WHERE w2 IS NOT NULL),
    uni AS (SELECT tok, count(*) AS c1 FROM toks GROUP BY tok),
    bc  AS (SELECT w1, w2, count(*) AS c2 FROM bo GROUP BY w1, w2),
    n   AS (
      SELECT CAST((SELECT count(*) FROM bo) AS DOUBLE) AS nb,
             CAST((SELECT count(*) FROM toks) AS DOUBLE) AS nu
    )
    SELECT w1, w2, c2,
           round(ln((bc.c2 / n.nb)
                    / ((ua.c1 / n.nu) * (ub.c1 / n.nu))), 6) AS pmi
    FROM bc
    JOIN uni ua ON ua.tok = bc.w1
    JOIN uni ub ON ub.tok = bc.w2
    CROSS JOIN n
    WHERE c2 >= 5
    ORDER BY pmi DESC, w1, w2 LIMIT 20
    """,
)
def llm_collocation_pmi(spark, sf_dir):
    """Bigram and unigram counts combine map-side; the scoring join
    shuffles the vocabulary-sized count tables, the corpus totals ride
    as a 1-row broadcast, and the top-20 is TakeOrderedAndProject over
    the scored bigram table — never a global sort."""
    from pyspark.sql import Window

    toks = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "tok"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bo = (
        toks.withColumn("w2", F.lead("tok").over(w))
        .filter(F.col("w2").isNotNull())
        .select(F.col("tok").alias("w1"), "w2")
    )
    uni = toks.groupBy("tok").agg(F.count("*").alias("c1"))
    bc = bo.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    n = bo.agg(
        F.count("*").cast("double").alias("nb")
    ).crossJoin(toks.agg(F.count("*").cast("double").alias("nu")))
    ua = uni.select(F.col("tok").alias("ua_tok"), F.col("c1").alias("ca"))
    ub = uni.select(F.col("tok").alias("ub_tok"), F.col("c1").alias("cb"))
    return (
        bc.filter(F.col("c2") >= 5)
        .join(ua, F.col("w1") == F.col("ua_tok"))
        .join(ub, F.col("w2") == F.col("ub_tok"))
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c2",
            r6(
                F.log(
                    (F.col("c2") / F.col("nb"))
                    / (
                        (F.col("ca") / F.col("nu"))
                        * (F.col("cb") / F.col("nu"))
                    )
                )
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(20)
    )


@query(
    "llm_source_concentration",
    # Source-concentration curve for corpus governance: per source the
    # doc share and the cumulative share in popularity order (docs desc,
    # source asc), plus the top-80% membership flag — the "how few
    # sources dominate the corpus" release check. All-integer until the
    # per-row exact divisions.
    oracle="""
    WITH s AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY source
    ), t AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS tot FROM s),
    c AS (
      SELECT source, n_docs, n_chars, tot,
             SUM(n_docs) OVER (ORDER BY n_docs DESC, source
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM s CROSS JOIN t
    )
    SELECT source, n_docs, n_chars,
           round(n_docs / tot, 6) AS share,
           round(cum / tot, 6) AS cum_share,
           CAST(cum / tot <= 0.8 AS BOOLEAN) AS in_top80
    FROM c ORDER BY n_docs DESC, source
    """,
)
def llm_source_concentration(spark, sf_dir):
    """The only window runs over the SOURCE GRID (|sources| rows — the
    per-doc work is one map-side-combined count), so the unpartitioned
    cumulative sum is bounded by the catalog of sources, not the
    corpus."""
    from pyspark.sql import Window

    s = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
    )
    t = s.agg(F.sum("n_docs").cast("double").alias("tot"))
    w = Window.orderBy(F.col("n_docs").desc(), "source").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        s.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n_docs",
            "n_chars",
            r6(F.col("n_docs") / F.col("tot")).alias("share"),
            r6(F.sum("n_docs").over(w) / F.col("tot")).alias("cum_share"),
            (F.sum("n_docs").over(w) / F.col("tot") <= 0.8).alias(
                "in_top80"
            ),
        )
        .orderBy(F.col("n_docs").desc(), "source")
    )


@query(
    "llm_knn_label_eval",
    # Majority-vote k-NN classification accuracy per label — the EVAL
    # half of the similarity-search family: each vector's 5 neighbors
    # (from the verified llm_knn_bruteforce kernel) vote with their
    # labels; ties break (count desc, label asc) so the prediction is a
    # total order on both engines; accuracy is exact-integer counts and
    # one exact division.
    oracle="""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
             sqrt(list_dot_product(list_transform(embedding,
                  x -> CAST(x AS DOUBLE)),
                  list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS src, a.label AS true_label, b.label AS nbr_label,
             row_number() OVER (PARTITION BY a.vec_id
               ORDER BY round(list_dot_product(a.e, b.e)
                              / (a.nrm * b.nrm), 6) DESC, b.vec_id ASC)
               AS rnk
      FROM v a JOIN v b ON a.vec_id <> b.vec_id
    ), votes AS (
      SELECT src, true_label, nbr_label, count(*) AS c
      FROM pairs WHERE rnk <= 5 GROUP BY 1, 2, 3
    ), pick AS (
      SELECT src, true_label, nbr_label AS pred,
             row_number() OVER (PARTITION BY src
                                ORDER BY c DESC, nbr_label ASC) AS pr
      FROM votes
    )
    SELECT true_label AS label,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN pred = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           round(sum(CASE WHEN pred = true_label THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS accuracy
    FROM pick WHERE pr = 1
    GROUP BY true_label ORDER BY true_label
    """,
)
def llm_knn_label_eval(spark, sf_dir):
    """Reuses the blocked-broadcast knn kernel (no second O(n²) path to
    maintain); the vote + argmax is two vec_id-partitioned aggregates
    and the final rollup is label-grid-sized. The eval that tells you
    whether the embedding space is worth indexing."""
    from pyspark.sql import Window

    from naqed_spark.queries.llm import llm_knn_bruteforce

    knn = llm_knn_bruteforce(spark, sf_dir).select("src", "nbr")
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    tl = emb.select(
        F.col("vec_id").alias("t_id"), F.col("label").alias("true_label")
    )
    nl = emb.select(
        F.col("vec_id").alias("n_id"), F.col("label").alias("nbr_label")
    )
    votes = (
        knn.join(tl, knn["src"] == tl["t_id"])
        .join(nl, knn["nbr"] == nl["n_id"])
        .groupBy("src", "true_label", "nbr_label")
        .agg(F.count("*").alias("c"))
    )
    pick = votes.withColumn(
        "pr",
        F.row_number().over(
            Window.partitionBy("src").orderBy(
                F.col("c").desc(), F.col("nbr_label").asc()
            )
        ),
    ).filter(F.col("pr") == 1)
    correct = F.sum(
        F.when(F.col("nbr_label") == F.col("true_label"), 1).otherwise(0)
    )
    return (
        pick.groupBy(F.col("true_label").alias("label"))
        .agg(
            F.count("*").cast("bigint").alias("n_queries"),
            correct.cast("bigint").alias("n_correct"),
            r6(correct / F.count("*").cast("double")).alias("accuracy"),
        )
        .orderBy("label")
    )


from naqed_spark.queries.llm_ext import _IVF_SQL  # noqa: E402


@query(
    "llm_ivf_recall_at_k",
    # Recall@3 of the IVF index vs exact brute force — the accuracy/cost
    # dial every ANN deployment tunes (nprobe up -> recall up, candidates
    # up). Composes the two VERIFIED kernels; the score is exact-integer
    # hit counts over the two top-3 sets, recall = hits/(3n) in ONE
    # exact division (never a mean of per-query thirds — 1/3 is not
    # dyadic and a summed mean would be order-sensitive).
    oracle=f"""
    WITH {_IVF_SQL},
    assigned AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
    probes AS (SELECT vec_id, cell FROM ranked WHERE rn <= 2),
    v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
             sqrt(list_dot_product(
                  list_transform(embedding, x -> CAST(x AS DOUBLE)),
                  list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ),
    ivf AS (
      SELECT src, nbr FROM (
        SELECT c.src, c.nbr,
               row_number() OVER (PARTITION BY c.src
                 ORDER BY round(list_dot_product(va.e, vb.e)
                                / (va.nrm * vb.nrm), 6) DESC,
                          c.nbr ASC) AS rnk
        FROM (SELECT p.vec_id AS src, a.vec_id AS nbr
              FROM probes p JOIN assigned a ON p.cell = a.cell
              WHERE p.vec_id <> a.vec_id) c
        JOIN v va ON va.vec_id = c.src
        JOIN v vb ON vb.vec_id = c.nbr
      ) WHERE rnk <= 3
    ),
    bf AS (
      SELECT src, nbr FROM (
        SELECT a.vec_id AS src, b.vec_id AS nbr,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY round(list_dot_product(a.e, b.e)
                                / (a.nrm * b.nrm), 6) DESC,
                          b.vec_id ASC) AS rnk
        FROM v a JOIN v b ON a.vec_id <> b.vec_id
      ) WHERE rnk <= 3
    ),
    hits AS (
      SELECT bf.src, count(*) AS h
      FROM bf JOIN ivf ON bf.src = ivf.src AND bf.nbr = ivf.nbr
      GROUP BY bf.src
    ), n AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS nq FROM bf)
    SELECT n.nq AS n_queries,
           CAST(coalesce(sum(h), 0) AS BIGINT) AS total_hits,
           round(coalesce(sum(h), 0) / (3.0 * n.nq), 6) AS recall_at_3,
           CAST(count(CASE WHEN h = 3 THEN 1 END) AS BIGINT) AS n_perfect
    FROM n LEFT JOIN hits ON TRUE
    GROUP BY n.nq
    """,
)
def llm_ivf_recall_at_k(spark, sf_dir):
    """Both sides come from the already-verified kernels (blocked
    broadcast for brute force, cell-join for IVF) — this key adds only
    an equi-join on (query, neighbor) and a grid-sized rollup, so the
    recall measurement costs one extra shuffle over the two top-k
    frames."""
    from naqed_spark.queries.llm import llm_knn_bruteforce
    from naqed_spark.queries.llm_ext import llm_knn_ivf

    bf = (
        llm_knn_bruteforce(spark, sf_dir)
        .filter(F.col("rnk") <= 3)
        .select("src", "nbr")
    )
    ivf = llm_knn_ivf(spark, sf_dir).select(
        F.col("src").alias("i_src"), F.col("nbr").alias("i_nbr")
    )
    hits = (
        bf.join(
            ivf,
            (bf["src"] == ivf["i_src"]) & (bf["nbr"] == ivf["i_nbr"]),
        )
        .groupBy("src")
        .agg(F.count("*").alias("h"))
    )
    n = bf.agg(F.count_distinct("src").cast("bigint").alias("n_queries"))
    agg = hits.agg(
        F.coalesce(F.sum("h"), F.lit(0)).cast("bigint").alias("total_hits"),
        F.count(F.when(F.col("h") == 3, 1)).cast("bigint").alias(
            "n_perfect"
        ),
    )
    return n.crossJoin(agg).select(
        "n_queries",
        "total_hits",
        r6(
            F.col("total_hits") / (3.0 * F.col("n_queries"))
        ).alias("recall_at_3"),
        "n_perfect",
    )


@query(
    "llm_sampling_temperature",
    # Temperature-scaled multilingual sampling weights (the mC4/XLM-R
    # recipe, arXiv:1911.02116 §3.1): q_l ∝ p_l^α with α = 0.7 —
    # upsamples low-resource languages without flattening the mix.
    # p_l is an exact integer ratio; pow/normalization are identical
    # doubles; the normalizing sum over the LANGUAGE GRID (5 terms)
    # carries the round(6) hedge. Emits the effective per-doc
    # multiplier (weight share / doc share) the sampler applies.
    oracle="""
    WITH l AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents
      GROUP BY lang
    ), t AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS total FROM l),
    w AS (
      SELECT lang, n_docs, power(n_docs / t.total, 0.7) AS q
      FROM l CROSS JOIN t
    ), z AS (SELECT sum(q) AS zq FROM w)
    SELECT w.lang, w.n_docs,
           round(w.q / z.zq, 6) AS sample_weight,
           round((w.q / z.zq) / (w.n_docs / t.total), 6) AS doc_multiplier
    FROM w CROSS JOIN z CROSS JOIN t ORDER BY w.lang
    """,
)
def llm_sampling_temperature(spark, sf_dir):
    """One language-grid aggregate; the temperature math runs on the
    5-row grid with the total and normalizer as 1-row broadcasts —
    constant state at any corpus size, and the emitted multipliers are
    what a downstream weighted sampler joins back per doc."""
    l = load(spark, sf_dir, "documents").groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    t = l.agg(F.sum("n_docs").cast("double").alias("total"))
    w = l.crossJoin(F.broadcast(t)).select(
        "lang",
        "n_docs",
        "total",
        F.pow(F.col("n_docs") / F.col("total"), 0.7).alias("q"),
    )
    z = w.agg(F.sum("q").alias("zq"))
    return (
        w.crossJoin(F.broadcast(z))
        .select(
            "lang",
            "n_docs",
            r6(F.col("q") / F.col("zq")).alias("sample_weight"),
            r6(
                (F.col("q") / F.col("zq"))
                / (F.col("n_docs") / F.col("total"))
            ).alias("doc_multiplier"),
        )
        .orderBy("lang")
    )


@query(
    "llm_preference_pairs",
    # Preference-pair assembly for reward-model / DPO training: within
    # each (lang, source) prompt group, the highest-quality doc becomes
    # `chosen` and the lowest `rejected` (deterministic argmax/argmin on
    # the ROUNDED quality score with doc_id tie-breaks), with the score
    # margin attached. Groups with fewer than 2 docs — or where best
    # and worst are the same doc — produce no pair.
    oracle="""
    WITH q AS (
      SELECT doc_id, lang, source,
             round(ln(1 + n_chars) * 0.5
                   + len(string_split(text, ' ')) * 0.01, 6) AS quality
      FROM documents WHERE text IS NOT NULL
    ), ranked AS (
      SELECT lang, source, doc_id, quality,
             row_number() OVER (PARTITION BY lang, source
                                ORDER BY quality DESC, doc_id) AS rb,
             row_number() OVER (PARTITION BY lang, source
                                ORDER BY quality ASC, doc_id) AS rw,
             count(*) OVER (PARTITION BY lang, source) AS n
      FROM q
    )
    SELECT b.lang, b.source,
           b.doc_id AS chosen_doc, w.doc_id AS rejected_doc,
           round(b.quality - w.quality, 6) AS margin
    FROM (SELECT * FROM ranked WHERE rb = 1 AND n >= 2) b
    JOIN (SELECT * FROM ranked WHERE rw = 1) w
      ON b.lang IS NOT DISTINCT FROM w.lang
     AND b.source IS NOT DISTINCT FROM w.source
    WHERE b.doc_id <> w.doc_id
    ORDER BY b.lang, b.source
    """,
)
def llm_preference_pairs(spark, sf_dir):
    """Both extremes come from ONE hash aggregate: the argmax/argmin
    ride as max_by/min_by over a (quality, ±doc_id) struct — ordering
    structs lexicographically reproduces the (quality desc/asc, doc_id
    asc) rank-1 exactly — so the pair assembly is a single map-side-
    combined shuffle with no window, no sort, and no self-join (the
    earlier two-rank-window spelling cost 4 exchanges; this costs 1,
    asserted in test_plans)."""
    # null text is unscorable (and size(NULL) = -1 would fabricate a
    # quality) — excluded identically in both engines
    q = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "lang",
            "source",
            F.round(
                F.log(1 + F.col("n_chars")) * 0.5
                + F.size(F.split("text", " ")) * 0.01,
                6,
            ).alias("quality"),
        )
    )
    best_key = F.struct(F.col("quality"), (-F.col("doc_id")).alias("nd"))
    worst_key = F.struct(F.col("quality"), F.col("doc_id").alias("d"))
    return (
        q.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n"),
            F.max_by("doc_id", best_key).alias("chosen_doc"),
            F.max("quality").alias("qb"),
            F.min_by("doc_id", worst_key).alias("rejected_doc"),
            F.min("quality").alias("qw"),
        )
        .filter(
            (F.col("n") >= 2)
            & (F.col("chosen_doc") != F.col("rejected_doc"))
        )
        .select(
            "lang",
            "source",
            "chosen_doc",
            "rejected_doc",
            F.round(F.col("qb") - F.col("qw"), 6).alias("margin"),
        )
        .orderBy("lang", "source")
    )


@query(
    "llm_span_corruption",
    # T5-style span-corruption planning (arXiv:1910.10683 §3.1.4,
    # deterministic spelling): spans of 2 tokens starting at positions
    # 5, 15, 25, … (~20% corruption, reproducibility rule: no rand) —
    # emits per span the sentinel id, 1-based start, and the masked
    # text, i.e. the (inputs, targets) plan a seq2seq pretraining
    # pipeline materializes. Pure integer arithmetic + list slicing.
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS n
      FROM documents
    )
    SELECT doc_id, CAST(span_idx AS INT) AS span_idx,
           CAST(5 + 10 * span_idx + 1 AS BIGINT) AS start_pos,
           array_to_string(
             w[5 + 10 * span_idx + 1 : 5 + 10 * span_idx + 2], ' ')
             AS masked_text
    FROM d
    CROSS JOIN (SELECT unnest(generate_series(0, 99)) AS span_idx)
    WHERE 5 + 10 * span_idx + 2 <= n
    """,
)
def llm_span_corruption(spark, sf_dir):
    """sequence() + explode generates span indices per doc (fan-out
    bounded by doc length / 10), slice() extracts the masked tokens
    JVM-side — no shuffle at all until a downstream aggregate; the doc
    body never leaves codegen."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.split("text", " ").alias("w"),
        F.size(F.split("text", " ")).alias("n"),
    ).filter(F.col("n") >= 7)
    spans = d.select(
        "doc_id",
        "w",
        "n",
        F.explode(
            F.sequence(
                F.lit(0),
                (((F.col("n") - 7) - (F.col("n") - 7) % 10) / 10)
                .cast("int"),
            )
        ).alias("span_idx"),
    ).filter(5 + 10 * F.col("span_idx") + 2 <= F.col("n"))
    start = 5 + 10 * F.col("span_idx") + 1
    return spans.select(
        "doc_id",
        "span_idx",
        start.cast("bigint").alias("start_pos"),
        F.array_join(
            F.slice(F.col("w"), start, 2), " "
        ).alias("masked_text"),
    )


@query(
    "llm_hard_negatives",
    # Hard-negative mining for contrastive/embedding training: each
    # vector's highest-ranked neighbor whose label DIFFERS — the
    # near-but-wrong examples that make a metric-learning batch
    # informative. Reuses the verified knn kernel; vectors whose whole
    # top-5 shares their label yield no row (nothing hard to mine).
    oracle="""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
             sqrt(list_dot_product(list_transform(embedding,
                  x -> CAST(x AS DOUBLE)),
                  list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS src, a.label AS src_label,
             b.vec_id AS nbr, b.label AS nbr_label,
             round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS sim,
             row_number() OVER (PARTITION BY a.vec_id
               ORDER BY round(list_dot_product(a.e, b.e)
                              / (a.nrm * b.nrm), 6) DESC, b.vec_id ASC)
               AS rnk
      FROM v a JOIN v b ON a.vec_id <> b.vec_id
    )
    SELECT src, src_label, nbr AS hard_negative, nbr_label, sim,
           CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY src ORDER BY rnk) AS hn
      FROM pairs WHERE rnk <= 5 AND nbr_label <> src_label
    ) WHERE hn = 1
    """,
)
def llm_hard_negatives(spark, sf_dir):
    """knn output (already top-5 per query) filtered to cross-label
    rows and reduced with one more rank-1 window on the same src
    partitioning — mining cost is one window over an O(5n) frame."""
    from pyspark.sql import Window

    from naqed_spark.queries.llm import llm_knn_bruteforce

    knn = llm_knn_bruteforce(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    sl = emb.select(
        F.col("vec_id").alias("s_id"), F.col("label").alias("src_label")
    )
    nl = emb.select(
        F.col("vec_id").alias("n_id"), F.col("label").alias("nbr_label")
    )
    cand = (
        knn.join(sl, knn["src"] == sl["s_id"])
        .join(nl, knn["nbr"] == nl["n_id"])
        .filter(F.col("nbr_label") != F.col("src_label"))
    )
    hn = F.row_number().over(Window.partitionBy("src").orderBy("rnk"))
    return (
        cand.withColumn("hn", hn)
        .filter(F.col("hn") == 1)
        .select(
            "src",
            "src_label",
            F.col("nbr").alias("hard_negative"),
            "nbr_label",
            "sim",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


@query(
    "llm_prefix_clusters",
    # Shared-prefix clustering: documents whose first 8 tokens are
    # identical form a cluster — the crawl artifact (truncated pages,
    # boilerplate templates) that exact full-text dedup misses because
    # the tails differ. Emits clusters of ≥2 docs with the md5 prefix
    # key, sizes, the representative (min doc_id), and whether the
    # cluster spans multiple sources (template syndication signal).
    oracle="""
    WITH p AS (
      SELECT doc_id, source,
             md5(array_to_string((string_split(text, ' '))[1:8], ' '))
               AS prefix_key
      FROM documents WHERE len(string_split(text, ' ')) >= 8
    )
    SELECT prefix_key,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS keep_doc,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           (count(DISTINCT source) > 1) AS cross_source
    FROM p GROUP BY prefix_key HAVING count(*) >= 2
    ORDER BY n_docs DESC, prefix_key
    """,
)
def llm_prefix_clusters(spark, sf_dir):
    """One codegen slice+hash per doc, one 16-byte-key aggregate with
    map-side combine — the same one-shuffle cost as exact dedup, over
    a key that catches what full-text hashing can't."""
    p = (
        load(spark, sf_dir, "documents")
        .filter(F.size(F.split("text", " ")) >= 8)
        .select(
            "doc_id",
            "source",
            F.md5(
                F.array_join(F.slice(F.split("text", " "), 1, 8), " ")
            ).alias("prefix_key"),
        )
    )
    return (
        p.groupBy("prefix_key")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("keep_doc"),
            F.count_distinct("source").cast("bigint").alias("n_sources"),
            (F.count_distinct("source") > 1).alias("cross_source"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), "prefix_key")
    )


@query(
    "llm_prototype_selection",
    # Exemplar/prototype selection for few-shot prompting and dataset
    # cards: per label, the 3 vectors closest to their OWN label
    # centroid (rounded d², vec_id tie-break) — the most-representative
    # examples, the complement of llm_hard_negatives' most-confusable
    # ones. Centroid components round to 6 on both engines so distances
    # compute from identical inputs (the llm_knn_centroid discipline).
    oracle="""
    WITH x AS (
      SELECT vec_id, label,
             generate_subscripts(embedding, 1) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings
    ),
    cent AS (
      SELECT label AS c_label, pos, round(avg(val), 6) AS c
      FROM x GROUP BY label, pos
    ),
    dist AS (
      SELECT x.vec_id, x.label,
             round(sum((x.val - cent.c) * (x.val - cent.c)), 6) AS d2
      FROM x JOIN cent ON x.pos = cent.pos AND x.label = cent.c_label
      GROUP BY x.vec_id, x.label
    )
    SELECT label, CAST(rn AS INT) AS rank, vec_id, d2 FROM (
      SELECT label, vec_id, d2,
             row_number() OVER (PARTITION BY label
                                ORDER BY d2 ASC, vec_id ASC) AS rn
      FROM dist
    ) WHERE rn <= 3
    ORDER BY label, rank
    """,
)
def llm_prototype_selection(spark, sf_dir):
    """Own-label distances only (the centroid join carries the label as
    a second equi-key, so candidates are |vectors| rows, not
    |vectors|×|labels|); the top-3 is a WindowGroupLimit-eligible rank
    over the label partition."""
    from pyspark.sql import Window

    x = (
        load(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "label",
            F.posexplode("embedding").alias("pos0", "valf"),
        )
        .select(
            "vec_id",
            "label",
            (F.col("pos0") + 1).alias("pos"),
            F.col("valf").cast("double").alias("val"),
        )
    )
    cent = x.groupBy(F.col("label").alias("c_label"), "pos").agg(
        r6(F.avg("val")).alias("c")
    )
    dist = (
        x.join(
            cent,
            (x["pos"] == cent["pos"]) & (x["label"] == cent["c_label"]),
        )
        .groupBy("vec_id", "label")
        .agg(
            r6(
                F.sum(
                    (F.col("val") - F.col("c")) * (F.col("val") - F.col("c"))
                )
            ).alias("d2")
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("label").orderBy(
            F.col("d2").asc(), F.col("vec_id").asc()
        )
    )
    return (
        dist.withColumn("rn", rn)
        .filter(F.col("rn") <= 3)
        .select("label", F.col("rn").cast("int").alias("rank"), "vec_id", "d2")
        .orderBy("label", "rank")
    )
