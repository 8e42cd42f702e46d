"""§2-K extensions, round 3: PII scrubbing and end-to-end dedup clustering.

llm_pii_scrub is the redaction pass every pretraining pipeline runs before
tokenization; llm_dedup_groups closes the near-dup loop — pair detection
(llm_neardup_lsh) → connected components → one canonical keep_id per
cluster — which is the operator a user actually runs to deduplicate a
corpus (pairs alone don't tell you which rows to drop).

Scale notes: the scrub is a pure per-row expression scan (JVM regex inside
whole-stage codegen, no UDF); the clustering runs min-label propagation on
the PAIR graph only — near-dup clusters are tiny and sparse, so the
iteration state is |docs-in-any-pair| rows, a vanishing fraction of the
corpus, and each round is one shuffle on the label key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from naqed_spark.queries._util import load, low_shuffle
from naqed_spark.queries.llm import _SHINGLES_SQL, _SIG_COLS_SQL, llm_neardup_lsh
from naqed_spark.registry import query

# [.] instead of \. — identical in Java regex and RE2, and immune to the
# engines' different string-literal escaping rules.
_EMAIL_PAT = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
_LONGNUM_PAT = "[0-9]{9,}"


@query(
    "llm_pii_scrub",
    # the fixture corpus carries no PII, so the scrub runs over a corpus
    # with synthetic PII injected deterministically per doc (an email and a
    # 10-digit number appended); redaction counts and the md5 of the
    # redacted text verify the rewrite byte-for-byte. DuckDB regexp_replace
    # needs the 'g' flag to match Spark's replace-all default.
    oracle=f"""
    WITH pii AS (
      SELECT doc_id,
             text || ' contact-' || doc_id ||
               '@example.com ph 555123' || (4000000 + doc_id) AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{_EMAIL_PAT}')) AS n_emails,
           len(regexp_extract_all(t, '{_LONGNUM_PAT}')) AS n_longnums,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL_PAT}', '[EMAIL]', 'g'),
                              '{_LONGNUM_PAT}', '[NUM]', 'g')) AS clean_md5,
           length(regexp_replace(regexp_replace(t, '{_EMAIL_PAT}', '[EMAIL]', 'g'),
                                 '{_LONGNUM_PAT}', '[NUM]', 'g')) AS clean_len
    FROM pii
    """,
)
def llm_pii_scrub(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.lit(" contact-"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ph 555123"),
        (F.col("doc_id") + 4000000).cast("string"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(t, _EMAIL_PAT, "[EMAIL]"), _LONGNUM_PAT, "[NUM]"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(_EMAIL_PAT), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(t, F.lit(_LONGNUM_PAT), F.lit(0))).alias(
            "n_longnums"
        ),
        F.md5(clean).alias("clean_md5"),
        F.length(clean).alias("clean_len"),
    )


@query(
    "llm_dedup_groups",
    # components of the LSH near-dup pair graph (same CTE chain as
    # llm_neardup_lsh), canonical keep_id = min doc_id per component via
    # transitive closure; n_members joins back per cluster.
    oracle=f"""
    WITH RECURSIVE sh AS ({_SHINGLES_SQL}),
    sigs AS (SELECT doc_id, sset, {_SIG_COLS_SQL} FROM sh),
    bands AS (
      SELECT doc_id, 0 AS band, md5(sig0 || sig1) AS bh FROM sigs
      UNION ALL SELECT doc_id, 1, md5(sig2 || sig3) FROM sigs
      UNION ALL SELECT doc_id, 2, md5(sig4 || sig5) FROM sigs
      UNION ALL SELECT doc_id, 3, md5(sig6 || sig7) FROM sigs
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b FROM cand
      JOIN sigs sa ON sa.doc_id = id_a
      JOIN sigs sb ON sb.doc_id = id_b
      WHERE CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
            / len(list_distinct(sa.sset || sb.sset)) >= 0.2
    ),
    sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    verts AS (SELECT DISTINCT src AS v FROM sym),
    reach(v, u) AS (
      SELECT v, v FROM verts
      UNION
      SELECT reach.v, sym.dst FROM reach JOIN sym ON sym.src = reach.u
    ),
    comp AS (SELECT v AS doc_id, min(u) AS keep_id FROM reach GROUP BY v)
    SELECT c.doc_id, c.keep_id, s.n_members
    FROM comp c
    JOIN (SELECT keep_id, count(*) AS n_members FROM comp GROUP BY keep_id) s
      ON s.keep_id = c.keep_id
    """,
)
def llm_dedup_groups(spark, sf_dir):
    """Min-label propagation to fixpoint over the near-dup pair graph
    (composition: the pairs come from the registered llm_neardup_lsh
    implementation). Emits (doc_id, keep_id, n_members) for every doc that
    appears in at least one near-dup pair; dropping rows with
    doc_id != keep_id IS the dedup."""
    pairs = llm_neardup_lsh(spark, sf_dir).select("id_a", "id_b")
    sym = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("src").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("label"))
    )
    with low_shuffle(spark):
        for _ in range(20):
            msgs = labels.join(sym, labels.v == sym.src).select(
                F.col("dst").alias("v"), F.col("label")
            )
            new_labels = (
                labels.unionAll(msgs)
                .groupBy("v")
                .agg(F.min("label").alias("label"))
                .localCheckpoint()
            )
            if new_labels.join(
                labels,
                (new_labels.v == labels.v) & (new_labels.label != labels.label),
            ).isEmpty():
                labels = new_labels
                break
            labels = new_labels
    sym.unpersist()
    comp = labels.select(
        F.col("v").alias("doc_id"), F.col("label").alias("keep_id")
    )
    sizes = comp.groupBy("keep_id").agg(F.count(F.lit(1)).alias("n_members"))
    return comp.join(sizes, "keep_id").select("doc_id", "keep_id", "n_members")
