"""§2-H: scalar function families — 9 composite keys (SURVEY.md:252-264).

One query per family, touching every function the contract lists. All
expressions are Catalyst built-ins (JVM-side, whole-stage codegen — no
Python in any hot path).

Cross-dialect traps handled here (each noted inline):
  - DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all
  - DuckDB ceil/floor return DOUBLE (Spark: BIGINT) → cast in SQL
  - DuckDB datediff is ('day', start, end); Spark datediff(end, start)
  - DuckDB CAST(double AS INT) rounds; Spark truncates → floor() first
  - libm-backed fns (ln/exp/power) differ in the last ulp → round(6)
  - posexplode is 0-based; generate_subscripts is 1-based → +1
"""

from __future__ import annotations

from pyspark.sql import functions as F

from naqed_spark.queries._util import date_str, epoch_us, load, r6, spread
from naqed_spark.registry import query


def _null_size(src, arr):
    """``size(arr)`` with SQL null semantics: NULL when ``src`` (the
    column the array derives from) is NULL — Spark's legacy ``size``
    returns -1 there, DuckDB's ``len`` returns NULL; the demos' null
    contract is "function of NULL is NULL"."""
    return F.when(src.isNotNull(), F.size(arr))


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS lname,
           upper(c_mktsegment) AS useg,
           substr(c_name, 1, 8) AS prefix,
           trim(concat(' ', c_name, ' ')) AS trimmed,
           c_name || '/' || c_mktsegment AS joined,
           length(c_name) AS name_len,
           string_split(c_name, '#')[1] AS first_part,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked
    FROM customer
    """,
)
def fn_string(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lname"),
        F.upper("c_mktsegment").alias("useg"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias(
            "trimmed"
        ),
        F.concat(F.col("c_name"), F.lit("/"), F.col("c_mktsegment")).alias(
            "joined"
        ),
        F.length("c_name").alias("name_len"),
        F.split("c_name", "#").getItem(0).alias("first_part"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        # DuckDB regexp_replace is first-match-only without the 'g' flag
        F.regexp_replace("c_name", "[0-9]", "#").alias("masked"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dy,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR)
             AS month_start,
           CAST(datediff('day', CAST(o_orderdate AS DATE),
                         DATE '2000-01-01') AS INT) AS days_to_y2k,
           CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS plus_30d,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS order_us
    FROM orders
    """,
)
def fn_date(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dy"),
        F.date_format(F.date_trunc("month", d).cast("date"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        # Spark datediff(end, start); DuckDB datediff('day', start, end)
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).alias(
            "days_to_y2k"
        ),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias(
            "plus_30d"
        ),
        F.date_format(F.last_day(d.cast("date")), "yyyy-MM-dd").alias(
            "month_end"
        ),
        epoch_us(d).alias("order_us"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           round(l_quantity, 1) AS qty_r1,
           abs(l_quantity - 25) AS qty_dev,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_ceil7,
           CAST(floor(l_quantity / 7) AS BIGINT) AS qty_floor7,
           sqrt(l_quantity) AS qty_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(exp(l_discount), 6) AS disc_exp,
           round(power(1 + l_discount, 2), 6) AS disc_pow2,
           l_orderkey % 7 AS key_mod7,
           CAST(sign(l_quantity - 25) AS INT) AS qty_sign
    FROM lineitem
    """,
)
def fn_math(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(q, 1).alias("qty_r1"),
        F.abs(q - 25).alias("qty_dev"),
        # DuckDB ceil/floor return DOUBLE; Spark returns BIGINT → cast SQL
        F.ceil(q / 7).alias("qty_ceil7"),
        F.floor(q / 7).alias("qty_floor7"),
        F.sqrt(q).alias("qty_sqrt"),  # IEEE correctly-rounded: exact match
        r6(F.log(F.col("l_extendedprice"))).alias("price_ln"),
        r6(F.exp(F.col("l_discount"))).alias("disc_exp"),
        r6(F.pow(F.lit(1) + F.col("l_discount"), 2)).alias("disc_pow2"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.signum(q - 25).cast("int").alias("qty_sign"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'other' END AS status_word,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS size_band,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_or_pending,
           greatest(o_totalprice, 200000.0) AS at_least_200k,
           least(o_totalprice, 200000.0) AS at_most_200k
    FROM orders
    """,
)
def fn_conditional(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    st, tp = F.col("o_orderstatus"), F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(st == "F", "finished")
        .when(st == "O", "open")
        .otherwise("other")
        .alias("status_word"),
        F.when(tp > 300000, "big")
        .when(tp > 100000, "mid")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(F.nullif(st, F.lit("P")), F.lit("PENDING")).alias(
            "status_or_pending"
        ),
        F.greatest(tp, F.lit(200000.0)).alias("at_least_200k"),
        F.least(tp, F.lit(200000.0)).alias("at_most_200k"),
    )


@query(
    "fn_array",
    # documents ⋈ embeddings (1:1) — plain arrays from split(text) plus
    # higher-order transform/filter/aggregate over the float vector.
    # Float elements are widened to double BEFORE arithmetic (exact), and
    # the fold result gets the round(6) libm hedge.
    oracle="""
    SELECT d.doc_id,
           len(string_split(d.text, ' ')) AS n_words,
           len(list_distinct(string_split(d.text, ' '))) AS n_distinct_words,
           array_to_string(list_sort(string_split(d.text, ' '))[1:3], ' ')
             AS first3_sorted,
           list_contains(string_split(d.text, ' '), 'scan') AS has_scan,
           CASE WHEN d.text IS NULL THEN NULL
                ELSE len(flatten([string_split(d.text, ' '),
                                  string_split(d.text, ' ')])) END
             AS n_words_x2,
           len(e.embedding) AS dim,
           round(list_sum(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * 2)), 6) AS sum2,
           len(list_filter(e.embedding, x -> x > 0)) AS n_pos
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def fn_array(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    words = F.split(F.col("text"), " ")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            # size(NULL) is -1 in Spark vs NULL in DuckDB — the demo's
            # null contract is "function of NULL is NULL", guarded here
            _null_size(F.col("text"), words).alias("n_words"),
            _null_size(F.col("text"), F.array_distinct(words)).alias(
                "n_distinct_words"
            ),
            F.array_join(F.slice(F.sort_array(words), 1, 3), " ").alias(
                "first3_sorted"
            ),
            F.array_contains(words, "scan").alias("has_scan"),
            _null_size(
                F.col("text"), F.flatten(F.array(words, words))
            ).alias("n_words_x2"),
            F.size("embedding").alias("dim"),
            r6(
                F.expr(
                    "aggregate(transform(embedding,"
                    " x -> cast(x as double) * 2),"
                    " cast(0 as double), (a, x) -> a + x)"
                )
            ).alias("sum2"),
            F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        )
    )


@query(
    "fn_explode",
    # posexplode is 0-based, generate_subscripts 1-based → +1 on Spark side
    oracle="""
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) AS pos,
           unnest(string_split(text, ' ')) AS word
    FROM documents
    """,
)
def fn_explode(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS prop_keys,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           (json_extract_string(props, '$.k') IS NOT NULL) AS has_k,
           (json_extract_string(props, '$.missing') IS NOT NULL) AS has_missing
    FROM events
    """,
)
def fn_map(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        F.element_at(m, "k").alias("k_val"),
        F.element_at(m, "k").isNotNull().alias("has_k"),
        F.element_at(m, "missing").isNotNull().alias("has_missing"),
    )


@query(
    "fn_json",
    # nested JSON built per-row from the flat props payload, then extracted
    # back out with path expressions + cast.
    # `||` (NULL-propagating, like Spark's concat) not concat() (DuckDB's
    # concat SKIPS nulls, producing malformed JSON that crashes
    # json_extract_string when props is NULL)
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           json_extract_string(
             '{"outer":{"inner":' || json_extract_string(props, '$.k')
               || ',"tag":"' || event_type || '"}}',
             '$.outer.inner') AS nested_k,
           json_extract_string(
             '{"outer":{"inner":' || json_extract_string(props, '$.k')
               || ',"tag":"' || event_type || '"}}',
             '$.outer.tag') AS nested_tag
    FROM events
    """,
)
def fn_json(spark, sf_dir):
    # r17 opt (guide §2.5): the events file scans as ONE split, so the
    # per-row JSON walking ran on a single core — round-robin the scan
    # to defaultParallelism before the CPU-heavy projection (the r16
    # fuzzy-probe idiom; scan parallelism is the file layout's problem,
    # compute parallelism is ours).
    ev = spread(load(spark, sf_dir, "events"))
    k_str = F.get_json_object("props", "$.k")
    nested = F.concat(
        F.lit('{"outer":{"inner":'),
        k_str,
        F.lit(',"tag":"'),
        F.col("event_type"),
        F.lit('"}}'),
    )
    return ev.select(
        "event_id",
        k_str.cast("int").alias("k"),
        F.get_json_object(nested, "$.outer.inner").alias("nested_k"),
        F.get_json_object(nested, "$.outer.tag").alias("nested_tag"),
    )


@query(
    "fn_cast",
    # try_cast on BOTH engines for the failure paths (Spark non-ANSI CAST
    # wraps int overflow instead of nulling — try_cast nulls, matching
    # DuckDB TRY_CAST). Double→int goes through floor(): Spark CAST
    # truncates, DuckDB CAST rounds.
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           TRY_CAST(regexp_extract(o_orderpriority, '([0-9]+)', 1) AS INTEGER)
             AS prio_num,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_int,
           TRY_CAST('99999999999999999999' AS INTEGER) AS overflow_int,
           CAST(floor(o_totalprice) AS BIGINT) AS price_trunc,
           CAST(o_totalprice AS VARCHAR) = '' AS never_true,
           CAST(CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS DATE)
             = CAST(o_orderdate AS DATE) AS date_roundtrip
    FROM orders
    """,
)
def fn_cast(spark, sf_dir):
    # r17 opt (guide §2.5): parallelize the per-row regex + try_cast work
    # above the single-split orders scan (see fn_json).
    o = spread(load(spark, sf_dir, "orders"))
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.regexp_extract("o_orderpriority", "([0-9]+)", 1)
        .try_cast("int")
        .alias("prio_num"),
        F.col("o_orderpriority").try_cast("int").alias("bad_int"),
        F.lit("99999999999999999999").try_cast("int").alias("overflow_int"),
        F.floor("o_totalprice").cast("bigint").alias("price_trunc"),
        (F.col("o_totalprice").cast("string") == "").alias("never_true"),
        (
            F.col("o_orderdate").cast("date").cast("string").cast("date")
            == F.col("o_orderdate").cast("date")
        ).alias("date_roundtrip"),
    )


@query(
    "fn_bitwise",
    # bitwise family over order keys: and/or/xor, shifts, popcount —
    # xor(a, b) spelled as a function in DuckDB, ^ in Spark; shifts are
    # operators in DuckDB, named fns in Spark SQL; semantics identical on
    # 64-bit integers in both.
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS k_and,
           o_orderkey | 4096 AS k_or,
           xor(o_orderkey, o_custkey) AS k_xor,
           o_orderkey << 3 AS k_shl,
           o_orderkey >> 2 AS k_shr,
           bit_count(o_orderkey) AS k_pop
    FROM orders WHERE o_orderkey <= 20000
    """,
)
def fn_bitwise(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 20000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("k_and"),
        k.bitwiseOR(F.lit(4096)).alias("k_or"),
        k.bitwiseXOR(F.col("o_custkey")).alias("k_xor"),
        F.shiftleft(k, 3).alias("k_shl"),
        F.shiftright(k, 2).alias("k_shr"),
        F.bit_count(k).alias("k_pop"),
    )


@query(
    "fn_variant_json",
    # Spark 4's VARIANT type over the events.props JSON column: parse once,
    # then typed path extraction (variant_get) and shredded-schema
    # introspection (schema_of_variant). VARIANT is the engine's
    # semi-structured fast path — binary-encoded, no per-access re-parse,
    # columnar-shreddable at rest — vs fn_json's string-walking
    # get_json_object. The variant itself never leaves the plan (the
    # driver canonicalizer can't sort it); only typed extractions emit.
    # Oracle: DuckDB JSON extraction of the same paths.
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
           CAST(json_extract(props, '$.k') AS VARCHAR) AS k_str,
           CASE WHEN json_extract(props, '$.k') IS NULL THEN 0 ELSE 1 END
             AS has_k
    FROM events
    """,
)
def fn_variant_json(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_id", "props")
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias(
            "k_int"
        ),
        F.expr("variant_get(parse_json(props), '$.k', 'string')").alias(
            "k_str"
        ),
        F.expr(
            "CASE WHEN variant_get(parse_json(props), '$.k') IS NULL"
            " THEN 0 ELSE 1 END"
        ).cast("int").alias("has_k"),
    )


@query(
    "fn_regex",
    # Regex family composite over documents.text: anchored group extract,
    # extract-all count, global replace, regex split count, and a partial
    # rlike match. Engine deltas handled: DuckDB regexp_replace needs the
    # 'g' flag to match Spark's replace-all default; both engines' \b and
    # character classes agree on this ASCII corpus — and on non-ASCII
    # text too, because the Spark side spells the word boundary as an
    # EXPLICIT ASCII lookbehind: Java's \b is Unicode-aware while
    # DuckDB/RE2's is ASCII-only (RE2 sees a boundary inside "ça"), and
    # RE2 has no lookbehind, so the common semantic is RE2's — Java gets
    # (?<![A-Za-z0-9_]) which is exactly RE2's \b before a word char
    # (probed by tests/test_adversarial_input.py's multibyte fixture).
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '^(\\w+)', 1) AS first_word,
           CAST(len(regexp_extract_all(text, '\\b[aeiou][a-z]*'))
                AS BIGINT) AS n_vowel_words,
           length(regexp_replace(text, '[aeiou]', '*', 'g')) AS masked_len,
           CAST(len(string_split_regex(text, '\\s+')) AS BIGINT)
             AS n_tokens,
           CAST(regexp_matches(text, 'agg.*scan') AS INTEGER) AS has_aggscan
    FROM documents
    """,
)
def fn_regex(spark, sf_dir):
    """All five expressions are JVM codegen string ops on a single scan —
    no shuffle, no Python; the 100 TB shape is embarrassingly parallel
    per-row work, the only knob being input split size."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
        _null_size(
            F.col("text"),
            F.regexp_extract_all(
                "text", F.lit(r"(?<![A-Za-z0-9_])[aeiou][a-z]*"), 0
            ),
        )
        .cast("bigint")
        .alias("n_vowel_words"),
        F.length(F.regexp_replace("text", "[aeiou]", "*")).alias(
            "masked_len"
        ),
        _null_size(F.col("text"), F.split("text", r"\s+"))
        .cast("bigint")
        .alias("n_tokens"),
        F.col("text").rlike("agg.*scan").cast("int").alias("has_aggscan"),
    )


@query(
    "fn_url",
    # URL parsing family over a deterministically synthesized URL column:
    # Spark's parse_url (HOST / PATH / QUERY / per-param extraction) must
    # recover exactly the components the URL was built from. The oracle
    # reconstructs the true decomposition directly from the source
    # columns — it checks the PARSER, not string-building.
    # a NULL source or lang makes the whole built URL NULL (Spark concat
    # propagates), so the parser returns NULL for EVERY component — the
    # oracle's reconstruction mirrors that with one guard
    oracle="""
    SELECT doc_id,
           CASE WHEN source IS NULL OR lang IS NULL THEN NULL
                ELSE source || '.example.com' END AS host,
           CASE WHEN source IS NULL OR lang IS NULL THEN NULL
                ELSE '/docs/' || CAST(doc_id AS VARCHAR) END AS path,
           CASE WHEN source IS NULL OR lang IS NULL THEN NULL
                ELSE 'lang=' || lang || '&n=' || CAST(n_chars AS VARCHAR)
           END AS query,
           CASE WHEN source IS NULL OR lang IS NULL THEN NULL
                ELSE lang END AS q_lang,
           CASE WHEN source IS NULL OR lang IS NULL THEN NULL
                ELSE CAST(n_chars AS VARCHAR) END AS q_n
    FROM documents
    """,
)
def fn_url(spark, sf_dir):
    """Single codegen scan, no shuffle — parse_url is a JVM expression;
    the 100 TB shape is per-row string work bounded by scan bandwidth."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars").cast("string"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
        F.parse_url(url, F.lit("QUERY"), F.lit("n")).alias("q_n"),
    )


@query(
    "fn_struct",
    # struct family: build structs, sort an array<struct> (Spark orders
    # structs lexicographically by field position), extract fields from
    # both ends. This is the serialize-nested idiom behind argmin/argmax
    # and first/last-event queries; per-group array size is bounded by
    # orders-per-customer (~O(10)), so collect_list is safe at any SF —
    # the same bound compiler_collect_nested documents. One shuffle on
    # o_custkey, everything else codegen. The oracle re-derives the
    # lexicographic-min/max elements with window row_numbers.
    oracle="""
    WITH r AS (
      SELECT o_custkey,
             strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS ds,
             o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                 ORDER BY strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') ASC,
                          o_orderkey ASC) AS rn_a,
             row_number() OVER (PARTITION BY o_custkey
                 ORDER BY strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') DESC,
                          o_orderkey DESC) AS rn_d
      FROM orders)
    SELECT o_custkey,
           count(*) AS n_orders,
           max(CASE WHEN rn_a = 1 THEN ds END) AS first_date,
           max(CASE WHEN rn_a = 1 THEN o_orderkey END) AS first_key,
           max(CASE WHEN rn_d = 1 THEN ds END) AS last_date,
           max(CASE WHEN rn_d = 1 THEN o_orderkey END) AS last_key
    FROM r GROUP BY o_custkey
    """,
)
def fn_struct(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    arr = F.sort_array(
        F.collect_list(F.struct(date_str("o_orderdate").alias("ds"),
                                F.col("o_orderkey").alias("k")))
    )
    return (
        o.groupBy("o_custkey")
        .agg(arr.alias("arr"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            "o_custkey",
            "n_orders",
            F.element_at("arr", 1).getField("ds").alias("first_date"),
            F.element_at("arr", 1).getField("k").alias("first_key"),
            F.element_at("arr", -1).getField("ds").alias("last_date"),
            F.element_at("arr", -1).getField("k").alias("last_key"),
        )
    )


@query(
    "fn_hash",
    # Hash/digest family — the workhorse of dedup keys, shard assignment,
    # and fingerprinting everywhere else in this repo (md5-bucket sampling,
    # exact dedup, train splits). md5/sha256 produce identical lowercase
    # hex on both engines; xxhash64/crc32 are engine-specific and excluded
    # on determinism grounds (SURVEY.md §7.3). Codegen scan, no shuffle.
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256,
           substr(md5(c_mktsegment), 1, 8) AS seg_bucket,
           length(sha256(c_name)) AS sha_len
    FROM customer
    """,
)
def fn_hash(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
        F.substring(F.md5("c_mktsegment"), 1, 8).alias("seg_bucket"),
        F.length(F.sha2("c_name", 256)).alias("sha_len"),
    )


@query(
    "fn_try_safe",
    # Error-safe expression family — the runtime counterpart of the E1
    # compiler's analysis-time SpecErrors (naqed's $error semantics,
    # SURVEY §1.2): malformed casts and zero denominators yield NULL
    # instead of failing the job. At 100 TB this is the difference
    # between one bad row killing a 6-hour job and a NULL you can audit.
    # try_divide's twin is spelled x / nullif(y, 0) (DuckDB raises on
    # integer /0); try_cast is native in both engines. Codegen scan, no
    # shuffle.
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           TRY_CAST(event_type AS INTEGER) AS bogus_int,
           round(value / nullif(CAST(round(value * 100, 0) AS BIGINT)
                                % 7, 0), 6) AS div7,
           TRY_CAST(substr(event_type, 1, 1) AS INTEGER) AS first_char_int
    FROM events
    """,
)
def fn_try_safe(spark, sf_dir):
    # r17 opt (guide §2.5): parallelize the per-row JSON parse +
    # try-conversion work above the single-split events scan (see
    # fn_json).
    ev = spread(load(spark, sf_dir, "events"))
    cents_mod = F.round(F.col("value") * 100, 0).cast("bigint") % 7
    return ev.select(
        "event_id",
        F.try_to_number(
            F.get_json_object("props", "$.k"), F.lit("999999")
        ).cast("int").alias("k_int"),
        F.expr("try_cast(event_type AS INT)").alias("bogus_int"),
        r6(F.try_divide(F.col("value"), F.nullif(cents_mod, F.lit(0)))).alias(
            "div7"
        ),
        F.expr("try_cast(substring(event_type, 1, 1) AS INT)").alias(
            "first_char_int"
        ),
    )


@query(
    "fn_date_arith",
    # Calendar-arithmetic family: month-end, add-months (with the
    # end-of-month clamp: Jan 31 + 1 mo = Feb 29), quarter, ISO week,
    # ISO day-of-week, and day distance to a fixed horizon. Cross-dialect
    # traps: DuckDB's add_months is + INTERVAL (same clamp), its
    # dayofweek is locale-shifted vs Spark — the ISO form (Spark
    # weekday()+1 = DuckDB isodow) is the portable spelling; datediff
    # argument order flips between engines. Codegen scan, no shuffle.
    oracle="""
    SELECT o_orderkey,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
             AS month_end,
           strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH
                         AS DATE), '%Y-%m-%d') AS plus3m,
           CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS qtr,
           CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT) AS iso_week,
           CAST(isodow(CAST(o_orderdate AS DATE)) AS INT) AS iso_dow,
           CAST(datediff('day', CAST(o_orderdate AS DATE),
                         DATE '2025-01-01') AS INT) AS days_to_2025
    FROM orders
    """,
)
def fn_date_arith(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        date_str(F.last_day(d)).alias("month_end"),
        date_str(F.add_months(d, 3)).alias("plus3m"),
        F.quarter(d).alias("qtr"),
        F.weekofyear(d).alias("iso_week"),
        (F.weekday(d) + 1).alias("iso_dow"),
        F.datediff(F.lit("2025-01-01").cast("date"), d).alias(
            "days_to_2025"
        ),
    )


@query(
    "fn_string_extra",
    # Second string family: padding, character translation, replacement,
    # reversal, repetition, edge slicing — the formatting/normalization
    # toolkit (ID zero-padding, char-class scrubbing). initcap is
    # deliberately absent: DuckDB has no twin and locale-sensitive
    # casing is an engine-divergence trap. Codegen scan, no shuffle.
    oracle="""
    SELECT c_custkey,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_id,
           rpad(c_mktsegment, 12, '.') AS padded_seg,
           translate(c_name, '#0', '_X') AS translated,
           replace(c_name, 'Customer', 'Acct') AS replaced,
           reverse(c_mktsegment) AS rev_seg,
           repeat('*', CAST(c_custkey % 5 AS INT)) AS stars,
           left(c_name, 8) AS l8,
           right(c_name, 4) AS r4
    FROM customer
    """,
)
def fn_string_extra(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_id"),
        F.rpad("c_mktsegment", 12, ".").alias("padded_seg"),
        F.translate("c_name", "#0", "_X").alias("translated"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Acct")).alias(
            "replaced"
        ),
        F.reverse("c_mktsegment").alias("rev_seg"),
        F.repeat(F.lit("*"), (F.col("c_custkey") % 5).cast("int")).alias(
            "stars"
        ),
        F.expr("left(c_name, 8)").alias("l8"),
        F.expr("right(c_name, 4)").alias("r4"),
    )


@query(
    "fn_json_roundtrip",
    # Structured → JSON → structured round trip: build a nested document
    # from order fields with to_json(struct(...)), parse it back with
    # from_json against an explicit schema, extract leaves — the
    # interchange pattern for event payloads. The JSON STRING itself is
    # never compared (serializers differ on spacing/key order across
    # engines); only extracted VALUES are, which is also the production
    # contract — consumers parse, they don't diff bytes. Codegen scan,
    # no shuffle, no Python.
    oracle="""
    SELECT o_orderkey,
           CAST(json_extract_string(j, '$.meta.status') AS VARCHAR)
             AS status,
           CAST(json_extract(j, '$.meta.prio_len') AS INTEGER) AS prio_len,
           CAST(json_extract(j, '$.key2') AS BIGINT) AS key2
    FROM (
      SELECT o_orderkey,
             to_json(struct_pack(
               meta := struct_pack(status := o_orderstatus,
                                   prio_len := length(o_orderpriority)),
               key2 := o_orderkey * 2)) AS j
      FROM orders
    )
    """,
)
def fn_json_roundtrip(spark, sf_dir):
    # r17 opt (guide §2.5): parallelize the per-row to_json/from_json
    # round trip above the single-split orders scan (see fn_json).
    o = spread(load(spark, sf_dir, "orders"))
    j = F.to_json(
        F.struct(
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.length("o_orderpriority").alias("prio_len"),
            ).alias("meta"),
            (F.col("o_orderkey") * 2).alias("key2"),
        )
    )
    parsed = F.from_json(
        j, "meta struct<status: string, prio_len: int>, key2 bigint"
    )
    return o.select(
        "o_orderkey",
        parsed.getField("meta").getField("status").alias("status"),
        parsed.getField("meta").getField("prio_len").alias("prio_len"),
        parsed.getField("key2").alias("key2"),
    )


@query(
    "fn_mask_redact",
    # Data masking (Spark 3.4+ mask()): upper→X, lower→x, digit→n — the
    # display-redaction primitive for PII-adjacent columns (the scrub
    # sibling of llm_pii_scrub, which removes; mask preserves shape so
    # formats stay validatable). DuckDB has no mask(): the twin is the
    # equivalent regexp_replace chain — same semantics for the default
    # masks over ASCII. Also shown: custom mask chars and a digits-only
    # variant. Codegen scan, no shuffle.
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(c_name,
             '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS masked_name,
           regexp_replace(c_name, '[0-9]', '*', 'g') AS digits_starred
    FROM customer
    """,
)
def fn_mask_redact(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr("mask(c_name)").alias("masked_name"),
        F.expr(
            "mask(c_name, NULL, NULL, '*', NULL)"
        ).alias("digits_starred"),
    )


@query(
    "fn_trig",
    # Trigonometric family over derived angles (key % 360 degrees):
    # radians conversion, sin/cos/tan, atan2 quadrant recovery, and the
    # sin²+cos² identity as a built-in self-check column. All libm-backed
    # → every emission carries the round(6) hedge (§7.3); tan is kept
    # away from ±90° poles by the integer-degree construction (90/270
    # map to well-conditioned neighbors via the +0.5° offset).
    oracle="""
    SELECT c_custkey,
           round(radians(deg), 6) AS rad,
           round(sin(radians(deg)), 6) AS s,
           round(cos(radians(deg)), 6) AS c,
           round(tan(radians(deg)), 6) AS t,
           round(atan2(sin(radians(deg)), cos(radians(deg))), 6) AS theta,
           round(sin(radians(deg)) * sin(radians(deg))
                 + cos(radians(deg)) * cos(radians(deg)), 6) AS unit
    FROM (SELECT c_custkey, (c_custkey % 360) + 0.5 AS deg FROM customer)
    """,
)
def fn_trig(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    deg = (F.col("c_custkey") % 360) + 0.5
    rad = F.radians(deg)
    return c.select(
        "c_custkey",
        r6(rad).alias("rad"),
        r6(F.sin(rad)).alias("s"),
        r6(F.cos(rad)).alias("c"),
        r6(F.tan(rad)).alias("t"),
        r6(F.atan2(F.sin(rad), F.cos(rad))).alias("theta"),
        r6(F.sin(rad) * F.sin(rad) + F.cos(rad) * F.cos(rad)).alias("unit"),
    )


@query(
    "fn_higher_order_lambdas",
    # Array higher-order functions — the JVM-codegen path that keeps
    # per-element logic OUT of Python UDFs: aggregate (fold), transform,
    # filter, exists, zip_with over the embedding arrays. Sum-of-squares
    # and dot-with-reversed are exact-input float folds in ONE
    # deterministic left-to-right order on both engines (Spark aggregate
    # and DuckDB list_sum/list_dot_product both fold sequentially), but
    # the round(6) hedge still applies; the count/any outputs are exact
    # integers/booleans.
    oracle="""
    SELECT vec_id,
           round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6)
             AS sum_sq,
           CAST(len(list_filter(embedding, x -> x > 0.0)) AS INT)
             AS n_positive,
           (len(list_filter(embedding, x -> abs(x) > 0.9)) > 0)
             AS any_large,
           round(list_dot_product(
                 list_transform(embedding, x -> CAST(x AS DOUBLE)),
                 list_transform(list_reverse(embedding),
                                x -> CAST(x AS DOUBLE))), 6)
             AS dot_reversed
    FROM embeddings
    """,
)
def fn_higher_order_lambdas(spark, sf_dir):
    """All four lambdas compile into whole-stage codegen (no Python, no
    shuffle) — at 100 TB this is a pure scan whose cost is bandwidth,
    the reason per-element feature math belongs in transform/aggregate
    and not in a UDF."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("e"),
    )
    return e.select(
        "vec_id",
        F.round(
            F.expr("aggregate(e, cast(0.0 as double), (acc, x) -> acc + x * x)"),
            6,
        ).alias("sum_sq"),
        F.expr("size(filter(e, x -> x > 0.0d))").cast("int").alias(
            "n_positive"
        ),
        F.expr("exists(e, x -> abs(x) > 0.9d)").alias("any_large"),
        F.round(
            F.expr(
                "aggregate(zip_with(e, reverse(e), (a, b) -> a * b),"
                " cast(0.0 as double), (acc, x) -> acc + x)"
            ),
            6,
        ).alias("dot_reversed"),
    )
