"""Metamorphic property tests for COMPOSITE E1 specs (round 9).

The per-feature compiler tests compare each spec feature against a
directly-built DataFrame twin; these close the composition gap with
twin-free metamorphic relations between ENGINE outputs over seeded
random predicates — algebraic identities any correct compiler must
satisfy regardless of which operators happen to be composed:

  1. partition:     |σ(A∧B)| + |σ(A∧¬B)| == |σ(A)|
  2. disjunction:   σ($or[A, B]) == σ(A) ∪ σ(B)  (row multisets on a key)
  3. group totals:  Σ per-group $count over σ(A) == |σ(A)|
  4. pagination:    ordered $limit/$offset chunks reassemble the whole

Deterministic seeded random (no hypothesis shrinking churn — each case
runs real Spark jobs, so the suite pins ~a dozen diverse seeds).
"""

from __future__ import annotations

import os
import random

import pytest

from naqed_spark.compiler.engine import Engine
from naqed_spark.session import get_spark, tune_session

SF_DIR = os.environ.get("NAQED_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def eng():
    spark = tune_session(get_spark("naqed-compiler-prop-tests"))
    return Engine(spark, SF_DIR)


# predicate pool over orders: (field, spec-predicate, negation)
def _pred_pool(rng: random.Random):
    thr = rng.choice([50000.0, 120000.0, 200000.0, 280000.0])
    lo, hi = sorted(rng.sample([10000.0, 90000.0, 180000.0, 300000.0], 2))
    stats = rng.sample(["O", "F", "P"], rng.randint(1, 2))
    prio = rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED"])
    price = rng.choice(
        [
            (
                {"o_totalprice": {"$gt": thr}},
                {"o_totalprice": {"$lte": thr}},
            ),
            (
                {"o_totalprice": {"$between": [lo, hi]}},
                {"$or": [{"o_totalprice": {"$lt": lo}},
                         {"o_totalprice": {"$gt": hi}}]},
            ),
        ]
    )
    # one entry per FIELD — predicates conjoin via dict merge, so two
    # predicates on the same field would overwrite each other
    pool = [
        price,
        (
            # o_orderstatus has the closed domain {O, F, P}, so the
            # complement of an $in list is $in over the remaining values
            {"o_orderstatus": {"$in": stats}},
            {"o_orderstatus": {"$in": [s for s in ["O", "F", "P"]
                                       if s not in stats]}},
        ),
        (
            {"o_orderpriority": prio},
            {"o_orderpriority": {"$ne": prio}},
        ),
    ]
    return rng.sample(pool, 2)


SEEDS = list(range(12))


@pytest.mark.parametrize("seed", SEEDS)
def test_filter_partition_identity(eng, seed):
    """|σ(A∧B)| + |σ(A∧¬B)| == |σ(A)| for random predicate pairs —
    null-free fields, so the complement is exact."""
    rng = random.Random(seed)
    (a, _na), (b, nb) = _pred_pool(rng)

    def count(filters):
        # conjoin plain predicates; distribute a $or complement over the
        # conjunction: σ(merged ∧ (x ∨ y)) == σ($or[merged∧x, merged∧y])
        merged: dict = {}
        ors = []
        for f in filters:
            if "$or" in f:
                ors.append(f["$or"])
            else:
                merged.update(f)
        body = {"$filter": dict(merged), "o_orderkey": True}
        if ors:
            body["$filter"] = {"$or": [dict(merged, **br) for br in ors[0]]}
        return eng.query({"orders": body}).count()

    n_ab = count([a, b])
    n_anb = count([a, nb])
    n_a = count([a])
    assert n_ab + n_anb == n_a, (seed, a, b, nb, n_ab, n_anb, n_a)


@pytest.mark.parametrize("seed", SEEDS[:8])
def test_or_is_union_of_branches(eng, seed):
    """σ($or[A,B]) over a unique key == σ(A) ∪ σ(B) as sets."""
    rng = random.Random(seed + 100)
    (a, _), (b, _) = _pred_pool(rng)
    if "$or" in a or "$or" in b:  # keep branches simple predicates
        a = {"o_totalprice": {"$gt": 150000.0}}
    keys_or = {
        r["o_orderkey"]
        for r in eng.query(
            {"orders": {"$filter": {"$or": [a, b]}, "o_orderkey": True}}
        ).collect()
    }
    keys_a = {
        r["o_orderkey"]
        for r in eng.query(
            {"orders": {"$filter": a, "o_orderkey": True}}
        ).collect()
    }
    keys_b = {
        r["o_orderkey"]
        for r in eng.query(
            {"orders": {"$filter": b, "o_orderkey": True}}
        ).collect()
    }
    assert keys_or == keys_a | keys_b, (seed, a, b)


@pytest.mark.parametrize("seed", SEEDS[:8])
def test_group_counts_sum_to_filtered_total(eng, seed):
    """Σ per-group $count over σ(A) == |σ(A)| for a random predicate and
    random group key."""
    rng = random.Random(seed + 200)
    (a, _), _ = _pred_pool(rng)
    if "$or" in a:
        a = {"o_totalprice": {"$between": [50000.0, 250000.0]}}
    gkey = rng.choice(["o_orderstatus", "o_orderpriority"])
    grouped = eng.query(
        {
            "orders": {
                "$filter": a,
                "$groupby": [gkey],
                "$agg": {"n": {"$count": True}},
            }
        }
    ).collect()
    total = eng.query({"orders": {"$filter": a, "o_orderkey": True}}).count()
    assert sum(r["n"] for r in grouped) == total, (seed, a, gkey)


@pytest.mark.parametrize("seed", SEEDS[:6])
def test_pagination_chunks_reassemble(eng, seed):
    """Ordered $limit/$offset chunks concatenate to the ordered whole —
    composite of filter + computed select + orderby + pagination."""
    rng = random.Random(seed + 300)
    (a, _), _ = _pred_pool(rng)
    if "$or" in a:
        a = {"o_orderstatus": {"$in": ["O", "F"]}}
    chunk = rng.choice([7, 19, 50])
    base = {
        "$filter": a,
        "$select": {"half": {"$div": ["o_totalprice", 2]}},
        "o_orderkey": True,
        "$orderby": [["half", "desc"], ["o_orderkey", "asc"]],
    }
    whole = [
        (r["o_orderkey"], r["half"])
        for r in eng.query(
            {"orders": dict(base, **{"$limit": 200})}
        ).collect()
    ]
    paged = []
    for off in range(0, 200, chunk):
        paged.extend(
            (r["o_orderkey"], r["half"])
            for r in eng.query(
                {"orders": dict(base, **{"$limit": min(chunk, 200 - off),
                                         "$offset": off})}
            ).collect()
        )
    assert paged == whole, (seed, a, chunk)


# -------- round-13 vector-similarity identities (M12 engine-half).
# Twin-free algebraic relations any correct $dot/$cosine/$euclidean
# lowering must satisfy, checked over seeded random query vectors
# against the real embedding fixture — one engine query per seed, all
# identities asserted row-by-row on the collected result.


def _qvec(rng: random.Random, dim: int = 64) -> list[float]:
    return [rng.uniform(-1.0, 1.0) for _ in range(dim)]


@pytest.mark.parametrize("seed", [11, 23, 47, 89])
def test_vector_identities(eng, seed):
    rng = random.Random(seed)
    b = _qvec(rng)
    scale = rng.uniform(0.5, 4.0)
    b_scaled = [scale * x for x in b]
    rows = eng.query(
        {
            "embeddings": {
                "vec_id": True,
                "$select": {
                    "dot_ab": {"$dot": ["embedding", {"$lit": b}]},
                    "dot_ba": {"$dot": [{"$lit": b}, "embedding"]},
                    "cos_ab": {"$cosine": ["embedding", {"$lit": b}]},
                    "cos_a_sb": {
                        "$cosine": ["embedding", {"$lit": b_scaled}]
                    },
                    "dist_ab": {"$euclidean": ["embedding", {"$lit": b}]},
                    "dot_aa": {"$dot": ["embedding", "embedding"]},
                    "dot_bb": {"$dot": [{"$lit": b}, {"$lit": b}]},
                    "cos_self": {"$cosine": ["embedding", "embedding"]},
                },
            }
        }
    ).collect()
    assert rows
    for r in rows:
        # commutativity: identical HOF fold either way, bit-exact
        assert r["dot_ab"] == r["dot_ba"]
        # positive-scale invariance of cosine
        assert abs(r["cos_ab"] - r["cos_a_sb"]) < 1e-9
        # law of cosines: ‖a−b‖² = a·a + b·b − 2 a·b
        assert abs(
            r["dist_ab"] ** 2
            - (r["dot_aa"] + r["dot_bb"] - 2 * r["dot_ab"])
        ) < 1e-6
        # a vector is parallel to itself (fixture norms are ~1, never 0)
        assert abs(r["cos_self"] - 1.0) < 1e-9
        # Cauchy–Schwarz: |a·b| ≤ ‖a‖‖b‖ ⇒ |cos| ≤ 1 (+ fp slack)
        assert abs(r["cos_ab"]) <= 1.0 + 1e-12


# --- round 15: comparison exprs / correlated $scalar / sketch lists -----


@pytest.mark.parametrize("seed", [11, 23, 37, 59])
def test_comparison_trichotomy(eng, seed):
    """For any threshold t, each non-NULL operand satisfies exactly one
    of lt/eq/gt, and $lte ≡ $lt ∨ $eq — counted over the engine's own
    boolean emissions (no SQL twin involved)."""
    rng = random.Random(seed)
    t = rng.choice([25.0, 30.5, 40.0, 47.0])
    df = eng.query({
        "lineitem": {
            "$select": {
                "lt": {"$lt": ["l_quantity", {"$lit": t}]},
                "eq": {"$eq": ["l_quantity", {"$lit": t}]},
                "gt": {"$gt": ["l_quantity", {"$lit": t}]},
                "lte": {"$lte": ["l_quantity", {"$lit": t}]},
                # self-comparison: true when non-NULL, NULL when NULL —
                # the NULL-operand detector without leaving the DSL
                "nn": {"$eq": ["l_quantity", "l_quantity"]},
            },
        }
    })
    rows = df.collect()
    for r in rows:
        vals = (r["lt"], r["eq"], r["gt"])
        if r["nn"] is None:  # NULL operand: every comparison is NULL
            assert vals == (None, None, None) and r["lte"] is None
        else:
            assert sum(bool(v) for v in vals) == 1, r
            assert r["lte"] == (r["lt"] or r["eq"])


@pytest.mark.parametrize("seed", [13, 29, 41])
def test_correlated_scalar_partition_identity(eng, seed):
    """σ(x < s) + σ(x >= s) == |rows| when the correlated scalar s
    exists for every row's group (inner = ungated same-table rollup,
    keys dense, operand non-NULL at this fixture) — the partition
    identity through the decorrelation join."""
    rng = random.Random(seed)
    mult = rng.choice([0.25, 0.5, 0.75, 1.0])

    def n(op):
        return eng.query({
            "lineitem": {
                "$filter": {"l_quantity": {op: {"$scalar": {
                    "lineitem": {
                        "$groupby": ["l_partkey"],
                        "$agg": {"t": {"$avg": "l_quantity"}},
                        "$derive": {"t": {"$mul": [mult, "t"]}},
                    },
                    "$on": {"l_partkey": "l_partkey"},
                }}}},
                "$agg": {"n": {"$count": True}},
            }
        }).collect()[0]["n"]

    total = eng.entity("lineitem").count()
    assert n("$lt") + n("$gte") == total


@pytest.mark.parametrize("seed", [7, 17, 31])
def test_multi_fraction_percentile_equals_singles(eng, seed):
    """Each element of a fraction-LIST $approx_percentile equals the
    single-fraction result at that fraction with the same accuracy —
    one sketch read n ways must agree with n separate reads."""
    rng = random.Random(seed)
    fracs = sorted(rng.sample([0.1, 0.25, 0.5, 0.75, 0.9, 0.99], 3))
    acc = rng.choice([100, 10000, 10000000])
    multi = {r["o_orderstatus"]: list(r["qs"]) for r in eng.query({
        "orders": {
            "$groupby": ["o_orderstatus"],
            "$agg": {"qs": {"$approx_percentile":
                            ["o_totalprice", fracs, acc]}},
        }
    }).collect()}
    for i, p in enumerate(fracs):
        single = {r["o_orderstatus"]: r["q"] for r in eng.query({
            "orders": {
                "$groupby": ["o_orderstatus"],
                "$agg": {"q": {"$approx_percentile":
                               ["o_totalprice", p, acc]}},
            }
        }).collect()}
        for k, v in single.items():
            assert multi[k][i] == v, (k, p, acc, multi[k][i], v)


# --- round-16 wave: regex / window-nav / stream identities ----------------

_RX_WORDS = ["the", "data", "scan", "query", "spark", "window", "table",
             "value", "batch", "merge"]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_regex_alternation_is_or_of_branches(eng, seed):
    """σ($regex a|b) == σ($regex a) ∪ σ($regex b) as row sets on the
    key — the alternation/disjunction identity ties the M31 filter
    verb to the engine's own $or semantics through a completely
    different execution path (one rlike vs two unioned scans)."""
    rng = random.Random(seed)
    a, b = rng.sample(_RX_WORDS, 2)

    def ids(flt):
        return {
            r[0]
            for r in eng.query(
                {"documents": {"$filter": flt, "doc_id": True}}
            ).collect()
        }

    both = ids({"text": {"$regex": f"\\b(?:{a}|{b})\\b"}})
    union = ids({"text": {"$regex": f"\\b{a}\\b"}}) | ids(
        {"text": {"$regex": f"\\b{b}\\b"}}
    )
    assert both == union
    assert both  # seeded words really occur in the corpus


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_regex_filter_equals_where_on_like_column(eng, seed):
    """$filter {$regex p} ≡ $select {$regex_like p} + $where — the
    scan-level and post-projection spellings of the same predicate
    must pick the same row set."""
    rng = random.Random(seed)
    w = rng.choice(_RX_WORDS)
    pat = f"\\b{w}\\b"
    scan = {
        r[0]
        for r in eng.query(
            {"documents": {"$filter": {"text": {"$regex": pat}},
                           "doc_id": True}}
        ).collect()
    }
    post = {
        r[0]
        for r in eng.query(
            {"documents": {
                "$select": {
                    "doc_id": "doc_id",
                    "hit": {"$regex_like": ["text", {"$lit": pat}]},
                },
                "$where": {"hit": True},
            }}
        ).collect()
    }
    assert scan == post and scan


def test_regex_replace_nonmatching_is_identity(eng):
    """Replacing a pattern that never matches leaves every string
    bit-identical (masked == text on all rows)."""
    df = eng.query({"documents": {"$select": {
        "doc_id": "doc_id",
        "same": {"$eq": [
            {"$regex_replace": ["text", {"$lit": "zqxj[0-9]{5}"},
                                {"$lit": "#"}]},
            "text",
        ]},
    }}})
    rows = df.collect()
    assert rows and all(r["same"] for r in rows)


def test_regex_extract_all_occurrences_vs_split(eng):
    """extract of group 0 with a .* wrapper returns the text itself
    when the pattern matches — extract(^.*) is the identity on
    matching rows (anchored whole-line capture)."""
    df = eng.query({"documents": {"$select": {
        "doc_id": "doc_id",
        "same": {"$eq": [
            {"$regex_extract": ["text", {"$lit": "^(.*)"}, 1]},
            "text",
        ]},
    }}})
    rows = df.collect()
    assert rows and all(r["same"] for r in rows)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_window_nav_first_reversed_is_last(eng, seed):
    """$first over (cols...) ≡ $last over the direction-flipped order
    — the navigation mirror identity, per partition, on a seeded
    random order spec."""
    rng = random.Random(seed)
    cols = [("o_totalprice", "o_orderkey"), ("o_orderdate", "o_orderkey"),
            ("o_orderkey",)][rng.randrange(3)]
    d1 = rng.choice(["asc", "desc"])
    flip = {"asc": "desc", "desc": "asc"}
    order = [[c, d1] for c in cols]
    rev = [[c, flip[d1]] for c in cols]
    df = eng.query({"orders": {
        "o_orderkey": True,
        "$window": {
            "f": {"$first": {"$partition": ["o_custkey"], "$order": order,
                             "$of": "o_orderkey"}},
            "l": {"$last": {"$partition": ["o_custkey"], "$order": rev,
                            "$of": "o_orderkey"}},
            "n1": {"$nth": {"$partition": ["o_custkey"], "$order": order,
                            "$of": "o_orderkey", "$n": 1}},
        },
    }})
    rows = df.collect()
    assert rows
    assert all(r["f"] == r["l"] for r in rows)   # mirror identity
    assert all(r["n1"] == r["f"] for r in rows)  # nth(1) == first


def test_stream_static_join_left_minus_nulls_is_inner(eng):
    """Left-join rows with a non-NULL enrich field == the inner-join
    rows (multiset on all emitted columns) — the outer/inner
    decomposition identity over the genuinely-partial supplier dim."""
    from collections import Counter

    def rows(how, drop_null):
        df = eng.query({"$stream": {
            "$source": "events",
            "$join": {"$entity": "supplier",
                      "$on": {"user_id": "s_suppkey"},
                      "$fields": ["s_name"], "$how": how},
            "$window": {"$size": "1 hour"},
            "$groupby": ["s_name"],
            "$agg": {"n": {"$count": True}},
        }})
        out = Counter()
        for r in df.collect():
            if drop_null and r["s_name"] is None:
                continue
            out[tuple(r)] += 1
        return out

    assert rows("left", True) == rows("inner", False)


def test_stream_dedup_idempotent_with_window_agg(eng):
    """Aggregating the deduped doubled replay == aggregating the
    plain single replay (complete mode): dedup exactly cancels the
    duplication — counts, not just row sets."""
    from collections import Counter

    deduped = eng.query({"$stream": {
        "$source": "events",
        "$distinct": ["event_id"],
        "$watermark": "2 hours",
        "$window": {"$size": "1 hour"},
        "$groupby": ["event_type"],
        "$agg": {"n": {"$count": True}},
    }})
    plain = eng.query({"$stream": {
        "$source": "events",
        "$window": {"$size": "1 hour"},
        "$groupby": ["event_type"],
        "$agg": {"n": {"$count": True}},
    }})
    got = Counter(tuple(r) for r in deduped.collect())
    want = Counter(tuple(r) for r in plain.collect())
    # append mode drops the unfinalized tail: every emitted row must
    # appear in the complete-mode twin, and at least one window emits
    assert sum(got.values()) > 0
    assert not (got - want)


# ---------------------------------------------------------------- r16b wave
# Metamorphic identities for the round-16b verbs: array HOFs, calendar
# parts, numeric verbs, $from composition, subquery membership, string
# shape verbs, boolean/distinct aggregates.


def test_prop_array_filter_partitions_size(eng):
    """|filter(w, len>k)| + |filter(w, len<=k)| == |w| per row (the
    lambda partition identity; NULL text rows stay NULL throughout)."""
    words = {"$split": ["text", {"$lit": " "}]}
    rows = eng.query({"documents": {
        "doc_id": True,
        "$select": {
            "n": {"$size": words},
            "a": {"$size": {"$array_filter": [
                words, {"$gt": [{"$length": "$x"}, 4]}]}},
            "b": {"$size": {"$array_filter": [
                words, {"$lte": [{"$length": "$x"}, 4]}]}},
        },
    }}).collect()
    assert rows
    for r in rows:
        if r["n"] is None:
            assert r["a"] is None and r["b"] is None
        else:
            assert r["a"] + r["b"] == r["n"]


def test_prop_array_transform_preserves_size_and_reverse_involution(eng):
    rows = eng.query({"documents": {
        "doc_id": True,
        "$select": {
            "n": {"$size": {"$split": ["text", {"$lit": " "}]}},
            "nt": {"$size": {"$array_transform": [
                {"$split": ["text", {"$lit": " "}]},
                {"$upper": "$x"}]}},
            "t": "text",
            "rr": {"$reverse": {"$reverse": "text"}},
        },
    }}).collect()
    for r in rows:
        assert r["n"] == r["nt"]
        assert r["rr"] == r["t"]


def test_prop_floor_ceil_negation_and_sqrt_square(eng):
    rows = eng.query({"lineitem": {
        "$select": {
            "fl": {"$floor": "l_quantity"},
            "nc": {"$ceil": {"$sub": [0.0, "l_quantity"]}},
            "q": "l_quantity",
            "rt2": {"$pow": [{"$sqrt": "l_quantity"}, 2.0]},
        },
        "$limit": 500,
    }}).collect()
    for r in rows:
        assert r["fl"] + r["nc"] == 0
        assert abs(r["rt2"] - r["q"]) < 1e-9


def test_prop_date_add_roundtrip_and_dow_weekly_period(eng):
    d = {"$cast": ["o_orderdate", {"$lit": "date"}]}
    rows = eng.query({"orders": {
        "$select": {
            "delta": {"$datediff": [{"$date_add": [d, 30]}, d]},
            "dw0": {"$dow_iso": d},
            "dw7": {"$dow_iso": {"$date_add": [d, 7]}},
            "back": {"$date_sub": [{"$date_add": [d, 13]}, 13]},
            "orig": d,
        },
        "$limit": 400,
    }}).collect()
    for r in rows:
        assert r["delta"] == 30
        assert r["dw0"] == r["dw7"]
        assert r["back"] == r["orig"]


def test_prop_strpos_contains_consistency_and_pad_length(eng):
    rows = eng.query({"documents": {
        "$select": {
            "c": {"$contains": ["text", {"$lit": "data"}]},
            "p": {"$strpos": ["text", {"$lit": "data"}]},
            "ln": {"$length": {"$lpad": ["lang", 7, {"$lit": "*"}]}},
        },
    }}).collect()
    for r in rows:
        if r["c"] is None:
            # code-review r16b: parenthesized — the earlier
            # `a and b or c` spelling made the p-is-None claim
            # vacuous whenever ln == 7
            assert r["p"] is None
            assert r["ln"] is None or r["ln"] == 7
        else:
            assert r["c"] == (r["p"] > 0)
    assert all(r["ln"] in (None, 7) for r in rows)


def test_prop_from_identity_passthrough(eng):
    """{"$from": X, <all X's columns>: True} ≡ X."""
    inner = {"orders": {"o_orderkey": True, "o_custkey": True,
                        "$filter": {"o_orderstatus": "F"}}}
    base = eng.query(inner)
    wrapped = eng.query({"$from": dict(inner),
                         "o_orderkey": True, "o_custkey": True})
    from collections import Counter
    assert Counter(tuple(r) for r in base.collect()) == \
        Counter(tuple(r) for r in wrapped.collect())


def test_prop_in_query_semi_anti_partition(eng):
    """semi + anti on the same membership set partition the outer
    table (c_custkey is never NULL in the fixture)."""
    sub = {"orders": {"o_custkey": True,
                      "$filter": {"o_totalprice": {"$gt": 150000.0}}}}
    n_all = eng.query({"customer": {"c_custkey": True}}).count()
    n_in = eng.query({"customer": {
        "c_custkey": True,
        "$filter": {"c_custkey": {"$in_query": dict(sub)}}}}).count()
    n_out = eng.query({"customer": {
        "c_custkey": True,
        "$filter": {"c_custkey": {"$not_in_query": dict(sub)}}}}).count()
    assert n_in + n_out == n_all


def test_prop_bool_aggs_de_morgan_and_distinct_algebra(eng):
    """bool_or(p) == NOT bool_and(NOT p) over non-NULL p, and
    avg_distinct * count_distinct == sum_distinct on exact ints."""
    rows = eng.query({"lineitem": {
        "$select": {
            "p": {"$gt": ["l_quantity", 30.0]},
            "np": {"$lte": ["l_quantity", 30.0]},
            "qi": {"$cast": ["l_quantity", {"$lit": "int"}]},
        },
        "$groupby": ["l_returnflag"],
        "$agg": {
            "any_p": {"$bool_or": "p"},
            "all_np": {"$bool_and": "np"},
            "cd": {"$count_distinct": "qi"},
            "sd": {"$sum_distinct": "qi"},
            "ad": {"$avg_distinct": "qi"},
        },
    }}).collect()
    assert rows
    for r in rows:
        assert r["any_p"] == (not r["all_np"])
        assert abs(r["ad"] * r["cd"] - r["sd"]) < 1e-9


def test_prop_calendar_parts_consistency(eng):
    """quarter/doy/week/dow cross-checks: quarter from month, doy
    monotone within a year vs datediff from Jan 1."""
    rows = eng.query({"events": {
        "$select": {
            "m": {"$month": "ts"},
            "q": {"$quarter": "ts"},
            "doy": {"$doy": "ts"},
            "jan1_delta": {"$datediff": [
                {"$cast": ["ts", {"$lit": "date"}]},
                {"$date_trunc": [{"$cast": ["ts", {"$lit": "date"}]},
                                 {"$lit": "year"}]}]},
        },
        "$limit": 500,
    }}).collect()
    for r in rows:
        assert r["q"] == (r["m"] - 1) // 3 + 1
        assert r["doy"] == r["jan1_delta"] + 1


def test_prop_bag_algebra(eng):
    """|A ∖all B| == |A| − |A ∩all B| (bag identity), and the bag ops
    degrade to the DISTINCT forms after $distinct branches."""
    a = {"orders": {"$select": {"k": "o_custkey"},
                    "$filter": {"o_orderstatus": "F"}}}
    b = {"orders": {"$select": {"k": "o_custkey"},
                    "$filter": {"o_orderpriority": "1-URGENT"}}}
    n_a = eng.query(dict(a)).count()
    n_minus = eng.query({"$except_all": [dict(a), dict(b)]}).count()
    n_inter = eng.query({"$intersect_all": [dict(a), dict(b)]}).count()
    assert n_minus == n_a - n_inter
    ad = {"orders": {"$select": {"k": "o_custkey"},
                     "$filter": {"o_orderstatus": "F"},
                     "$distinct": True}}
    bd = {"orders": {"$select": {"k": "o_custkey"},
                     "$filter": {"o_orderpriority": "1-URGENT"},
                     "$distinct": True}}
    from collections import Counter
    bag_on_sets = Counter(
        tuple(r) for r in
        eng.query({"$intersect_all": [ad, bd]}).collect())
    distinct_op = Counter(
        tuple(r) for r in
        eng.query({"$intersect": [dict(a), dict(b)]}).collect())
    assert bag_on_sets == distinct_op


def test_prop_join_frames_full_decomposes(eng):
    """full = inner + left-only + right-only (row counts), and inner
    equals the both-sides-non-NULL slice of full."""
    left = {"orders": {"$select": {"k": "o_custkey"},
                       "$filter": {"o_orderstatus": "P"},
                       "$groupby": ["k"], "$agg": {"np": {"$count": True}}}}
    right = {"orders": {"$select": {"k2": "o_custkey"},
                        "$filter": {"o_orderstatus": "F"},
                        "$groupby": ["k2"], "$agg": {"nf": {"$count": True}}}}

    def q(how):
        return eng.query({"$join": {"$left": dict(left),
                                    "$right": dict(right),
                                    "$on": {"k": "k2"}, "$how": how},
                          "k": True, "np": True, "nf": True})

    full_rows = q("full").collect()
    n_inner = q("inner").count()
    n_left_only = sum(1 for r in full_rows if r["nf"] is None)
    n_right_only = sum(1 for r in full_rows if r["np"] is None)
    assert len(full_rows) == n_inner + n_left_only + n_right_only
    both = sum(1 for r in full_rows
               if r["np"] is not None and r["nf"] is not None)
    assert both == n_inner


def test_prop_ilike_contains_like_and_is_case_blind(eng):
    """$ilike('%P%') rows ⊇ $like('%P%') rows, and $ilike is invariant
    under pattern case."""
    up = eng.query({"documents": {
        "doc_id": True, "$filter": {"text": {"$ilike": "%DATA%"}}}})
    low = eng.query({"documents": {
        "doc_id": True, "$filter": {"text": {"$ilike": "%data%"}}}})
    strict = eng.query({"documents": {
        "doc_id": True, "$filter": {"text": {"$like": "%data%"}}}})
    up_ids = {r[0] for r in up.collect()}
    low_ids = {r[0] for r in low.collect()}
    strict_ids = {r[0] for r in strict.collect()}
    assert up_ids == low_ids
    assert strict_ids <= up_ids
