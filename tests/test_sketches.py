"""Metamorphic properties of the hash-exact relational sketches
(round 8): invariants that hold by construction for REAL sketch
algorithms, checked on live Spark frames — a correctness layer the
value-hash oracle can't express (it only proves engine parity).
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from naqed_spark.queries._util import load
from naqed_spark.registry import QUERIES, load_all
from naqed_spark.session import get_spark, tune_session

SF_DIR = os.environ.get("NAQED_TEST_SF_DIR", "/root/testdata/sf0.001")

load_all()


@pytest.fixture(scope="module")
def spark():
    yield tune_session(get_spark("naqed-sketch-tests"))


def test_hll_estimate_within_error_bound(spark):
    """256 registers → σ ≈ 1.04/√256 = 6.5%; require every group's
    estimate within 4σ of exact (the driver-checked key already proves
    engine parity; this proves the SKETCH is calibrated)."""
    rows = QUERIES["agg_hll_from_scratch"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert abs(r.rel_err) < 4 * 0.065, (r.event_type, r.rel_err)


def test_hll_invariant_under_duplication(spark):
    """Distinct-count sketches must ignore multiplicity: doubling every
    event row leaves all registers (maxima) — and thus the estimate —
    bit-identical."""
    base = QUERIES["agg_hll_from_scratch"](spark, SF_DIR).collect()

    ev = load(spark, SF_DIR, "events")
    doubled = ev.unionAll(ev)
    doubled.createOrReplaceTempView("_hll_doubled")
    # re-run the same pipeline inline over the doubled frame
    B = 4294967296
    v = doubled.select(
        "event_type",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 10),
            16, 10,
        ).cast("bigint").alias("v"),
    )
    b = v.select(
        "event_type",
        ((F.col("v") - F.col("v") % B) / B).cast("bigint").alias("bucket"),
        (F.col("v") % B).alias("w"),
    )
    rho = F.when(F.col("w") == 0, 33).otherwise(
        33 - F.length(F.bin(F.col("w")))
    )
    regs = b.groupBy("event_type", "bucket").agg(F.max(rho).alias("m"))
    z = regs.groupBy("event_type").agg(
        (F.sum(F.pow(F.lit(2.0), -F.col("m"))) + (256 - F.count("*")))
        .alias("zz")
    ).collect()
    # compare the harmonic denominators: identical registers → identical zz
    base_z = {}
    vb = load(spark, SF_DIR, "events").select(
        "event_type",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 10),
            16, 10,
        ).cast("bigint").alias("v"),
    )
    bb = vb.select(
        "event_type",
        ((F.col("v") - F.col("v") % B) / B).cast("bigint").alias("bucket"),
        (F.col("v") % B).alias("w"),
    )
    regs_b = bb.groupBy("event_type", "bucket").agg(F.max(rho).alias("m"))
    for r in regs_b.groupBy("event_type").agg(
        (F.sum(F.pow(F.lit(2.0), -F.col("m"))) + (256 - F.count("*")))
        .alias("zz")
    ).collect():
        base_z[r.event_type] = r.zz
    for r in z:
        assert r.zz == base_z[r.event_type], r.event_type
    assert base  # driver-checked key stays sane


def test_bloom_has_no_false_negatives(spark):
    """Probing a Bloom filter with its OWN build keys must return every
    key as positive — the one guarantee a Bloom filter makes."""
    cust = load(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    build = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )

    def cells(df):
        i = F.explode(F.array(*[F.lit(x) for x in range(3)])).alias("i")
        return df.select("c_custkey", i).select(
            "c_custkey",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("i").cast("string"),
                                F.lit(":"),
                                F.col("c_custkey").cast("string"),
                            )
                        ),
                        1, 8,
                    ),
                    16, 10,
                ).cast("bigint") % 4096
            ).alias("bit"),
        )

    bits = cells(build).select("bit").distinct()
    hits = (
        cells(build)
        .join(bits, "bit")
        .groupBy("c_custkey")
        .agg(F.count_distinct("bit").alias("nb"))
        .filter(F.col("nb") == 3)
    )
    assert hits.count() == build.count()


def test_countmin_never_underestimates(spark):
    """CM estimates are min-of-sums over cells each containing the true
    count — overcount ≥ 0 for EVERY reported token, never negative."""
    rows = QUERIES["agg_countmin_sketch"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.overcount >= 0, (r.tok, r.overcount)
        assert r.cm_estimate >= r.exact_cnt


def test_ks_distance_of_identical_samples_is_zero(spark):
    """Metamorphic identity: KS distance of a distribution against
    itself is exactly 0 (same ECDF at every support point)."""
    ev = load(spark, SF_DIR, "events").select("event_type", "value")
    a = ev.filter(F.col("event_type") == "click")
    from pyspark.sql import Window

    pts = a.groupBy("value").agg(F.count("*").alias("c"))
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n = a.count()
    d = (
        pts.select(
            (F.sum("c").over(w) / F.lit(float(n))
             - F.sum("c").over(w) / F.lit(float(n))).alias("d")
        )
        .agg(F.max(F.abs("d")).alias("ks"))
        .collect()[0].ks
    )
    assert d == 0.0


def test_approx_count_distinct_dsl_estimate_calibrated(spark):
    """M24 (round 15): the driver key's hash-exact emission is the
    ≤5% CONTRACT boolean; this pins the underlying Spark estimate
    tighter (rsd 0.01 → require every group within 5σ = 5%) and
    deterministic across two runs (HLL++ has no RNG: same input, same
    registers, same estimate)."""
    from naqed_spark.compiler.engine import Engine

    eng = Engine(spark, SF_DIR)
    spec = {
        "events": {
            "$groupby": ["event_type"],
            "$agg": {
                "n_exact": {"$count_distinct": "user_id"},
                "n_approx": {"$approx_count_distinct": ["user_id", 0.01]},
            },
        }
    }
    rows = eng.query(spec).collect()
    assert rows
    for r in rows:
        if r.n_exact:
            assert abs(r.n_approx - r.n_exact) <= 0.05 * r.n_exact, (
                r.event_type, r.n_approx, r.n_exact)
        else:
            assert r.n_approx == 0
    again = {r.event_type: r.n_approx for r in eng.query(spec).collect()}
    assert again == {r.event_type: r.n_approx for r in rows}


def test_approx_percentile_dsl_rank_error_bound(spark):
    """M24: at accuracy A the sketch's rank error is ≤ n/A. Run the
    DSL op at a LOW accuracy (A=10, coarse sketch) and assert every
    group's estimate sits between the exact (p−1/A) and (p+1/A)
    quantiles — the algorithm's published guarantee, checked on live
    frames."""
    from naqed_spark.compiler.engine import Engine

    eng = Engine(spark, SF_DIR)
    got = eng.query({
        "orders": {
            "$groupby": ["o_orderpriority"],
            "$agg": {"p50": {"$approx_percentile":
                             ["o_totalprice", 0.5, 10]}},
            "$derive": {"p50": {"$cast": ["p50", {"$lit": "double"}]}},
        }
    }).collect()
    assert got
    exact = load(spark, SF_DIR, "orders").groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.4)").alias("lo"),
        F.expr("percentile(o_totalprice, 0.6)").alias("hi"),
    ).collect()
    bounds = {r.o_orderpriority: (float(r.lo), float(r.hi)) for r in exact}
    for r in got:
        lo, hi = bounds[r.o_orderpriority]
        assert lo <= r.p50 <= hi, (r.o_orderpriority, r.p50, lo, hi)
