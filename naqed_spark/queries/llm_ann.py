"""Random-hyperplane LSH similarity join — the sub-quadratic scale path
for embedding-cosine near-dup (SURVEY.md §2-K).

``llm_similarity_threshold_join`` (llm.py) is the blocked-brute-force
baseline: exact, O(n²) FLOPs. This operator is the 100 TB form: sign-of-
dot-product signatures against fixed random hyperplanes, banded so that
similar vectors collide in at least one band, exact cosine verification
on the (linear-ish) candidate set only. Same shape as the MinHash/LSH
text path (llm_neardup_lsh) but for the embedding column.

Cross-engine determinism: the hyperplanes are ±1 vectors derived from
md5 (`_plane`) ONCE at import and inlined into BOTH the Spark
expressions and the DuckDB oracle as literals — the two engines share
the exact same planes by construction, so the emitted pair set is
hash-identical (the oracle is exact equality, not a recall bound).

Scale knobs (module constants; the oracle is generated from the same
values so they can never drift apart):
  - ``_NBITS``/``_NBANDS``: 16 bits, 4 bands × 4 bits fits the fixture
    corpus (16 buckets/band). At corpus scale bits-per-band grows
    ~log2(n) to keep band buckets bounded — more bits = fewer, more
    precise candidates; recall is recovered by adding bands.
  - ``_DIM``: fixture embeddings are dim-64; planes are generated for
    the declared dim.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from naqed_spark.queries._util import r6, scoped_persist
from naqed_spark.queries.llm import _VECS_SQL, _vecs
from naqed_spark.registry import query

_NBITS = 16
_NBANDS = 4
_BPB = _NBITS // _NBANDS  # bits per band
_DIM = 64
_TAU = 0.3  # strict >, raw value — same convention as the brute-force join


def _plane(b: int, i: int) -> float:
    """Deterministic ±1 hyperplane component: parity of the first hex
    digit of md5('hp:b:i'). Public derivation, reproducible anywhere."""
    d = hashlib.md5(f"hp:{b}:{i}".encode()).hexdigest()
    return 1.0 if (int(d[0], 16) & 1) else -1.0


_PLANES = [[_plane(b, i) for i in range(_DIM)] for b in range(_NBITS)]


def _spark_band(k: int) -> str:
    """SQL expr: integer value of band k (bits 4k..4k+3, MSB first) of a
    row's signature — sign-of-dot against each plane, packed."""
    bits = []
    for j in range(_BPB):
        arr = "array(" + ",".join(f"{x:.1f}D" for x in _PLANES[_BPB * k + j]) + ")"
        dot = f"aggregate(zip_with(e, {arr}, (x, p) -> x * p), 0D, (a, x) -> a + x)"
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << (_BPB - 1 - j)} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def _duck_band(k: int) -> str:
    bits = []
    for j in range(_BPB):
        arr = "[" + ",".join(f"{x:.1f}" for x in _PLANES[_BPB * k + j]) + "]"
        bits.append(
            f"(CASE WHEN list_dot_product(e, {arr}) >= 0"
            f" THEN {1 << (_BPB - 1 - j)} ELSE 0 END)"
        )
    return "(" + " + ".join(bits) + ")"


_DUCK_BV = (
    "CASE bi " +
    " ".join(f"WHEN {k} THEN band{k}" for k in range(_NBANDS - 1)) +
    f" ELSE band{_NBANDS - 1} END"
)


@query(
    "llm_ann_hyperplane_lsh",
    # Exact oracle twin: identical plane literals, identical band packing,
    # identical candidate join and cosine verification — the result is the
    # same deterministic pair set on both engines (candidates that share
    # >= 1 band AND have raw cosine > τ).
    oracle=f"""
    WITH v AS ({_VECS_SQL}),
    sig AS (
      SELECT vec_id, e, nrm,
             {", ".join(f"{_duck_band(k)} AS band{k}" for k in range(_NBANDS))}
      FROM v
    ),
    cand AS (
      SELECT vec_id, bi, {_DUCK_BV} AS bv
      FROM sig CROSS JOIN (VALUES {", ".join(f"({k})" for k in range(_NBANDS))}) t(bi)
    ),
    p AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM cand a JOIN cand b
        ON a.bi = b.bi AND a.bv = b.bv AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b,
           round(list_dot_product(va.e, vb.e) / (va.nrm * vb.nrm), 6) AS sim
    FROM p
    JOIN v va ON va.vec_id = id_a
    JOIN v vb ON vb.vec_id = id_b
    WHERE list_dot_product(va.e, vb.e) / (va.nrm * vb.nrm) > {_TAU}
    """,
)
def llm_ann_hyperplane_lsh(spark, sf_dir):
    """Banded hyperplane LSH: signature scan → band equi-join candidates →
    exact cosine verify on candidates only.

    Scale shape: the signature pass is one codegen scan (the plane dots
    are JVM higher-order functions over literal arrays — no Python, no
    shuffle); candidates come from a hash equi-join on (band_idx,
    band_value), never a cartesian; verification joins the two vector
    sides back by id (two shuffle equi-joins of candidate-sized frames).
    Candidate volume is Σ_buckets |bucket|²/2 per band — bounded by
    growing bits-per-band with corpus size (module docstring).
    """
    v = _vecs(spark, sf_dir).select("vec_id", "e", "nrm")
    sig = v.select(
        "vec_id",
        *[F.expr(_spark_band(k)).alias(f"band{k}") for k in range(_NBANDS)],
    )
    cand = scoped_persist(
        sig.select(
            "vec_id",
            F.posexplode(
                F.array(*[f"band{k}" for k in range(_NBANDS)])
            ).alias("bi", "bv"),
        )
        # r16 opt: both legs of the candidate self-join re-derived the
        # signature pass (16 plane dots per vector) — persist the n×4
        # band table so it materializes once (scoped; released at the
        # next query build).
    )
    pairs = (
        cand.alias("a")
        .join(
            cand.alias("b"),
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
        )
        .distinct()
    )
    dot = "aggregate(zip_with(ea, eb, (x, y) -> x * y), 0D, (a, x) -> a + x)"
    return (
        pairs.join(
            v.select(
                F.col("vec_id").alias("id_a"),
                F.col("e").alias("ea"),
                F.col("nrm").alias("na"),
            ),
            "id_a",
        )
        .join(
            v.select(
                F.col("vec_id").alias("id_b"),
                F.col("e").alias("eb"),
                F.col("nrm").alias("nb"),
            ),
            "id_b",
        )
        .withColumn("sim_raw", F.expr(dot) / (F.col("na") * F.col("nb")))
        .filter(F.col("sim_raw") > _TAU)
        .select("id_a", "id_b", r6(F.col("sim_raw")).alias("sim"))
    )
