"""Tie-heavy + multibyte-text battery (round 9).

Two more dirty-data classes, combined into one fixture because they
touch disjoint columns:

- **Maximal ties**: every continuous measure column is CONSTANT
  (o_totalprice, l_quantity/extendedprice/discount/tax, events.value,
  c_acctbal). Every rank, top-k, percentile, skyline and window key now
  ties on its whole input — the registry's deterministic-tiebreak
  discipline (explicit id tiebreaks in every ORDER BY, value-statistics
  grids, two-phase ranks) must hold exactly, or engines order ties
  differently and hashes explode. The round-9 probe ran 356/356 with
  ZERO code changes — this battery keeps it that way.
- **Multibyte text**: documents.text decorated with accented Latin,
  CJK, Cyrillic and emoji (n_chars kept consistent). Code-point
  length/substr, UTF-8 md5, split and shingle boundaries must agree
  across engines.

The regex word boundary was the one initial divergence here: Java's
``\\b`` is Unicode-aware while DuckDB/RE2's is ASCII-only (RE2 sees a
boundary inside "ça" and matches the "a" as a vowel word). RE2 has no
lookbehind, so the common semantic is RE2's: ``fn_regex``'s Spark side
now spells the boundary as the explicit ASCII lookbehind
``(?<![A-Za-z0-9_])``, and the whole registry holds FULL oracle parity
on this fixture.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from naqed_spark.catalog import TABLES
from naqed_spark.oracle_check import check_key, duck_connect
from naqed_spark.registry import QUERIES, load_all
from naqed_spark.session import get_spark, tune_session

SCHEMA_SRC = os.environ.get("NAQED_TEST_SF_DIR", "/root/testdata/sf0.001")

CONST = {
    "orders": {"o_totalprice": 1000.0},
    "lineitem": {
        "l_quantity": 25.0,
        "l_extendedprice": 1000.0,
        "l_discount": 0.05,
        "l_tax": 0.05,
    },
    "events": {"value": 50.0},
    "customer": {"c_acctbal": 500.0},
}
DECOR = [
    "héllo wörld",
    "日本語 テキスト",
    "emoji 🙂 here",
    "кириллица текст",
    "ça à ü ñ",
]
load_all()


@pytest.fixture(scope="session")
def spark():
    yield tune_session(get_spark("naqed-tests"))


@pytest.fixture(scope="session")
def adversarial_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_adversarial")
    for t in TABLES:
        tbl = pq.read_table(os.path.join(SCHEMA_SRC, t + ".parquet"))
        spec = CONST.get(t, {})
        cols = {}
        for name in tbl.schema.names:
            col = tbl.column(name).combine_chunks()
            if name in spec:
                col = pa.array([spec[name]] * tbl.num_rows, type=col.type)
            cols[name] = col
        if t == "documents":
            texts = [
                (x + " " + DECOR[i % len(DECOR)])
                if (x is not None and i % 3 == 0)
                else x
                for i, x in enumerate(cols["text"].to_pylist())
            ]
            cols["text"] = pa.array(texts, type=pa.string())
            cols["n_chars"] = pa.array(
                [len(x) if x is not None else None for x in texts],
                type=pa.int64(),
            )
        pq.write_table(pa.table(cols), str(d / (t + ".parquet")))
    return str(d)


def test_every_key_matches_oracle_on_ties_and_multibyte_text(
    spark, adversarial_sf_dir
):
    con = duck_connect(adversarial_sf_dir)
    failures: list[str] = []
    try:
        for key in sorted(QUERIES):
            try:
                problems = check_key(spark, con, key, adversarial_sf_dir)
            except Exception as exc:  # noqa: BLE001
                failures.append(f"{key}: raised {exc!r}")
                continue
            failures.extend(f"{key}: {p}" for p in problems)
    finally:
        con.close()
    assert not failures, (
        f"{len(failures)} adversarial-input failures:\n"
        + "\n".join(failures)
    )
