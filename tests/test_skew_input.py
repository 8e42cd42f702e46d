"""Hot-key skew + duplicate-corpus battery (round 10).

At 100 TB, skew is the norm: one customer produces most orders, one
user most events, one source most documents, and crawl corpora are
full of exact duplicates. The previous dirty-data batteries (empty /
null-heavy / all-ties / multibyte) never concentrated the JOIN and
GROUP keys, so the skew-specific code paths (salted joins, per-group
two-phase machinery with one giant group, sessionize on one hot user,
window partitions of very different sizes, dedup with one massive
duplicate group) had semantic coverage only on near-uniform data.

This fixture rewrites (keeping every PRIMARY key unique, so the §7.3
unique-tiebreak determinism contracts hold):

- 70% of orders.o_custkey -> ONE hot customer (group-by skew, join
  fan-out, windows with one giant partition);
- 70% of lineitem.l_suppkey -> ONE hot supplier (EXISTS/star joins);
- 70% of events.user_id -> ONE hot user (sessionize, graph edges,
  interval joins, stateful streaming all funnel through it);
- 50% of documents.text -> ONE duplicated payload (exact/near dedup,
  MinHash/SimHash buckets, winnowing, containment see a giant group;
  n_chars kept consistent with the new text).

Every registered key must run AND hash-match its DuckDB oracle on this
fixture — the oracle recomputes the same skewed inputs, so any
divergence is a real skew-path semantic bug, not a tuning artifact.
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

HOT_TEXT = "the hot duplicate corpus row repeated across half the table"

load_all()


@pytest.fixture(scope="session")
def spark():
    yield tune_session(get_spark("naqed-tests"))


def _skew(col, hot_value, every=10, keep=3):
    """Send all but every ``every``-th-window ``keep`` rows to the hot
    key: positions where (i % every) >= keep become ``hot_value`` (70%
    for 10/3), the rest keep their original value — deterministic and
    order-stable."""
    vals = col.to_pylist()
    out = [
        v if (i % every) < keep else hot_value
        for i, v in enumerate(vals)
    ]
    return pa.array(out, type=col.type)


@pytest.fixture(scope="session")
def skew_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_skew")
    hot_cust = int(
        pq.read_table(os.path.join(SCHEMA_SRC, "customer.parquet"))
        .column("c_custkey")[0]
        .as_py()
    )
    hot_supp = int(
        pq.read_table(os.path.join(SCHEMA_SRC, "supplier.parquet"))
        .column("s_suppkey")[0]
        .as_py()
    )
    for t in TABLES:
        tbl = pq.read_table(os.path.join(SCHEMA_SRC, t + ".parquet"))
        cols = {n: tbl.column(n).combine_chunks() for n in tbl.schema.names}
        if t == "orders":
            cols["o_custkey"] = _skew(cols["o_custkey"], hot_cust)
        elif t == "lineitem":
            cols["l_suppkey"] = _skew(cols["l_suppkey"], hot_supp)
        elif t == "events":
            hot_user = int(cols["user_id"][0].as_py())
            cols["user_id"] = _skew(cols["user_id"], hot_user)
        elif t == "documents":
            texts = cols["text"].to_pylist()
            new_texts = [
                v if (i % 2) == 0 else HOT_TEXT
                for i, v in enumerate(texts)
            ]
            cols["text"] = pa.array(new_texts, type=cols["text"].type)
            cols["n_chars"] = pa.array(
                [None if v is None else len(v) for v in new_texts],
                type=cols["n_chars"].type,
            )
        pq.write_table(pa.table(cols), str(d / (t + ".parquet")))
    return str(d)


def test_every_key_matches_oracle_on_skewed_tables(spark, skew_sf_dir):
    """One loop over the registry: every key must run AND hash-match its
    DuckDB oracle on the hot-key/duplicate-corpus fixture (rows-only
    sketch keys: run + their usual ≥1-row floor)."""
    con = duck_connect(skew_sf_dir)
    failures: list[str] = []
    try:
        for key in sorted(QUERIES):
            try:
                problems = check_key(spark, con, key, skew_sf_dir)
            except Exception as exc:  # noqa: BLE001
                failures.append(f"{key}: raised {exc!r}")
                continue
            failures.extend(f"{key}: {p}" for p in problems)
    finally:
        con.close()
    assert not failures, (
        f"{len(failures)} skew-input failures:\n" + "\n".join(failures)
    )
