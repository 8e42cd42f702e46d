"""Null-heavy dirty-data battery (round 9).

At 100 TB, nulls in payload columns are the NORM: crawl text that failed
to extract, events with no measured value, missing media payloads,
unlabeled lang/source. The round-9 null probe (nulls planted in
documents.text/lang/source, events.props/value, customer.c_mktsegment/
c_acctbal, orders.o_orderpriority — keys and timestamps intact) found 27
keys that crashed or silently diverged from their oracles:

- crashes: llm_chunk_windows (sequence(1, size(NULL)=-1)), udtf_python
  (None.split), the multimodal feature extractor (len(None)),
  stream_stateful_count (astype int64 on NaN), and the fn_json ORACLE
  (DuckDB concat() skips NULLs → malformed JSON);
- null-group drops: the two-phase value-grid join-backs equi-joined on
  group columns, so NULL groups vanished while GROUP BY kept them
  (fixed null-safe in aggs._ns_bjoin / _grouped_range_bucketed);
- semantic divergences: size(NULL) = -1 vs NULL, concat null-skip vs
  propagate, ANY/ALL three-valued logic, regr_slope pair-exclusion,
  EWMA over missing observations, all-NULL-group sums.

All fixed with DEFINED semantics mirrored in both engines; this battery
pins every key to full oracle parity on the null fixture.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from naqed_spark.catalog import TABLES
from naqed_spark.oracle_check import check_key, duck_connect
from naqed_spark.registry import QUERIES, load_all
from naqed_spark.session import get_spark, tune_session

SCHEMA_SRC = os.environ.get("NAQED_TEST_SF_DIR", "/root/testdata/sf0.001")

# column -> null every k-th row (keys and timestamps stay non-null)
NULL_SPEC = {
    "documents": {"text": 7, "lang": 5, "source": 6},
    "events": {"props": 5, "value": 3, "event_type": 8},
    "customer": {"c_mktsegment": 4, "c_acctbal": 5},
    # NULL outer operand for the ANY/ALL quantifiers (round-10 ADVICE):
    # sub_any_all compares s_acctbal against a per-nation set — a NULL
    # outer value must yield UNKNOWN for both quantifiers, not the
    # empty-set defaults.
    "supplier": {"s_acctbal": 5},
    # o_totalprice nulls (round 11): compiler_unpivot stacks it into a
    # typed value column — NULL measures must survive the cast in both
    # engines (and every other orders-measure oracle must already hold
    # under SQL null-skipping aggregation semantics)
    "orders": {"o_orderpriority": 6, "o_totalprice": 19},
    # category/flag columns: the second null wave (round 9) — these feed
    # GROUP BY / PARTITION BY keys, so they flush out null-group drops
    # at join-backs and null-sort-order divergence
    "lineitem": {
        "l_returnflag": 9,
        "l_linestatus": 11,
        # measure columns feeding the two-phase value grids (round-10
        # probe after the agg_ks_statistic NULL-support-point fix: a
        # NULL measure must never become a _range_bucketed support
        # point or a divergently-sorted rank row) — swept 358/358 green
        "l_quantity": 13,
        "l_extendedprice": 17,
    },
}
# measure column -> (negate every nk-th, zero every zk-th) on rows the
# null spec left alone — the extreme-value class (log/sqrt domains,
# zero variance, zero prices) swept 356/356 clean in round 9; folding
# it into this fixture keeps it pinned without another battery
EXTREME_SPEC = {
    "events": ("value", 4, 7),
    "customer": ("c_acctbal", 4, 9),
    "orders": ("o_totalprice", 11, 9),
}

load_all()


@pytest.fixture(scope="session")
def spark():
    yield tune_session(get_spark("naqed-tests"))


@pytest.fixture(scope="session")
def null_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_nulls")
    for t in TABLES:
        tbl = pq.read_table(os.path.join(SCHEMA_SRC, t + ".parquet"))
        spec = NULL_SPEC.get(t, {})
        n = tbl.num_rows
        cols = {}
        ex = EXTREME_SPEC.get(t)
        for name in tbl.schema.names:
            col = tbl.column(name).combine_chunks()
            if name in spec:
                k = spec[name]
                mask = pa.array([(i % k) == 0 for i in range(n)])
                col = pc.if_else(mask, pa.nulls(n, type=col.type), col)
            if ex and name == ex[0]:
                _, nk, zk = ex
                vals = []
                for i, v in enumerate(col.to_pylist()):
                    if v is None:
                        vals.append(v)
                    elif i % zk == 0:
                        vals.append(0.0)
                    elif i % nk == 0:
                        vals.append(-abs(v))
                    else:
                        vals.append(v)
                col = pa.array(vals, type=col.type)
            cols[name] = col
        pq.write_table(pa.table(cols), str(d / (t + ".parquet")))
    return str(d)


def test_every_key_matches_oracle_on_null_heavy_tables(spark, null_sf_dir):
    """One loop over the registry: every key must run AND hash-match its
    DuckDB oracle on the null-planted fixture (rows-only sketch keys:
    run + their usual ≥1-row floor, enforced by check_key itself)."""
    con = duck_connect(null_sf_dir)
    failures: list[str] = []
    try:
        for key in sorted(QUERIES):
            try:
                problems = check_key(spark, con, key, null_sf_dir)
            except Exception as exc:  # noqa: BLE001
                failures.append(f"{key}: raised {exc!r}")
                continue
            failures.extend(f"{key}: {p}" for p in problems)
    finally:
        con.close()
    assert not failures, (
        f"{len(failures)} null-input failures:\n" + "\n".join(failures)
    )


def test_collect_segments_all_null_group(spark, tmp_path):
    """Round-13 self-review pass 2: an ALL-NULL group is the one spot
    where Spark's collect_* (empty array → '' after join) and DuckDB's
    FILTERed list() (NULL over zero surviving rows → NULL after
    array_to_string) diverge — the key's oracle carries a COALESCE to
    encode the engine contract. The regular fixtures never produce such
    a group, so manufacture one (nation 0 all-NULL) and run the full
    check_key gate over it."""
    src = SCHEMA_SRC
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        if t == "customer":
            nk = tbl.column("c_nationkey").combine_chunks()
            seg = tbl.column("c_mktsegment").combine_chunks()
            mask = pc.equal(nk, 0)
            seg = pc.if_else(
                mask, pa.nulls(tbl.num_rows, type=seg.type), seg
            )
            tbl = tbl.set_column(
                tbl.schema.get_field_index("c_mktsegment"),
                "c_mktsegment",
                seg,
            )
        pq.write_table(tbl, str(tmp_path / (t + ".parquet")))
    con = duck_connect(str(tmp_path))
    try:
        problems = check_key(
            spark, con, "compiler_collect_segments", str(tmp_path)
        )
    finally:
        con.close()
    assert not problems, problems
    # and the engine side really emits '' (not NULL) for the group
    row = [
        r
        for r in QUERIES["compiler_collect_segments"](
            spark, str(tmp_path)
        ).collect()
        if r["c_nationkey"] == 0
    ]
    assert row and row[0]["segs"] == "" and row[0]["seg_bag"] == ""
