"""Local replica of the driver's correctness gate (SURVEY.md §5.2).

For every registered key: run the PySpark query and its DuckDB oracle twin
on the same parquet fixtures and compare row-count + column names +
order-insensitive values (columns sorted by name, rows sorted — mirroring
the driver's order-insensitive value hash, but stricter: we diff actual
values so failures are debuggable).

Usable as a library (tests/test_oracle.py) and as a CLI:

    python -m naqed_spark.oracle_check [key ...] [--sf DIR]
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from naqed_spark.catalog import TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with every entity registered as a view —
    the same setup the driver uses."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v) -> str:
    """Canonical string for one cell. Floats via repr → bit-exact compare;
    the queries' determinism discipline is responsible for making both
    engines produce identical doubles."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, _dt.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, _dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((str(k), _canon_value(x)) for k, x in v.items())
        return "{" + ",".join(f"{k}={x}" for k, x in items) + "}"
    return f"s:{v}"


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_value(r[i]) for i in order) for r in rows)


# Column types the driver's canonicalizer cannot sort: its pandas
# ``sort_values`` over all columns factorizes each column, which dies with
# "unhashable type" on list/ndarray/dict cells (CORRECTNESS_r04's
# compiler_collect_nested ERR). The fix discipline is the repo-wide §7.3
# rule: serialize collections (array_join / to_json) before emitting.
_UNSORTABLE_SPARK_TYPES = ("ArrayType", "MapType", "StructType")


def _driver_canon_probe(cols: list[str], rows: list[tuple]) -> None:
    """Replicate the driver's canonicalization exactly enough to crash where
    it crashes: a pandas frame, columns sorted by name, ``sort_values`` over
    ALL columns. Raises whatever pandas raises — run under the caller's
    try so unsortable emissions fail the LOCAL gate first (VERDICT r4 §2)."""
    import pandas as pd

    frame = pd.DataFrame(rows, columns=cols)
    frame = frame.reindex(sorted(cols), axis=1)
    frame.sort_values(by=list(frame.columns), kind="mergesort")


def check_key(spark, con, key: str, sf_dir: str) -> list[str]:
    """Run one key both ways; return a list of problems ([] = pass)."""
    from naqed_spark.registry import ORACLES, QUERIES, ROWS_ONLY

    problems: list[str] = []
    sdf = QUERIES[key](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    # Driver-canonicalizer parity (VERDICT r4 item 2): the driver sorts a
    # pandas frame over every column, so complex-typed emissions crash it.
    # Catch the class at the schema level AND probe the exact crash path.
    # This runs BEFORE the ROWS_ONLY early return (ADVICE r5): today's
    # rows-only driver check only counts rows, but if it ever canonicalizes
    # through the same pandas path, a collection-typed rows-only emission
    # would crash remotely while the local gate stayed green — screen the
    # whole registry, not just the sql-oracle subset.
    for f in sdf.schema.fields:
        tname = type(f.dataType).__name__
        if tname in _UNSORTABLE_SPARK_TYPES:
            problems.append(
                f"{key}: column {f.name!r} is {f.dataType.simpleString()} — "
                f"driver canonicalizer cannot sort collection columns; "
                f"serialize (array_join/to_json) before emitting"
            )
    if problems:
        return problems

    if key in ROWS_ONLY:
        if len(srows) == 0 and key != "_allow_empty":
            problems.append(f"{key}: rows-only query returned 0 rows")
        return problems

    try:
        _driver_canon_probe(scols, srows)
    except Exception as e:  # mirror the driver: any canon crash is an ERR
        problems.append(f"{key}: driver-canonicalizer probe crashed: {e!r}")
        return problems

    # Fetch the DuckDB side via Arrow, exactly like the driver's hasher:
    # fetchall() coerces HUGEINT→int and hides type-level divergence, while
    # Arrow surfaces HUGEINT as decimal128 (VERDICT r3 — 5 hash-FAILs whose
    # oracles emitted uncast integer SUMs passed the old fetchall gate).
    tbl = con.execute(ORACLES[key]).arrow()
    dcols = list(tbl.schema.names)
    for name, typ in zip(dcols, tbl.schema.types):
        s = str(typ)
        if "decimal" in s or "128" in s:
            problems.append(
                f"{key}: oracle column {name!r} is {s} (HUGEINT?) — "
                f"CAST the emitted aggregate to BIGINT/DOUBLE"
            )
    cols_data = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    drows = list(zip(*cols_data)) if cols_data else []

    if sorted(scols) != sorted(dcols):
        problems.append(f"{key}: columns differ spark={sorted(scols)} duck={sorted(dcols)}")
        return problems
    if len(srows) != len(drows):
        problems.append(f"{key}: row count spark={len(srows)} duck={len(drows)}")
    a, b = _canon_rows(scols, srows), _canon_rows(dcols, drows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        only_a = [r for r in a if r not in set(b)][:2]
        only_b = [r for r in b if r not in set(a)][:2]
        problems.append(
            f"{key}: value mismatch; first diffs={diffs} "
            f"spark-only={only_a} duck-only={only_b}"
        )
    return problems


def main(argv: list[str] | None = None) -> int:
    import argparse

    from naqed_spark.registry import QUERIES, load_all
    from naqed_spark.session import get_spark, tune_session

    p = argparse.ArgumentParser()
    p.add_argument("keys", nargs="*", help="keys to check (default: all)")
    p.add_argument("--sf", default=DEFAULT_SF_DIR)
    args = p.parse_args(argv)

    load_all()
    keys = args.keys or sorted(QUERIES)
    spark = tune_session(get_spark("oracle-check"))
    con = duck_connect(args.sf)
    failed = 0
    for key in keys:
        try:
            probs = check_key(spark, con, key, args.sf)
        except Exception as exc:  # noqa: BLE001 — one key must not kill
            # the sweep (the driver records a per-key ERR; mirror that)
            probs = [f"{key}: raised {type(exc).__name__}: {exc}"]
        if probs:
            failed += 1
            for pr in probs:
                print(f"FAIL {pr}")
        else:
            print(f"ok   {key}")
    print(f"{len(keys) - failed}/{len(keys)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
