"""Shared helpers enforcing the oracle-determinism rules (SURVEY.md §7.3).

Cross-engine hash-match conventions used by every checked query:
  - dates      → ISO 'yyyy-MM-dd' strings   (pandas date/datetime ambiguity)
  - timestamps → epoch microseconds bigint  (both engines truncate ns → µs)
  - money sums → round(x, 2)   (1e9-magnitude double sums; reorder error ≪ 5e-3)
  - small sums / avgs → round(x, 4)
  - ratios / correlations → round(x, 6)
  - arrays → sorted + joined to a single string
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from naqed_spark.catalog import load  # re-export for query modules

__all__ = ["load", "date_str", "epoch_us", "money", "r4", "r6"]


def date_str(c: str | Column) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.date_format(c.cast("date"), "yyyy-MM-dd")


def epoch_us(c: str | Column) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(c)


def money(c: Column) -> Column:
    return F.round(c, 2)


def r4(c: Column) -> Column:
    return F.round(c, 4)


def r6(c: Column) -> Column:
    return F.round(c, 6)
