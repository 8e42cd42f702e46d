"""QuerySpec compiler — the naqed-shaped entry point (SURVEY.md §3.2 E1).

A query is a plain nested dict mirroring the result shape, exactly like the
reference's query objects (SURVEY.md §1.1): ``True`` requests a field, a
nested dict traverses a relationship, ``$``-prefixed keys carry arguments.
The compiler parses the dict into a small IR, binds it against the Catalog
(analysis-time type checking — naqed's ``$error`` semantics become raised
``SpecError``s), and emits a single declarative DataFrame expression so
Catalyst owns optimization (pushdown, pruning, join ordering, AQE).
"""

from naqed_spark.compiler.spec import SetSpec, SpecError, parse_query, parse_spec
from naqed_spark.compiler.engine import Engine

__all__ = ["Engine", "SetSpec", "SpecError", "parse_query", "parse_spec"]
