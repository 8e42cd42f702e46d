"""QuerySpec IR + parser.

Query shape (naqed-style, SURVEY.md §1.1/§3.2):

    {
      "customer": {                         # root entity
        "$filter": {"c_mktsegment": "BUILDING",
                     "c_acctbal": {"$gt": 1000}},
        "c_custkey": True,                  # request a field
        "c_name": True,
        "orders": {                          # relationship hop (join)
          "$filter": {"o_orderstatus": {"$in": ["O", "F"]}},
          "o_orderkey": True,
        },
        "$groupby": ["c_mktsegment"],
        "$agg": {"n_orders": {"$count": True},
                  "total": {"$sum": "o_totalprice"}},
        "$having": {"total": {"$gt": 1000.0}},
        "$orderby": [["total", "desc"]],
        "$limit": 10,
      }
    }

Round-4 extensions (VERDICT r3 item 7):

    "$select": {"alias": <expr>}      # computed columns; <expr> is a column
                                      # name, a number, or {op: args} from
                                      # SELECT_OPS ({"$lit": v} for string
                                      # literals); computed before $agg so
                                      # groupby/agg/orderby can use them
    "orders": {"$collect": True, ...}  # re-nest: children become ONE sorted
                                      # array column per parent row (naqed's
                                      # array-of-children shape) instead of
                                      # the default join fan-out

``$``-keys are arguments (the reference passes resolver args the same way);
everything else is either a requested field (``True``) or a relationship
traversal (nested dict). Relationship fan-out is relational: one output row
per related entity (the reference auto-maps arrays; SURVEY.md §1.2 maps that
to join fan-out).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class SpecError(ValueError):
    """Analysis-time spec/type error (the reference embeds these as $error
    values in the result; we fail fast at compile time — SURVEY.md §1.2)."""


FILTER_OPS = {"$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$between",
              "$like", "$isnull", "$notnull"}
AGG_OPS = {"$count", "$sum", "$avg", "$min", "$max", "$count_distinct"}
# $select expression DSL (round 4): arity-checked at parse time.
# A bare string is a column reference; numbers are literals; string
# literals must be spelled {"$lit": "..."} to stay unambiguous.
SELECT_OPS = {
    "$lit": None,      # literal value (any scalar)
    "$add": -1,        # n-ary numeric
    "$sub": 2,
    "$mul": -1,
    "$div": 2,
    "$abs": 1,
    "$round": 2,       # [expr, ndigits-literal]
    "$concat": -1,     # n-ary string
    "$lower": 1,
    "$upper": 1,
    "$length": 1,      # string length
    "$size": 1,        # array length (a $collect-ed relationship)
    "$array_join": 2,  # [array-expr, {"$lit": sep}] → serialized string
    "$year": 1,
    "$month": 1,
}


@dataclass
class Predicate:
    column: str
    op: str  # one of FILTER_OPS
    value: object


@dataclass
class AggSpec:
    alias: str
    op: str  # one of AGG_OPS
    column: str | None  # None for $count


@dataclass
class Expr:
    """One node of a $select computed-column expression tree."""

    op: str  # "$col", or one of SELECT_OPS
    args: list  # children (Expr) for operators; [value] for $col/$lit


@dataclass
class Node:
    """One entity in the traversal tree."""

    entity: str
    fields: list[str] = field(default_factory=list)
    filters: list[Predicate] = field(default_factory=list)
    children: list[tuple[str, "Node"]] = field(default_factory=list)  # (rel name, node)
    how: str = "inner"  # join type for this hop
    collect: bool = False  # $collect: re-nest as array-of-children, no fan-out


@dataclass
class QuerySpec:
    root: Node
    groupby: list[str] = field(default_factory=list)
    aggs: list[AggSpec] = field(default_factory=list)
    having: list[Predicate] = field(default_factory=list)  # post-agg filter
    orderby: list[tuple[str, str]] = field(default_factory=list)
    limit: int | None = None
    distinct: bool = False
    select: list[tuple[str, Expr]] = field(default_factory=list)  # computed cols


def _parse_filters(obj: object) -> list[Predicate]:
    if not isinstance(obj, dict):
        raise SpecError(f"$filter must be a dict, got {type(obj).__name__}")
    preds: list[Predicate] = []
    for col, cond in obj.items():
        if isinstance(cond, dict):
            for op, val in cond.items():
                if op not in FILTER_OPS:
                    raise SpecError(f"unknown filter op {op!r} on {col!r}")
                preds.append(Predicate(col, op, val))
        else:
            preds.append(Predicate(col, "$eq", cond))
    return preds


def _parse_aggs(obj: object) -> list[AggSpec]:
    if not isinstance(obj, dict):
        raise SpecError("$agg must be a dict of alias -> {op: column}")
    aggs: list[AggSpec] = []
    for alias, body in obj.items():
        if not isinstance(body, dict) or len(body) != 1:
            raise SpecError(f"$agg entry {alias!r} must be a single {{op: column}}")
        ((op, col),) = body.items()
        if op not in AGG_OPS:
            raise SpecError(f"unknown agg op {op!r} in {alias!r}")
        aggs.append(AggSpec(alias, op, None if col is True else col))
    return aggs


def _parse_expr(obj: object) -> Expr:
    """Parse one $select expression. Bare strings are column references,
    bare numbers/bools literals; operator nodes are single-key dicts."""
    if isinstance(obj, str):
        return Expr("$col", [obj])
    if isinstance(obj, bool) or isinstance(obj, (int, float)):
        return Expr("$lit", [obj])
    if not isinstance(obj, dict) or len(obj) != 1:
        raise SpecError(f"$select expression must be a single {{op: args}} dict,"
                        f" a column name, or a number — got {obj!r}")
    ((op, raw),) = obj.items()
    if op not in SELECT_OPS:
        raise SpecError(f"unknown $select op {op!r}")
    if op == "$lit":
        return Expr("$lit", [raw])
    args = raw if isinstance(raw, list) else [raw]
    arity = SELECT_OPS[op]
    if arity == -1:
        if len(args) < 2:
            raise SpecError(f"{op} needs at least 2 arguments, got {len(args)}")
    elif len(args) != arity:
        raise SpecError(f"{op} needs exactly {arity} argument(s), got {len(args)}")
    if op == "$round":
        nd = args[1]
        if not isinstance(nd, int) or isinstance(nd, bool):
            raise SpecError("$round second argument must be an int literal")
        return Expr("$round", [_parse_expr(args[0]), Expr("$lit", [nd])])
    if op == "$array_join":
        sep = args[1]
        if not (isinstance(sep, dict) and set(sep) == {"$lit"}
                and isinstance(sep["$lit"], str)):
            raise SpecError(
                "$array_join second argument must be a {'$lit': str} separator"
            )
        return Expr("$array_join", [_parse_expr(args[0]), Expr("$lit", [sep["$lit"]])])
    return Expr(op, [_parse_expr(a) for a in args])


def _parse_select(obj: object) -> list[tuple[str, Expr]]:
    if not isinstance(obj, dict):
        raise SpecError("$select must be a dict of alias -> expression")
    return [(alias, _parse_expr(body)) for alias, body in obj.items()]


def _parse_node(entity: str, body: dict) -> tuple[Node, dict]:
    """Returns (node, top-level-args) — top-level args only used at root."""
    if not isinstance(body, dict):
        raise SpecError(f"entity {entity!r} body must be a dict")
    node = Node(entity=entity)
    top: dict = {}
    for key, val in body.items():
        if key == "$filter":
            node.filters = _parse_filters(val)
        elif key == "$how":
            if val not in ("inner", "left", "right", "full", "left_semi", "left_anti"):
                raise SpecError(f"bad $how {val!r}")
            node.how = val
        elif key == "$collect":
            node.collect = bool(val)
        elif key in ("$agg", "$groupby", "$having", "$orderby", "$limit",
                     "$distinct", "$select"):
            top[key] = val
        elif key.startswith("$"):
            raise SpecError(f"unknown argument {key!r} on entity {entity!r}")
        elif val is True:
            node.fields.append(key)
        elif isinstance(val, dict):
            child, child_top = _parse_node(key, val)
            if child_top:
                raise SpecError(f"aggregation args only allowed at root, found on {key!r}")
            if child.collect:
                if child.how in ("left_semi", "left_anti"):
                    raise SpecError(
                        f"$collect on {key!r} cannot combine with semi/anti $how"
                    )
                if not child.fields and not child.children:
                    raise SpecError(f"$collect on {key!r} requests no fields")
            node.children.append((key, child))
        else:
            raise SpecError(
                f"field {key!r}: expected True or nested dict, got {val!r}"
            )
    return node, top


def parse_spec(spec: dict) -> QuerySpec:
    if not isinstance(spec, dict) or len(spec) != 1:
        raise SpecError("query spec must be a dict with exactly one root entity")
    ((entity, body),) = spec.items()
    root, top = _parse_node(entity, body)
    if root.collect:
        raise SpecError("$collect is only meaningful on a relationship hop")
    qs = QuerySpec(root=root)
    if "$select" in top:
        qs.select = _parse_select(top["$select"])
    if "$groupby" in top:
        gb = top["$groupby"]
        if not isinstance(gb, list):
            raise SpecError("$groupby must be a list of columns")
        qs.groupby = gb
    if "$agg" in top:
        qs.aggs = _parse_aggs(top["$agg"])
    if "$having" in top:
        if "$agg" not in top:
            raise SpecError("$having requires $agg")
        qs.having = _parse_filters(top["$having"])
    if "$orderby" in top:
        ob = top["$orderby"]
        if not isinstance(ob, list):
            raise SpecError("$orderby must be a list of [column, asc|desc]")
        for item in ob:
            if isinstance(item, str):
                qs.orderby.append((item, "asc"))
            else:
                col, direction = item
                if direction not in ("asc", "desc"):
                    raise SpecError(f"bad sort direction {direction!r}")
                qs.orderby.append((col, direction))
    if "$limit" in top:
        if not isinstance(top["$limit"], int) or top["$limit"] < 0:
            raise SpecError("$limit must be a non-negative int")
        qs.limit = top["$limit"]
    if "$distinct" in top:
        qs.distinct = bool(top["$distinct"])
    if qs.aggs and not qs.groupby:
        # global aggregation is fine; groupby optional
        pass
    return qs
