"""Rule linting: schema-validate every field a rule's predicate touches.

A typo'd field name in a detection rule is a SILENT FALSE NEGATIVE in
production — Spark resolves ``event_data.ProcesCommandLine`` to an error
only at query build, and a rule registry loaded as data may not build
every rule on every deploy.  The lint walks the predicate IR (not the SQL
text: the IR is the single source of truth, and ``eq_field`` references
count too) and reports every path the event schema cannot satisfy.

The reference has nothing like this; its compiler pastes field names into
SQL strings unchecked (sigma-transf/main.py) — a misspelled Sigma field
ships as a rule that can never fire.
"""

from __future__ import annotations

from typing import Iterable, List, Tuple

from pyspark.sql import types as T

from ..expr import And, Leaf, Not, Or, Pred
from ..schemas import SYSMON_EVENT_SCHEMA


def schema_paths(schema: T.StructType, prefix: str = "") -> set:
    """Every addressable dotted path in a (possibly nested) struct schema."""
    out = set()
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        out.add(path)
        if isinstance(f.dataType, T.StructType):
            out |= schema_paths(f.dataType, path + ".")
    return out


def predicate_fields(pred: Pred) -> set:
    """Every field path a predicate reads — including the right-hand side
    of ``eq_field`` comparisons."""
    out = set()

    def walk(p: Pred):
        if isinstance(p, (And, Or)):
            for c in p.children:
                walk(c)
        elif isinstance(p, Not):
            walk(p.child)
        else:
            assert isinstance(p, Leaf)
            out.add(p.field)
            if p.op == "eq_field":
                out.add(p.value)

    walk(pred)
    return out


def lint_rules(
    rules: Iterable, schema: T.StructType = SYSMON_EVENT_SCHEMA
) -> List[Tuple[str, str]]:
    """``[(rule_name, unknown_field), ...]`` for every field some rule
    reads that the schema cannot satisfy (sorted, deterministic).  Empty
    list == registry is schema-clean."""
    known = schema_paths(schema)
    bad = set()
    for rule in rules:
        for field in predicate_fields(rule.predicate):
            if field not in known:
                bad.add((rule.name, field))
    return sorted(bad)
