"""Rule lint: schema validation of every field a predicate reads."""

from dagger_spark.expr import parse_predicate
from dagger_spark.rules.builtin import REFERENCE_RULES, active_rules
from dagger_spark.rules.lint import (
    lint_rules, predicate_fields, schema_paths,
)
from dagger_spark.schemas import SYSMON_EVENT_SCHEMA


def test_reference_registry_is_schema_clean():
    # every field the 31 ported rules read exists in the superset schema —
    # the invariant that makes the registry safe to load as data
    assert lint_rules(REFERENCE_RULES) == []
    assert lint_rules(active_rules()) == []


def test_lint_flags_typod_field():
    class FakeRule:
        name = "typo rule"
        predicate = parse_predicate(
            "`event_data`.`ProcesCommandLine` = 'x' AND `event_id` = 1"
        )

    assert lint_rules([FakeRule()]) == [
        ("typo rule", "event_data.ProcesCommandLine")
    ]


def test_lint_sees_fieldref_right_hand_side():
    class FakeRule:
        name = "fieldref rule"
        predicate = parse_predicate(
            "`event_data`.`Image` = `event_data`.`NoSuchField`"
        )

    assert lint_rules([FakeRule()]) == [
        ("fieldref rule", "event_data.NoSuchField")
    ]


def test_schema_paths_cover_nesting():
    paths = schema_paths(SYSMON_EVENT_SCHEMA)
    assert "event_data" in paths and "event_data.Image" in paths
    assert "uuid" in paths and "Image" not in paths  # no bare nested names


def test_predicate_fields_walks_boolean_tree():
    p = parse_predicate(
        "(`event_id` = 1 OR `event_data`.`A` = 'x') "
        "AND NOT (`event_data`.`B` IS NULL)"
    )
    assert predicate_fields(p) == {"event_id", "event_data.A", "event_data.B"}
