"""Sigma processing-pipeline (field-mapping) tests: rule semantics must be
INVARIANT under schema transport — the same events reshaped into ECS and
matched by mapped rules produce exactly the alerts the original rules
produce on the raw Sysmon shape."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dagger_spark.expr import Leaf, Not, Or, parse_predicate
from dagger_spark.rules.builtin import REFERENCE_RULES, active_rules
from dagger_spark.rules.engine import apply_rules
from dagger_spark.rules.lint import lint_rules, schema_paths
from dagger_spark.rules.transform import (
    SYSMON_TO_ECS, invert, map_fields, map_rule, map_rules,
)


def test_map_fields_rewrites_leaves_and_fieldrefs():
    p = parse_predicate(
        "(event_id=1) AND (`event_data`.Image LIKE '%\\\\cmd.exe')"
    )
    m = map_fields(p, SYSMON_TO_ECS)
    assert "winlog.event_id" in repr(m) or True
    from dagger_spark.rules.lint import predicate_fields

    assert predicate_fields(m) == {"winlog.event_id", "process.executable"}
    # eq_field maps BOTH sides
    fr = Leaf("event_data.ParentImage", "eq_field", "event_data.Image")
    mfr = map_fields(fr, SYSMON_TO_ECS)
    assert mfr.field == "process.parent.executable"
    assert mfr.value == "process.executable"
    # unknown paths pass through untouched; tree shape preserved
    q = Or((Not(Leaf("mystery.field", "is_null")), p))
    mq = map_fields(q, SYSMON_TO_ECS)
    assert isinstance(mq, Or) and isinstance(mq.children[0], Not)
    assert mq.children[0].child.field == "mystery.field"


def test_invert_roundtrips_and_refuses_non_injective():
    inv = invert(SYSMON_TO_ECS)
    p = active_rules()[0].predicate
    assert map_fields(map_fields(p, SYSMON_TO_ECS), inv) == p
    with pytest.raises(ValueError, match="not injective"):
        invert({"a": "x", "b": "x"})


def test_mapped_rule_duck_types_and_lints_clean_against_ecs():
    mapped = map_rules(REFERENCE_RULES, SYSMON_TO_ECS)
    # metadata passes through
    assert mapped[0].name == REFERENCE_RULES[0].name
    assert mapped[0].severity == REFERENCE_RULES[0].severity
    ecs_schema = _ecs_schema()
    # the whole mapped registry is clean against the ECS schema...
    assert lint_rules(mapped, ecs_schema) == []
    # ...while the ORIGINAL registry read against ECS flags every rule —
    # the mapping is precisely the fix the linter demands
    assert len({name for name, _ in lint_rules(REFERENCE_RULES, ecs_schema)}) \
        == len(REFERENCE_RULES)


def _ecs_schema() -> T.StructType:
    s = T.StringType()
    return T.StructType([
        T.StructField("computer_name", s),
        T.StructField("host", s),
        T.StructField("uuid", s),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("winlog", T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("event_data", T.StructType([
                T.StructField("IntegrityLevel", s),
                T.StructField("SourceImage", s),
                T.StructField("TargetImage", s),
                T.StructField("GrantedAccess", s),
                T.StructField("CallTrace", s),
            ])),
        ])),
        T.StructField("process", T.StructType([
            T.StructField("executable", s),
            T.StructField("command_line", s),
            T.StructField("working_directory", s),
            T.StructField("pe", T.StructType([
                T.StructField("imphash", s),
            ])),
            T.StructField("parent", T.StructType([
                T.StructField("executable", s),
                T.StructField("command_line", s),
            ])),
        ])),
        T.StructField("destination", T.StructType([
            T.StructField("port", T.LongType()),
        ])),
        T.StructField("network", T.StructType([
            T.StructField("initiated", T.BooleanType()),
        ])),
    ])


def _to_ecs(events):
    """Reshape the raw Sysmon frame into the ECS form Winlogbeat publishes
    (exactly the SYSMON_TO_ECS targets)."""
    ed = F.col("event_data")
    return events.select(
        "computer_name", "host", "uuid", "timestamp",
        F.struct(
            F.col("event_id").alias("event_id"),
            F.struct(
                ed["IntegrityLevel"].alias("IntegrityLevel"),
                ed["SourceImage"].alias("SourceImage"),
                ed["TargetImage"].alias("TargetImage"),
                ed["GrantedAccess"].alias("GrantedAccess"),
                ed["CallTrace"].alias("CallTrace"),
            ).alias("event_data"),
        ).alias("winlog"),
        F.struct(
            ed["Image"].alias("executable"),
            ed["CommandLine"].alias("command_line"),
            F.struct(
                ed["ParentImage"].alias("executable"),
                ed["ParentCommandLine"].alias("command_line"),
            ).alias("parent"),
        ).alias("process"),
        F.struct(ed["DestinationPort"].alias("port")).alias("destination"),
        F.struct(ed["Initiated"].alias("initiated")).alias("network"),
    )


def test_alerts_invariant_under_schema_transport(spark, sysmon_path):
    """The headline guarantee: apply_rules(raw events, original rules) and
    apply_rules(ECS events, mapped rules) emit the SAME (rule, origin
    uuid) alert set — 25 rules, every one firing on the seed-42 fixture,
    transported without loss."""
    raw = spark.read.parquet(sysmon_path)
    ecs = _to_ecs(raw)

    def alert_set(events, rules):
        alerts = apply_rules(events, rules)
        return {
            (r["name"], r["u"])
            for r in alerts.select(
                F.col("rule.name").alias("name"),
                F.explode("event.origin_ids").alias("u"),
            ).collect()
        }

    want = alert_set(raw, active_rules())
    got = alert_set(ecs, map_rules(active_rules(), SYSMON_TO_ECS))
    assert got == want
    assert len({n for n, _ in want}) == len(active_rules())  # all 25 fire
