"""Sigma CLI (python -m dagger_spark.sigma) + alert JSON sink shape."""

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

RULE_YAML = """\
title: Cmdkey Cached Credentials Recon
author: t
level: high
description: d
tags: [attack.credential_access, attack.t1003]
logsource: {category: process_creation}
detection:
  sel:
    Image|endswith: '\\cmdkey.exe'
    CommandLine|contains: ' /list'
  condition: sel
"""

TF_YAML = """\
title: Burst
author: t
level: critical
description: d
logsource: {category: process_access}
detection:
  sel:
    TargetImage|endswith: '\\lsass.exe'
  timeframe: 60s
  condition: sel | count() >= 5
"""


@pytest.fixture(scope="module")
def rules_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sigma_cli")
    (d / "a.yml").write_text(RULE_YAML)
    (d / "b.yml").write_text(TF_YAML)
    return str(d)


def _run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "dagger_spark.sigma", *args],
        capture_output=True, text=True, timeout=60,
    )


def test_cli_compiles_dir(rules_dir):
    r = _run_cli(rules_dir)
    assert r.returncode == 0
    specs = [json.loads(line) for line in r.stdout.splitlines()]
    assert len(specs) == 2
    by_name = {s["name"]: s for s in specs}
    assert "event_id = 1" in by_name["Cmdkey Cached Credentials Recon"]["predicate_sql"]
    assert by_name["Burst"]["timeframe_seconds"] == 60
    assert by_name["Burst"]["timeframe_min_count"] == 5


def test_cli_bug_compat_skips_timeframe(rules_dir):
    r = _run_cli(rules_dir, "--bug-compat")
    assert r.returncode == 0
    specs = [json.loads(line) for line in r.stdout.splitlines()]
    assert [s["name"] for s in specs] == ["Cmdkey Cached Credentials Recon"]
    assert specs[0]["case_insensitive"] is False


def test_cli_errors_on_missing_dir():
    r = _run_cli("/nonexistent/rules")
    assert r.returncode == 0  # os.walk of a missing dir is empty, not fatal
    assert "compiled 0 rules" in r.stderr


def test_alert_json_shape_matches_sink_ddl(spark, sysmon_df):
    """The serialized alert JSON must carry the reference sink DDL's field
    names (windows-process-access.sql:38-64 superset): top-level
    computer_name/host + event/threat/rule structs with the DDL member
    names — Flink fills them positionally, we fill them by name."""
    from dagger_spark.rules.builtin import active_rules
    from dagger_spark.rules.engine import apply_rules_single_pass

    alerts = apply_rules_single_pass(sysmon_df, active_rules())
    payload = alerts.select(F.to_json(F.struct(*alerts.columns)).alias("value"))
    doc = json.loads(payload.first()["value"])
    assert set(doc) >= {"computer_name", "host", "event", "threat", "rule"}
    assert set(doc["event"]) >= {"kind", "origin_ids", "count", "start", "end", "time"}
    assert set(doc["threat"]) == {"tactic", "technique", "subtechnique"}
    assert set(doc["rule"]) >= {"name", "author", "category", "severity",
                               "description", "reference", "version", "source"}
    assert doc["event"]["count"] == 1
    assert isinstance(doc["event"]["origin_ids"], list)
