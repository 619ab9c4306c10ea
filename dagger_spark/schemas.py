"""Canonical schemas: sysmon event superset + alert superset.

The reference declares two different shapes for the same physical event topic
(9 event_data fields in rules/sigma/windows-process-access.sql:12-22, 33 in
rules/sigma/windows-process-creation.sql:5-46) and two different alert shapes
(8-field event struct with `module` at windows-process-access.sql:41-49 vs a
7-field one at windows-process-creation.sql:65-72).  We standardize on the
SUPERSET of each (SURVEY.md §2.8.5): one event schema, one alert schema with a
nullable ``event.module``.

The reference's own field-name typos (``ParentPrcessName``, the
``ProcessCommandLine``/``processCommandLine`` duplicate) are part of the wire
schema and are kept verbatim (windows-process-creation.sql:32,36-37).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Union of both source DDLs' event_data members, reference order-ish.
EVENT_DATA_FIELDS: tuple = (
    "CallTrace", "GrantedAccess", "SourceImage", "TargetImage", "Image",
    "ParentImage", "CommandLine", "ParentCommandLine", "UtcTime",
    "OriginalFileName", "sha1", "EventType", "WMIcommand", "EventLog",
    "Imphash", "DestinationPort", "Initiated", "User", "DestinationHostname",
    "StartModule", "EventID", "TargetProcessAddress", "StartFunction",
    "IntegrityLevel", "Description", "CurrentDirectory", "Company", "Product",
    "ProcessCommandLine", "DestinationIp", "DestinationIsIpv6", "SourcePort",
    "ParentPrcessName", "processCommandLine", "LogonId", "SubjectLogonId",
    "FileVersion", "ParentUser",
)

EVENT_DATA_SCHEMA = T.StructType(
    [T.StructField(f, T.StringType(), True) for f in EVENT_DATA_FIELDS]
)

#: one sysmon event (the JSON payload of a Kafka record in the reference).
SYSMON_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("computer_name", T.StringType(), True),
        T.StructField("event_id", T.LongType(), True),
        T.StructField("host", T.StringType(), True),
        T.StructField("event_data", EVENT_DATA_SCHEMA, True),
        T.StructField("uuid", T.StringType(), True),
        # Kafka record timestamp metadata column (windows-process-access.sql:24);
        # present as a real column once the source wrapper attaches it.
        T.StructField("timestamp", T.TimestampType(), True),
    ]
)

#: alert output schema — superset of both sink DDLs; `module` nullable.
ALERT_EVENT_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("module", T.StringType(), True),
        T.StructField("origin_ids", T.ArrayType(T.StringType()), True),
        T.StructField("count", T.LongType(), True),
        T.StructField("start", T.TimestampType(), True),
        T.StructField("end", T.TimestampType(), True),
        T.StructField("time", T.TimestampType(), True),
    ]
)

ALERT_THREAT_STRUCT = T.StructType(
    [
        T.StructField("tactic", T.ArrayType(T.StringType()), True),
        T.StructField("technique", T.ArrayType(T.StringType()), True),
        T.StructField("subtechnique", T.ArrayType(T.StringType()), True),
    ]
)

ALERT_RULE_STRUCT = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("author", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("severity", T.IntegerType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("reference", T.ArrayType(T.StringType()), True),
        T.StructField("version", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

ALERT_SCHEMA = T.StructType(
    [
        T.StructField("computer_name", T.StringType(), True),
        T.StructField("host", T.StringType(), True),
        T.StructField("event", ALERT_EVENT_STRUCT, True),
        T.StructField("threat", ALERT_THREAT_STRUCT, True),
        T.StructField("rule", ALERT_RULE_STRUCT, True),
    ]
)
