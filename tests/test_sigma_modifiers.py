"""Modifier conformance fuzz gate (COVERAGE.md round-9 matrix): every
modifier string OUTSIDE the implemented set must raise SigmaCompileError
at compile time — the engine's implement-or-reject posture, vs the
reference's silent strip (main.py:35) that turns an unknown-modifier
rule into a wrong plain match."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dagger_spark.sigma import SigmaCompileError, compile_sigma

# the complete implemented surface, as single-modifier tokens; chains are
# validated by their own branches (encoding must precede base64*, windash
# recurses, re validates its flags)
IMPLEMENTED = {
    "contains", "startswith", "endswith", "re", "all",
    "base64", "base64offset", "wide", "utf16le", "utf16be", "utf16",
    "windash", "cidr", "lt", "lte", "gt", "gte", "fieldref", "exists",
    "cased",
}

# Sigma-v2 spec modifiers that are PARAMETERIZED rather than standalone:
# expand needs an external %var% dictionary — implemented when the caller
# supplies placeholders=, rejected loudly when they don't (COVERAGE.md)
SPEC_PARAMETERIZED = ["expand"]


def mk(field_spec, value):
    return {
        "title": "T", "author": "a", "description": "d", "level": "low",
        "logsource": {"category": "process_creation"},
        "detection": {"sel": {field_spec: value}, "condition": "sel"},
    }


@pytest.mark.parametrize("mod", SPEC_PARAMETERIZED)
def test_parameterized_modifiers_reject_without_their_parameter(mod):
    with pytest.raises(SigmaCompileError):
        compile_sigma(mk(f"CommandLine|{mod}", "x"))


# ---------------------------------------------------------------------------
# |expand — implemented round 11 behind a caller-supplied placeholder dict
# ---------------------------------------------------------------------------


def test_expand_rejected_without_placeholders():
    with pytest.raises(SigmaCompileError, match="placeholder"):
        compile_sigma(mk("Image|expand", "%admin_tools%"))


def test_expand_rejected_on_unknown_placeholder():
    with pytest.raises(SigmaCompileError, match="%other%"):
        compile_sigma(
            mk("Image|expand", "%other%"), placeholders={"admin_tools": ["x"]}
        )


def test_expand_rejected_in_bug_compat():
    with pytest.raises(SigmaCompileError, match="bug-compat"):
        compile_sigma(
            mk("Image|expand", "%admin_tools%"),
            bug_compat=True,
            placeholders={"admin_tools": ["x"]},
        )


def test_expand_substitutes_and_ors():
    spec = compile_sigma(
        mk("Image|expand", r"C:\Tools\%admin_tools%"),
        placeholders={"admin_tools": ["psexec.exe", "procdump.exe"]},
    )
    sql = spec.predicate_sql
    assert r"C:\Tools\psexec.exe" in sql and r"C:\Tools\procdump.exe" in sql


def test_expand_chains_with_contains():
    spec = compile_sigma(
        mk("CommandLine|expand|contains", "%susp_flags%"),
        placeholders={"susp_flags": ["-accepteula", "/list"]},
    )
    sql = spec.predicate_sql
    assert "%-accepteula%" in sql and "%/list%" in sql  # LIKE needles


def test_expand_cartesian_over_multiple_placeholders():
    spec = compile_sigma(
        mk("Image|expand", "%drive%\\%tool%"),
        placeholders={"drive": ["C:", "D:"], "tool": ["a.exe", "b.exe"]},
    )
    sql = spec.predicate_sql
    for needle in ("C:\\a.exe", "C:\\b.exe", "D:\\a.exe", "D:\\b.exe"):
        assert needle in sql, needle


_PH_NAME = st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,8}", fullmatch=True)
_PH_VALUE = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_.-",
    min_size=1,
    max_size=8,
)


@settings(max_examples=150, deadline=None)
@given(
    placeholders=st.dictionaries(
        keys=_PH_NAME,
        values=st.lists(_PH_VALUE, min_size=1, max_size=3),
        min_size=1,
        max_size=3,
    )
)
def test_expand_substitutes_every_mapping(placeholders):
    """Property: for ANY placeholder dict, a value referencing every
    placeholder compiles, and every substitution value appears verbatim in
    the predicate (list values OR; the placeholder marker itself never
    survives)."""
    for name, vals in placeholders.items():
        spec = compile_sigma(
            mk("Image|expand", f"pre_%{name}%_post"),
            placeholders=placeholders,
        )
        sql = spec.predicate_sql
        assert f"%{name}%" not in sql
        for v in vals:
            assert f"pre_{v}_post" in sql, (name, v, sql)


@settings(max_examples=100, deadline=None)
@given(value=_PH_VALUE, placeholders=st.dictionaries(
    keys=_PH_NAME, values=_PH_VALUE, min_size=0, max_size=2))
def test_expand_passes_placeholder_free_values_verbatim(value, placeholders):
    """Property: a value with no %var% markers survives expand unchanged,
    whatever the dict contains."""
    spec = compile_sigma(
        mk("Image|expand", value), placeholders=placeholders
    )
    assert value in spec.predicate_sql


@settings(max_examples=100, deadline=None)
@given(name=_PH_NAME, placeholders=st.dictionaries(
    keys=_PH_NAME, values=_PH_VALUE, min_size=0, max_size=2))
def test_expand_unknown_placeholder_always_raises(name, placeholders):
    """Property: referencing a placeholder absent from the dict raises —
    never a silent pass-through of the %var% marker."""
    placeholders.pop(name, None)
    with pytest.raises(SigmaCompileError, match="expand"):
        compile_sigma(
            mk("Image|expand", f"%{name}%"), placeholders=placeholders
        )


def test_expand_live_parity_spark_duckdb(spark, duck):
    """The expanded rule must match exactly the substituted hosts — in both
    renderers (Spark Column and the DuckDB oracle SQL)."""
    from dagger_spark.expr import to_sql

    rule = mk("User|expand|contains", "%admins%")
    del rule["logsource"]["category"]  # no event_id gate: pure string test
    spec = compile_sigma(
        rule, placeholders={"admins": ["ADM_alice", "ADM_bob"]}
    )
    rows = [
        ("hit_a", "corp\\ADM_alice"),
        ("hit_b", "corp\\adm_bob"),  # CI default still applies post-expand
        ("miss", "corp\\carol"),
    ]
    df = spark.createDataFrame(
        [(n, {"User": u}) for n, u in rows],
        "name string, event_data map<string,string>",
    )
    got = sorted(
        r["name"] for r in df.filter(spec.condition()).select("name").collect()
    )
    assert got == ["hit_a", "hit_b"]

    sql = to_sql(spec.predicate, "duckdb", case_insensitive=True)
    con = duck
    con.execute("DROP TABLE IF EXISTS t_expand")
    con.execute(
        "CREATE TABLE t_expand(name VARCHAR, event_data STRUCT(User VARCHAR))"
    )
    for n, u in rows:
        con.execute("INSERT INTO t_expand VALUES (?, row(?))", [n, u])
    oracle = sorted(
        r[0]
        for r in con.execute(f"SELECT name FROM t_expand WHERE {sql}").fetchall()
    )
    assert oracle == got


# ---------------------------------------------------------------------------
# |cased — implemented round 10 (the spec's case-sensitivity escape hatch)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "field_spec,value,expect",
    [
        ("CommandLine|cased", "DumpCreds", "(CASED(`event_data`.`CommandLine`) = 'DumpCreds')"),
        ("CommandLine|contains|cased", "DumpCreds", None),
        ("CommandLine|cased|contains", "DumpCreds", None),  # order-agnostic
        ("Image|startswith|cased", "C:\\", None),
        ("Image|endswith|cased", ".Exe", None),
        ("CommandLine|cased", ["A*", "b"], None),
    ],
)
def test_cased_compiles_to_cased_leaves(field_spec, value, expect):
    from dagger_spark.expr import Leaf, Not, Pred

    spec = compile_sigma(mk(field_spec, value))
    leaves = []

    def walk(p):
        if isinstance(p, Leaf):
            leaves.append(p)
        elif isinstance(p, Not):
            walk(p.child)
        else:
            for c in p.children:
                walk(c)

    walk(spec.predicate)
    cased = [leaf for leaf in leaves if leaf.cased]
    assert cased, f"no cased leaf in {spec.predicate_sql!r}"
    # the event_id gate leaf must NOT be cased
    assert all(leaf.field.startswith("event_data.") for leaf in cased)


def test_cased_rejected_in_bug_compat():
    with pytest.raises(SigmaCompileError, match="cased"):
        compile_sigma(mk("CommandLine|cased", "x"), bug_compat=True)


def test_cased_is_case_sensitive_under_ci_rule(spark, duck):
    """Under the rule-wide case-insensitive default, a |cased leaf must
    match case-SENSITIVELY while its undecorated sibling stays CI — in
    BOTH renderers (Spark Column and the DuckDB oracle SQL)."""
    from dagger_spark.expr import to_sql

    rule = mk("CommandLine|contains|cased", "DuMpCrEdS")
    rule["detection"]["sel"]["Image|contains"] = "MIMIKATZ"
    del rule["logsource"]["category"]  # no event_id gate: pure string test
    spec = compile_sigma(rule)
    assert spec.case_insensitive

    rows = [
        ("exact", "run DuMpCrEdS now", r"c:\tools\mimikatz.exe"),
        ("wrongcase", "run dumpcreds now", r"c:\tools\MiMiKaTz.exe"),
        ("lowerneedle", "run DuMpCrEdS now", r"C:\TOOLS\Mimikatz.EXE"),
    ]
    df = spark.createDataFrame(
        [(n, {"CommandLine": c, "Image": i}) for n, c, i in rows],
        "name string, event_data map<string,string>",
    )
    got = sorted(
        r["name"] for r in df.filter(spec.condition()).select("name").collect()
    )
    # Image|contains 'MIMIKATZ' matches all three (CI); the cased
    # CommandLine needle kills 'wrongcase'
    assert got == ["exact", "lowerneedle"]

    sql = to_sql(spec.predicate, "duckdb", case_insensitive=True)
    con = duck
    con.execute("DROP TABLE IF EXISTS t_cased")
    con.execute("CREATE TABLE t_cased(name VARCHAR, event_data STRUCT(CommandLine VARCHAR, Image VARCHAR))")
    for n, c, i in rows:
        con.execute(
            "INSERT INTO t_cased VALUES (?, row(?, ?))", [n, c, i]
        )
    oracle = sorted(
        r[0]
        for r in con.execute(
            f"SELECT name FROM t_cased WHERE {sql}"
        ).fetchall()
    )
    assert oracle == got


@pytest.mark.parametrize("mod", sorted(IMPLEMENTED - {"exists", "lt", "lte", "gt", "gte", "all", "wide", "utf16le", "utf16be", "utf16", "base64offset"}))
def test_implemented_string_modifiers_compile(mod):
    spec = compile_sigma(mk(f"CommandLine|{mod}", "10.0.0.0/8" if mod == "cidr" else ("Image" if mod == "fieldref" else "abc")))
    assert spec.predicate


def test_bare_base64offset_rejected_with_specific_error():
    """Spec/pySigma: base64offset's trimmed offset variants are substring
    needles — it must chain with |contains.  The bare form gets the
    SPECIFIC rejection, not the generic unknown-modifier fall-through."""
    with pytest.raises(SigmaCompileError, match="requires .?contains"):
        compile_sigma(mk("CommandLine|base64offset", "x"))
    assert compile_sigma(mk("CommandLine|base64offset|contains", "x")).predicate


def test_implemented_typed_modifiers_compile():
    assert compile_sigma(mk("CommandLine|exists", True)).predicate
    assert compile_sigma(mk("Port|gt", 1024)).predicate
    assert compile_sigma(mk("CommandLine|all", ["a", "b"])).predicate
    assert compile_sigma(mk("CommandLine|wide|base64", "x")).predicate


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789_",
        min_size=1,
        max_size=12,
    )
)
def test_unlisted_modifier_always_rejected(mod):
    """Any single modifier token outside the implemented set — random
    junk, typos ('containz'), future spec words — must raise."""
    if mod in IMPLEMENTED or mod in {"i", "m", "s"}:
        return  # implemented (or a bare re-flag token that 're|' owns)
    with pytest.raises(SigmaCompileError):
        compile_sigma(mk(f"CommandLine|{mod}", "x"))


@settings(max_examples=150, deadline=None)
@given(
    st.sampled_from(sorted(IMPLEMENTED)),
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz",
        min_size=1,
        max_size=10,
    ),
)
def test_unlisted_chained_modifier_always_rejected(head, junk):
    """A junk tail chained after an implemented modifier must also raise
    (windash/base64* recurse into the tail; re validates flags; the rest
    fall through to the unknown-modifier error)."""
    if junk in IMPLEMENTED:
        return
    # heads whose chain grammar consumes specific tails only
    if head == "re" and junk in ("i", "m", "s"):
        return
    if head in ("wide", "utf16le", "utf16be", "utf16") and junk in (
        "base64", "base64offset",
    ):
        return
    if head in ("base64", "base64offset", "windash") and junk in (
        "contains", "startswith", "endswith", "re", "all",
    ):
        return
    if head == "contains" and junk == "all":
        return
    with pytest.raises(SigmaCompileError):
        compile_sigma(mk(f"CommandLine|{head}|{junk}", ["x"]))


def test_expand_preserves_non_string_value_types():
    """Advice r11: a placeholder-free non-string value routed through
    |expand must keep its ORIGINAL type and defer to the same rendering as
    the modifier-free form — expand itself never coerces.  (The renderer's
    own scalar handling — quoting against the all-STRING event_data schema
    — is shared by both paths, so the two predicates must be IDENTICAL.)"""
    via_expand = compile_sigma(
        mk("event_id|expand", 4688), placeholders={"x": ["y"]}
    ).predicate_sql
    plain = compile_sigma(mk("event_id", 4688)).predicate_sql
    assert via_expand == plain


def test_expand_mixed_type_value_list():
    """A mixed list: the string entry substitutes, the non-string entry
    passes through exactly as a plain list entry would."""
    via_expand = compile_sigma(
        mk("event_id|expand", [4688, "pre_%extra%"]),
        placeholders={"extra": [4104]},
    ).predicate_sql
    plain = compile_sigma(mk("event_id", [4688, "pre_4104"])).predicate_sql
    assert via_expand == plain
