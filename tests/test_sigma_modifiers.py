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
}

# Sigma-v2 spec modifiers we deliberately reject (COVERAGE.md matrix)
SPEC_REJECTED = ["cased", "expand"]


def mk(field_spec, value):
    return {
        "title": "T", "author": "a", "description": "d", "level": "low",
        "logsource": {"category": "process_creation"},
        "detection": {"sel": {field_spec: value}, "condition": "sel"},
    }


@pytest.mark.parametrize("mod", SPEC_REJECTED)
def test_spec_modifiers_we_dont_implement_reject_loudly(mod):
    with pytest.raises(SigmaCompileError):
        compile_sigma(mk(f"CommandLine|{mod}", "x"))


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
