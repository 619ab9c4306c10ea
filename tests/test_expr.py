"""Unit tests for the predicate IR: parser, LIKE classification, SQL render."""

import pytest

from dagger_spark.expr import (
    And, Leaf, Not, Or,
    anchor_regex, classify_like, like_to_regex, parse_predicate, to_sql,
)


def test_classify_like_shapes():
    assert classify_like("f", "%x%") == Leaf("f", "contains", "x")
    assert classify_like("f", "x%") == Leaf("f", "startswith", "x")
    assert classify_like("f", "%x") == Leaf("f", "endswith", "x")
    assert classify_like("f", "x") == Leaf("f", "eq", "x")
    # '_' is a single-char wildcard -> stays a generic like
    assert classify_like("f", "%_ctypes.pyd+%").op == "like"
    # interior % -> generic like
    assert classify_like("f", "%a%b%").op == "like"


def test_like_to_regex():
    import re
    r = like_to_regex("%_ctypes.pyd+%")
    assert re.search(r, "x_ctypes.pyd+1")
    assert re.search(r, "Xctypes.pyd+")  # _ matches any single char
    assert not re.search(r, "ctypes.pyd+")  # _ must match exactly one char
    # backslashes literal
    r2 = like_to_regex("%\\verclsid.exe")
    assert re.search(r2, "C:\\Windows\\verclsid.exe")
    assert not re.search(r2, "C:\\Windows\\verclsidXexe\\x")


def test_anchor_regex():
    assert anchor_regex("^a$") == "^a$"
    assert anchor_regex("{[a-f]{8}}") == "^(?:{[a-f]{8}})$"


def test_parse_simple_eq():
    p = parse_predicate("event_id = 10")
    assert p == Leaf("event_id", "eq", 10)


def test_parse_nested_bool():
    p = parse_predicate(
        "event_id = 10 AND (`event_data`.`A` LIKE '%x' OR NOT `event_data`.`B` IN ('1', '2'))"
    )
    assert isinstance(p, And)
    assert isinstance(p.children[1], Or)
    assert isinstance(p.children[1].children[1], Not)
    leaf = p.children[1].children[1].child
    assert leaf == Leaf("event_data.B", "in", ("1", "2"))


def test_parse_is_null_and_not_null():
    assert parse_predicate("`a` IS NULL") == Leaf("a", "is_null")
    assert parse_predicate("`a` IS NOT NULL") == Not(Leaf("a", "is_null"))


def test_parse_similar_to_wraps_anchor_and_escapes_bare_brace():
    p = parse_predicate("`event_data`.`C` SIMILAR TO '{[a-f]{4}}'")
    # full-string anchored; the literal GUID brace is escaped for Java regex,
    # the {4} quantifier is preserved
    assert p == Leaf("event_data.C", "regex", "^(?:\\{[a-f]{4}})$")


def test_parse_preserves_and_or_precedence():
    p = parse_predicate("a = '1' OR b = '2' AND c = '3'")
    # AND binds tighter: Or(a, And(b, c))
    assert isinstance(p, Or)
    assert isinstance(p.children[1], And)


def test_sql_quote_escaping():
    p = Leaf("f", "eq", "it's")
    assert to_sql(p, "duckdb") == "(\"f\" = 'it''s')"


def test_sql_spark_backslash_doubling():
    p = Leaf("event_data.X", "contains", "a\\b")
    s = to_sql(p, "spark")
    assert "a\\\\b" in s


def test_case_insensitive_render():
    p = Leaf("f", "contains", "AbC")
    s = to_sql(p, "duckdb", case_insensitive=True)
    assert "lower" in s and "'abc'" in s


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse_predicate("SELECT * FROM x;")


def test_numeric_literal_renders_decimal_for_ints():
    # int literal -> exact DECIMAL(38,9) comparison (2^53 cliff avoided)
    s = to_sql(Leaf("a", "gt", 2 ** 53 + 1), "duckdb")
    assert "DECIMAL(38,9)" in s and str(2 ** 53 + 1) in s
    # float literal keeps the DOUBLE path
    s = to_sql(Leaf("a", "gt", 3.5), "duckdb")
    assert "DOUBLE" in s and "3.5" in s
    # bool is not an int for this purpose
    assert "DOUBLE" in to_sql(Leaf("a", "lt", True), "duckdb")


def test_non_finite_numeric_literals_rejected():
    for bad in (float("inf"), float("-inf"), float("nan")):
        with pytest.raises(ValueError, match="non-finite"):
            Leaf("a", "gt", bad)
        with pytest.raises(ValueError, match="non-finite"):
            Leaf("a", "in", (1.0, bad))


def test_huge_int_literals_render_decimal():
    # past 2^63 a plain int has no JVM long literal; the Decimal literal
    # keeps the DECIMAL(38,9) path selected (execution of these literals
    # on live Spark+DuckDB is covered by test_property_expr's NUM_LITS)
    for v in (2 ** 63, 2 ** 64 - 1, 10 ** 28, -(10 ** 28)):
        s = to_sql(Leaf("a", "gt", v), "duckdb")
        assert "DECIMAL(38,9)" in s and str(v) in s
    # at/above 10^29: double fallback (no DECIMAL(38,9) headroom)
    assert "DOUBLE" in to_sql(Leaf("a", "gt", 10 ** 29), "duckdb")
