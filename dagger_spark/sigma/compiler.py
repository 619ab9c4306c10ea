"""Sigma YAML -> RuleSpec compiler.

A from-scratch port of the *semantics* of the reference's offline compiler
(/root/reference/sigma-transf/main.py) emitting our predicate grammar (parsed
by ``dagger_spark.expr.parse_predicate``) instead of Flink SQL text.

Default behavior FIXES the reference's known bugs (SURVEY.md §2.8); passing
``bug_compat=True`` reproduces them bit-for-bit so compiled output can be
diffed against the checked-in reference rules:

  reference behavior (main.py)                 | fixed behavior (default)
  ---------------------------------------------+--------------------------------
  `*` kept literally in `=` / `IN` values      | glob `*`/`?` -> LIKE wildcards
  (main.py:122-126 — rules can never match)    |
  `contains` list strips only LEADING `*`      | strip handled by glob translation
  (main.py:41 vs 38)                           |
  `base64offset|contains` silently ignored     | real 3-offset base64 encoding
  (main.py:35)                                 |
  lists under non-contains modifiers           | same (correct in reference)
  timeframe rules skipped (main.py:194-195)    | compiled to windowed count rules
  matching case-sensitive                      | case-insensitive (Sigma spec),
                                               | per-rule override
  empty tag arrays -> ARRAY[''] (arr2str)      | empty arrays stay empty
  technique parent ids emitted bare (`t1055`)  | normalized to `attack.t1055`,
  and duplicated (main.py:29)                  | deduplicated

Condition grammar support: bare selection names, ``1 of X*``, ``1 of them``,
``all of X*`` / ``all of them`` (absent from the reference — added),
``and`` / ``or`` / ``not`` with parentheses, and trailing
``| count() [by F] <op> N`` aggregations (compiled to timeframe rules).
"""

from __future__ import annotations

import base64
import os
import re
from typing import Optional

import yaml

from ..expr import parse_predicate
from ..rules.spec import RuleSpec

_TACTICS = (
    "attack.reconnaissance", "attack.resource_development", "attack.initial_access",
    "attack.execution", "attack.persistence", "attack.privilege_escalation",
    "attack.defense_evasion", "attack.credential_access", "attack.discovery",
    "attack.lateral_movement", "attack.collection", "attack.command_and_control",
    "attack.exfiltration", "attack.impact",
)

_SEVERITY = {"critical": 9, "high": 7, "medium": 5, "low": 3}

#: logsource.category -> sysmon event_id gate (main.py:89-95; the network gate
#: appears hand-written in windows-process-creation.sql:115)
CATEGORY_EVENT_ID = {
    "process_access": 10,
    "process_creation": 1,
    "network_connection": 3,
}

_TIMEFRAME_UNITS = {"s": 1, "m": 60, "h": 3600, "d": 86400}


class SigmaCompileError(Exception):
    pass


def _split_tags(tags, bug_compat: bool):
    tactic, technique, subtechnique = [], [], []
    for tag in tags or []:
        if tag in _TACTICS:
            tactic.append(tag)
        elif re.match(r"^attack\.t[0-9]+$", tag):
            technique.append(tag)
        elif re.match(r"^attack\.t[0-9]+\.[0-9]+$", tag):
            parent = tag.split(".")[1]  # 'tNNNN'
            technique.append(parent if bug_compat else f"attack.{parent}")
            subtechnique.append(tag)
    if not bug_compat:
        technique = list(dict.fromkeys(technique))
    out = [tuple(x) for x in (tactic, technique, subtechnique)]
    if bug_compat:
        # arr2str([]) yields "''" -> a single empty-string element
        out = [x if x else ("",) for x in out]
    return out


def _q(v: str) -> str:
    return "'" + str(v).replace("'", "''") + "'"


def _field(key: str) -> str:
    return f"`event_data`.`{key}`"


def _glob_to_like(value: str) -> tuple:
    """Sigma plain-match value -> (op-kind, text).  ``*``/``?`` are wildcards;
    returns ('eq', v) when no wildcard present, else ('like', pattern)."""
    if "*" not in value and "?" not in value:
        return "eq", value
    # KNOWN LIMITATION: a literal % or _ inside a wildcard-bearing Sigma
    # value is passed through and acts as a LIKE wildcard too (no escape
    # syntax in this renderer).  No rule in the reference corpus carries
    # one; revisit if a real ruleset does.
    pattern = value.replace("*", "%").replace("?", "_")
    return "like", pattern


def _scalar_term(key: str, value, bug_compat: bool) -> str:
    if value is None:
        return f"{_field(key)} IS NULL"
    if isinstance(value, bool):
        v = "true" if value else "false"  # sysmon JSON carries strings
        return f"{_field(key)} = {_q(v)}"
    if isinstance(value, (int, float)):
        if bug_compat:
            raise SigmaCompileError("sigma value type not support")  # main.py:131
        return f"{_field(key)} = {_q(value)}"
    if not isinstance(value, str):
        raise SigmaCompileError(f"unsupported sigma value: {value!r}")
    if bug_compat:
        return f"{_field(key)} = {_q(value)}"  # '*' stays literal (bug §2.8.1)
    kind, text = _glob_to_like(value)
    if kind == "eq":
        return f"{_field(key)} = {_q(text)}"
    return f"{_field(key)} LIKE {_q(text)}"


def _list_term(key: str, values, bug_compat: bool) -> str:
    if bug_compat:
        items = ", ".join(_q(v) for v in values)  # main.py:124-126, '*' literal
        return f"{_field(key)} IN ({items})"
    parts = [_scalar_term(key, v, False) for v in values]
    if len(parts) == 1:
        return parts[0]
    return "(" + " OR ".join(parts) + ")"


def _b64offset_variants(value: str, codec: str = "utf-8") -> list:
    """The three base64 alignments of a plaintext needle (Sigma
    ``base64offset`` modifier; public algorithm from the Sigma spec).  The
    reference strips this modifier silently (main.py:35).

    Trim rule: the leading 0/2/3 chars absorb the i prepended shift bytes;
    the TRAILING trim depends on ``(len(raw) + i) % 3`` — the final 1-2
    content chars of an incomplete triple mix with whatever byte follows in
    a real stream (here: padding), so they can never be matched literally.
    Indexing the end trim by i alone (the previous behavior) leaves
    ``w==`` in the alignment-0 variant of ``http://`` — a pattern that
    never occurs mid-stream, i.e. a silently dead detection."""
    starts = (0, 2, 3)
    ends = {0: None, 1: -3, 2: -2}
    out = []
    raw = value.encode(codec)
    for i in range(3):
        enc = base64.b64encode(b"\x00" * i + raw).decode("ascii")
        out.append(enc[starts[i] : ends[(len(raw) + i) % 3]])
    return out


#: Sigma value-encoding modifiers (must be followed by base64/base64offset).
#: ``wide`` is the pySigma alias for utf16le; ``utf16`` includes the BOM.
_ENC_CODECS = {
    "wide": "utf-16le",
    "utf16le": "utf-16le",
    "utf16be": "utf-16be",
    "utf16": "utf-16",
}


def _encoded_term(key: str, chain: list, value, codec: str) -> str:
    """``base64``/``base64offset`` terms over a needle pre-encoded with
    ``codec`` (utf-8 when no utf16/wide prefix was given)."""
    kind, rest = chain[0], "|".join(chain[1:])
    vals = value if isinstance(value, list) else [value]
    if kind == "base64offset":
        if rest != "contains":
            raise SigmaCompileError("base64offset requires |contains")
        variants = [x for v in vals for x in _b64offset_variants(str(v), codec)]
        parts = [f"{_field(key)} LIKE {_q('%' + x + '%')}" for x in variants]
        return "(" + " OR ".join(parts) + ")"
    # plain base64: one whole-value encoding, padding included — exact
    # match semantics (pySigma behavior); alignment-robust substring
    # matching is what base64offset is for
    enc_vals = [base64.b64encode(str(v).encode(codec)).decode("ascii")
                for v in vals]
    if not rest:
        parts = [f"{_field(key)} = {_q(x)}" for x in enc_vals]
        return parts[0] if len(parts) == 1 else "(" + " OR ".join(parts) + ")"
    if rest in ("contains", "startswith", "endswith"):
        return _modifier_term(key, rest, enc_vals, False)
    raise SigmaCompileError(f"base64 cannot chain with {rest!r}")


# Sigma `windash` variant set (the pySigma set: hyphen, slash, en dash,
# em dash, horizontal bar) — command-line flags written with any of them
# must match any other
_WINDASH_CHARS = ("-", "/", "–", "—", "―")


def _windash_variations(value: str, cap: int = 256) -> list:
    """All dash-variant permutations of ``value``: every character that IS a
    dash variant expands over the full variant set (cartesian across
    occurrences, like pySigma).  Refuses loudly past ``cap`` permutations —
    no silent truncation."""
    import itertools

    slots = [
        _WINDASH_CHARS if ch in _WINDASH_CHARS else (ch,) for ch in value
    ]
    n = 1
    for s in slots:
        n *= len(s)
        if n > cap:
            raise SigmaCompileError(
                f"windash: {value!r} expands to >{cap} permutations"
            )
    return ["".join(p) for p in itertools.product(*slots)]


def _cidr_patterns(cidr: str) -> list:
    """IPv4 CIDR -> LIKE/equality patterns over the dotted-quad TEXT form
    (the field carries an IP string).  Byte-aligned prefixes give one
    ``a.b.%`` pattern; a partial octet expands into its 2^(8-r) values.
    IPv6 is rejected loudly (compressed text forms make textual prefix
    matching unsound), as is malformed input — never silently stripped
    (the reference's modifier bug, main.py:35)."""
    import ipaddress

    try:
        net = ipaddress.ip_network(cidr, strict=False)
    except ValueError as exc:
        raise SigmaCompileError(f"cidr: invalid network {cidr!r}: {exc}") from exc
    if net.version != 4:
        raise SigmaCompileError(
            f"cidr: IPv6 not supported for text matching ({cidr!r}); "
            "normalize addresses upstream and use explicit patterns"
        )
    octets = str(net.network_address).split(".")
    full, rem = divmod(net.prefixlen, 8)
    if rem == 0:
        if full == 4:
            return [str(net.network_address)]
        if full == 0:
            return ["%"]
        return [".".join(octets[:full]) + ".%"]
    base = int(octets[full])
    pats = []
    for v in range(base, base + (1 << (8 - rem))):
        prefix = octets[:full] + [str(v)]
        pats.append(".".join(prefix) if full == 3 else ".".join(prefix) + ".%")
    return pats


def _wrap_cased(term: str, key: str) -> str:
    """Wrap every occurrence of ``key``'s rendered field in CASED(..) —
    skipping text inside single-quoted SQL literals, so a needle that
    happens to contain the backquoted field text is never rewritten."""
    fld = _field(key)
    out, i, n = [], 0, len(term)
    while i < n:
        ch = term[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if term[j] == "'":
                    if j + 1 < n and term[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(term[i : j + 1])
            i = j + 1
            continue
        if term.startswith(fld, i):
            out.append(f"CASED({fld})")
            i += len(fld)
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _modifier_term(key: str, modifier: str, value, bug_compat: bool) -> str:
    chain = modifier.split("|")
    if "cased" in chain:
        # Sigma v2 |cased: the spec's case-sensitivity escape hatch — the
        # decorated leaf compares case-sensitively even under the rule-wide
        # case-insensitive default.  Compiles the chain WITHOUT the marker,
        # then wraps the field in the grammar's CASED(..) form (expr.Leaf
        # cased=True), which exempts just this leaf from CI rendering.
        if bug_compat:
            # the reference strips unknown modifiers silently (main.py:35);
            # under its case-SENSITIVE matching the strip is semantically
            # harmless, but we refuse like every other unknown-to-it
            # modifier rather than reproduce the strip
            raise SigmaCompileError("cased not supported in bug-compat mode")
        rest = [m for m in chain if m != "cased"]
        if rest:
            term = _modifier_term(key, "|".join(rest), value, False)
        else:
            vals = value if isinstance(value, list) else [value]
            parts = [_scalar_term(key, v, False) for v in vals]
            term = parts[0] if len(parts) == 1 else "(" + " OR ".join(parts) + ")"
        return _wrap_cased(term, key)
    if chain[0] in _ENC_CODECS:
        if bug_compat:
            # the reference silently strips unknown modifiers (main.py:35);
            # a wide rule quietly matching narrow text is a wrong detection
            raise SigmaCompileError(
                f"{chain[0]} not supported in bug-compat mode")
        if len(chain) < 2 or chain[1] not in ("base64", "base64offset"):
            raise SigmaCompileError(
                f"{chain[0]} must be followed by base64 or base64offset")
        return _encoded_term(key, chain[1:], value, _ENC_CODECS[chain[0]])
    if chain[0] == "base64offset":
        rest = "|".join(chain[1:])
        if bug_compat:
            if not rest:
                raise SigmaCompileError(
                    "base64offset not supported in bug-compat mode")
            # reproduce the reference's silent strip (main.py:35): the
            # modifier vanishes and the tail compiles as a plain term —
            # the one documented bug-compat mangling, pinned by
            # tests/test_sigma.py::test_base64offset
            return _modifier_term(key, rest, value, True)
        # bare base64offset falls into _encoded_term's specific rejection:
        # its trimmed offset variants are substring needles, so the spec
        # (and pySigma) require |contains — never a generic fall-through
        return _encoded_term(key, chain, value, "utf-8")
    if chain[0] == "base64":
        if bug_compat:
            raise SigmaCompileError("base64 not supported in bug-compat mode")
        return _encoded_term(key, chain, value, "utf-8")

    def values_list(v):
        return v if isinstance(v, list) else [v]

    if modifier == "windash" or modifier.startswith("windash|"):
        if bug_compat:
            # the reference strips modifiers it doesn't know SILENTLY
            # (main.py:35) — that turns a windash rule into a wrong plain
            # match; refusing loudly is the only safe reproduction
            raise SigmaCompileError("windash not supported in bug-compat mode")
        rest = modifier[len("windash"):].lstrip("|")
        per_value = [
            (v, _windash_variations(str(v))) for v in values_list(value)
        ]
        if rest == "contains|all":
            if not isinstance(value, list):
                raise SigmaCompileError("contains|all requires a list")
            # each listed flag must appear, in ANY dash form
            return " AND ".join(
                "(" + " OR ".join(
                    f"{_field(key)} LIKE {_q('%' + x.strip('*') + '%')}"
                    for x in variants
                ) + ")"
                for _v, variants in per_value
            )
        expanded = [x for _v, variants in per_value for x in variants]
        if not rest:
            parts = [_scalar_term(key, x, False) for x in expanded]
            return parts[0] if len(parts) == 1 else "(" + " OR ".join(parts) + ")"
        return _modifier_term(key, rest, expanded, False)

    if modifier == "cidr":
        if bug_compat:
            raise SigmaCompileError("cidr not supported in bug-compat mode")
        pats = [p for v in values_list(value) for p in _cidr_patterns(str(v))]
        parts = [
            f"{_field(key)} LIKE {_q(p)}" if "%" in p else f"{_field(key)} = {_q(p)}"
            for p in pats
        ]
        return parts[0] if len(parts) == 1 else "(" + " OR ".join(parts) + ")"

    if modifier in ("lt", "lte", "gt", "gte"):
        if bug_compat:
            raise SigmaCompileError(f"{modifier} not supported in bug-compat mode")
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            raise SigmaCompileError(
                f"{modifier} requires a scalar numeric value, got {value!r}")
        sym = {"lt": "<", "lte": "<=", "gt": ">", "gte": ">="}[modifier]
        return f"{_field(key)} {sym} {value!r}"

    if modifier == "fieldref":
        # Sigma v2: compare against ANOTHER FIELD of the same event, not a
        # literal (e.g. ParentImage|fieldref: Image).  Column-vs-column
        # equality in both renderers; lists OR the references.
        if bug_compat:
            raise SigmaCompileError("fieldref not supported in bug-compat mode")
        refs = values_list(value)
        if not all(isinstance(v, str) for v in refs):
            raise SigmaCompileError(
                f"fieldref requires field-name string(s), got {value!r}")
        parts = [f"{_field(key)} = {_field(v)}" for v in refs]
        return parts[0] if len(parts) == 1 else "(" + " OR ".join(parts) + ")"

    if modifier == "exists":
        if bug_compat:
            raise SigmaCompileError("exists not supported in bug-compat mode")
        if not isinstance(value, bool):
            raise SigmaCompileError(f"exists requires true/false, got {value!r}")
        return (
            f"{_field(key)} IS NOT NULL" if value else f"{_field(key)} IS NULL"
        )

    if modifier == "all":
        # generic |all (no contains): every listed value must match exactly —
        # meaningful for multi-valued event fields, degenerate-but-correct
        # (never matches >1 distinct value) for scalar columns
        if bug_compat:
            raise SigmaCompileError("all not supported in bug-compat mode")
        if not isinstance(value, list):
            raise SigmaCompileError("all requires a list")
        return "(" + " AND ".join(_scalar_term(key, v, False) for v in value) + ")"

    if modifier.startswith("re|"):
        # regex flag modifiers (Sigma spec): i / m / s -> inline Java/RE2
        # flags prefixed onto the pattern, identical in both engines
        if bug_compat:
            raise SigmaCompileError("re flags not supported in bug-compat mode")
        flags = modifier.split("|")[1:]
        bad = [f for f in flags if f not in ("i", "m", "s")]
        if bad:
            raise SigmaCompileError(f"unsupported re flags: {bad!r}")
        prefix = "(?" + "".join(flags) + ")"
        parts = [
            f"{_field(key)} SIMILAR TO {_q(prefix + str(v))}"
            for v in values_list(value)
        ]
        return parts[0] if len(parts) == 1 else "(" + " OR ".join(parts) + ")"

    if modifier == "contains":
        if bug_compat:
            if isinstance(value, str):
                parts = [f"{_field(key)} LIKE {_q('%' + value.strip('*') + '%')}"]
            elif isinstance(value, list):
                # reference list-branch uses lstrip only (main.py:41 — bug §2.8.4)
                parts = [f"{_field(key)} LIKE {_q('%' + str(v).lstrip('*') + '%')}" for v in value]
            else:
                raise SigmaCompileError("sigma value type not support")
        else:
            parts = [f"{_field(key)} LIKE {_q('%' + str(v).strip('*') + '%')}" for v in values_list(value)]
        return parts[0] if len(parts) == 1 else "(" + " OR ".join(parts) + ")"
    if modifier == "endswith":
        parts = [f"{_field(key)} LIKE {_q('%' + str(v).lstrip('*'))}" for v in values_list(value)]
        return parts[0] if len(parts) == 1 else "(" + " OR ".join(parts) + ")"
    if modifier == "startswith":
        parts = [f"{_field(key)} LIKE {_q(str(v).rstrip('*') + '%')}" for v in values_list(value)]
        return parts[0] if len(parts) == 1 else "(" + " OR ".join(parts) + ")"
    if modifier == "re":
        parts = [f"{_field(key)} SIMILAR TO {_q(str(v))}" for v in values_list(value)]
        return parts[0] if len(parts) == 1 else "(" + " OR ".join(parts) + ")"
    if modifier == "contains|all":
        if not isinstance(value, list):
            raise SigmaCompileError("contains|all requires a list")
        strip = (lambda s: s) if bug_compat else (lambda s: s.strip("*"))
        return " AND ".join(
            f"{_field(key)} LIKE {_q('%' + strip(str(v)) + '%')}" for v in value
        )
    raise SigmaCompileError(f"sigma condition not found: {modifier!r}")


_PLACEHOLDER_RE = re.compile(r"%([A-Za-z0-9_]+)%")


def _expand_values(value, placeholders) -> list:
    """Sigma v2 ``|expand``: substitute ``%name%`` placeholders from a
    CALLER-SUPPLIED dictionary (the mapping is deployment-specific — admin
    workstation lists, service-account patterns — so the engine refuses to
    guess: no dict, loud rejection; unknown placeholder, loud rejection).
    A value holding several placeholders expands over their cartesian
    product; values without placeholders pass through verbatim."""
    if placeholders is None:
        raise SigmaCompileError(
            "expand requires a caller-supplied placeholder dictionary: "
            "compile_sigma(rule, placeholders={'var': [...]}) — the "
            "%var% mapping is deployment-specific and is never guessed"
        )
    vals = value if isinstance(value, list) else [value]
    out = []
    for v in vals:
        # only strings can carry %var% placeholders: a numeric/boolean value
        # in a mixed-type list passes through with its ORIGINAL type, so
        # |expand never silently turns typed equality into string equality
        # (advice r11)
        names = (
            sorted(set(_PLACEHOLDER_RE.findall(v)))
            if isinstance(v, str)
            else []
        )
        if not names:
            out.append(v)
            continue
        expanded = [v]
        for name in names:
            if name not in placeholders:
                raise SigmaCompileError(
                    f"expand: placeholder %{name}% missing from the "
                    f"placeholders dict (has: {sorted(placeholders)})"
                )
            subs = placeholders[name]
            subs = subs if isinstance(subs, list) else [subs]
            expanded = [
                e.replace(f"%{name}%", str(s)) for e in expanded for s in subs
            ]
        out.extend(expanded)
    if not out:
        raise SigmaCompileError("expand: empty value list after expansion")
    return out


def _map_sql(items, bug_compat: bool, placeholders=None) -> str:
    """Field->value map entries -> AND-joined predicate fragment."""
    terms = []
    for field_spec, value in items:
        if "|" not in field_spec:
            if isinstance(value, list):
                terms.append(_list_term(field_spec, value, bug_compat))
            else:
                terms.append(_scalar_term(field_spec, value, bug_compat))
        else:
            key, modifier = field_spec.split("|", 1)
            chain = modifier.split("|")
            if "expand" in chain:
                if bug_compat:
                    # same posture as every post-v1 modifier: the reference
                    # would silently strip it (main.py:35) — refuse instead
                    raise SigmaCompileError(
                        "expand not supported in bug-compat mode"
                    )
                value = _expand_values(value, placeholders)
                rest = "|".join(m for m in chain if m != "expand")
                if rest:
                    terms.append(_modifier_term(key, rest, value, bug_compat))
                else:
                    terms.append(_list_term(key, value, bug_compat))
                continue
            terms.append(_modifier_term(key, modifier, value, bug_compat))
    if not terms:
        raise SigmaCompileError("empty selection")
    return "(" + ") AND (".join(terms) + ")"


def _selection_sql(selection, bug_compat: bool, placeholders=None) -> str:
    """One named selection -> predicate fragment (main.py:106-135).

    Sigma semantics: a map selection ANDs its fields; a LIST selection ORs
    its entries (each entry itself a map of AND'd fields).  The reference
    compiler flattens list entries into one AND (main.py:117-121 never
    branches on the list case) — that makes multi-entry list selections
    unsatisfiable, so it is reproduced only under bug_compat.
    """
    if isinstance(selection, dict):
        return _map_sql(list(selection.items()), bug_compat, placeholders)
    if isinstance(selection, list):
        dict_entries = [e for e in selection if isinstance(e, dict)]
        # bare strings in selection lists are skipped by the reference too
        if not dict_entries:
            raise SigmaCompileError("empty selection")
        if bug_compat:
            items = []
            for entry in dict_entries:
                items.extend(entry.items())
            return _map_sql(items, bug_compat, placeholders)
        branches = [
            _map_sql(list(e.items()), bug_compat, placeholders)
            for e in dict_entries
        ]
        if len(branches) == 1:
            return branches[0]
        return "(" + " OR ".join(branches) + ")"
    raise SigmaCompileError(f"unsupported selection shape: {selection!r}")


_AGG_RE = re.compile(
    r"^\s*count\(\s*\)\s*(?:by\s+(?P<by>\w+)\s*)?(?P<op>[><]=?|=)\s*(?P<n>\d+)\s*$",
    re.I,
)


def _parse_timeframe(tf) -> int:
    m = re.match(r"^(\d+)([smhd])$", str(tf).strip())
    if not m:
        raise SigmaCompileError(f"bad timeframe: {tf!r}")
    return int(m.group(1)) * _TIMEFRAME_UNITS[m.group(2)]


def _condition_sql(condition: str, sel_sql: dict, bug_compat: bool) -> str:
    """Apply the Sigma condition grammar over compiled selection fragments.

    Names resolve case-insensitively (the reference uppercases everything,
    main.py:96).  Supports bare names, ``1 of X*``/``1 of them``,
    ``all of X*``/``all of them``, and/or/not with parens.
    """
    lookup = {k.upper(): v for k, v in sel_sql.items()}

    def of_expr(quant: str, pattern: str) -> str:
        if pattern.upper() == "THEM":
            matches = list(lookup.values())
        elif pattern.endswith("*"):
            prefix = pattern[:-1].upper()
            matches = [v for k, v in lookup.items() if k.startswith(prefix)]
        else:
            matches = [lookup[pattern.upper()]] if pattern.upper() in lookup else []
        if not matches:
            raise SigmaCompileError(f"'of' pattern matched no selections: {pattern!r}")
        joiner = " OR " if quant == "1" else " AND "
        return "(" + joiner.join(f"({m})" for m in matches) + ")"

    # normalize "1 of X" / "all of X" into single tokens first
    text = condition
    out_tokens = []
    tokens = re.findall(r"\(|\)|[^\s()]+", text)
    i = 0
    while i < len(tokens):
        t = tokens[i]
        tl = t.lower()
        if tl in ("1", "all") and i + 2 < len(tokens) and tokens[i + 1].lower() == "of":
            out_tokens.append(of_expr("1" if tl == "1" else "all", tokens[i + 2]))
            i += 3
            continue
        if tl in ("and", "or", "not"):
            out_tokens.append(tl.upper())
        elif t in ("(", ")"):
            out_tokens.append(t)
        else:
            if t.upper() not in lookup:
                raise SigmaCompileError(f"unknown selection in condition: {t!r}")
            out_tokens.append(f"({lookup[t.upper()]})")
        i += 1
    return " ".join(out_tokens)


def compile_sigma(
    rule: dict,
    bug_compat: bool = False,
    case_insensitive: Optional[bool] = None,
    placeholders: Optional[dict] = None,
) -> Optional[RuleSpec]:
    """Compile one parsed Sigma rule dict into a RuleSpec.

    Returns None for timeframe rules when ``bug_compat`` (the reference skips
    them, main.py:194-195); otherwise timeframe rules compile into windowed
    count rules (RuleSpec.timeframe_*).  ``case_insensitive`` defaults to the
    Sigma spec (True) in fixed mode and False in bug-compat mode.
    ``placeholders`` supplies the ``%var%`` dictionary for the v2 ``expand``
    modifier ({name: value-or-list}); expand rules are REJECTED when it is
    absent — the mapping is deployment data, never guessed.
    """
    if case_insensitive is None:
        case_insensitive = not bug_compat

    if not isinstance(rule, dict) or "detection" not in rule or "title" not in rule:
        raise SigmaCompileError(f"not a sigma rule (need title+detection): {rule!r}")
    detection = dict(rule["detection"])
    condition = detection.pop("condition")
    timeframe = detection.pop("timeframe", None)

    if timeframe is not None and bug_compat:
        return None

    agg = None
    if "|" in condition:
        cond_part, agg_part = condition.split("|", 1)
        m = _AGG_RE.match(agg_part)
        if not m:
            raise SigmaCompileError(f"unsupported aggregation: {agg_part!r}")
        if m.group("op") not in (">", ">="):
            raise SigmaCompileError("only count() > / >= thresholds supported")
        agg = dict(
            by=m.group("by"),
            min_count=int(m.group("n")) + (1 if m.group("op") == ">" else 0),
        )
        condition = cond_part.strip()

    sel_sql = {
        name: _selection_sql(sel, bug_compat, placeholders)
        for name, sel in detection.items()
    }
    body = _condition_sql(condition, sel_sql, bug_compat)

    category = (rule.get("logsource") or {}).get("category", "")
    event_id = CATEGORY_EVENT_ID.get(category)
    predicate_sql = f"event_id = {event_id} AND ({body})" if event_id else body
    # validate through the shared parser — compile errors surface here
    parse_predicate(predicate_sql)

    tactic, technique, subtechnique = _split_tags(rule.get("tags"), bug_compat)
    level = rule.get("level", "medium")
    severity = _SEVERITY.get(level)
    if severity is None:
        raise SigmaCompileError(f"unknown level: {level!r}")

    tf_seconds = _parse_timeframe(timeframe) if timeframe is not None else None
    if agg and tf_seconds is None:
        # a count() threshold with no timeframe would otherwise compile to a
        # stateless rule that fires on EVERY matching event — silently
        # dropping the threshold.  Refuse loudly instead.
        raise SigmaCompileError(
            "count() aggregation requires a detection.timeframe "
            f"(rule {rule.get('title')!r} has none)"
        )
    group_by = ("host",)
    if agg and agg["by"]:
        group_by = ("host", f"event_data.{agg['by']}")
    min_count = agg["min_count"] if agg else (2 if tf_seconds else None)

    return RuleSpec(
        name=rule["title"],
        author=rule.get("author", ""),
        severity=severity,
        description=rule.get("description", ""),
        references=tuple(rule.get("references", ())),
        tactic=tactic,
        technique=technique,
        subtechnique=subtechnique,
        category="sysmon",
        module="process_access" if category == "process_access" else None,
        predicate_sql=predicate_sql,
        case_insensitive=case_insensitive,
        timeframe_seconds=tf_seconds,
        timeframe_min_count=min_count if tf_seconds else None,
        timeframe_group_by=group_by,
    )


from dataclasses import dataclass as _dataclass


@_dataclass(frozen=True)
class FilterSpec:
    """A Sigma global FILTER meta-document (the spec's tuning mechanism:
    exclude known-benign matches from OTHER rules without editing them).
    ``condition_sql`` is the compiled keep-predicate ANDed onto every
    referenced rule — the filter document's ``condition`` expresses what
    to KEEP (typically ``not selection``)."""

    name: str
    rules: tuple
    condition_sql: str


_KNOWN_FILTER_KEYS = frozenset({"rules", "condition"})


def compile_filter(doc: dict, bug_compat: bool = False) -> FilterSpec:
    """One Sigma filter document -> FilterSpec.

    The ``filter:`` block holds ``rules`` (names of the base rules this
    filter tunes), one or more named selections (same syntax/modifiers as
    a detection block, compiled by the same machinery), and a
    ``condition`` over those selections.  A declared
    ``logsource.category`` compiles to the same event-id gate base rules
    get, so a filter can never silently loosen a rule onto other event
    types.  Unknown structure is rejected loudly (implement-or-reject,
    same discipline as the correlation parser)."""
    flt = doc.get("filter")
    ctx = doc.get("title") or "filter"
    if not isinstance(flt, dict):
        raise SigmaCompileError(f"{ctx!r}: no filter block")
    rules = flt.get("rules")
    if isinstance(rules, str):
        rules = [rules]
    if not isinstance(rules, (list, tuple)) or not rules or not all(
        isinstance(r, str) and r for r in rules
    ):
        raise SigmaCompileError(
            f"{ctx!r}: filter.rules must name at least one base rule"
        )
    condition = flt.get("condition")
    if not isinstance(condition, str) or not condition.strip():
        raise SigmaCompileError(f"{ctx!r}: filter.condition is required")
    selections = {
        k: v for k, v in flt.items() if k not in _KNOWN_FILTER_KEYS
    }
    if not selections:
        raise SigmaCompileError(
            f"{ctx!r}: filter needs at least one selection beside "
            "rules/condition"
        )
    bad = [k for k, v in selections.items() if not isinstance(v, (dict, list))]
    if bad:
        raise SigmaCompileError(
            f"{ctx!r}: filter keys {bad} are neither selections "
            "(mapping/list) nor known filter fields "
            f"{sorted(_KNOWN_FILTER_KEYS)}"
        )
    sel_sql = {
        name: _selection_sql(sel, bug_compat)
        for name, sel in selections.items()
    }
    body = _condition_sql(condition, sel_sql, bug_compat)
    category = (doc.get("logsource") or {}).get("category", "")
    event_id = CATEGORY_EVENT_ID.get(category)
    cond = f"event_id = {event_id} AND ({body})" if event_id else body
    parse_predicate(cond)  # loud compile errors, same gate as rules
    return FilterSpec(
        name=str(doc.get("title", "filter")),
        rules=tuple(str(r) for r in rules),
        condition_sql=cond,
    )


def load_filters(path: str, bug_compat: bool = False) -> list:
    """Walk a file/directory of YAML documents, returning every filter
    meta-document found (multi-doc files supported, same loader
    discipline as load_correlations)."""
    specs = []
    paths = []
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            paths += [os.path.join(root, f) for f in sorted(files)
                      if f.endswith((".yml", ".yaml"))]
    elif os.path.isfile(path):
        paths = [path]
    for p in paths:
        with open(p) as fh:
            for doc in yaml.safe_load_all(fh):
                if (
                    isinstance(doc, dict)
                    and "filter" in doc
                    and "detection" not in doc
                ):
                    specs.append(compile_filter(doc, bug_compat=bug_compat))
    return specs


def apply_filters(rules: list, filters: list) -> list:
    """Return a new RuleSpec list with every filter's keep-condition ANDed
    onto the rules it references (order preserved; untouched rules pass
    through).  A filter naming an unknown rule fails loudly — a typo'd
    reference would otherwise silently leave the noisy rule untuned, the
    exact failure mode filters exist to prevent."""
    import dataclasses

    by_name = {r.name: r for r in rules}
    for flt in filters:
        missing = [n for n in flt.rules if n not in by_name]
        if missing:
            raise SigmaCompileError(
                f"filter {flt.name!r} references unknown rules: {missing}"
            )
        for n in flt.rules:
            r = by_name[n]
            merged = f"({r.predicate_sql}) AND ({flt.condition_sql})"
            parse_predicate(merged)
            by_name[n] = dataclasses.replace(r, predicate_sql=merged)
    return [by_name[r.name] for r in rules]


def compile_sigma_file(path: str, **kw) -> Optional[RuleSpec]:
    with open(path) as f:
        doc = yaml.safe_load(f.read())
    if isinstance(doc, dict) and "detection" not in doc and (
        "correlation" in doc or "filter" in doc
    ):
        # a Sigma META-document (correlation or global filter) referencing
        # base rules: not a per-event rule — sigma/correlation.py and
        # compile_filter/apply_filters own these, and a mixed rules
        # directory must not trip the base compiler
        return None
    return compile_sigma(doc, **kw)


def compile_sigma_dir(path: str, **kw) -> list:
    """Walk a rules directory (main.py:220-224) and compile every YAML file."""
    out = []
    for root, _dirs, files in os.walk(path):
        for fn in sorted(files):
            if fn.endswith((".yml", ".yaml")):
                spec = compile_sigma_file(os.path.join(root, fn), **kw)
                if spec is not None:
                    out.append(spec)
    return out
