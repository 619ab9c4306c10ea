"""CLI: compile a directory of Sigma YAML rules to Spark SQL predicates.

Parity with the reference's only executable (sigma-transf/main.py:227-229,
which walks a rules dir and prints generated Flink SQL to stdout for manual
curation).  Ours prints one JSON object per rule — name, severity, MITRE
tags, the compiled Spark SQL predicate, timeframe fields — which is the
data the engine loads, no hand-curation step.

    python -m dagger_spark.sigma RULES_DIR [--bug-compat] [--case-sensitive]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

from .compiler import SigmaCompileError, compile_sigma_dir


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m dagger_spark.sigma",
        description="Compile Sigma YAML rules to Spark SQL predicate specs",
    )
    ap.add_argument("rules_dir", help="directory of Sigma .yml/.yaml rules")
    ap.add_argument(
        "--bug-compat", action="store_true",
        help="replicate the reference compiler's quirks (SURVEY.md §2.8): "
             "skip timeframe rules, keep wildcard/strip bugs, case-sensitive",
    )
    ap.add_argument(
        "--case-sensitive", action="store_true",
        help="match case-sensitively (default: insensitive per Sigma spec, "
             "unless --bug-compat)",
    )
    args = ap.parse_args(argv)

    ci = False if args.case_sensitive else None
    try:
        specs = compile_sigma_dir(args.rules_dir, bug_compat=args.bug_compat, case_insensitive=ci)
    except (SigmaCompileError, OSError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1

    # meta-documents living beside the base rules compile too: global
    # FILTERS tune the emitted predicates in place (what the engine loads
    # IS the tuned rule — no separate application step to forget), and
    # correlation references are linted with dangling refs surfaced loudly
    from .compiler import apply_filters, load_filters
    from .correlation import load_correlations, suppressed_rule_names

    try:
        filters = load_filters(args.rules_dir, bug_compat=args.bug_compat)
        filtered_names = {n for f in filters for n in f.rules}
        if filters:
            specs = apply_filters(specs, filters)
        correlations = load_correlations(args.rules_dir)
    except SigmaCompileError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    suppressed = suppressed_rule_names(correlations)

    for spec in specs:
        d = dataclasses.asdict(spec)
        d = {k: (list(v) if isinstance(v, tuple) else v) for k, v in d.items()}
        if spec.name in filtered_names:
            d["tuned_by_filter"] = True
        if spec.name in suppressed:
            # Sigma v2 generate:false — the correlation replaces this
            # rule's standalone alerts; the engine should drop it from
            # apply_rules while still compiling the correlation
            d["suppressed_by_correlation"] = True
        print(json.dumps(d))

    known = {s.name for s in specs}
    n_dangling = 0
    for c in correlations:
        d = dataclasses.asdict(c)
        d = {k: (list(v) if isinstance(v, tuple) else v) for k, v in d.items()}
        d["kind"] = "correlation"
        missing = [r for r in c.rules if r not in known]
        if missing:
            d["unresolved_rules"] = missing
            n_dangling += 1
        print(json.dumps(d))
    tail = f"compiled {len(specs)} rules"
    if filters:
        tail += f" + {len(filters)} filters"
    if correlations:
        tail += f" + {len(correlations)} correlations"
        if n_dangling:
            tail += f" ({n_dangling} with unresolved references)"
    print(tail, file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
