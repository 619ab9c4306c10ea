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

    for spec in specs:
        d = dataclasses.asdict(spec)
        d = {k: (list(v) if isinstance(v, tuple) else v) for k, v in d.items()}
        print(json.dumps(d))

    # correlation meta-rules living beside the base rules compile too,
    # with dangling references surfaced loudly (the compile itself checks
    # them at run-build time; here we lint against the rules just compiled)
    from .correlation import load_correlations

    try:
        correlations = load_correlations(args.rules_dir)
    except SigmaCompileError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
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
    if correlations:
        tail += f" + {len(correlations)} correlations"
        if n_dangling:
            tail += f" ({n_dangling} with unresolved references)"
    print(tail, file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
