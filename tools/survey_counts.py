"""Regenerate registry counts embedded in SURVEY.md from load_all().

Hand-counted registry numbers drift (round-5 verdict: §8 said 233/220 and
§5 said 240 while the registry held 247/234). PLANS.md already generates
its counts; this gives SURVEY.md the same treatment — run after adding or
removing queries:

    PYTHONPATH=/root/repo python tools/survey_counts.py

Rewrites, in place:
  - the §8 sentence "N queries, M with full DuckDB oracles (K rows-only)"
  - the §5 narrative "Registry grew to N queries / M oracles"
  - any "(N queries as of round X)" parentheticals in the verify skill
"""

from __future__ import annotations

import re
import sys


def main() -> int:
    from better_cdc_spark.queries import load_all

    registry = load_all()
    n = len(registry)
    m = sum(1 for s in registry.values() if s.oracle is not None)
    k = n - m
    print(f"registry: {n} queries, {m} oracles, {k} rows-only")

    path = "SURVEY.md"
    src = open(path).read()
    subs = [
        (
            r"\d+ queries, \d+ with full DuckDB oracles \(\d+ rows-only\)",
            f"{n} queries, {m} with full DuckDB oracles ({k} rows-only)",
        ),
        (
            r"Registry grew to \d+ queries /\s*\n?\d+ oracles",
            f"Registry grew to {n} queries /\n{m} oracles",
        ),
    ]
    changed = 0
    for pat, repl in subs:
        src, c = re.subn(pat, repl, src)
        changed += c
    open(path, "w").write(src)
    print(f"SURVEY.md: {changed} count sites regenerated")

    skill = ".claude/skills/verify/SKILL.md"
    try:
        s = open(skill).read()
        s2 = re.sub(r"\(\d+ queries as of round \d+\)", f"({n} queries)", s)
        if s2 != s:
            open(skill, "w").write(s2)
            print("verify skill: count regenerated")
    except FileNotFoundError:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
