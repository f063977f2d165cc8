"""Machine-derive the SURVEY.md §2 inventory totals from the registry.

Prints the counts the SURVEY totals line must carry, and (with --check)
verifies the committed SURVEY.md line matches — the round-6 verdict found
a hand-maintained off-by-one (474 vs 473), so the counts are now derived,
never typed.

Usage:
    python tools/inventory.py            # print counts
    python tools/inventory.py --check    # exit 1 if SURVEY.md disagrees
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from npc_recommender_netflix_spark import registry

registry.load_all()

SURVEY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md"
)

TOTALS_RE = re.compile(
    r"Inventory totals \(as implemented, round \d+\): (\d+) keys — (\d+) "
    r"SQL-oracle,\s*\n?(\d+) rows-only"
)


def counts() -> tuple[int, int, int]:
    n = len(registry.QUERIES)
    n_oracle = len(registry.ORACLE)
    return n, n_oracle, n - n_oracle


def main() -> int:
    n, n_oracle, n_rows_only = counts()
    print(f"keys={n} sql_oracle={n_oracle} rows_only={n_rows_only}")
    if "--check" not in sys.argv:
        return 0
    with open(SURVEY) as fh:
        m = TOTALS_RE.search(fh.read())
    if not m:
        print("SURVEY.md totals line not found", file=sys.stderr)
        return 1
    claimed = tuple(int(g) for g in m.groups())
    if claimed != (n, n_oracle, n_rows_only):
        print(
            f"SURVEY.md claims {claimed}, registry has "
            f"{(n, n_oracle, n_rows_only)}",
            file=sys.stderr,
        )
        return 1
    print("SURVEY.md totals line matches the registry")
    return 0


if __name__ == "__main__":
    sys.exit(main())
