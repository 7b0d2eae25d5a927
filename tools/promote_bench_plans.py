"""Promote staged bench-plan snapshots into the committed baseline.

bench.py never overwrites a committed plan snapshot (bench_plans/<q>.txt);
a genuinely changed plan is staged to <q>.txt.new instead so repeated
bench runs within a round stay idempotent against the baseline.  After
reviewing a plan change (it should be intentional — a new strategy, not
a regression), run this to promote every staged snapshot:

    python tools/promote_bench_plans.py            # promote all
    python tools/promote_bench_plans.py q_foo ...  # promote named only
"""

from __future__ import annotations

import os
import sys

_PLAN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_plans"
)


def main(names: list[str]) -> None:
    promoted = []
    for f in sorted(os.listdir(_PLAN_DIR)):
        if not f.endswith(".txt.new"):
            continue
        q = f[: -len(".txt.new")]
        if names and q not in names:
            continue
        os.replace(
            os.path.join(_PLAN_DIR, f), os.path.join(_PLAN_DIR, q + ".txt")
        )
        promoted.append(q)
    print(f"promoted {len(promoted)}: {', '.join(promoted) or '(none staged)'}")


if __name__ == "__main__":
    main(sys.argv[1:])
