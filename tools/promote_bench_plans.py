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


def _registered() -> set[str] | None:
    """Names currently in the query registry, or None if it can't load
    (promotion must still work on a box without pyspark)."""
    try:
        sys.path.insert(0, os.path.dirname(_PLAN_DIR))
        from kafkaish_spark.plans.registry import all_queries

        return set(all_queries())
    except Exception:
        return None


def main(names: list[str]) -> None:
    promoted, orphans = [], []
    registered = _registered()
    for f in sorted(os.listdir(_PLAN_DIR)):
        if not f.endswith(".txt.new"):
            continue
        q = f[: -len(".txt.new")]
        if names and q not in names:
            continue
        # a staged file for a removed/renamed query would become a
        # baseline .txt no bench run ever reconciles (r7 advice):
        # skip it in promote-all mode and say so; promoting it stays
        # possible by naming it explicitly
        if registered is not None and q not in registered and not names:
            orphans.append(q)
            continue
        os.replace(
            os.path.join(_PLAN_DIR, f), os.path.join(_PLAN_DIR, q + ".txt")
        )
        promoted.append(q)
    print(f"promoted {len(promoted)}: {', '.join(promoted) or '(none staged)'}")
    if orphans:
        print(
            f"skipped {len(orphans)} staged plan(s) with no registered "
            f"query (removed/renamed?): {', '.join(orphans)} — promote "
            "explicitly by name, or delete the .txt.new"
        )


if __name__ == "__main__":
    main(sys.argv[1:])
