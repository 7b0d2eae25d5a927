"""Round-5 seventh wave (operators/composites33.py): functional-
dependency audit and g3 strength — checked against pure-python
replays on sf0.001 (the oracle gate re-proves them vs DuckDB at
sf0.01)."""

import duckdb

SF = "/root/testdata/sf0.001"


def _pairs(tab, det, dep):
    return duckdb.sql(
        f"SELECT {det}, {dep} FROM '{SF}/{tab}.parquet'"
    ).fetchall()


def test_functional_deps_match_pure_python_replay(spark):
    from kafkaish_spark.operators.composites33 import (
        _FDS,
        q_profile_functional_deps,
    )

    want = {}
    for tab, det, dep in _FDS:
        groups = {}
        for x, y in _pairs(tab, det, dep):
            groups.setdefault(x, set()).add(y)
        violations = sum(len(v) - 1 for v in groups.values())
        want[f"{tab}.{det}->{dep}"] = (
            len(groups),
            violations,
            violations == 0,
        )
    got = {
        r["fd"]: (r["n_groups"], r["violations"], r["holds"])
        for r in q_profile_functional_deps(spark, SF).collect()
    }
    assert got == want
    # the fixture must exercise both verdicts
    assert {v[2] for v in want.values()} == {True, False}


def test_fd_strength_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites33 import (
        _FDS,
        q_profile_fd_strength,
    )

    want = {}
    for tab, det, dep in _FDS:
        counts = {}
        for x, y in _pairs(tab, det, dep):
            counts.setdefault(x, {})
            counts[x][y] = counts[x].get(y, 0) + 1
        n = sum(sum(ys.values()) for ys in counts.values())
        keep = sum(max(ys.values()) for ys in counts.values())
        want[f"{tab}.{det}->{dep}"] = (
            n,
            n - keep,
            round((n - keep) / n, 6),
        )
    got = {
        r["fd"]: (r["n_rows"], r["n_delete"], r["g3_error"])
        for r in q_profile_fd_strength(spark, SF).collect()
    }
    assert got == want
