"""Behavioral tests for the composites21 batch: temperature mixture
and SpaceSaving heavy hitters."""

import collections

import pyspark.sql.functions as F


def test_temperature_flattens_the_mixture(spark, sf_dir):
    """T=0.5 must move every domain's share toward uniform: larger
    domains get repeat_factor < 1, smaller ones > 1, and the ordering
    of shares is preserved."""
    from kafkaish_spark.operators.composites21 import q_sample_temperature

    rows = q_sample_temperature(spark, sf_dir).collect()
    assert len(rows) >= 2
    mean_share = 1.0 / len(rows)
    for r in rows:
        assert abs(r.temp_share - r.share) <= abs(mean_share - r.share) + 1e-9
        if r.share > mean_share:
            assert r.repeat_factor < 1.0
        elif r.share < mean_share * 0.9:
            assert r.repeat_factor > 1.0
    by_share = sorted(rows, key=lambda r: r.share)
    by_temp = sorted(rows, key=lambda r: r.temp_share)
    assert [r.source for r in by_share] == [r.source for r in by_temp]


def test_spacesaving_bounds_and_recall(spark, sf_dir):
    """Sketch invariants: est >= true >= est - err for every reported
    term, and the exact top-5 terms all surface in the sketch top-20."""
    from kafkaish_spark.operators.composites21 import q_sketch_spacesaving_topk
    from kafkaish_spark.sources.tables import load_table

    got = q_sketch_spacesaving_topk(spark, sf_dir).collect()
    assert 0 < len(got) <= 20
    assert [r.rk for r in got] == list(range(1, len(got) + 1))

    exact = collections.Counter()
    for r in load_table(spark, sf_dir, "documents").select("text").collect():
        exact.update(w for w in r.text.split(" ") if w)

    for r in got:
        true = exact[r.term]
        assert r.est >= true, (r.term, r.est, true)
        assert r.est - r.err <= true, (r.term, r.est, r.err, true)

    top5_exact = [w for w, _ in exact.most_common(5)]
    sketched = {r.term for r in got}
    assert set(top5_exact) <= sketched
