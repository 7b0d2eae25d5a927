"""Behavioral tests for the composites23 batch: Kaplan-Meier survival
and MASE forecast scoring."""


def test_kaplan_meier_is_monotone_and_bounded(spark, sf_dir):
    from kafkaish_spark.operators.composites23 import q_events_kaplan_meier

    rows = sorted(
        q_events_kaplan_meier(spark, sf_dir).collect(), key=lambda r: r.t
    )
    assert rows, "expected at least one observed churn event"
    prev = 1.0
    for r in rows:
        assert 0.0 < r.km <= 1.0
        assert r.km <= prev + 1e-9  # survival never increases
        assert 0 < r.d <= r.n_at_risk
        prev = r.km
    # risk sets shrink as t grows
    risks = [r.n_at_risk for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_mase_scalar_consistent_with_errors(spark, sf_dir):
    from kafkaish_spark.operators.composites23 import q_ts_mase

    rows = q_ts_mase(spark, sf_dir).collect()
    assert rows
    mase = {r.mase for r in rows}
    assert len(mase) == 1  # one scalar broadcast to every row
    assert mase.pop() > 0
    for r in rows:
        assert r.abs_err == abs(r.cents - r.forecast)
