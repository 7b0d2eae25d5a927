"""Round-5 second wave (operators/composites28.py +
sources/idempotent.py): URL canonicalization, curriculum two-phase
rank, bucketed zero-exchange join, idempotent producer."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_url_canonicalizer_cases(spark):
    """The canonicalizer must collapse exactly the equivalence class it
    claims: query strings, host case, www., one trailing slash — and
    preserve path case."""
    from kafkaish_spark.operators.composites28 import _canon

    cases = [
        ("HTTPS://WWW.SRC1.Example.com/en/p3/?utm_campaign=c1",
         "https://src1.example.com/en/p3"),
        ("https://src1.example.com/en/p3",
         "https://src1.example.com/en/p3"),
        ("http://Www.Host.IO/A/B?x=1&y=2", "http://host.io/A/B"),
        ("https://host.io/CaseSensitive/Path/", "https://host.io/CaseSensitive/Path"),
        ("https://host.io/", "https://host.io"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(_canon(F.col("url"))).collect()]
    assert got == [want for _, want in cases]


def test_curriculum_positions_are_a_permutation_and_stage_ordered(spark):
    """Two-phase curriculum rank: positions are exactly 1..N and stages
    are non-decreasing along the position order (easy docs first)."""
    from kafkaish_spark.operators.composites28 import q_train_curriculum_order

    rows = (
        q_train_curriculum_order(spark, SF)
        .orderBy("position")
        .collect()
    )
    assert [r["position"] for r in rows] == list(range(1, len(rows) + 1))
    stages = [r["stage"] for r in rows]
    assert stages == sorted(stages)
    # within a stage, seeded-shuffle order = skey ascending
    for s in set(stages):
        keys = [r["skey"] for r in rows if r["stage"] == s]
        assert keys == sorted(keys)


def test_bucketed_join_plan_has_no_join_side_exchange(spark):
    """The point of the bucketed layout: the SortMergeJoin consumes
    both bucketed scans DIRECTLY — the only Exchange in the whole plan
    is the final rollup's; neither join input is re-shuffled."""
    from kafkaish_spark.operators.composites28 import q_layout_bucketed_join

    df = q_layout_bucketed_join(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "Reused" not in ln
    ]
    assert len(exchanges) == 1, exchanges
    assert "hashpartitioning(c_mktsegment" in exchanges[0], exchanges
    # and the result is right (vs a plain parquet join)
    from kafkaish_spark.sources.tables import load_table

    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    want = {
        (r["c_mktsegment"], r["n_orders"], r["cents"])
        for r in o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .collect()
    }
    got = {(r["c_mktsegment"], r["n_orders"], r["cents"]) for r in df.collect()}
    assert got == want


def test_bucketed_tables_self_heal_on_fingerprint(spark):
    """A bucketed table whose contents no longer match the source
    fingerprint is rebuilt, not silently reused."""
    from kafkaish_spark.operators.composites28 import (
        _BKT_N,
        _bucketed_tables,
    )

    t_o, _t_c = _bucketed_tables(spark, SF)
    n0 = spark.table(t_o).count()
    # corrupt: drop and recreate the table with one row missing
    broken = spark.table(t_o).limit(n0 - 1).collect()
    spark.sql(f"DROP TABLE {t_o}")
    import shutil

    from kafkaish_spark.operators.composites28 import _REPO_ROOT
    import os

    loc = os.path.join(
        _REPO_ROOT, "spark-warehouse", "_bkt",
        os.path.basename(SF).replace(".", "_"), "orders",
    )
    shutil.rmtree(loc, ignore_errors=True)
    (
        spark.createDataFrame(broken)
        .repartition(_BKT_N, "o_custkey")
        .write.format("parquet")
        .option("path", loc)
        .bucketBy(_BKT_N, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable(t_o)
    )
    assert spark.table(t_o).count() == n0 - 1
    t_o2, _ = _bucketed_tables(spark, SF)
    assert spark.table(t_o2).count() == n0  # healed


def test_idempotent_producer_skips_retries_and_rejects_gaps(engine, spark):
    from kafkaish_spark.sources.idempotent import (
        last_seq,
        publish_idempotent,
    )

    topic = engine.prepare_topic("idem")
    batch = spark.createDataFrame(
        [("a", "m1"), ("a", "m2")], "event string, message string"
    )
    r1 = publish_idempotent(topic, batch, "p1", 1)
    assert r1 == {"published": 2, "skipped": False, "seq": 1}
    # the classic timeout retry: same seq, suppressed
    r1b = publish_idempotent(topic, batch, "p1", 1)
    assert r1b["skipped"] and topic.latest() == 2
    # a DIFFERENT producer is independent
    r_other = publish_idempotent(topic, batch, "p2", 1)
    assert not r_other["skipped"] and topic.latest() == 4
    # sequence gap fails loudly
    with pytest.raises(ValueError, match="sequence gap"):
        publish_idempotent(topic, batch, "p1", 5)
    assert last_seq(topic, "p1") == 1
    # next in sequence proceeds
    r2 = publish_idempotent(topic, batch, "p1", 2)
    assert r2 == {"published": 2, "skipped": False, "seq": 2}
    assert topic.latest() == 6


def test_interval_join_twin_matches_naive_join(spark):
    """The library interval_join on batch frames equals the naive
    range-join formulation (the oracle's shape) row-for-row."""
    from kafkaish_spark.operators.composites28 import (
        q_stream_join_interval_counts,
    )
    from kafkaish_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    v = ev.filter(F.col("event_type") == "view").alias("v")
    naive = (
        c.join(
            v,
            (F.col("v.user_id") == F.col("c.user_id"))
            & (F.col("v.ts") <= F.col("c.ts"))
            & (F.col("v.ts") >= F.col("c.ts") - F.expr("INTERVAL 10 MINUTES")),
        )
        .groupBy(F.col("c.user_id").alias("user_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.round(F.col("c.value") * 100).cast("long"))
            .cast("long")
            .alias("click_cents"),
        )
    )
    want = {tuple(r) for r in naive.collect()}
    got = {tuple(r) for r in q_stream_join_interval_counts(spark, SF).collect()}
    assert got == want and got


def test_pii_scrub_redacts_and_preserves_rest(spark):
    """The scrubber must remove exactly the injected email+phone per
    doc and leave every other byte intact."""
    from kafkaish_spark.operators.composites28 import q_text_pii_scrub
    from kafkaish_spark.sources.tables import load_table

    rows = q_text_pii_scrub(spark, SF).collect()
    d = load_table(spark, SF, "documents")
    per_lang = {
        r["lang"]: (r["n"], r["chars"])
        for r in d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("text")).alias("chars"),
        )
        .collect()
    }
    for r in rows:
        n, chars = per_lang[r["lang"]]
        assert r["n_docs"] == n
        # one email + one phone injected per doc
        assert r["emails_scrubbed"] == n
        assert r["phones_scrubbed"] == n
        # after scrubbing, the doc is original text + the fixed-width
        # scaffold (' contact ' + '<EMAIL>' + ' or ' + '<PHONE>')
        scaffold = len(" contact ") + len("<EMAIL>") + len(" or ") + len("<PHONE>")
        assert r["sum_len_after"] == chars + n * scaffold


def test_url_canonicalizer_idempotent_property(spark):
    """Canonicalization is a projection: canon(canon(u)) == canon(u)
    for arbitrary scheme/host/path/query shapes (hypothesis)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from kafkaish_spark.operators.composites28 import _canon

    host_chars = st.text("abcdefgh.WXZ", min_size=1, max_size=12)
    path_chars = st.text("abcXYZ09/._-", max_size=16)
    query = st.one_of(st.just(""), st.text("abc=&123_", max_size=10).map(lambda q: "?" + q))

    @settings(
        max_examples=30,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        scheme=st.sampled_from(["http", "HTTPS", "hTTp"]),
        www=st.sampled_from(["", "www.", "WWW."]),
        host=host_chars,
        path=path_chars,
        q=query,
    )
    def check(scheme, www, host, path, q):
        url = f"{scheme}://{www}{host}/{path}{q}"
        df = spark.createDataFrame([(url,)], "url string")
        once = df.select(_canon(F.col("url")).alias("c"))
        twice = once.select(_canon(F.col("c")).alias("c2"), "c").first()
        assert twice["c2"] == twice["c"], url

    check()
