"""Twelfth operator batch: row-pattern matching — the MATCH_RECOGNIZE
analog.  Spark has no SQL:2016 MATCH_RECOGNIZE clause; the classical
rewrite encodes each key's ordered event sequence as a letter string
and runs the row pattern as a REGEX over it — patterns like
"one-or-more clicks then a purchase" become literally ``c+p``.

Determinism rules: the sequence string builds from
``sort_array(collect_list(struct(ts, event_id, letter)))`` — an
explicit total order, never the shuffle-dependent collect_list order —
and both engines' regex engines agree on greedy non-overlapping
matching for these patterns.

Reference parity: [NS] north-star operator per SURVEY.md §2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# event_type -> pattern letter (single chars keep the regex readable)
_LETTERS = {
    "click": "c",
    "purchase": "p",
    "view": "v",
    "error": "e",
    "signup": "s",
}


@query(
    "q_events_pattern_match",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(CASE event_type WHEN 'click' THEN 'c'
                                        WHEN 'purchase' THEN 'p'
                                        WHEN 'view' THEN 'v'
                                        WHEN 'error' THEN 'e'
                                        ELSE 's' END,
                        '' ORDER BY ts, event_id) AS s,
             COUNT(*) AS n_events
      FROM events GROUP BY user_id)
    SELECT user_id, n_events,
           CAST(len(regexp_extract_all(s, 'c+p')) AS BIGINT)
             AS n_click_to_buy,
           CAST(COALESCE(list_max(list_transform(
                  regexp_extract_all(s, 'c+'), x -> len(x))), 0) AS BIGINT)
             AS longest_click_run,
           CAST(len(regexp_extract_all(s, 'pe')) AS BIGINT)
             AS n_buy_then_error
    FROM seq
    """,
)
def q_events_pattern_match(spark: SparkSession, sf: str) -> DataFrame:
    """Row-pattern matching (MATCH_RECOGNIZE analog): per user, count
    'one-or-more clicks then a purchase' journeys (``c+p``), the
    longest uninterrupted click run (``c+``), and purchase-then-error
    incidents (``pe``) — sequential-behavior questions a funnel
    aggregate can't answer because ADJACENCY matters.  The per-user
    timeline compiles to a letter string (sorted struct collect, so
    the order is the data's, not the shuffle's) and each pattern is
    one regex — both engines scan greedy non-overlapping, so counts
    agree exactly.  One shuffle on user_id; state per user is its
    history string, so at unbounded history you shard the timeline
    (user, week) and stitch run boundaries, or run the streaming
    stateful twin (streaming.stateful) instead."""
    ev = t(spark, sf, "events")
    known = list(_LETTERS.items())
    letter = F.when(F.col("event_type") == known[0][0], known[0][1])
    for k, v in known[1:-1]:
        letter = letter.when(F.col("event_type") == k, v)
    letter = letter.otherwise(known[-1][1])  # ELSE 's', as in the oracle
    seq = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("ts"),
                            F.col("event_id"),
                            letter.alias("l"),
                        )
                    )
                ),
                lambda x: x["l"],
            ),
        ).alias("s"),
        F.count(F.lit(1)).alias("n_events"),
    )
    runs = F.transform(
        F.regexp_extract_all(F.col("s"), F.lit("c+"), F.lit(0)),
        lambda x: F.length(x),
    )
    return seq.select(
        "user_id",
        "n_events",
        F.size(F.regexp_extract_all(F.col("s"), F.lit("c+p"), F.lit(0)))
        .cast("long")
        .alias("n_click_to_buy"),
        F.coalesce(F.array_max(runs), F.lit(0))
        .cast("long")
        .alias("longest_click_run"),
        F.size(F.regexp_extract_all(F.col("s"), F.lit("pe"), F.lit(0)))
        .cast("long")
        .alias("n_buy_then_error"),
    )


# ------------------------------------------------- NULL-handling scalars
@query(
    "q_scalar_null_functions",
    oracle="""
    WITH x AS (
      SELECT o_orderkey,
             nullif(o_orderstatus, 'O') AS closed_status,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN o_orderpriority END AS hot_priority
      FROM orders)
    SELECT coalesce(closed_status, 'OPEN') AS status_or_open,
           CASE WHEN hot_priority IS NOT NULL
                THEN 'expedite' ELSE 'queue' END AS routing,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN closed_status IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           COUNT(hot_priority) AS n_hot
    FROM x GROUP BY coalesce(closed_status, 'OPEN'),
                    CASE WHEN hot_priority IS NOT NULL
                         THEN 'expedite' ELSE 'queue' END
    """,
)
def q_scalar_null_functions(spark: SparkSession, sf: str) -> DataFrame:
    """NULL-handling scalar surface (R27 completion): nullif
    manufactures NULLs ('O' = still open -> NULL), coalesce restores a
    default, nvl2-style branching routes on presence, and the
    NULL-skipping COUNT(col) vs the NULL-counting SUM(CASE) show both
    counting conventions side by side.  All pure codegen expressions —
    the three-valued-logic toolkit every dirty-data pipeline leans on
    (and the same semantics the null-safe join, q_join_null_safe,
    exercises at the join boundary)."""
    o = t(spark, sf, "orders")
    closed = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    hot = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        F.col("o_orderpriority"),
    )
    x = o.select(closed.alias("closed_status"), hot.alias("hot_priority"))
    return x.groupBy(
        F.coalesce(F.col("closed_status"), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.nvl2(F.col("hot_priority"), F.lit("expedite"), F.lit("queue")).alias(
            "routing"
        ),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("closed_status").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_open"),
        F.count("hot_priority").alias("n_hot"),
    )


# ------------------------------------------------- array set functions
@query(
    "q_array_set_functions",
    oracle="""
    WITH f AS (
      SELECT o_custkey,
             list_sort(list_distinct(list(
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)))) AS fy
      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey),
    o AS (
      SELECT o_custkey,
             list_sort(list_distinct(list(
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)))) AS oy
      FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey),
    j AS (
      SELECT COALESCE(f.o_custkey, o.o_custkey) AS o_custkey,
             COALESCE(fy, []) AS fy, COALESCE(oy, []) AS oy
      FROM f FULL JOIN o ON f.o_custkey = o.o_custkey)
    SELECT o_custkey,
           COALESCE(array_to_string(list_transform(
             list_sort(list_intersect(fy, oy)),
             x -> CAST(x AS VARCHAR)), ','), '') AS years_both,
           COALESCE(array_to_string(list_transform(
             list_sort(list_distinct(list_concat(fy, oy))),
             x -> CAST(x AS VARCHAR)), ','), '') AS years_any,
           COALESCE(array_to_string(list_transform(
             list_sort(list_filter(fy, x -> NOT list_contains(oy, x))),
             x -> CAST(x AS VARCHAR)), ','), '') AS years_f_only
    FROM j
    """,
)
def q_array_set_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Array set algebra (R28 completion): per customer, the order
    years with finished vs open status as SETS — intersection (years
    with both), union (any activity), difference (finished-only).
    Set-typed columns are how a pipeline carries per-entity label
    sets, seen-feature sets, and shard membership without exploding
    rows; all three operators are JVM-side codegen over the collected
    arrays.  Every array is sorted before output — array equality is
    positional, so canonical ordering is what makes set results
    comparable across engines (and across partitionings).  The
    driver-facing projection joins each sorted set to a comma string
    (int->string is format-stable) because the driver's pandas
    canonicalizer cannot sort list-typed cells."""
    o = t(spark, sf, "orders")
    yr = F.year("o_orderdate").cast("long")

    def years(status):
        return (
            o.filter(F.col("o_orderstatus") == status)
            .groupBy("o_custkey")
            .agg(F.array_sort(F.collect_set(yr)).alias(f"{status.lower()}y"))
        )

    empty = F.array().cast("array<bigint>")
    j = (
        years("F")
        .join(years("O"), "o_custkey", "full")
        .select(
            "o_custkey",
            F.coalesce("fy", empty).alias("fy"),
            F.coalesce("oy", empty).alias("oy"),
        )
    )
    def joined(arr, name):
        return F.array_join(
            F.transform(F.array_sort(arr), lambda x: x.cast("string")), ","
        ).alias(name)

    return j.select(
        "o_custkey",
        joined(F.array_intersect("fy", "oy"), "years_both"),
        joined(F.array_distinct(F.concat("fy", "oy")), "years_any"),
        joined(F.array_except("fy", "oy"), "years_f_only"),
    )


# ------------------------------------------------- mapInArrow surface
def _token_count_arrow(batches):
    """mapInArrow kernel: whitespace token counts via pyarrow.compute —
    columnar string ops on the Arrow buffers, no pandas materialization
    and no per-row Python.  Counts are exact integers, so this Python
    path is oracle-checkable (same trick as the applyInArrow
    regression: keep the Python side integer-exact)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        n = pc.add(pc.count_substring(batch.column("text"), " "), 1)
        yield pa.RecordBatch.from_arrays(
            [batch.column("doc_id"), pc.cast(n, pa.int64())],
            ["doc_id", "n_tokens"],
        )


@query(
    "q_udf_map_in_arrow_tokens",
    oracle="""
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
    """,
)
def q_udf_map_in_arrow_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """``mapInArrow`` surface — the last cell of the Python-boundary
    matrix (scalar UDF, Arrow UDF, pandas UDF, UDTF, mapInPandas,
    applyInPandas, applyInArrow, applyInPandasWithState are all
    exercised elsewhere): per-document token counts computed with
    pyarrow.compute directly on the Arrow record batches.  vs
    mapInPandas this skips the pandas conversion entirely — the string
    kernel (count_substring) runs vectorized over the Arrow buffers —
    and the integer output makes a Python-side operator bit-equal to
    the SQL oracle.  In production the JVM-side F.size(F.split(...))
    wins (no Python boundary at all); this registers the API surface
    with honest cost notes, like q_udf_arrow_vowel_ratio."""
    d = t(spark, sf, "documents").select("doc_id", "text")
    return d.mapInArrow(
        _token_count_arrow, schema="doc_id long, n_tokens long"
    )


# ------------------------------------------------- lateness audit
@query(
    "q_events_lateness_audit",
    oracle="""
    WITH o AS (
      SELECT event_type, epoch_ms(ts) AS ms,
             MAX(epoch_ms(ts)) OVER (ORDER BY event_id
                                     ROWS UNBOUNDED PRECEDING) AS frontier
      FROM events)
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN ms < frontier THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           CAST(MAX(frontier - ms) AS BIGINT) AS max_lateness_ms,
           CAST(quantile_disc(frontier - ms, 0.99) AS BIGINT)
             AS p99_lateness_ms
    FROM o GROUP BY event_type
    """,
)
def q_events_lateness_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Out-of-orderness audit — the measurement that SIZES a watermark:
    replay the stream in arrival order (event_id is the ingest order),
    track the event-time frontier (running max), and report how far
    behind it late events arrive.  max and p99 lateness are exactly the
    numbers you set ``withWatermark`` from; guessing instead either
    drops data (too tight) or holds state forever (too loose).  The
    frontier is one global running max — an audit-scale sort (events
    fit; at 100 TB you compute per-shard frontiers in arrival order
    per ingest partition and a late event is late within its shard,
    which is also how per-partition watermarks actually advance)."""
    ev = t(spark, sf, "events")
    from kafkaish_spark.functions.timeutil import epoch_ms

    ms = epoch_ms(F.col("ts"))
    w = Window.orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    o = ev.select(
        "event_type",
        ms.alias("ms"),
        F.max(ms).over(w).alias("frontier"),
    )
    late = F.col("frontier") - F.col("ms")
    o.createOrReplaceTempView("lateness_v")
    return spark.sql(
        """
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN ms < frontier THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_late,
               CAST(MAX(frontier - ms) AS BIGINT) AS max_lateness_ms,
               CAST(percentile_disc(0.99) WITHIN GROUP
                    (ORDER BY frontier - ms) AS BIGINT) AS p99_lateness_ms
        FROM lateness_v GROUP BY event_type
        """
    )


# ------------------------------------------------- Gini coefficient
@query(
    "q_agg_gini_customer_revenue",
    oracle="""
    WITH c AS (
      SELECT o_custkey,
             CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey),
    r AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i,
             COUNT(*) OVER () AS n
      FROM c)
    SELECT CAST(MIN(n) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           round(CAST(2 * SUM(i * cents) AS DOUBLE)
                 / (MIN(n) * SUM(cents))
                 - CAST(MIN(n) + 1 AS DOUBLE) / MIN(n), 6) AS gini
    FROM r
    """,
)
def q_agg_gini_customer_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Gini coefficient of customer revenue — the third concentration
    lens next to Pareto (q_agg_pareto_customers) and HHI
    (q_agg_hhi_supplier_share): 0 = everyone spends alike, 1 = one
    customer is the business.  Computed by the rank formula
    G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending-sorted values —
    Σ(i·xᵢ) is an exact integer (rank x cents), so the whole statistic
    is two IEEE divisions at the end.  The rank runs over the
    per-customer aggregate with a (cents, custkey) total order; ties
    in cents don't change the sum because equal values make rank
    assignment among them irrelevant to Σ(i·xᵢ)."""
    o = t(spark, sf, "orders")
    c = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    r = c.select(
        "cents",
        F.row_number().over(Window.orderBy("cents", "o_custkey")).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    n = F.min("n")
    return r.agg(
        n.cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.round(
            (2 * F.sum(F.col("i") * F.col("cents"))).cast("double")
            / (n * F.sum("cents"))
            - (n + 1).cast("double") / n,
            6,
        ).alias("gini"),
    )


# ------------------------------------------------- time to convert
@query(
    "q_events_time_to_convert",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(epoch_ms(ts)) AS signup_ms
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    p AS (
      SELECT e.user_id, MIN(epoch_ms(e.ts)) AS first_purchase_ms
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= s.signup_ms
      GROUP BY e.user_id)
    SELECT COUNT(*) AS n_signup_users,
           COUNT(p.first_purchase_ms) AS n_converted,
           round(CAST(COUNT(p.first_purchase_ms) AS DOUBLE) / COUNT(*), 6)
             AS conv_rate,
           CAST(percentile_disc(0.5) WITHIN GROUP
                (ORDER BY p.first_purchase_ms - s.signup_ms) AS BIGINT)
             AS p50_latency_ms,
           CAST(percentile_disc(0.9) WITHIN GROUP
                (ORDER BY p.first_purchase_ms - s.signup_ms) AS BIGINT)
             AS p90_latency_ms
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    """,
)
def q_events_time_to_convert(spark: SparkSession, sf: str) -> DataFrame:
    """Time-to-convert: of users who signed up, how many ever purchase
    (at or after their first signup), and how fast — the activation
    metric product teams steer by, and the label-latency profile an ML
    team needs before defining a 'converted within X' target (compare
    p90 here against the label window you were about to pick).
    First-signup and first-qualifying-purchase are per-user MINs over
    exact integer ms; discrete percentiles return actual observed
    latencies.  Two user-keyed aggregates and a broadcast-size join —
    no timeline materialization."""
    ev = t(spark, sf, "events")
    from kafkaish_spark.functions.timeutil import epoch_ms

    ms = epoch_ms(F.col("ts"))
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(ms).alias("signup_ms"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", ms.alias("pms"))
        .join(s, "user_id")
        .filter(F.col("pms") >= F.col("signup_ms"))
        .groupBy("user_id")
        .agg(F.min("pms").alias("first_purchase_ms"))
    )
    j = s.join(p, "user_id", "left").select(
        "user_id",
        "signup_ms",
        "first_purchase_ms",
        (F.col("first_purchase_ms") - F.col("signup_ms")).alias("latency_ms"),
    )
    j.createOrReplaceTempView("ttc_v")
    return spark.sql(
        """
        SELECT COUNT(*) AS n_signup_users,
               COUNT(first_purchase_ms) AS n_converted,
               round(CAST(COUNT(first_purchase_ms) AS DOUBLE) / COUNT(*), 6)
                 AS conv_rate,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY latency_ms)
                    AS BIGINT) AS p50_latency_ms,
               CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY latency_ms)
                    AS BIGINT) AS p90_latency_ms
        FROM ttc_v
        """
    )


# ------------------------------------------------- association lift
@query(
    "q_basket_pair_lift",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM items),
    freq AS (SELECT l_partkey, COUNT(*) AS f FROM items GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS c
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey)
    SELECT part_a, part_b, c,
           round(CAST(c AS DOUBLE) * (SELECT n_baskets FROM nb)
                 / (fa.f * fb.f), 6) AS lift
    FROM pairs
    JOIN freq fa ON fa.l_partkey = part_a
    JOIN freq fb ON fb.l_partkey = part_b
    WHERE c >= 3
    ORDER BY lift DESC, part_a, part_b
    LIMIT 20
    """,
)
def q_basket_pair_lift(spark: SparkSession, sf: str) -> DataFrame:
    """Association-rule LIFT: for co-purchased part pairs (support >=
    3 baskets), lift = P(a,b) / (P(a)·P(b)) — the measure that
    separates 'bought together because both are popular' (lift ~ 1)
    from real affinity (lift >> 1), which raw co-occurrence counts
    (q_basket_part_pairs) cannot.  The algebra n·c/(fa·fb) uses only
    exact integers and one final division; the support floor prunes
    the pair table BEFORE the lift join, which at 100 TB is the
    difference between ranking signal and shuffling noise.  Top-20
    tie-breaks on the pair — deterministic."""
    li = t(spark, sf, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    nb = items.agg(F.countDistinct("l_orderkey").alias("n_baskets"))
    freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("f"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 3)
    )
    fa = freq.alias("fa")
    fb = freq.alias("fb")
    return (
        pairs.join(fa, F.col("part_a") == F.col("fa.l_partkey"))
        .join(fb, F.col("part_b") == F.col("fb.l_partkey"))
        .crossJoin(F.broadcast(nb))
        .select(
            "part_a",
            "part_b",
            "c",
            F.round(
                F.col("c").cast("double")
                * F.col("n_baskets")
                / (F.col("fa.f") * F.col("fb.f")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(20)
    )


# ------------------------------------------------- IQR outlier fences
@query(
    "q_agg_iqr_outliers",
    oracle="""
    WITH e AS (SELECT event_type,
                      CAST(round(value * 100, 0) AS BIGINT) AS v_c
               FROM events),
    q AS (SELECT event_type,
                 quantile_cont(v_c, 0.25) AS q1,
                 quantile_cont(v_c, 0.75) AS q3
          FROM e GROUP BY event_type)
    SELECT e.event_type,
           COUNT(*) AS n,
           round(MIN(q.q1) / 100, 6) AS q1,
           round(MIN(q.q3) / 100, 6) AS q3,
           CAST(SUM(CASE WHEN e.v_c < q.q1 - 1.5 * (q.q3 - q.q1)
                           OR e.v_c > q.q3 + 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM e JOIN q ON e.event_type = q.event_type
    GROUP BY e.event_type
    """,
)
def q_agg_iqr_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Tukey / IQR outlier fences — the third standard outlier method
    next to z-scores (q_events_rate_anomaly) and MAD
    (q_agg_mad_robust): values beyond Q1−1.5·IQR or Q3+1.5·IQR per
    event type.  Same exactness recipe as MAD: quartiles interpolate
    on integer cents (quarter positions are exact dyadic fractions of
    integers), the fences are single IEEE expressions of identical
    inputs, and the tiny per-type stats broadcast back onto the scan —
    two scans, zero fact shuffles."""
    ev = t(spark, sf, "events").select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("v_c")
    )
    q = ev.groupBy("event_type").agg(
        F.percentile("v_c", F.lit(0.25)).alias("q1"),
        F.percentile("v_c", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    out = (F.col("v_c") < F.col("q1") - 1.5 * iqr) | (
        F.col("v_c") > F.col("q3") + 1.5 * iqr
    )
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("q1") / 100, 6).alias("q1"),
            F.round(F.min("q3") / 100, 6).alias("q3"),
            F.sum(F.when(out, 1).otherwise(0)).cast("long").alias(
                "n_outliers"
            ),
        )
    )


# ------------------------------------------------- string sweep
@query(
    "q_scalar_string_sweep",
    oracle="""
    SELECT p_partkey,
           reverse(p_name) AS rev_name,
           translate(p_name, 'aeiou', '_____') AS devoweled,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
           split_part(p_name, ' ', 1) AS first_word,
           repeat(p_brand, 2) AS brand_twice,
           CAST(length(p_name) - length(replace(p_name, ' ', ''))
                AS BIGINT) AS n_spaces
    FROM part
    """,
)
def q_scalar_string_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """The wider string scalar surface (R25 completion): reverse,
    translate (character mapping), lpad (fixed-width key rendering —
    the zero-padded join/sort key trick), split_part (delimited field
    extraction without an array), repeat, and the replace-based
    occurrence count.  All pure codegen in one projection over the
    scan — string kernels are where whole-stage codegen earns its
    keep, since every one of these would be a per-row Python call in
    a naive pipeline."""
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.reverse("p_name").alias("rev_name"),
        F.translate("p_name", "aeiou", "_____").alias("devoweled"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias(
            "padded_key"
        ),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias(
            "first_word"
        ),
        F.repeat(F.col("p_brand"), 2).alias("brand_twice"),
        (
            F.length("p_name")
            - F.length(F.replace(F.col("p_name"), F.lit(" "), F.lit("")))
        )
        .cast("long")
        .alias("n_spaces"),
    )


# ------------------------------------------------- seasonality index
@query(
    "q_agg_seasonality_index",
    oracle="""
    WITH m AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
             CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY yr, mo),
    avg_mo AS (
      SELECT mo, COUNT(*) AS n_years,
             CAST(SUM(cents) AS BIGINT) AS mo_cents
      FROM m GROUP BY mo),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t,
                   COUNT(*) AS n_cells FROM m)
    SELECT mo, n_years, mo_cents,
           round((CAST(mo_cents AS DOUBLE) / n_years)
                 / (CAST((SELECT t FROM tot) AS DOUBLE)
                    / (SELECT n_cells FROM tot)), 6) AS seasonality
    FROM avg_mo
    """,
)
def q_agg_seasonality_index(spark: SparkSession, sf: str) -> DataFrame:
    """Month-of-year seasonality index: each calendar month's average
    revenue relative to the average across all year-months (1.0 = flat,
    >1 = peak season) — the multiplicative seasonal factor a
    forecasting pipeline divides out before trend fitting.  Everything
    folds as exact integer cents at (year, month) grain first, so the
    index is a ratio of two IEEE averages of identical exact sums; the
    12-row month table and the scalar total are broadcast-size."""
    o = t(spark, sf, "orders")
    m = o.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    avg_mo = m.groupBy("mo").agg(
        F.count(F.lit(1)).alias("n_years"),
        F.sum("cents").cast("long").alias("mo_cents"),
    )
    tot = m.agg(
        F.sum("cents").cast("long").alias("t"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    return avg_mo.crossJoin(F.broadcast(tot)).select(
        "mo",
        "n_years",
        "mo_cents",
        F.round(
            (F.col("mo_cents").cast("double") / F.col("n_years"))
            / (F.col("t").cast("double") / F.col("n_cells")),
            6,
        ).alias("seasonality"),
    )


# ------------------------------------------------- embedding norm audit
@query(
    "q_embed_norm_histogram",
    oracle="""
    WITH n AS (
      SELECT vec_id,
             sqrt(CAST(list_sum(list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)
                         * CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)))
                  AS DOUBLE)) / 10000000 AS norm
      FROM embeddings)
    SELECT CAST(floor(norm * 10) AS BIGINT) AS bucket,
           COUNT(*) AS n_vectors,
           round(MIN(norm), 6) AS min_norm,
           round(MAX(norm), 6) AS max_norm
    FROM n GROUP BY CAST(floor(norm * 10) AS BIGINT)
    """,
)
def q_embed_norm_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding L2-norm histogram (0.1-wide buckets) — the vector
    quality audit run before any similarity search: a spread-out norm
    distribution means un-normalized vectors (cosine and dot-product
    ranking will disagree), and a spike at 0 means dead embeddings.
    Exactness: components quantize to an integer 1e-7 grid, squares
    sum as exact integers (JVM-side fold, no Python), and sqrt is
    IEEE-correctly-rounded — the same double on both engines, so even
    bucket edges agree bit-for-bit.  Scan-only: no shuffle before the
    16-ish-row histogram aggregate."""
    e = t(spark, sf, "embeddings")
    q = F.transform(
        "embedding",
        # x is float32: promote to double BEFORE scaling, or the
        # engine-specific float32 multiply shifts the grid by ±1
        lambda x: F.round(x.cast("double") * 10000000, 0).cast("long")
        * F.round(x.cast("double") * 10000000, 0).cast("long"),
    )
    norm = F.sqrt(
        F.aggregate(q, F.lit(0).cast("long"), lambda a, b: a + b).cast(
            "double"
        )
    ) / F.lit(10000000.0)
    n = e.select(norm.alias("norm"))
    return n.groupBy(
        F.floor(F.col("norm") * 10).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.min("norm"), 6).alias("min_norm"),
        F.round(F.max("norm"), 6).alias("max_norm"),
    )


# ------------------------------------------------- growth accounting
@query(
    "q_orders_growth_accounting",
    oracle="""
    WITH fo AS (
      SELECT o_custkey,
             MIN(CAST(date_trunc('month', o_orderdate) AS DATE)) AS first_m
      FROM orders GROUP BY o_custkey),
    m AS (
      SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS mo,
             o.o_custkey, MIN(f.first_m) AS first_m
      FROM orders o JOIN fo f ON o.o_custkey = f.o_custkey
      GROUP BY mo, o.o_custkey)
    SELECT mo,
           CAST(SUM(CASE WHEN mo = first_m THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(SUM(CASE WHEN mo <> first_m THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returning,
           COUNT(*) AS n_active
    FROM m GROUP BY mo
    """,
)
def q_orders_growth_accounting(spark: SparkSession, sf: str) -> DataFrame:
    """Growth accounting: per month, how many active customers are NEW
    (first-ever order this month) vs RETURNING — the
    acquisition-vs-retention split every growth team reports, and the
    denominator feed for the cohort retention table
    (q_events_cohort_retention).  Two aggregates on the same custkey
    shuffle: first-order month per customer (broadcast back), then
    distinct customer-months classified by comparison — all integer
    date math, no windows over the fact."""
    o = t(spark, sf, "orders")
    mo = F.to_date(F.date_trunc("month", "o_orderdate"))
    fo = o.groupBy("o_custkey").agg(F.min(mo).alias("first_m"))
    m = (
        o.select("o_custkey", mo.alias("mo"))
        .distinct()
        .join(F.broadcast(fo), "o_custkey")
    )
    is_new = (F.col("mo") == F.col("first_m")).cast("int")
    return m.groupBy("mo").agg(
        F.sum(is_new).cast("long").alias("n_new"),
        F.sum(1 - is_new).cast("long").alias("n_returning"),
        F.count(F.lit(1)).alias("n_active"),
    )


# ------------------------------------------------- winsorized mean
@query(
    "q_agg_winsorized_mean",
    oracle="""
    WITH e AS (SELECT event_type,
                      CAST(round(value * 100, 0) AS BIGINT) AS v_c
               FROM events),
    q AS (SELECT event_type,
                 quantile_cont(v_c, 0.05) AS lo,
                 quantile_cont(v_c, 0.95) AS hi
          FROM e GROUP BY event_type)
    SELECT e.event_type,
           COUNT(*) AS n,
           round(CAST(SUM(CAST(round(least(greatest(CAST(e.v_c AS DOUBLE),
                                                    q.lo), q.hi) * 100, 0)
                               AS BIGINT))
                      AS DOUBLE) / (COUNT(*) * 10000), 6)
             AS winsorized_mean,
           round(CAST(SUM(e.v_c) AS DOUBLE) / (COUNT(*) * 100), 6)
             AS raw_mean
    FROM e JOIN q ON e.event_type = q.event_type
    GROUP BY e.event_type
    """,
)
def q_agg_winsorized_mean(spark: SparkSession, sf: str) -> DataFrame:
    """Winsorized mean (clamp at p5/p95, then average) — the robust
    ESTIMATOR companion to the outlier DETECTORS (z-score, MAD, IQR):
    instead of flagging tails it caps them, giving a mean a single
    fat-fingered value can't drag.  Exactness: cents are integers, the
    p5/p95 bounds interpolate on integers (values on the 0.05 grid —
    exact in double), the clamp is a comparison, and the clamped sum
    re-quantizes to an exact 1e-4-cent integer grid before the one
    final division.  Stats broadcast back onto the scan, as in the MAD
    and IQR plans."""
    ev = t(spark, sf, "events").select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("v_c")
    )
    q = ev.groupBy("event_type").agg(
        F.percentile("v_c", F.lit(0.05)).alias("lo"),
        F.percentile("v_c", F.lit(0.95)).alias("hi"),
    )
    clamped = F.least(
        F.greatest(F.col("v_c").cast("double"), F.col("lo")), F.col("hi")
    )
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.round(clamped * 100, 0).cast("long")).cast("double")
                / (F.count(F.lit(1)) * 10000),
                6,
            ).alias("winsorized_mean"),
            F.round(
                F.sum("v_c").cast("double") / (F.count(F.lit(1)) * 100), 6
            ).alias("raw_mean"),
        )
    )
