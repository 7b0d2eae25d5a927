"""Second round of composite operators: sessionization, more TPC-H
shapes (Q3/Q10/Q18), median/deterministic-mode, least-squares
regression from mergeable moments, text normalization, int8 embedding
quantization, and sentence-level dedup.

Same conventions as ``relational.py``: every computed column aliased
identically on both sides, doubles aggregated via the exact-decimal /
integer-moment patterns so the driver's value hash matches bit-for-bit,
top-k always tie-broken on a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.functions.exact import dsum, dsum_sql
from kafkaish_spark.functions.timeutil import epoch_ms
from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t


# ---------------------------------------------------------------- sessionization
@query(
    "q_events_sessionize",
    bench=True,
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    tagged AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered)
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           CAST(epoch_ms(MIN(ts)) AS BIGINT) AS start_ms,
           CAST(epoch_ms(MAX(ts)) AS BIGINT) AS end_ms,
           COUNT(*) AS n_events
    FROM tagged GROUP BY user_id, session_no
    """,
)
def q_events_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based batch sessionization (30-min inactivity gap): the
    classic lag-flag-cumsum pattern.  ONE shuffle on user_id serves
    both window passes and the final group-by (same partitioning is
    reused across stages — Exchange appears once in the plan).  At
    100 TB this is the standard linear-state sessionizer; per-user
    state is a sorted run, no cross-user data movement.  Timestamps
    compared as epoch millis so the 30-min gap is exact integer math
    in both engines."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = t(spark, sf, "events").select(
        "user_id", "ts", "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                epoch_ms("ts")
                - epoch_ms(F.lag("ts").over(w))
                > 1_800_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    tagged = ev.select(
        "user_id", "ts", "event_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("session_no"),
    )
    return tagged.groupBy("user_id", "session_no").agg(
        epoch_ms(F.min("ts")).alias("start_ms"),
        epoch_ms(F.max("ts")).alias("end_ms"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------- TPC-H Q3
@query(
    "q_tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           CAST(epoch_ms(o_orderdate) AS BIGINT) AS orderdate_ms
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): unshipped revenue of
    BUILDING-segment orders.  customer and the filtered orders both
    broadcast against the lineitem fact at any realistic dimension/fact
    ratio; the only shuffle is the final group-by on l_orderkey, and
    the top-10 is TakeOrderedAndProject (no global sort).  Both date
    filters push down to the parquet scans.  Tie-break on l_orderkey
    keeps the limit deterministic."""
    c = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    joined = li.join(
        F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
        li.l_orderkey == o.o_orderkey,
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            epoch_ms("o_orderdate").alias("orderdate_ms"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------- TPC-H Q10
@query(
    "q_tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item losses): top 20 customers by
    revenue on returned lineitems in a half-year window.  The
    returnflag + date predicates push down; orders-in-window and
    customer⋈nation both broadcast, so the lineitem fact is scanned
    once with zero pre-join shuffle; the group-by on c_custkey is the
    single Exchange."""
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    li = t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    joined = li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey).join(
        F.broadcast(cn), o.o_custkey == cn.c_custkey
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------- TPC-H Q18
@query(
    "q_tpch_q18_large_orders",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(epoch_ms(o_orderdate) AS BIGINT) AS orderdate_ms,
           o_totalprice,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q_tpch_q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): orders whose total
    quantity exceeds 300, with their customer.  The IN-subquery is
    expressed as aggregate-then-semi-join; Spark decorrelates it to a
    broadcast semi join because the >300 survivor set is tiny (high
    selectivity), so the second lineitem pass never shuffles.  At
    100 TB the survivor set is still ~orders/10^4 — broadcast holds."""
    li = t(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    oo = o.join(
        F.broadcast(big), o.o_orderkey == big.l_orderkey, "left_semi"
    )
    joined = li.join(F.broadcast(oo), li.l_orderkey == oo.o_orderkey).join(
        F.broadcast(c), oo.o_custkey == c.c_custkey
    )
    return joined.groupBy(
        "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    ).agg(dsum("l_quantity", "sum_qty")).select(
        "c_name",
        "c_custkey",
        "o_orderkey",
        epoch_ms("o_orderdate").alias("orderdate_ms"),
        "o_totalprice",
        "sum_qty",
    )


# ---------------------------------------------------------------- median + deterministic mode
@query(
    "q_agg_median_mode",
    oracle="""
    WITH med AS (
      SELECT l_returnflag, median(l_quantity) AS median_qty,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag),
    counts AS (
      SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
      FROM lineitem GROUP BY l_returnflag, l_quantity),
    best AS (
      SELECT l_returnflag, l_quantity AS mode_qty,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY cnt DESC, l_quantity) AS rn
      FROM counts)
    SELECT m.l_returnflag, m.median_qty, b.mode_qty, m.n
    FROM med m JOIN best b ON m.l_returnflag = b.l_returnflag
    WHERE b.rn = 1
    """,
)
def q_agg_median_mode(spark: SparkSession, sf: str) -> DataFrame:
    """Median (exact interpolated percentile) and a DETERMINISTIC mode
    per group.  The builtin mode() ties arbitrarily in both engines —
    unusable for reproducible pipelines — so mode is computed as
    count-then-rank with a value tie-break: two mergeable aggregations,
    both partial-aggregated map-side.  l_quantity is integer-valued so
    the median interpolation is exact in IEEE terms on both engines."""
    li = t(spark, sf, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("median_qty"),
        F.count(F.lit(1)).alias("n"),
    )
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("cnt"), "l_quantity"
    )
    best = (
        counts.select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return med.join(best, "l_returnflag").select(
        "l_returnflag", "median_qty", "mode_qty", "n"
    )


# ---------------------------------------------------------------- least-squares regression
@query(
    "q_agg_regression_price_qty",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_quantity * 100) AS HUGEINT) AS x,
             CAST(round(l_extendedprice * 100) AS HUGEINT) AS y
      FROM lineitem),
    m AS (
      SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx
      FROM c GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS slope,
           round((sy - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx)
                 / n / 100, 6) AS intercept
    FROM m
    """,
)
def q_agg_regression_price_qty(spark: SparkSession, sf: str) -> DataFrame:
    """regr_slope / regr_intercept of extendedprice on quantity per
    group, from four exact integer-cent moment sums combined in a fixed
    IEEE sequence (the builtin regr_* are accumulation-order-dependent,
    like corr/stddev).  Slope is scale-invariant under the common cent
    factor; the intercept divides it back out.  Four mergeable partials
    + one shuffle — the shape a 1000-executor regression should have."""
    li = t(spark, sf, "lineitem")
    x = F.round(F.col("l_quantity") * 100).cast("decimal(20,0)")
    y = F.round(F.col("l_extendedprice") * 100).cast("decimal(20,0)")
    n = F.count(F.lit(1))
    m = li.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
    )
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    )
    return m.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n") / 100, 6
        ).alias("intercept"),
    )


# ---------------------------------------------------------------- text normalization
@query(
    "q_text_clean",
    oracle="""
    WITH cleaned AS (
      SELECT doc_id,
             trim(regexp_replace(
               lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')),
               ' +', ' ', 'g')) AS clean_text
      FROM documents)
    SELECT doc_id, clean_text,
           CAST(length(clean_text)
                - length(replace(clean_text, ' ', '')) + 1 AS BIGINT)
             AS n_tokens
    FROM cleaned
    """,
)
def q_text_clean(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus text normalization: strip non-alphanumerics, lowercase,
    collapse whitespace — the standard pre-tokenization cleanup pass.
    Pure JVM-side regexp chain (whole-stage codegen, no Python), fully
    parallel per row: no shuffle at any scale.  Token count via
    space-counting avoids a split+size array allocation per row."""
    d = t(spark, sf, "documents")
    clean = F.trim(
        F.regexp_replace(
            F.lower(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9 ]", " ")),
            " +",
            " ",
        )
    )
    return d.select(
        "doc_id",
        clean.alias("clean_text"),
    ).select(
        "doc_id",
        "clean_text",
        (
            F.length("clean_text")
            - F.length(F.replace(F.col("clean_text"), F.lit(" "), F.lit("")))
            + 1
        )
        .cast("bigint")
        .alias("n_tokens"),
    )


# ---------------------------------------------------------------- int8 quantization
@query(
    "q_embed_quantize_int8",
    oracle="""
    WITH scaled AS (
      SELECT vec_id,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) AS scale
      FROM embeddings),
    qv AS (
      SELECT e.vec_id, s.scale,
             list_transform(e.embedding,
               x -> CASE WHEN s.scale = 0 THEN 0
                         ELSE CAST(floor(CAST(x AS DOUBLE) / s.scale * 127
                                         + 0.5) AS INTEGER) END) AS qvec
      FROM embeddings e JOIN scaled s ON e.vec_id = s.vec_id)
    SELECT vec_id, scale,
           array_to_string(list_transform(qvec, x -> CAST(x AS VARCHAR)), ' ')
             AS qvec_s,
           CAST(list_reduce(list_transform(qvec, x -> CAST(x AS BIGINT)),
                            (a, b) -> a + b) AS BIGINT) AS sum_q
    FROM qv
    """,
)
def q_embed_quantize_int8(spark: SparkSession, sf: str) -> DataFrame:
    """Per-vector symmetric int8 quantization (max-abs scaling) — the
    standard 4x storage/bandwidth shrink before ANN indexing at scale.
    All array lambdas are JVM higher-order functions: no UDF, no
    shuffle, embarrassingly parallel.  floor(x+0.5) rounding (not
    round()) because HALF_UP vs HALF_EVEN differs across engines; the
    max-abs scale itself is exact (max of exactly-widened floats).

    Driver-facing projection is SCALAR on purpose (the driver's pandas
    canonicalizer cannot sort list-typed cells): the int8 codes are
    emitted space-joined (int->string is format-stable across engines)
    plus their exact int64 sum, which pins the array without the
    array type."""
    e = t(spark, sf, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    scale = F.array_max(F.transform("embedding", lambda x: F.abs(xd(x))))
    withs = e.select("vec_id", "embedding", scale.alias("scale"))
    qvec = F.transform(
        "embedding",
        lambda x: F.when(F.col("scale") == 0, F.lit(0)).otherwise(
            F.floor(xd(x) / F.col("scale") * 127 + 0.5).cast("int")
        ),
    )
    return withs.select(
        "vec_id",
        "scale",
        F.array_join(
            F.transform(qvec, lambda x: x.cast("string")), " "
        ).alias("qvec_s"),
        F.aggregate(
            qvec, F.lit(0).cast("long"), lambda a, b: a + b.cast("long")
        ).alias("sum_q"),
    )


# ---------------------------------------------------------------- sentence-level dedup
@query(
    "q_dedup_sentence_level",
    oracle="""
    WITH sents AS (
      SELECT doc_id, trim(sent) AS sentence
      FROM (SELECT doc_id, unnest(string_split(text, '.')) AS sent
            FROM documents)
      WHERE trim(sent) <> ''),
    firsts AS (
      SELECT sentence, MIN(doc_id) AS first_doc FROM sents
      GROUP BY sentence)
    SELECT s.doc_id,
           COUNT(*) AS n_sents,
           CAST(SUM(CASE WHEN f.first_doc < s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_sents,
           round(SUM(CASE WHEN f.first_doc < s.doc_id THEN 1.0 ELSE 0 END)
                 / COUNT(*), 6) AS dup_frac,
           CASE WHEN SUM(CASE WHEN f.first_doc < s.doc_id THEN 1.0 ELSE 0 END)
                     / COUNT(*) > 0.5
                THEN 'drop' ELSE 'keep' END AS verdict
    FROM sents s JOIN firsts f ON s.sentence = f.sentence
    GROUP BY s.doc_id
    """,
)
def q_dedup_sentence_level(spark: SparkSession, sf: str) -> DataFrame:
    """Sentence-level (sub-document) dedup, CCNet/Gopher style: a doc
    whose sentences mostly already appeared in earlier docs is dropped
    even when no full-text hash matches.  Two shuffles (sentence-hash
    group-by, then doc_id re-group); at 100 TB the sentence table is
    grouped by a hash of the sentence — here the sentence string itself
    keeps the oracle exact, with the md5 variant noted for scale (16
    bytes shuffled per sentence instead of the text)."""
    d = t(spark, sf, "documents")
    sents = (
        d.select(
            "doc_id", F.explode(F.split(F.col("text"), "\\.")).alias("sent")
        )
        .select("doc_id", F.trim(F.col("sent")).alias("sentence"))
        .filter(F.col("sentence") != "")
    )
    firsts = sents.groupBy("sentence").agg(F.min("doc_id").alias("first_doc"))
    dup = F.when(F.col("first_doc") < F.col("doc_id"), 1).otherwise(0)
    per_doc = (
        sents.join(firsts, "sentence")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sents"),
            F.sum(dup).alias("n_dup_sents"),
        )
    )
    frac = F.col("n_dup_sents") / F.col("n_sents")
    return per_doc.select(
        "doc_id",
        "n_sents",
        "n_dup_sents",
        F.round(frac, 6).alias("dup_frac"),
        F.when(frac > 0.5, "drop").otherwise("keep").alias("verdict"),
    )


# ---------------------------------------------------------------- skew/kurtosis
@query(
    "q_agg_skew_kurtosis",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_quantity * 100) AS HUGEINT) AS x
      FROM lineitem),
    m AS (
      SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS s1,
             CAST(SUM(x * x) AS DOUBLE) AS s2,
             CAST(SUM(x * x * x) AS DOUBLE) AS s3,
             CAST(SUM(x * x * x * x) AS DOUBLE) AS s4
      FROM c GROUP BY l_returnflag),
    mm AS (
      SELECT l_returnflag, n, s1 / n AS mean,
             s2 / n - (s1 / n) * (s1 / n) AS m2,
             s3 / n - 3 * (s1 / n) * (s2 / n)
                    + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
             s4 / n - 4 * (s1 / n) * (s3 / n)
                    + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                    - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      FROM m)
    SELECT l_returnflag, n,
           round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
           round(m4 / (m2 * m2) - 3, 6) AS excess_kurtosis
    FROM mm
    """,
)
def q_agg_skew_kurtosis(spark: SparkSession, sf: str) -> DataFrame:
    """Skewness and excess kurtosis per group from four exact
    integer-cent power sums (builtin skewness()/kurtosis() accumulate
    doubles in partition order — not reproducible).  Both are
    scale-invariant, so the cent factor cancels.  Four mergeable
    partials, one shuffle; the fixed IEEE combine sequence is written
    identically in both engines so the hash matches bit-for-bit."""
    li = t(spark, sf, "lineitem")
    x = F.round(F.col("l_quantity") * 100).cast("decimal(20,0)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("s1"),
        F.sum(x * x).cast("double").alias("s2"),
        F.sum(x * x * x).cast("double").alias("s3"),
        F.sum(x * x * x * x).cast("double").alias("s4"),
    )
    n = F.col("n")
    mean = F.col("s1") / n
    m2 = F.col("s2") / n - mean * mean
    m3 = (
        F.col("s3") / n
        - F.lit(3) * mean * (F.col("s2") / n)
        + F.lit(2) * mean * mean * mean
    )
    m4 = (
        F.col("s4") / n
        - F.lit(4) * mean * (F.col("s3") / n)
        + F.lit(6) * mean * mean * (F.col("s2") / n)
        - F.lit(3) * mean * mean * mean * mean
    )
    return m.select(
        "l_returnflag",
        "n",
        F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("excess_kurtosis"),
    )


# ---------------------------------------------------------------- referential audit
@query(
    "q_audit_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS constraint_name,
           (SELECT COUNT(*) FROM lineitem) AS n_rows,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
    UNION ALL
    SELECT 'orders->customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer->nation',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'supplier->nation',
           (SELECT COUNT(*) FROM supplier),
           (SELECT COUNT(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = s.s_nationkey))
    """,
)
def q_audit_referential_integrity(spark: SparkSession, sf: str) -> DataFrame:
    """Data-quality audit: orphan counts for every foreign-key edge of
    the star schema — the pre-flight check any 100 TB ingest runs
    before joins silently drop rows.  Each edge is an anti join whose
    build side is a dimension key set (broadcast); the fact side is
    scanned once per edge with only the key column read (pruned
    ReadSchema).  Output is four one-row aggregates unioned — constant
    size regardless of input scale."""

    def edge(name, fact, fk, dim, pk):
        f = t(spark, sf, fact)
        d = t(spark, sf, dim).select(pk)
        orphans = f.join(
            F.broadcast(d), f[fk] == d[pk], "left_anti"
        ).count()
        total = f.count()
        return spark.createDataFrame(
            [(name, total, orphans)],
            "constraint_name string, n_rows bigint, n_orphans bigint",
        )

    dfs = [
        edge("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        edge("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        edge("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        edge("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


# ---------------------------------------------------------------- z-order layout key
def _interleave_bits_sql(a: str, b: str, nbits: int = 8) -> str:
    """SQL expression interleaving the low nbits of a (odd positions)
    and b (even positions) — generated from one loop so the Spark and
    DuckDB forms are structurally identical."""
    terms = []
    for i in range(nbits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return " | ".join(terms)


@query(
    "q_layout_zorder",
    oracle=f"""
    WITH k AS (
      SELECT o_orderkey,
             o_custkey & 255 AS cust_b,
             CAST(epoch_ms(o_orderdate) / 86400000 AS BIGINT) & 255 AS date_b
      FROM orders)
    SELECT o_orderkey, cust_b, date_b,
           CAST({_interleave_bits_sql('cust_b', 'date_b')} AS BIGINT) AS zval
    FROM k
    """,
)
def q_layout_zorder(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order (Morton) layout key over (customer, day) — the
    multi-dimensional clustering key used to lay out 100 TB so BOTH
    per-customer and per-date-range scans skip most files (sort by
    zval before writing; parquet min/max on each dimension then prunes
    in both directions, where a plain sort helps only its leading
    column).  Pure integer bit math, embarrassingly parallel, and the
    same generated expression runs on both engines."""
    o = t(spark, sf, "orders")
    k = o.select(
        "o_orderkey",
        (F.col("o_custkey").bitwiseAND(255)).alias("cust_b"),
        (epoch_ms("o_orderdate") / F.lit(86400000))
        .cast("bigint")
        .bitwiseAND(255)
        .alias("date_b"),
    )
    return k.select(
        "o_orderkey",
        "cust_b",
        "date_b",
        F.expr(_interleave_bits_sql("cust_b", "date_b"))
        .cast("bigint")
        .alias("zval"),
    )


# ---------------------------------------------------------------- weighted sampling
@query(
    "q_sample_weighted",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                       AS BIGINT) AS DOUBLE) / n_chars AS skey
      FROM documents),
    ranked AS (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY skey, doc_id) AS rn
      FROM keyed)
    SELECT doc_id, lang, n_chars, rn FROM ranked WHERE rn <= 50
    """,
)
def q_sample_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """Length-weighted reproducible sampling: 50 docs per language,
    selection probability ~ n_chars (exponential-jump sampling with a
    deterministic md5-derived uniform instead of a PRNG — same sample
    on every run, every partitioning, both engines).  One shuffle on
    lang; rank + cutoff is a per-group top-k, so map-side partial
    TakeOrdered keeps the shuffle tiny even when a language has
    billions of docs."""
    d = t(spark, sf, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
    keyed = d.select(
        "doc_id",
        "lang",
        "n_chars",
        (h.cast("bigint").cast("double") / F.col("n_chars")).alias("skey"),
    )
    w = Window.partitionBy("lang").orderBy("skey", "doc_id")
    return (
        keyed.select(
            "doc_id", "lang", "n_chars", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 50)
    )


# ---------------------------------------------------------------- HLL sketch surface
@query("q_sketch_hll_cardinality", oracle=None)
def q_sketch_hll_cardinality(spark: SparkSession, sf: str) -> DataFrame:
    """Datasketches HLL surface: per-event-type user cardinality from
    mergeable binary sketches, plus the all-types union WITHOUT
    rescanning — hll_union_agg over the per-group sketches.  This is
    THE 100 TB distinct-counting pattern: sketches merge associatively
    so partial aggregation happens map-side and re-aggregation (daily
    -> monthly, per-type -> global) needs no second scan.  Rows-only:
    sketch estimates are engine-specific; accuracy vs exact distinct is
    pytest-asserted."""
    ev = t(spark, sf, "events").select("event_type", "user_id")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg(F.col("user_id"), F.lit(12)).alias("sk")
    )
    union_all = per_type.agg(
        F.hll_union_agg("sk").alias("sk")
    ).select(
        F.lit("__all__").alias("event_type"),
        F.hll_sketch_estimate("sk").cast("bigint").alias("approx_users"),
    )
    return (
        per_type.select(
            "event_type",
            F.hll_sketch_estimate("sk").cast("bigint").alias("approx_users"),
        )
        .unionByName(union_all)
    )


# ---------------------------------------------------------------- LATERAL top-k
@query(
    "q_lateral_topk_suppliers",
    oracle="""
    SELECT n_name, s_name, s_acctbal
    FROM nation n,
    LATERAL (SELECT s_name, s_acctbal FROM supplier s
             WHERE s.s_nationkey = n.n_nationkey
             ORDER BY s_acctbal DESC, s_name LIMIT 3) top3
    """,
)
def q_lateral_topk_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:2016 lateral derived table,
    Spark 4 surface): per-nation top-3 suppliers by balance.  Catalyst
    rewrites the correlated limit into the same window-rank plan the
    DataFrame top-k-per-group uses — the declarative form costs
    nothing, and the nation side never materializes a cross product."""
    t(spark, sf, "supplier").createOrReplaceTempView("lat_supplier_v")
    t(spark, sf, "nation").createOrReplaceTempView("lat_nation_v")
    return spark.sql(
        """
        SELECT n_name, s_name, s_acctbal
        FROM lat_nation_v n,
        LATERAL (SELECT s_name, s_acctbal FROM lat_supplier_v s
                 WHERE s.s_nationkey = n.n_nationkey
                 ORDER BY s_acctbal DESC, s_name LIMIT 3) top3
        """
    )


# ---------------------------------------------------------------- recursive CTE
@query(
    "q_recursive_month_spine",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT 0
      UNION ALL
      SELECT m + 1 FROM months WHERE m + 1 < 36),
    spine AS (
      SELECT 1996 + m // 12 AS yr, 1 + m % 12 AS mon FROM months),
    actual AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(month(o_orderdate) AS BIGINT) AS mon,
             COUNT(*) AS n_orders
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1999-01-01'
      GROUP BY 1, 2)
    SELECT CAST(s.yr AS BIGINT) AS yr, CAST(s.mon AS BIGINT) AS mon,
           COALESCE(a.n_orders, 0) AS n_orders
    FROM spine s LEFT JOIN actual a ON s.yr = a.yr AND s.mon = a.mon
    """,
)
def q_recursive_month_spine(spark: SparkSession, sf: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4 surface): a 36-month spine generated by
    recursion, left-joined to monthly order counts so silent months
    appear as zeros.  The recursive branch is driver-tiny (36 rows) and
    broadcasts; the aggregate side shuffles once — recursion never
    touches the fact table, which is the only sane use of recursive
    CTEs at 100 TB (spines/hierarchies, not data traversal)."""
    t(spark, sf, "orders").createOrReplaceTempView("rec_orders_v")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT 0
          UNION ALL
          SELECT m + 1 FROM months WHERE m + 1 < 36),
        spine AS (
          SELECT 1996 + CAST(m / 12 AS INT) AS yr, 1 + m % 12 AS mon
          FROM months),
        actual AS (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
                 CAST(month(o_orderdate) AS BIGINT) AS mon,
                 COUNT(*) AS n_orders
          FROM rec_orders_v
          WHERE o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1999-01-01'
          GROUP BY 1, 2)
        SELECT CAST(s.yr AS BIGINT) AS yr, CAST(s.mon AS BIGINT) AS mon,
               COALESCE(a.n_orders, 0) AS n_orders
        FROM spine s LEFT JOIN actual a ON s.yr = a.yr AND s.mon = a.mon
        """
    )


# ---------------------------------------------------------------- Arrow Python UDF
@query(
    "q_udf_arrow_vowel_ratio",
    oracle="""
    SELECT doc_id,
           CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g'))
                AS BIGINT) AS n_vowels,
           CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                AS BIGINT) AS n_letters
    FROM documents
    """,
)
def q_udf_arrow_vowel_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (useArrow=True): per-doc vowel
    and letter counts.  Same logic is trivially JVM-expressible (the
    oracle is the regexp form) — registered to keep the U1 surface
    honest about its COST model: Arrow serialization makes the
    batch-transfer ~10x cheaper than pickled row-at-a-time UDFs, but it
    is still a Python round-trip, so anything regexp-expressible
    belongs JVM-side; this surface is for logic that genuinely needs
    Python."""
    from pyspark.sql.functions import udf

    @udf("n_vowels bigint, n_letters bigint", useArrow=True)
    def counts(text: str):
        low = text.lower()
        vowels = sum(low.count(v) for v in "aeiou")
        letters = sum(c.isalpha() for c in low if ord(c) < 128)
        return (vowels, letters)

    d = t(spark, sf, "documents")
    return d.select("doc_id", counts("text").alias("c")).select(
        "doc_id",
        F.col("c.n_vowels").alias("n_vowels"),
        F.col("c.n_letters").alias("n_letters"),
    )


# ---------------------------------------------------------------- null-safe join
@query(
    "q_join_null_safe",
    oracle="""
    WITH a AS (
      SELECT NULLIF(o_orderpriority, '1-URGENT') AS prio,
             COUNT(*) AS n_open
      FROM orders WHERE o_orderstatus = 'O' GROUP BY 1),
    b AS (
      SELECT NULLIF(o_orderpriority, '1-URGENT') AS prio,
             COUNT(*) AS n_closed
      FROM orders WHERE o_orderstatus = 'F' GROUP BY 1)
    SELECT a.prio, a.n_open, b.n_closed
    FROM a JOIN b ON a.prio IS NOT DISTINCT FROM b.prio
    """,
)
def q_join_null_safe(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of silently dropping — the correct
    semantics when NULL is a real category (here: the redacted
    '1-URGENT' bucket).  Catalyst plans <=> as an ordinary hash join
    key (EqualNullSafe), so there is no performance cliff vs = — but
    beware at 100 TB: a heavy NULL bucket is the classic skew key, the
    case AQE skew-join or salting handles."""
    o = t(spark, sf, "orders")
    prio = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio")
    a = (
        o.filter(F.col("o_orderstatus") == "O")
        .select(prio)
        .groupBy("prio")
        .agg(F.count(F.lit(1)).alias("n_open"))
    )
    b = (
        o.filter(F.col("o_orderstatus") == "F")
        .select(prio)
        .groupBy("prio")
        .agg(F.count(F.lit(1)).alias("n_closed"))
    )
    return a.join(b, a["prio"].eqNullSafe(b["prio"])).select(
        a["prio"], "n_open", "n_closed"
    )


# ---------------------------------------------------------------- try_* functions
@query(
    "q_scalar_try_functions",
    oracle="""
    SELECT p_partkey,
           TRY_CAST(p_name AS INTEGER) AS name_as_int,
           CASE WHEN p_size - p_size = 0 THEN NULL
                ELSE p_retailprice / (p_size - p_size) END AS div_by_zero,
           CASE WHEN p_size = 0 THEN NULL
                ELSE p_retailprice / p_size END AS price_per_size
    FROM part
    """,
)
def q_scalar_try_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Error-safe scalar surface: try_cast / try_divide return NULL
    instead of failing the 10-hour job on row 9 billion — the ANSI-mode
    companion every large pipeline needs (one malformed row must
    poison a row, not a stage).  Per-row, codegen'd, no shuffle."""
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.col("p_name").try_cast("int").alias("name_as_int"),
        F.try_divide(
            F.col("p_retailprice"), F.col("p_size") - F.col("p_size")
        ).alias("div_by_zero"),
        F.try_divide(F.col("p_retailprice"), F.col("p_size")).alias(
            "price_per_size"
        ),
    )


# ---------------------------------------------------------------- bitmap exact distinct
@query(
    "q_agg_bitmap_distinct",
    bench=True,
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q_agg_bitmap_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregates (Spark 3.5+):
    user ids roll into fixed-size bitmap buckets, buckets OR-merge.
    Unlike HLL this is exact, and unlike COUNT(DISTINCT) the shuffle
    carries one bitmap per (group, bucket) instead of every distinct
    value — at 100 TB with dense integer keys this is the cheapest
    exact-distinct there is (it's how warehouse engines implement
    exact COUNT DISTINCT over int keys).  Result proven equal to the
    plain COUNT(DISTINCT) oracle."""
    ev = t(spark, sf, "events")
    ev.createOrReplaceTempView("bm_events_v")
    return spark.sql(
        """
        SELECT event_type, SUM(bitmap_count(b)) AS n_users
        FROM (
          SELECT event_type,
                 bitmap_bucket_number(user_id) AS bk,
                 bitmap_construct_agg(bitmap_bit_position(user_id)) AS b
          FROM bm_events_v
          GROUP BY event_type, bitmap_bucket_number(user_id))
        GROUP BY event_type
        """
    )


# ---------------------------------------------------------------- VARIANT JSON
@query(
    "q_json_variant_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 90
    """,
)
def q_json_variant_extract(spark: SparkSession, sf: str) -> DataFrame:
    """VARIANT (Spark 4's semi-structured type): parse once into a
    binary-encoded variant, then typed-path extraction — unlike
    get_json_object (string re-parse per access) the variant parses
    ONCE and every later access is a binary seek, the right model when
    a payload is touched by many expressions.  This is the engine's
    schema-on-read path for the reference's arbitrary-BSON messages
    (src/topic.js:26-29)."""
    ev = t(spark, sf, "events")
    v = F.parse_json(F.col("props"))
    return (
        ev.select(
            "event_id",
            F.variant_get(v, "$.k", "bigint").alias("k"),
        )
        .filter(F.col("k") > 90)
    )


# ---------------------------------------------------------------- collation
@query(
    "q_collation_group_lcase",
    oracle="""
    WITH mixed AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END AS lang_mixed
      FROM documents)
    SELECT lower(lang_mixed) AS lang_norm, COUNT(*) AS n_docs
    FROM mixed GROUP BY lower(lang_mixed)
    """,
)
def q_collation_group_lcase(spark: SparkSession, sf: str) -> DataFrame:
    """Collated grouping (Spark 4 collation support): GROUP BY a
    UTF8_LCASE column folds case differences in the ENGINE's comparator
    instead of a lower() rewrite — the declarative form survives joins,
    distincts, and ORDER BY on the same column without sprinkling
    normalizers.  (The output normalizes to lower() for the oracle,
    whose grouping semantics are the rewrite form.)"""
    d = t(spark, sf, "documents")
    mixed = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.upper("lang"))
        .otherwise(F.col("lang"))
        .alias("lang_mixed"),
    )
    collated = mixed.select(
        F.expr("lang_mixed COLLATE UTF8_LCASE").alias("lang_c")
    )
    return (
        collated.groupBy("lang_c")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(F.lower(F.col("lang_c")).cast("string").alias("lang_norm"), "n_docs")
    )


# ---------------------------------------------------------------- existence-flag join
@query(
    "q_join_existence_flag",
    oracle="""
    SELECT c_custkey, c_name,
           CASE WHEN EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_orderstatus = 'O')
                THEN 1 ELSE 0 END AS has_open_order
    FROM customer c
    """,
)
def q_join_existence_flag(spark: SparkSession, sf: str) -> DataFrame:
    """EXISTS as a projected flag (not a filter): Catalyst plans the
    correlated EXISTS-in-SELECT as an ExistenceJoin — one pass, no
    row duplication when a customer has many open orders (a left join
    + distinct would shuffle the duplicated fact).  The probe side is
    the orders key set under a pushed status filter."""
    c = t(spark, sf, "customer")
    t(spark, sf, "orders").createOrReplaceTempView("exist_orders_v")
    c.createOrReplaceTempView("exist_customer_v")
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               CASE WHEN EXISTS (SELECT 1 FROM exist_orders_v o
                                 WHERE o.o_custkey = c.c_custkey
                                   AND o.o_orderstatus = 'O')
                    THEN 1 ELSE 0 END AS has_open_order
        FROM exist_customer_v c
        """
    )


# ---------------------------------------------------------------- BPE merge candidates
@query(
    "q_text_bigram_merge_candidates",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS idx
      FROM documents)
    SELECT a.tok AS t1, b.tok AS t2, COUNT(*) AS n_pairs
    FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.idx = a.idx + 1
    GROUP BY a.tok, b.tok
    ORDER BY n_pairs DESC, t1, t2
    LIMIT 20
    """,
)
def q_text_bigram_merge_candidates(spark: SparkSession, sf: str) -> DataFrame:
    """The first step of BPE/WordPiece vocabulary training: adjacent
    token-pair frequencies, top merge candidates.  The Spark side
    builds pairs with an indexed array lambda (slice + element_at)
    INSIDE each row — linear, no self-join — where the oracle's
    relational form needs a positional self-join; at 100 TB that
    difference is the whole game (the join would shuffle the exploded
    token table twice).  One shuffle for the pair count, top-20 via
    TakeOrderedAndProject."""
    d = t(spark, sf, "documents")
    pairs = d.select(
        F.explode(
            F.expr(
                "transform(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),"
                " (x, i) -> struct(x AS t1, element_at(split(text, ' '), i + 2) AS t2))"
            )
        ).alias("p")
    )
    return (
        pairs.select("p.t1", "p.t2")
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "t1", "t2")
        .limit(20)
    )


# ---------------------------------------------------------------- TPC-H Q6
@query(
    "q_tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the pure
    scan-filter-aggregate — every predicate pushes to the parquet scan
    (date range prunes row groups via min/max), the aggregate is a
    single global partial+final with no group keys.  The simplest
    query in the suite and the one where scan efficiency IS the whole
    cost: at 100 TB this is bounded by storage bandwidth times the
    pruning ratio."""
    li = t(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------- TPC-H Q7
@query(
    "q_tpch_q7_nation_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation nc ON nc.n_nationkey = c_nationkey
    JOIN nation ns ON ns.n_nationkey = s_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY ns.n_name, nc.n_name, year(l_shipdate)
    """,
)
def q_tpch_q7_nation_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): the
    bidirectional nation-pair filter over a five-way star.  Every
    dimension chain (orders->customer->nation, supplier->nation)
    broadcasts, so the lineitem fact joins without shuffling; the
    pair predicate is applied post-join (it spans both chains), and
    the final group-by is the single Exchange on three low-cardinality
    keys."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    cust_chain = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).join(
        F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key")
    ).select("o_orderkey", "cust_nation")
    supp_chain = s.join(F.broadcast(ns), s.s_nationkey == F.col("ns_key")).select(
        "s_suppkey", "supp_nation"
    )
    joined = (
        li.join(F.broadcast(cust_chain), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp_chain), li.l_suppkey == F.col("s_suppkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
    ).agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))


# ---------------------------------------------------------------- TPC-H Q8
@query(
    "q_tpch_q8_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             ns.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation nc ON nc.n_nationkey = c_nationkey
      JOIN region    ON r_regionkey = nc.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ns ON ns.n_nationkey = s_nationkey
      WHERE r_name = 'EUROPE'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01')
    SELECT o_year,
           round({dsum_sql("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
                 / {dsum_sql('volume')}, 6) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def q_tpch_q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_3's share of
    supply volume into EUROPE-customer orders per year.  The
    conditional-sum-over-sum ratio computes from two exact-decimal
    sums and ONE IEEE division (reproducible at any partitioning);
    everything except the lineitem scan broadcasts, and both sums come
    out of one aggregate pass — not two queries."""
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    s = t(spark, sf, "supplier")
    nc = n.select("n_nationkey", "n_regionkey")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    cust_chain = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == nc.n_nationkey)
        .join(F.broadcast(r), nc.n_regionkey == r.r_regionkey)
        .select("o_orderkey", "o_orderdate")
    )
    supp_chain = s.join(F.broadcast(ns), s.s_nationkey == F.col("ns_key")).select(
        "s_suppkey", "supp_nation"
    )
    vol = (
        li.join(F.broadcast(cust_chain), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp_chain), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0)
    )
    return vol.groupBy("o_year").agg(
        F.round(dsum(nation_vol) / dsum(F.col("volume")), 6).alias("mkt_share")
    )
