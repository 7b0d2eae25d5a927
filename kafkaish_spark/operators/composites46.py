"""Round-7 second wave: pre-run audits a 100 TB pipeline executes
before committing cluster time — join-key skew, heavy-tail shape, and
shard balance.

- join-key skew audit: the fanout histogram + row-share of the
  orders->lineitem join key, i.e. the measurement that decides between
  a plain shuffle join, AQE skew handling, and salting (the Spark
  skew-join playbook; our salted_join / q_agg_salted_skew are the
  remedies this audit gates);
- Hill tail-index estimator (Hill, Annals of Statistics 1975) over the
  top-k word frequencies — the standard power-law-tail measurement
  (heavier tail = smaller alpha), complementing q_text_zipf_fit's
  global fit with the tail-only estimator the heavy-hitter literature
  actually uses;
- training-shard balance: deterministic md5 shard assignment and the
  per-shard doc/token budgets — the "will every data-parallel worker
  get the same amount of work" check run before a training job;
- (r8) skew-STRESS salted join: the remedy the skew audit gates,
  exercised on a deliberately pathological synthesized hot key at
  bench scale (q_join_skew_stress_salted, bench-flagged; the 3-way
  plain/AQE/salted comparison lives in tools/bench_skew.py).

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB, src/topic.js) computes none of these — [NS] north-star
extensions per SURVEY.md §2.4.  House exactness: counts exact BIGINTs;
the Hill fold is an ORDERED 19-term fold over a TakeOrdered-bounded
frame; shares are single IEEE divisions on exact ints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t


# ------------------------------------------------------ join-key skew
@query(
    "q_audit_join_key_skew",
    oracle="""
    WITH f AS (
      SELECT l_orderkey, COUNT(*) AS k FROM lineitem GROUP BY l_orderkey),
    tot AS (SELECT SUM(k) AS n FROM f)
    SELECT CAST(k AS BIGINT) AS fanout,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(k * COUNT(*) AS BIGINT) AS n_rows,
           round((k * COUNT(*)) / (SELECT n FROM tot), 6) AS row_share
    FROM f GROUP BY k
    """,
)
def q_audit_join_key_skew(spark: SparkSession, sf: str) -> DataFrame:
    """Join-key skew audit for the orders->lineitem equi-join: the
    fanout histogram (how many join keys carry k rows) and each
    fanout's share of total fact rows — the measurement that decides
    whether the join needs nothing, AQE skew splitting, or salting
    (q_join_salted_skew is the remedy this audit gates).  A healthy
    key prints a tight histogram; a power-law key shows a long tail
    whose top rows carry a visible row_share.

    Scale (100 TB): one hash shuffle on the DATA key (l_orderkey,
    map-side partial counts), then a rollup over the BOUNDED set of
    distinct fanout values; the grand total is the fanout frame's own
    1-row sum cross-joined back broadcast (the q_agg_share_of_total
    pattern — Spark reuses the exchange, so the fact table is scanned
    ONCE).  Exactness: counts exact; each share is one IEEE division
    on exact ints."""
    li = t(spark, sf, "lineitem")
    hist = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )
    total = hist.agg(F.sum(F.col("k") * F.col("n_keys")).alias("total"))
    return hist.crossJoin(F.broadcast(total)).select(
        F.col("k").cast("long").alias("fanout"),
        F.col("n_keys").cast("long").alias("n_keys"),
        (F.col("k") * F.col("n_keys")).cast("long").alias("n_rows"),
        F.round((F.col("k") * F.col("n_keys")) / F.col("total"), 6).alias(
            "row_share"
        ),
    )


# ------------------------------------------------------- Hill index
_HILL_K = 20  # top-20 frequencies; 19 ratio terms


@query(
    "q_text_hill_tail_index",
    oracle=f"""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    f AS (SELECT word, COUNT(*) AS c FROM w GROUP BY word),
    top AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, word) AS rk
      FROM f ORDER BY c DESC, word LIMIT {_HILL_K}),
    xk AS (SELECT c AS ck FROM top WHERE rk = {_HILL_K}),
    s AS (
      SELECT list_reduce(list_prepend(0.0,
               list(ln(c / (SELECT ck FROM xk)) ORDER BY rk)),
             (a, b) -> a + b) AS lnsum
      FROM top WHERE rk < {_HILL_K})
    SELECT CAST((SELECT COUNT(*) FROM f) AS BIGINT) AS n_vocab,
           CAST({_HILL_K - 1} AS BIGINT) AS k_terms,
           CAST((SELECT ck FROM xk) AS BIGINT) AS x_k,
           round(1.0 / ((SELECT lnsum FROM s) / {_HILL_K - 1}), 6)
             AS hill_alpha
    """,
)
def q_text_hill_tail_index(spark: SparkSession, sf: str) -> DataFrame:
    """Hill tail-index estimator (Hill 1975) of the word-frequency
    distribution: alpha_hat = 1 / mean(ln(c_i / c_k)) over the top
    k-1 = {_HILL_K - 1} frequencies relative to the k-th — the
    tail-only power-law exponent (smaller alpha = heavier tail =
    more vocabulary mass in few heavy hitters), the estimator the
    heavy-hitter/Zipf literature uses where a global fit is biased by
    the body.

    Scale: one token shuffle to the word-count table, then
    TakeOrderedAndProject bounds everything downstream to {_HILL_K}
    rows; the ln fold is ORDERED by rank over those rows (house
    ordered-fold rule), so the result is bit-reproducible at any
    cluster size.  The (c DESC, word) ordering makes the top set
    deterministic under count ties."""
    d = t(spark, sf, "documents")
    f = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_vocab = f.agg(F.count(F.lit(1)).cast("long").alias("n_vocab"))
    top = f.orderBy(F.col("c").desc(), F.col("word")).limit(_HILL_K)
    # one bounded row: counts ordered desc-by-c (asc by (-c, word))
    folded = top.agg(
        F.array_sort(
            F.collect_list(F.struct((-F.col("c")).alias("nc"), "word", "c"))
        ).alias("arr")
    ).select(
        # try_element_at: a corpus with < _HILL_K distinct words yields
        # NULL x_k / hill_alpha (matching the oracle's empty-subquery
        # NULL) instead of an ANSI INVALID_ARRAY_INDEX crash (r7 advice)
        F.try_element_at("arr", F.lit(_HILL_K))["c"].cast("long").alias("x_k"),
        F.aggregate(
            F.transform(
                F.slice("arr", 1, _HILL_K - 1),
                lambda s: F.log(
                    s["c"] / F.try_element_at(F.col("arr"), F.lit(_HILL_K))["c"]
                ),
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("lnsum"),
    )
    return n_vocab.crossJoin(folded).select(
        "n_vocab",
        F.lit(_HILL_K - 1).cast("long").alias("k_terms"),
        "x_k",
        F.round(
            F.lit(1.0) / (F.col("lnsum") / F.lit(_HILL_K - 1)), 6
        ).alias("hill_alpha"),
    )


# ----------------------------------------------------- shard balance
_SHARD_SEED = "shard-v1"
_N_SHARDS = 8


@query(
    "q_train_shard_balance",
    oracle=f"""
    WITH s AS (
      SELECT CAST(('0x' || substring(
               md5('{_SHARD_SEED}' || CAST(doc_id AS VARCHAR)), 1, 8))
             AS BIGINT) % {_N_SHARDS} AS shard,
             len(string_split(text, ' ')) AS nw
      FROM documents),
    g AS (
      SELECT shard, COUNT(*) AS n_docs, SUM(nw) AS n_tokens
      FROM s GROUP BY shard),
    tot AS (SELECT SUM(n_tokens) AS tt FROM g)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(n_tokens / (SELECT tt FROM tot), 6) AS token_share
    FROM g
    """,
)
def q_train_shard_balance(spark: SparkSession, sf: str) -> DataFrame:
    """Training-shard balance audit: every doc is assigned to one of
    {_N_SHARDS} shards by a seeded md5 hash (the house deterministic
    shuffle-key pattern — reproducible shard manifests, no RNG), and
    the plan reports each shard's doc count, token budget, and token
    share.  Data-parallel training stalls on its SLOWEST shard, so
    this is the check run before committing a cluster: shares far
    from 1/{_N_SHARDS} mean re-sharding (or token-budget packing,
    q_pack_sequences) before the job, not after.

    Scale: one projection (md5 + split are codegen) and one
    {_N_SHARDS}-group rollup with map-side partials; the grand total
    is a global window over the {_N_SHARDS} ALREADY-AGGREGATED rows
    (the bounded post-aggregate frame class, like the whitelisted
    decile/histogram windows — a cross-join total here would not
    reuse the exchange because column pruning splits the two agg
    subtrees, costing a second scan+tokenize of the corpus).  The
    corpus is scanned and tokenized ONCE.  Exactness: budgets exact
    BIGINTs, each share one IEEE division."""
    d = t(spark, sf, "documents")
    shard = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(_SHARD_SEED), F.col("doc_id").cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _N_SHARDS
    )
    g = d.select(
        shard.alias("shard"),
        F.size(F.split(F.col("text"), " ")).alias("nw"),
    ).groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("nw").alias("n_tokens")
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    return g.select(
        F.col("shard").cast("long").alias("shard"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("n_tokens") / total, 6).alias("token_share"),
    )


# ------------------------------------------------- skew-stress salted
_STRESS_SALTS = 16


@query(
    "q_join_skew_stress_salted",
    oracle="""
    WITH f AS (
      SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 0 ELSE l_orderkey END
               AS hot_key,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem),
    d AS (
      SELECT DISTINCT
             CASE WHEN o_orderkey % 4 <> 0 THEN 0 ELSE o_orderkey END
               AS hot_key
      FROM orders),
    d2 AS (SELECT hot_key, hot_key % 7 AS band FROM d)
    SELECT CAST(band AS BIGINT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM f JOIN d2 USING (hot_key) GROUP BY band
    """,
    bench=True,
)
def q_join_skew_stress_salted(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-STRESS join (r7 verdict item 5): a deliberately pathological
    key — every l_orderkey not divisible by 4 collapses onto key 0, so
    ~75% of the fact table carries ONE join key — joined to its unique
    dimension through ``functions.skew.salted_join``.  This is the
    remedy the q_audit_join_key_skew fanout histogram gates: plain
    shuffle-join puts 3/4 of the fact rows in a single reducer task
    (the straggler that kills a 1000-executor job); the salt spreads
    key 0 over {_STRESS_SALTS} tasks and the dimension is replicated
    x{_STRESS_SALTS} to match.  ``dim_hint="merge"`` pins the
    shuffle-join regime — at a test sf Spark would broadcast the dim
    and there would be no skew to fix; at 100 TB the dim side
    (every distinct key) exceeds any broadcast threshold, which is
    exactly when salting is the only portable fix (AQE's skew split
    can't help bucketed/stream joins and can't split one key's rows
    inside a single sort-merge group).  The salt is dropped before the
    rollup, so the result is bit-identical to the plain join — the
    oracle IS the plain join.  tools/bench_skew.py measures this plan
    against the unsalted and AQE-skew variants at bench scale.
    Exactness: counts and integer cents."""
    from kafkaish_spark.functions.skew import salted_join

    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders")

    def hot(col: str):
        return (
            F.when(F.col(col) % 4 != 0, F.lit(0))
            .otherwise(F.col(col))
            .cast("long")
        )

    fact = li.select(
        hot("l_orderkey").alias("hot_key"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    )
    dim = (
        o.select(hot("o_orderkey").alias("hot_key"))
        .distinct()
        .select("hot_key", (F.col("hot_key") % 7).cast("long").alias("band"))
    )
    joined = salted_join(
        fact, dim, "hot_key", salt_buckets=_STRESS_SALTS, dim_hint="merge"
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").alias("cents"),
    )
