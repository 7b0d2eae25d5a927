"""Corpus-quality gates, round 3: vocabulary OOV rate and the
compression-ratio repetition filter — two of the standard
Gopher/CCNet-family heuristics not yet in the quality family
(q_text_quality covers length/punct/stopword ratios; entropy and
repetition-score cover character statistics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.operators.llm import (
    _PAIR_CTES_SQL,
    _cached_capped_shingles,
)
from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_VOCAB_K = 500  # top-K corpus terms form the "tokenizer vocabulary"


@query(
    "q_text_vocab_oov",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents),
    vocab AS (
      SELECT term FROM (
        SELECT term, COUNT(*) AS c,
               row_number() OVER (ORDER BY COUNT(*) DESC, term) AS rn
        FROM toks GROUP BY term)
      WHERE rn <= {_VOCAB_K})
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           round(CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.term = v.term
    GROUP BY t.doc_id
    """,
)
def q_text_vocab_oov(spark: SparkSession, sf: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-{_VOCAB_K} term vocabulary — the proxy for "how will the
    tokenizer fragment this doc": high OOV means long byte-fallback
    token chains (wasted context) or the wrong corpus for the
    tokenizer.  The real-pipeline twin swaps the derived vocab for the
    tokenizer's released vocab file, same plan.

    Plan: one term-count aggregate -> top-K (K rows, deterministic
    count-desc/term-asc tiebreak) -> BROADCAST left join back onto the
    token stream -> per-doc aggregate.  The vocab is K rows at any
    corpus size, so the join never shuffles the corpus; the two real
    shuffles are the term count and the doc regroup, both
    partial-aggregated."""
    d = t(spark, sf, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ", -1)).alias("term")
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "term")
        .limit(_VOCAB_K)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    oov = F.sum(F.col("in_vocab").isNull().cast("long"))
    n = F.count(F.lit(1))
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            n.alias("n_tokens"),
            oov.alias("n_oov"),
            F.round(oov.cast("double") / n, 6).alias("oov_rate"),
        )
    )


_ZLIB_LEVEL = 6  # pinned: zlib output is deterministic per (input, level)
_RATIO_DROP = 0.42  # below this compressed/raw ratio a doc is repetitive junk
# (calibrated to this corpus: flags the ~5% most compressible docs while
# the median doc sits near 0.50 — the same calibrate-to-corpus rule as
# the 0.4 cosine threshold in q_dedup_embedding_cosine)


def _compression_batches(batches):
    """mapInPandas kernel: deflate each text at a PINNED zlib level and
    report compressed/raw byte ratio.  zlib is deterministic for a
    fixed (input, level, strategy), so the output is reproducible —
    but engine-specific, hence rows-only + a pytest twin instead of a
    SQL oracle."""
    import zlib

    import pandas as pd

    for pdf in batches:
        raw = pdf["text"].str.encode("utf-8")
        comp = raw.map(lambda b: len(zlib.compress(b, _ZLIB_LEVEL)))
        rawlen = raw.map(len)
        ratio = (comp / rawlen).round(6)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "raw_bytes": rawlen.astype("int64"),
                "compressed_bytes": comp.astype("int64"),
                "ratio": ratio,
                "verdict": (ratio < _RATIO_DROP).map(
                    {True: "drop", False: "keep"}
                ),
            }
        )


@query("q_text_compression_ratio", oracle=None)
def q_text_compression_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """The compression-ratio quality gate (Gopher-family): text that
    deflates too well is repetitive boilerplate — keyword stuffing,
    template spam, copy-paste loops — that slips past token-level
    repetition scores when the repeated unit is long.  Ratio =
    deflate(text)/len(text) at a pinned level; docs under
    the corpus-calibrated threshold are flagged.

    Python is unavoidable (no JVM-side deflate expression), so the
    kernel is Arrow-batched mapInPandas — bounded memory per batch,
    ~one C-speed zlib call per doc, no per-row Python loop beyond the
    map.  Rows-only by design (zlib output is engine-specific);
    tests/test_composites26.py pins the kernel to direct python zlib
    byte-for-byte."""
    d = t(spark, sf, "documents").select("doc_id", "text")
    return d.mapInPandas(
        _compression_batches,
        "doc_id long, raw_bytes long, compressed_bytes long, "
        "ratio double, verdict string",
    )


@query(
    "q_dedup_containment",
    oracle=f"""
    WITH {_PAIR_CTES_SQL}
    SELECT CASE WHEN na.n < nb.n THEN doc_a
                WHEN nb.n < na.n THEN doc_b
                ELSE doc_b END AS contained_doc,
           CASE WHEN na.n < nb.n THEN doc_b
                WHEN nb.n < na.n THEN doc_a
                ELSE doc_a END AS container_doc,
           CAST(LEAST(na.n, nb.n) AS BIGINT) AS n_contained,
           CAST(GREATEST(na.n, nb.n) AS BIGINT) AS n_container
    FROM common
    JOIN counts na ON na.doc_id = doc_a
    JOIN counts nb ON nb.doc_id = doc_b
    WHERE c = LEAST(na.n, nb.n)
    """,
)
def q_dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Full-containment dedup: doc X is contained in doc Y when every
    one of X's (DF-capped) distinct 3-grams also occurs in Y — the
    quote-farm / subset-spam case Jaccard misses (a short doc inside a
    long one has LOW Jaccard but adds zero new content).  Containment
    test: common-shingle count == the smaller doc's shingle count.
    Ties (identical shingle sets) mark the higher doc_id as contained,
    the keep-first convention of the exact-dedup family.

    Reuses the near-dup family's shared machinery end to end — cached
    raw shingles, the hot-shingle DF cap bounding the worst join
    group, the same inverted pair join — so the scale properties are
    the ones already measured for q_dedup_ngram_jaccard, and the extra
    cost of ALSO screening for containment in a dedup pass is one more
    aggregate over the same pair frame."""
    sh = _cached_capped_shingles(spark, sf)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    na = counts.alias("na")
    nb = counts.alias("nb")
    j = common.join(na, F.col("doc_a") == F.col("na.doc_id")).join(
        nb, F.col("doc_b") == F.col("nb.doc_id")
    )
    small = F.least(F.col("na.n"), F.col("nb.n"))
    contained = (
        F.when(F.col("na.n") < F.col("nb.n"), F.col("doc_a"))
        .when(F.col("nb.n") < F.col("na.n"), F.col("doc_b"))
        .otherwise(F.col("doc_b"))
    )
    return (
        j.filter(F.col("c") == small)
        .select(
            contained.alias("contained_doc"),
            (F.col("doc_a") + F.col("doc_b") - contained).alias(
                "container_doc"
            ),
            small.cast("long").alias("n_contained"),
            F.greatest(F.col("na.n"), F.col("nb.n"))
            .cast("long")
            .alias("n_container"),
        )
    )



@query(
    "q_privacy_t_closeness",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             o_orderstatus AS s,
             CAST(COUNT(*) AS BIGINT) AS a
      FROM orders GROUP BY 1, 2, 3),
    groups AS (
      SELECT o_orderpriority, yr, CAST(SUM(a) AS BIGINT) AS ng
      FROM cells GROUP BY 1, 2),
    global AS (
      SELECT s, CAST(SUM(a) AS BIGINT) AS b FROM cells GROUP BY s),
    n AS (SELECT CAST(SUM(b) AS BIGINT) AS n FROM global),
    terms AS (
      SELECT g.o_orderpriority, g.yr, g.ng,
             abs(COALESCE(c.a, 0) * (SELECT n FROM n) - gl.b * g.ng)
               AS num
      FROM groups g
      CROSS JOIN global gl
      LEFT JOIN cells c ON c.o_orderpriority = g.o_orderpriority
                       AND c.yr = g.yr AND c.s = gl.s)
    SELECT o_orderpriority, yr, ng AS n_rows,
           round(CAST(SUM(num) AS DOUBLE)
                 / (2.0 * ng * (SELECT n FROM n)), 6) AS tv_dist,
           CAST(CAST(SUM(num) AS DOUBLE)
                / (2.0 * ng * (SELECT n FROM n)) <= 0.2 AS BIGINT) AS close
    FROM terms GROUP BY 1, 2, 3
    """,
)
def q_privacy_t_closeness(spark: SparkSession, sf: str) -> DataFrame:
    """t-closeness audit — the third rung of the privacy ladder after
    q_privacy_k_anonymity (re-identification) and q_privacy_l_diversity
    (attribute disclosure): a QI group whose SENSITIVE-VALUE
    DISTRIBUTION diverges from the global one leaks information even
    when it is diverse (if 90% of one (priority, year) cell's orders
    are status 'F' vs 25% globally, membership in the cell IS a status
    signal).  Distance = total variation between the group's and the
    global status distribution; close iff TV <= t = 0.2.

    Exactness: TV = sum |a*N - b*ng| / (2*ng*N) keeps the numerator in
    int64 (counts cross-multiplied — no per-class float divisions to
    accumulate) and spends ONE IEEE division per group at the end.
    Plan: one (QI, status) cell aggregate, a ~|statuses|-row broadcast
    of the global distribution onto the QI groups, regroup — at 100 TB
    the only full-data pass is the first partial-aggregated cell
    count."""
    o = t(spark, sf, "orders")
    cells = (
        o.select(
            "o_orderpriority",
            F.year("o_orderdate").cast("long").alias("yr"),
            F.col("o_orderstatus").alias("s"),
        )
        .groupBy("o_orderpriority", "yr", "s")
        .agg(F.count(F.lit(1)).cast("long").alias("a"))
    )
    groups = cells.groupBy("o_orderpriority", "yr").agg(
        F.sum("a").cast("long").alias("ng")
    )
    glob = cells.groupBy("s").agg(F.sum("a").cast("long").alias("b"))
    n_total = int(glob.agg(F.sum("b")).first()[0])
    terms = (
        groups.crossJoin(F.broadcast(glob))
        .join(
            cells,
            ["o_orderpriority", "yr", "s"],
            "left",
        )
        .select(
            "o_orderpriority",
            "yr",
            "ng",
            F.abs(
                F.coalesce(F.col("a"), F.lit(0)) * F.lit(n_total)
                - F.col("b") * F.col("ng")
            ).alias("num"),
        )
    )
    tv = F.sum("num").cast("double") / (
        F.lit(2.0) * F.col("ng") * F.lit(float(n_total))
    )
    return (
        terms.groupBy("o_orderpriority", "yr", "ng")
        .agg(
            F.round(tv, 6).alias("tv_dist"),
            (tv <= 0.2).cast("long").alias("close"),
        )
        .select(
            "o_orderpriority",
            "yr",
            F.col("ng").alias("n_rows"),
            "tv_dist",
            "close",
        )
    )


@query(
    "q_events_ohlc_hourly",
    oracle="""
    SELECT CAST((epoch_ms(ts) // 3600000) * 3600000 AS BIGINT) AS hour_ms,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           min_by(value, epoch_ms(ts) * 1000000 + event_id) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           max_by(value, epoch_ms(ts) * 1000000 + event_id) AS close
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_ohlc_hourly(spark: SparkSession, sf: str) -> DataFrame:
    """OHLC downsampling: per (hour, event_type), the opening value
    (earliest event, event_id tiebreak), high, low, and closing value —
    the canonical time-series reduction for charting/monitoring a
    metric stream without shipping raw points (and the financial
    candlestick shape).  One partial-aggregated shuffle: min_by/max_by
    carry (key, arg) pairs map-side, so the full stream never moves.
    All four outputs are PICKED or compared values, never arithmetic —
    hash-exact with no grid tricks needed."""
    ev = t(spark, sf, "events")
    from kafkaish_spark.functions.timeutil import epoch_ms

    # composite (ts, event_id) key packed into one int64 (ms ~1.7e12 x
    # 1e6 + id < 2^63): DuckDB's min_by/max_by take only scalar keys
    key = epoch_ms(F.col("ts")).cast("long") * F.lit(1000000) + F.col(
        "event_id"
    )
    return (
        ev.groupBy(
            ((epoch_ms(F.col("ts")) / 3600000).cast("long") * 3600000).alias(
                "hour_ms"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
        )
    )


@query(
    "q_corpus_source_drift",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS term
      FROM documents),
    cells AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS a
      FROM toks GROUP BY source, term),
    srcs AS (
      SELECT source, CAST(SUM(a) AS BIGINT) AS ns FROM cells GROUP BY source),
    gterms AS (
      SELECT term, CAST(SUM(a) AS BIGINT) AS b FROM cells GROUP BY term),
    n AS (SELECT CAST(SUM(b) AS BIGINT) AS n FROM gterms),
    terms AS (
      SELECT s.source, s.ns,
             abs(COALESCE(c.a, 0) * (SELECT n FROM n) - g.b * s.ns) AS num
      FROM srcs s
      CROSS JOIN gterms g
      LEFT JOIN cells c ON c.source = s.source AND c.term = g.term)
    SELECT source, ns AS n_tokens,
           round(CAST(SUM(num) AS DOUBLE)
                 / (2.0 * ns * (SELECT n FROM n)), 6) AS tv_dist
    FROM terms GROUP BY source, ns
    """,
)
def q_corpus_source_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source corpus drift: total-variation distance between each
    source's unigram distribution and the whole corpus's — the mixture
    QA number behind "is this crawl slice the same language/domain as
    the rest?".  A source whose TV spikes after a recrawl changed its
    content mix even when volume and dedup rates look flat
    (complements q_audit_chi2_drift, which monitors ONE distribution
    over time; this compares the slices against each other).

    Same exactness recipe as q_privacy_t_closeness scaled to an
    unbounded support: counts cross-multiplied into int64 before the
    |a*N - b*ns| sum, one IEEE division per source.  Plan: one (source,
    term) cell aggregate (partial-agg — the only full-data pass), the
    global term distribution joined back BY TERM (both sides already
    hash-partitioned on term; never broadcast — the vocabulary is
    unbounded), then a per-source rollup of |sources| x |vocab| cells."""
    d = t(spark, sf, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.col("text"), " ", -1)).alias("term")
    )
    cells = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("a")
    )
    srcs = cells.groupBy("source").agg(F.sum("a").cast("long").alias("ns"))
    glob = cells.groupBy("term").agg(F.sum("a").cast("long").alias("b"))
    n_total = int(glob.agg(F.sum("b")).first()[0])
    # every (source, term) pair needs a row even when a=0: expand the
    # source list against the vocab via the srcs-by-term join shape
    expanded = srcs.crossJoin(glob.select("term", "b")).join(
        cells, ["source", "term"], "left"
    )
    terms = expanded.select(
        "source",
        "ns",
        F.abs(
            F.coalesce(F.col("a"), F.lit(0)) * F.lit(n_total)
            - F.col("b") * F.col("ns")
        ).alias("num"),
    )
    return (
        terms.groupBy("source", "ns")
        .agg(
            F.round(
                F.sum("num").cast("double")
                / (F.lit(2.0) * F.col("ns") * F.lit(float(n_total))),
                6,
            ).alias("tv_dist")
        )
        .select("source", F.col("ns").alias("n_tokens"), "tv_dist")
    )


_HUB_K = 5  # out-degree of the kNN graph


@query(
    "q_embed_hubness",
    oracle=f"""
    WITH norms AS (
      SELECT vec_id, embedding,
             sqrt(list_reduce(list_transform(list_zip(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])), s -> s[1] * s[2]), (x, y) -> x + y)) AS nn
      FROM embeddings),
    ranked AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY round(list_reduce(list_transform(list_zip(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), s -> s[1] * s[2]), (x, y) -> x + y) / (a.nn * b.nn), 6) DESC,
                        b.vec_id) AS rn
      FROM norms a JOIN norms b ON a.vec_id <> b.vec_id),
    edges AS (SELECT src, dst FROM ranked WHERE rn <= {_HUB_K}),
    indeg AS (
      SELECT n.vec_id,
             CAST(COUNT(e.src) AS BIGINT) AS in_degree
      FROM norms n LEFT JOIN edges e ON e.dst = n.vec_id
      GROUP BY n.vec_id)
    SELECT vec_id, in_degree FROM indeg
    """,
)
def q_embed_hubness(spark: SparkSession, sf: str) -> DataFrame:
    """Hubness diagnostic: in-degree of every vector in the exact
    k={_HUB_K} nearest-neighbor graph.  High-dimensional embeddings
    suffer hub vectors that appear in everyone's top-k — they poison
    retrieval (the same passages dominate every query) and kNN labels;
    the in-degree distribution (mean is exactly k; the TAIL is the
    signal) is the standard health check before shipping an index.

    This is the all-pairs ORACLE TWIN (like q_dedup_ngram_jaccard): at
    100 TB the kNN graph is built with the banded/bucketed ANN paths
    (q_sim_ann_lsh / q_sim_ivf_ann) and this kernel's aggregation runs
    on those candidate edges unchanged — only the pair generator
    swaps.  Ranking uses the repo's rounded-cosine + id tie-break, so
    the graph is engine-identical."""
    from kafkaish_spark.functions.vectors import norm

    e = t(spark, sf, "embeddings").select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nn")
    )
    a = e.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("ea"),
        F.col("nn").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("eb"),
        F.col("nn").alias("nb"),
    )
    from kafkaish_spark.functions.vectors import dot

    cos = F.round(
        dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6
    )
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst"))
    edges = (
        a.join(b, F.col("src") != F.col("dst"))
        .select("src", "dst", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _HUB_K)
        .select("src", "dst")
    )
    indeg = edges.groupBy(F.col("dst").alias("vec_id")).agg(
        F.count(F.lit(1)).cast("long").alias("in_degree")
    )
    return (
        e.select("vec_id")
        .join(indeg, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("in_degree"), F.lit(0)).cast("long").alias(
                "in_degree"
            ),
        )
    )


@query("q_embed_hubness_ann", oracle=None)
def q_embed_hubness_ann(spark: SparkSession, sf: str) -> DataFrame:
    """The SCALE path of q_embed_hubness: the same in-degree
    aggregation over the LSH candidate edges instead of the all-pairs
    graph — the "only the pair generator swaps" property.  Each vector
    ranks only its same-bucket candidates (sublinear), takes its
    top-k, and in-degrees are counted identically.  Out-degree can
    fall below k in sparse buckets, so the exact invariant weakens to
    sum(in_degree) <= k*n.

    Honest caveat, measured: on THIS synthetic corpus (near-uniform
    vectors, max pairwise cosine ~0.48) the ANN hub RANKING correlates
    weakly with the exact one — 6-bit hyperplane buckets over
    clusterless data have low neighbor recall, consistent with
    q_sim_ann_lsh's recall band on the same vectors.  That is the
    diagnostic working as intended (it measures what the index will
    actually serve); on corpora with real cluster structure — where
    ANN indexes are used at all — bucket-local hubs track global
    hubs.  pytest pins the structural invariants, not a rank
    correlation this data cannot support.  Rows-only: the hyperplane
    signatures are engine-specific."""
    from kafkaish_spark.functions.vectors import cosine_sim
    from kafkaish_spark.operators.llm import _lsh_bucketed

    buck = _lsh_bucketed(spark, sf)
    a = buck.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("ea"),
        "bucket",
    )
    b = buck.select(
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("eb"),
        "bucket",
    )
    cos = F.round(cosine_sim(F.col("ea"), F.col("eb")), 6)
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst"))
    edges = (
        a.join(b, ["bucket"])
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _HUB_K)
        .select("src", "dst")
    )
    indeg = edges.groupBy(F.col("dst").alias("vec_id")).agg(
        F.count(F.lit(1)).cast("long").alias("in_degree")
    )
    return (
        buck.select("vec_id")
        .join(indeg, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("in_degree"), F.lit(0)).cast("long").alias(
                "in_degree"
            ),
        )
    )


@query(
    "q_orders_max_open",
    oracle="""
    WITH intervals AS (
      SELECT o.o_orderkey, o.o_orderdate AS start_d,
             MAX(l.l_shipdate) AS end_d
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate),
    deltas AS (
      SELECT start_d AS d, CAST(COUNT(*) AS BIGINT) AS delta
      FROM intervals GROUP BY start_d
      UNION ALL
      SELECT end_d AS d, CAST(-COUNT(*) AS BIGINT) AS delta
      FROM intervals GROUP BY end_d),
    byday AS (
      SELECT d, CAST(SUM(delta) AS BIGINT) AS delta FROM deltas GROUP BY d),
    running AS (
      SELECT d,
             CAST(SUM(delta) OVER (ORDER BY d
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open_orders
      FROM byday)
    SELECT CAST(EXTRACT(year FROM d) AS BIGINT) AS yr,
           CAST(EXTRACT(month FROM d) AS BIGINT) AS mo,
           CAST(MAX(open_orders) AS BIGINT) AS peak_open
    FROM running GROUP BY 1, 2
    """,
)
def q_orders_max_open(spark: SparkSession, sf: str) -> DataFrame:
    """Interval-concurrency sweep: the monthly PEAK number of
    simultaneously open orders — open from order date until the last
    line ships (exclusive: the -1 lands on the final ship day).  The
    +1/-1 delta prefix-sum that answers every "max concurrent
    sessions / open tickets / active connections" question without an
    interval-x-day join.

    Scale shape: the naive per-day interval join is |days| x |open
    intervals|; this derives each order's interval with one
    partial-agg shuffle (max ship date per order), collapses to
    per-day NET deltas (second partial agg), and runs the running sum
    over the DAY table — thousands of rows at any corpus size, the
    collapsed-aggregate global window of SCALE.md §8 (the exchange
    feeding it carries aggregated rows, which is what the
    SinglePartition contract test admits)."""
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    intervals = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("end_d"))
        .select(F.col("o_orderdate").alias("start_d"), "end_d")
    )
    deltas = (
        intervals.groupBy(F.col("start_d").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("delta"))
        .unionByName(
            intervals.groupBy(F.col("end_d").alias("d")).agg(
                (-F.count(F.lit(1))).cast("long").alias("delta")
            )
        )
    )
    byday = deltas.groupBy("d").agg(F.sum("delta").cast("long").alias("delta"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    running = byday.select(
        "d", F.sum("delta").over(w).cast("long").alias("open_orders")
    )
    return (
        running.groupBy(
            F.year("d").cast("long").alias("yr"),
            F.month("d").cast("long").alias("mo"),
        )
        .agg(F.max("open_orders").cast("long").alias("peak_open"))
    )


@query(
    "q_events_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
               AS vq
      FROM events GROUP BY 1, 2),
    tot AS (
      SELECT event_type, CAST(SUM(vq) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM daily GROUP BY event_type),
    cum AS (
      SELECT d.event_type, d.d, t.n,
             CAST(SUM(d.vq) OVER (PARTITION BY d.event_type ORDER BY d.d
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumq,
             CAST(row_number() OVER (PARTITION BY d.event_type ORDER BY d.d)
                  AS BIGINT) AS k,
             t.total
      FROM daily d JOIN tot t ON d.event_type = t.event_type),
    s AS (
      SELECT event_type, d, n,
             n * cumq - k * total AS s_scaled
      FROM cum),
    best AS (
      SELECT event_type, d, n, s_scaled,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(s_scaled) DESC, d) AS rn
      FROM s)
    SELECT event_type, d AS cp_day, s_scaled AS cusum_scaled,
           n AS n_days
    FROM best WHERE rn = 1
    """,
)
def q_events_cusum_changepoint(spark: SparkSession, sf: str) -> DataFrame:
    """CUSUM changepoint detection per event type: the day where the
    cumulative deviation of daily value totals from their overall mean
    peaks in magnitude — the classic single-changepoint estimator for
    "when did this metric's level shift?" (deployment regressions,
    upstream data changes).

    Exactness: the textbook statistic S_d = cum(d) - k*mean mixes a
    float mean into every row; scaling by n gives n*cum(d) - k*total —
    pure int64 on the 1e-6 value grid, so the argmax (|S| desc, day
    tiebreak) is engine-identical with no float anywhere.  Plan: one
    partial-agg shuffle to (type, day) totals, a |types|-row broadcast
    of the grand totals, per-type ordered windows over collapsed day
    rows (thousands per type at any corpus size) — never a
    corpus-scale window."""
    ev = t(spark, sf, "events")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("d"),
            F.round(F.col("value") * 1e6).cast("long").alias("vq"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("vq").cast("long").alias("vq"))
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("vq").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_rn = Window.partitionBy("event_type").orderBy("d")
    cum = daily.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "d",
        "n",
        F.sum("vq").over(w_cum).cast("long").alias("cumq"),
        F.row_number().over(w_rn).cast("long").alias("k"),
        "total",
    )
    s = cum.select(
        "event_type",
        "d",
        "n",
        (F.col("n") * F.col("cumq") - F.col("k") * F.col("total")).alias(
            "s_scaled"
        ),
    )
    w_best = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s_scaled")).desc(), "d"
    )
    return (
        s.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("d").alias("cp_day"),
            "s_scaled",
            F.col("n").alias("n_days"),
        )
        .withColumnRenamed("s_scaled", "cusum_scaled")
    )
