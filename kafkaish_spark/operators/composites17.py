"""Round-2 additions, batch 5: prefix-filtered set-similarity join
(PPJoin-style) and the window-based 2D skyline.  [NS] north-star
extensions — the reference (/root/reference/src/topic.js) has no
processing layer.

Both entries exist to demonstrate the ALGORITHMIC scale path for a
problem whose naive formulation is quadratic:

- q_dedup_prefix_filter returns the EXACT same >=0.5-Jaccard pairs as
  the inverted-index twin, but indexes only each doc's rarest prefix
  shingles (AllPairs/PPJoin prefix filtering, Bayardo et al. WWW'07 /
  Xiao et al. WWW'08 — published public work), shrinking the candidate
  join by orders of magnitude on realistic DF distributions.
- q_skyline_parts computes the 2D Pareto frontier with ONE window pass
  (sort by x, running max of y) instead of the textbook NOT EXISTS
  self-join, which is quadratic.
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

_PF_TAU = 0.5  # Jaccard threshold — matches the near-dup verdict tier


@query(
    "q_dedup_prefix_filter",
    oracle=f"""
    WITH {_PAIR_CTES_SQL}
    SELECT doc_a, doc_b,
           round(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) AS jaccard
    FROM common
    JOIN counts na ON na.doc_id = doc_a
    JOIN counts nb ON nb.doc_id = doc_b
    WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= {_PF_TAU}
    """,
)
def q_dedup_prefix_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Prefix-filtered exact set-similarity join: all doc pairs with
    3-gram Jaccard >= 0.5, computed by indexing ONLY each doc's prefix
    of globally-rarest shingles instead of every shingle.

    Why this is exact (the AllPairs/PPJoin argument): order every
    doc's shingles by ascending corpus DF (ties broken by shingle
    text — a total order).  A pair with Jaccard >= tau must share at
    least one shingle among the first |d| - ceil(tau*|d|) + 1 of each
    side's ordering — if two docs shared NO prefix shingle, their
    overlap is bounded below tau.  So joining on prefix shingles loses
    no qualifying pair; candidates are then verified with an exact
    intersection count over the FULL sets.  Same oracle as the
    inverted-index twin at tau=0.5 — two independent algorithms, one
    hash-checked answer.

    Scale: the prefix join indexes ~(1-tau) of each doc's shingles,
    and because prefixes hold the RAREST shingles, candidate buckets
    are the small-DF tail — the exact opposite of the hot-key blowup;
    the verification join expands |candidates| x doc-length, linear in
    survivors.  The rank window partitions by doc_id, so its sort is
    bounded by doc length.  DF ranking reuses the shared shingle cache
    and the same DF-cap guard as the twin."""
    sh = _cached_capped_shingles(spark, sf)
    dfs = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        sh.join(dfs, "shingle")
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "shingle")
            ),
        )
        .withColumn("sz", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    )
    prefix = ranked.filter(
        F.col("rnk") <= F.col("sz") - F.ceil(F.lit(_PF_TAU) * F.col("sz")) + 1
    ).select("doc_id", "shingle")
    pa, pb = prefix.alias("pa"), prefix.alias("pb")
    cand = (
        pa.join(
            pb,
            (F.col("pa.shingle") == F.col("pb.shingle"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id")),
        )
        .select(
            F.col("pa.doc_id").alias("doc_a"), F.col("pb.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # exact verification over full sets: count shared shingles per
    # candidate pair, then the Jaccard on exact integer counts
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    na, nb = counts.alias("na"), counts.alias("nb")
    jac = F.col("c").cast("double") / (F.col("na.n") + F.col("nb.n") - F.col("c"))
    return (
        common.join(na, F.col("doc_a") == F.col("na.doc_id"))
        .join(nb, F.col("doc_b") == F.col("nb.doc_id"))
        .filter(jac >= _PF_TAU)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@query(
    "q_skyline_parts",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice, p_size
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_retailprice <= a.p_retailprice
        AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
    """,
)
def q_skyline_parts(spark: SparkSession, sf: str) -> DataFrame:
    """2D skyline (Pareto frontier): parts where no other part is both
    cheaper-or-equal AND larger-or-equal with one side strict — the
    "best tradeoff" query behind price/quality frontiers.

    The oracle states the spec as the textbook NOT EXISTS dominance
    anti-join — quadratic.  The Spark plan is the sort-based linear
    algorithm: order by (price asc, size desc); a part is dominated
    iff some strictly-cheaper part has size >= its own, OR an
    equal-price part has strictly larger size.  Both conditions fall
    out of two running-max windows over the same sort order, so the
    whole operator is ONE sort + two window columns — no self-join at
    all.  At 100 TB a single global sort window is the known
    bottleneck; the standard fix is range-partitioning by price and
    carrying each range's max size forward (a 2-pass prefix-max, same
    shape as the documented q_window_running_total swap), which keeps
    the algorithm linear."""
    p = t(spark, sf, "part").withColumn(
        # strict "cheaper" needs an integer order key: a RANGE frame
        # ending at -1 over raw doubles would mean "a whole dollar
        # cheaper".  Prices are 2-decimal, so cents are exact.
        "_cents",
        F.round(F.col("p_retailprice") * 100).cast("long"),
    )
    w_cheaper = Window.orderBy("_cents").rangeBetween(
        Window.unboundedPreceding, -1
    )
    # max size among STRICTLY cheaper parts (the -1 range bound on the
    # cents ordering excludes equal-price peers)
    dominated_by_cheaper = F.max("p_size").over(w_cheaper) >= F.col("p_size")
    w_equal = Window.partitionBy("_cents")
    dominated_by_equal = F.max("p_size").over(w_equal) > F.col("p_size")
    return (
        p.select(
            "p_partkey",
            "p_brand",
            "p_retailprice",
            "p_size",
            F.coalesce(dominated_by_cheaper, F.lit(False)).alias("_dc"),
            dominated_by_equal.alias("_de"),
        )
        .filter(~F.col("_dc") & ~F.col("_de"))
        .drop("_dc", "_de")
    )
