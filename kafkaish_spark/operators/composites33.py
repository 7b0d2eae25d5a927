"""Round-5 seventh wave: functional-dependency profiling — a
TANE-style violation audit (Huhtala et al., Comput. J. 1999) and the
g3 dependency-strength error (Kivinen & Mannila, TCS 1995: the
minimum fraction of rows to delete for X -> Y to hold exactly), for a
fixed candidate-dependency list.

FD profiling is the schema-discovery step a warehouse runs over
landed data: it tells you which "keys" actually behave like keys and
how dirty the almost-dependencies are — complementary to the
expectation suites already registered (q_audit_expectations's
single-table checks, q_audit_referential_integrity's FK edges).

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB) computes neither — [NS] north-star extensions per SURVEY.md
§2.4.  House exactness: violation and mode counts are exact BIGINTs;
g3 is one IEEE division of two of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# Candidate list: two dependencies that hold by construction
# (key -> attribute), two that genuinely fail on this corpus.
_FDS = (
    ("nation", "n_nationkey", "n_name"),
    ("part", "p_partkey", "p_name"),
    ("part", "p_brand", "p_type"),
    ("customer", "c_nationkey", "c_mktsegment"),
)


def _fd_union_sql() -> str:
    parts = []
    for tab, det, dep in _FDS:
        parts.append(f"""
      SELECT '{tab}.{det}->{dep}' AS fd,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(d - 1) AS BIGINT) AS violations,
             SUM(d - 1) = 0 AS holds
      FROM (SELECT COUNT(DISTINCT {dep}) AS d FROM {tab} GROUP BY {det})""")
    return "\n      UNION ALL".join(parts)


@query("q_profile_functional_deps", oracle=_fd_union_sql())
def q_profile_functional_deps(spark: SparkSession, sf: str) -> DataFrame:
    """TANE-style functional-dependency audit for a fixed candidate
    list: X -> Y holds iff every X group maps to exactly one Y value;
    the violation count sums (distinct-Y-per-group - 1), the quantity
    TANE prunes its lattice with.  The list pairs two dependencies
    that hold (key -> attribute) with two that fail (brand -> type,
    nation -> segment), so the report exercises both verdicts.

    Scale: each dependency is one partial-aggregated shuffle on its
    determinant (count-distinct of the dependent per group, then a
    1-row rollup); dependencies run as independent jobs unioned at
    the end — at 100 TB you'd batch same-table determinants into one
    grouping-sets pass, which this plan shape permits.
    Reference: [NS] — no analog in kafkaish."""
    outs = []
    for tab, det, dep in _FDS:
        g = (
            t(spark, sf, tab)
            .groupBy(det)
            .agg(F.count_distinct(F.col(dep)).alias("d"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum(F.col("d") - 1).cast("long").alias("violations"),
            )
            .select(
                F.lit(f"{tab}.{det}->{dep}").alias("fd"),
                "n_groups",
                "violations",
                (F.col("violations") == 0).alias("holds"),
            )
        )
        outs.append(g)
    out = outs[0]
    for g in outs[1:]:
        out = out.unionByName(g)
    return out


def _g3_union_sql() -> str:
    parts = []
    for tab, det, dep in _FDS:
        parts.append(f"""
      SELECT '{tab}.{det}->{dep}' AS fd,
             CAST(n AS BIGINT) AS n_rows,
             CAST(n - keep AS BIGINT) AS n_delete,
             round(CAST(n - keep AS DOUBLE) / n, 6) AS g3_error
      FROM (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n, CAST(SUM(mx) AS BIGINT) AS keep
        FROM (
          SELECT SUM(c) AS cnt, MAX(c) AS mx FROM (
            SELECT {det}, {dep}, COUNT(*) AS c
            FROM {tab} GROUP BY {det}, {dep}) GROUP BY {det}))""")
    return "\n      UNION ALL".join(parts)


@query("q_profile_fd_strength", oracle=_g3_union_sql())
def q_profile_fd_strength(spark: SparkSession, sf: str) -> DataFrame:
    """g3 dependency strength for the same candidate list: the
    minimum number (and fraction) of rows to DELETE for X -> Y to
    hold exactly — per determinant group keep the modal dependent
    value, delete the rest.  g3 = 0 means the dependency holds;
    g3 near 1 means X carries no information about Y.  This is the
    error measure approximate-FD discovery (TANE's g3 threshold)
    ranks candidates by.

    Scale: one partial-aggregated shuffle to (X, Y) counts, a second
    to per-X (total, max) — both keyed on data-grown dictionaries —
    then a 1-row rollup per dependency; nothing is collected and no
    group is materialized wider than its distinct (X, Y) pairs.
    Reference: [NS] — no analog in kafkaish."""
    outs = []
    for tab, det, dep in _FDS:
        pair = (
            t(spark, sf, tab)
            .groupBy(det, dep)
            .agg(F.count(F.lit(1)).alias("c"))
        )
        per_det = pair.groupBy(det).agg(
            F.sum("c").alias("cnt"), F.max("c").alias("mx")
        )
        roll = per_det.agg(
            F.sum("cnt").cast("long").alias("n"),
            F.sum("mx").cast("long").alias("keep"),
        )
        g = roll.select(
            F.lit(f"{tab}.{det}->{dep}").alias("fd"),
            F.col("n").alias("n_rows"),
            (F.col("n") - F.col("keep")).cast("long").alias("n_delete"),
            F.round(
                (F.col("n") - F.col("keep")).cast("double") / F.col("n"), 6
            ).alias("g3_error"),
        )
        outs.append(g)
    out = outs[0]
    for g in outs[1:]:
        out = out.unionByName(g)
    return out
