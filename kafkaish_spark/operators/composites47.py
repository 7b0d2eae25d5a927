"""Round-8 wave: query-planning pre-flight audits + sequence mining.

Extends the round-7 pre-run audit family (composites46 — skew fanout,
tail index, shard balance) with the remaining decisions a 100 TB query
planner (or the engineer overriding it) makes BEFORE committing cluster
time, each computed as a cheap linear pass instead of discovered as a
blown-up job:

- broadcast decision table: per dimension, the exact in-join projected
  bytes vs the broadcast threshold — whether each star-join side is a
  BroadcastHashJoin or must shuffle (the single most consequential plan
  choice; Spark's own CBO estimates this from stats, we compute it
  exactly);
- join cardinality pre-flight: per FK edge, the exact inner-join output
  size from the two per-key count histograms (sum over keys of
  fL(k)*fR(k)) WITHOUT running the join, plus key containment — the
  "will this join explode / silently drop rows" check;
- top-key mass: the one-number skew gate per edge (hottest key's row
  share — the q_audit_join_key_skew histogram collapsed to its
  decision scalar; NULL/default keys hashing to one reducer show up
  here first);
- scan partition plan: per fact table, exact projected scan bytes and
  the partition count a 128 MiB-target split yields — the
  maxPartitionBytes / task-count sanity check.

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB, src/topic.js) computes none of these — [NS] north-star
extensions per SURVEY.md §2.4.  House exactness: all counts/bytes exact
BIGINTs (octet_length == DuckDB strlen — byte semantics, not chars);
shares are single IEEE divisions on exact ints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# (dim table, key column, representative payload column) — the
# projection a star join actually ships to the build side
_DIMS = (
    ("nation", "n_nationkey", "n_name"),
    ("region", "r_regionkey", "r_name"),
    ("supplier", "s_suppkey", "s_name"),
    ("customer", "c_custkey", "c_mktsegment"),
    ("part", "p_partkey", "p_type"),
)
_BROADCAST_BYTES = 10 * 1024 * 1024  # spark.sql.autoBroadcastJoinThreshold


def _broadcast_oracle() -> str:
    parts = []
    for name, key, payload in _DIMS:
        parts.append(f"""
        SELECT '{name}' AS dim_table,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(8 * COUNT(*) + SUM(strlen({payload})) AS BIGINT)
                 AS est_bytes,
               CAST(CASE WHEN 8 * COUNT(*) + SUM(strlen({payload}))
                         <= {_BROADCAST_BYTES} THEN 1 ELSE 0 END AS BIGINT)
                 AS broadcastable
        FROM {name}""")
    return " UNION ALL ".join(parts)


@query("q_audit_broadcast_decision", oracle=_broadcast_oracle())
def q_audit_broadcast_decision(spark: SparkSession, sf: str) -> DataFrame:
    """Broadcast decision table: for every dimension of the star
    schema, the EXACT bytes its join projection (8-byte key + payload
    string) would ship to executors, and the verdict against the
    10 MiB autoBroadcastJoinThreshold — the pre-flight twin of what
    Spark's CBO estimates from ANALYZE statistics.  A dim whose exact
    bytes hug the threshold is the one that flips plan shape between
    environments; this table finds it before the cluster does.

    Scale: five independent linear scans, each collapsing map-side to
    one (count, byte-sum) row — no join, no data shuffle, cost is the
    scans alone.  Exactness: octet_length == DuckDB strlen (bytes, not
    chars); the verdict is integer arithmetic."""
    outs = []
    for name, key, payload in _DIMS:
        d = t(spark, sf, name)
        est = (
            F.lit(8) * F.count(F.lit(1))
            + F.sum(F.octet_length(F.col(payload)))
        ).cast("long")
        outs.append(
            d.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                est.alias("est_bytes"),
                F.when(est <= _BROADCAST_BYTES, F.lit(1))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("broadcastable"),
            ).select(F.lit(name).alias("dim_table"), "*")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# FK edges: (edge label, left table, left key, right table, right key)
# — left is the dimension/parent, right the fact/child
_EDGES = (
    ("customer->orders", "customer", "c_custkey", "orders", "o_custkey"),
    ("orders->lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("nation->customer", "nation", "n_nationkey", "customer", "c_nationkey"),
    ("nation->supplier", "nation", "n_nationkey", "supplier", "s_nationkey"),
)


def _cardinality_oracle() -> str:
    parts = []
    for label, lt, lk, rt, rk in _EDGES:
        parts.append(f"""
        SELECT '{label}' AS edge,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {lt}) AS n_left,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {rt}) AS n_right,
               (SELECT CAST(COUNT(DISTINCT {lk}) AS BIGINT) FROM {lt})
                 AS keys_left,
               (SELECT CAST(COUNT(DISTINCT {rk}) AS BIGINT) FROM {rt})
                 AS keys_right,
               (SELECT CAST(COALESCE(SUM(fl * fr), 0) AS BIGINT)
                FROM (SELECT {lk} AS k, COUNT(*) AS fl FROM {lt} GROUP BY 1) a
                JOIN (SELECT {rk} AS k, COUNT(*) AS fr FROM {rt} GROUP BY 1) b
                USING (k)) AS est_join_rows,
               (SELECT round(COUNT(DISTINCT CASE WHEN l.k IS NOT NULL
                                            THEN r.k END)
                       / COUNT(DISTINCT r.k), 6)
                FROM (SELECT DISTINCT {rk} AS k FROM {rt}) r
                LEFT JOIN (SELECT DISTINCT {lk} AS k FROM {lt}) l
                ON r.k = l.k) AS containment""")
    return " UNION ALL ".join(parts)


@query("q_audit_join_cardinality", oracle=_cardinality_oracle())
def q_audit_join_cardinality(spark: SparkSession, sf: str) -> DataFrame:
    """Join-cardinality pre-flight: for every FK edge of the schema,
    the EXACT inner-join output size computed from the two per-key
    count histograms (sum over shared keys of fL(k)*fR(k)) — the join
    is never run, yet its row count is known, which is precisely the
    estimate a cost-based optimizer wants and usually only
    approximates.  ``containment`` (share of child keys present in the
    parent) is the referential-integrity companion: < 1.0 means an
    inner join silently drops child rows (q_audit_referential_integrity
    counts exactly which).

    Scale: per edge, two hash aggregations (map-side partial counts,
    shuffle carries one row per distinct key), then ONE full-outer
    join of the two KEY-COUNT frames from which every output number is
    aggregated — so each base table is scanned exactly once per edge
    (review r8: the earlier shape derived side totals and containment
    from separate consumers, and the isnotnull pushdown each join
    added specialized their scans differently, defeating exchange
    reuse; a full-outer join filters no keys, so the count frames are
    consumed once, unspecialized).  Exactness: all counts exact;
    containment is one IEEE division of exact ints.  Null keys: a NULL
    key never equi-joins (est), is excluded from keys_*/containment
    (COUNT DISTINCT semantics), but its rows still count in n_*."""
    outs = []
    for label, lt, lk, rt, rk in _EDGES:
        ldf, rdf = t(spark, sf, lt), t(spark, sf, rt)
        lcnt = ldf.groupBy(F.col(lk).alias("k")).agg(
            F.count(F.lit(1)).alias("fl")
        )
        rcnt = rdf.groupBy(F.col(rk).alias("k")).agg(
            F.count(F.lit(1)).alias("fr")
        )
        both = lcnt.join(rcnt, "k", "full_outer")
        k_ok = F.col("k").isNotNull()
        stats = both.agg(
            F.sum("fl").cast("long").alias("n_left"),
            F.sum("fr").cast("long").alias("n_right"),
            F.count(F.when(k_ok & F.col("fl").isNotNull(), F.lit(1)))
            .cast("long")
            .alias("keys_left"),
            F.count(F.when(k_ok & F.col("fr").isNotNull(), F.lit(1)))
            .cast("long")
            .alias("keys_right"),
            F.coalesce(F.sum(F.col("fl") * F.col("fr")), F.lit(0))
            .cast("long")
            .alias("est_join_rows"),
            F.round(
                F.count(
                    F.when(
                        k_ok
                        & F.col("fl").isNotNull()
                        & F.col("fr").isNotNull(),
                        F.lit(1),
                    )
                )
                / F.count(F.when(k_ok & F.col("fr").isNotNull(), F.lit(1))),
                6,
            ).alias("containment"),
        )
        outs.append(stats.select(F.lit(label).alias("edge"), "*"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _top_key_oracle() -> str:
    parts = []
    for label, _lt, _lk, rt, rk in _EDGES:
        parts.append(f"""
        SELECT '{label}' AS edge, hot_key, hot_rows, total_rows,
               round(hot_rows / total_rows, 6) AS share
        FROM (
          SELECT CAST({rk} AS BIGINT) AS hot_key,
                 CAST(COUNT(*) AS BIGINT) AS hot_rows,
                 CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total_rows
          FROM {rt} GROUP BY 1
          ORDER BY hot_rows DESC, hot_key LIMIT 1)""")
    return " UNION ALL ".join(parts)


@query("q_audit_top_key_mass", oracle=_top_key_oracle())
def q_audit_top_key_mass(spark: SparkSession, sf: str) -> DataFrame:
    """Top-key mass: per FK edge, the single hottest child-side join
    key and its share of the fact rows — the full fanout histogram
    (q_audit_join_key_skew) collapsed to the one decision scalar a
    nightly gate thresholds on.  A NULL or default-value key (the
    classic production skew: every orphan row carrying user_id=0
    hashes to ONE reducer) surfaces here before the join stalls.

    Scale: per edge, one hash aggregation on the key (map-side
    partials), then a TakeOrdered(1) over the key-count frame — the
    key-count frame is CORPUS-scale (one row per distinct key), so the
    grand total is its own 1-row sum cross-joined back broadcast (the
    q_audit_join_key_skew exchange-reuse pattern), never a global
    window over the key counts.  Exactness: counts exact, one
    division."""
    outs = []
    for label, _lt, _lk, rt, rk in _EDGES:
        rdf = t(spark, sf, rt)
        cnt = rdf.groupBy(F.col(rk).cast("long").alias("hot_key")).agg(
            F.count(F.lit(1)).alias("hot_rows")
        )
        total = cnt.agg(F.sum("hot_rows").cast("long").alias("total_rows"))
        top = (
            cnt.orderBy(
                F.col("hot_rows").desc(), F.col("hot_key").asc_nulls_last()
            )
            .limit(1)
            .crossJoin(F.broadcast(total))
        )
        outs.append(
            top.select(
                F.lit(label).alias("edge"),
                "hot_key",
                F.col("hot_rows").cast("long").alias("hot_rows"),
                "total_rows",
                F.round(F.col("hot_rows") / F.col("total_rows"), 6).alias(
                    "share"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# (fact table, fixed-width bytes per row, string payload column)
_SCANS = (
    ("orders", 16, "o_orderstatus"),
    ("lineitem", 16, "l_returnflag"),
    ("documents", 8, "text"),
    ("events", 16, "event_type"),
)
_TARGET_PARTITION_BYTES = 128 * 1024 * 1024  # maxPartitionBytes default


def _partition_plan_oracle() -> str:
    parts = []
    for name, fixed, payload in _SCANS:
        parts.append(f"""
        SELECT '{name}' AS fact_table,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST({fixed} * COUNT(*) + SUM(strlen({payload})) AS BIGINT)
                 AS est_bytes,
               CAST(GREATEST(1,
                 ({fixed} * COUNT(*) + SUM(strlen({payload}))
                  + {_TARGET_PARTITION_BYTES - 1}) // {_TARGET_PARTITION_BYTES})
                 AS BIGINT) AS n_partitions,
               CAST((COUNT(*) + GREATEST(1,
                 ({fixed} * COUNT(*) + SUM(strlen({payload}))
                  + {_TARGET_PARTITION_BYTES - 1}) // {_TARGET_PARTITION_BYTES})
                 - 1) // GREATEST(1,
                 ({fixed} * COUNT(*) + SUM(strlen({payload}))
                  + {_TARGET_PARTITION_BYTES - 1}) // {_TARGET_PARTITION_BYTES})
                 AS BIGINT) AS rows_per_partition
        FROM {name}""")
    return " UNION ALL ".join(parts)


@query("q_audit_scan_partition_plan", oracle=_partition_plan_oracle())
def q_audit_scan_partition_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Scan partition plan: per fact table, the exact projected scan
    bytes (fixed-width columns + string payload bytes) and the task
    count a 128 MiB ``maxPartitionBytes`` split yields, with rows per
    task — the pre-flight check that a 100 TB scan neither produces
    millions of tiny tasks (merge files / raise the target) nor a few
    memory-blowing ones (lower it).  This is the arithmetic Spark's
    FilePartition planner runs on file sizes; computing it from exact
    DATA bytes shows the compression-independent lower bound.

    Scale: four independent linear scans collapsing to one row each —
    no shuffle.  Exactness: integer bytes, ceil-division in exact
    integer arithmetic on both engines."""
    outs = []
    for name, fixed, payload in _SCANS:
        d = t(spark, sf, name)
        est = (
            F.lit(fixed) * F.count(F.lit(1))
            + F.sum(F.octet_length(F.col(payload)))
        ).cast("long")
        base = d.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            est.alias("est_bytes"),
        )
        tpb = _TARGET_PARTITION_BYTES
        outs.append(
            base.select(
                F.lit(name).alias("fact_table"),
                "n_rows",
                "est_bytes",
                F.greatest(
                    F.lit(1).cast("long"),
                    F.expr(f"(est_bytes + {tpb - 1}) div {tpb}"),
                ).alias("n_partitions"),
            ).withColumn(
                "rows_per_partition",
                F.expr("(n_rows + n_partitions - 1) div n_partitions"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
