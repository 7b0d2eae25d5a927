"""Join-strategy advisor: the r8 pre-flight audit family turned into
engine behavior (r8 verdict item 5).

``q_audit_broadcast_decision`` / ``q_audit_join_cardinality`` /
``q_audit_top_key_mass`` (operators/composites47.py) compute exactly
the numbers that decide broadcast vs plain-shuffle vs salted join.
This module CONSUMES those statistics and returns the strategy — the
cost-based step the reference (kafkaish, ~350 LoC pub/sub over
MongoDB) never had, and the step Spark's own CBO approximates from
ANALYZE statistics where we compute it exactly.

The decision tree, in priority order:

1. **broadcast** — the dim's exact in-join projected bytes fit the
   broadcast threshold.  A broadcast dim means the FACT side never
   shuffles, so skew on the fact key is irrelevant (a hot key costs
   nothing when every executor holds the whole build side).
2. **salt** — the dim must shuffle AND the hottest fact key carries
   ≥ ``hot_share_threshold`` of the fact rows.  tools/bench_skew.py
   measured why this is its own branch: AQE's OptimizeSkewedJoin
   never fires on a pre-partitioned dim side and cannot split one
   key's rows inside a single sort-merge group — salting is the only
   portable fix (plain 4.48 s / AQE 4.54 s / salted 3.31 s under 20×
   hot-key amplification at bench sf).
3. **shuffle** — the dim must shuffle and no key is pathological:
   the plain sort-merge/shuffle-hash join Catalyst picks is right.

``scale_factor`` is the 100 TB honesty knob: the advisor answers for
TARGET scale, not test scale.  A dim that measures 120 KB at sf 0.01
but grows linearly with the corpus is declared with
``scale_factor=10_000`` and correctly falls out of the broadcast
regime — the same reasoning q_join_skew_stress_salted documents for
pinning its shuffle-join regime at test sf.

Cost model of the advisor itself: one column-pruned linear aggregation
over the dim (exact bytes) and one hash aggregation + top-1 over the
fact key (hot share) — the two cheapest statistics in the audit
family, both driver-materialized as single-row scalars (the bounded
``.collect()`` class).  At 100 TB these are the pre-flight scans a
planner runs ONCE per (table, key) and caches; ``JoinAdvice`` is a
plain dataclass so callers can persist and reuse it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the Spark default this engine also pins in session.py
BROADCAST_BYTES_DEFAULT = 10 * 1024 * 1024
# one key holding >= 1/8 of the fact side saturates its reducer ~8x
# sooner than the average task — the straggler regime where the
# salted plan measured faster than plain AND AQE in tools/bench_skew.py
HOT_SHARE_THRESHOLD_DEFAULT = 0.125

_FIXED_WIDTH = 8  # numeric/date/timestamp/bool in-join bytes per value


def dim_projected_bytes(dim: DataFrame) -> int:
    """Exact bytes the dim frame ships to executors if broadcast:
    ``octet_length`` summed for strings/binary, 8 bytes per value for
    fixed-width columns — the same arithmetic
    ``q_audit_broadcast_decision`` tabulates (composites47.py), applied
    to the frame's actual projection.  Nested types count their JSON
    byte length (upper-bound-ish but deterministic)."""
    exprs = []
    for f in dim.schema.fields:
        if isinstance(f.dataType, (T.StringType, T.BinaryType)):
            exprs.append(
                F.coalesce(F.octet_length(F.col(f.name)), F.lit(0))
            )
        elif isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType)
        ):
            exprs.append(
                F.coalesce(
                    F.octet_length(F.to_json(F.col(f.name))), F.lit(0)
                )
            )
        else:
            exprs.append(F.lit(_FIXED_WIDTH))
    per_row = exprs[0]
    for e in exprs[1:]:
        per_row = per_row + e
    row = dim.agg(F.coalesce(F.sum(per_row), F.lit(0)).cast("long")).first()
    return int(row[0])


def fact_hot_share(fact: DataFrame, key: str) -> tuple[object, float]:
    """(hottest key, its share of the fact rows) — the decision scalar
    ``q_audit_top_key_mass`` reports per FK edge.  One hash aggregation
    on the key (map-side partials) + a top-1 over the key-count frame;
    the grand total is the count frame's own 1-row sum cross-joined
    back broadcast (never a global window over the key counts)."""
    cnt = fact.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = cnt.agg(F.sum("n").cast("long").alias("t"))
    top = (
        cnt.orderBy(F.col("n").desc(), F.col("k").asc_nulls_last())
        .limit(1)
        .crossJoin(F.broadcast(total))
        .first()
    )
    if top is None or not top["t"]:
        return None, 0.0
    return top["k"], float(top["n"]) / float(top["t"])


@dataclass(frozen=True)
class JoinAdvice:
    """The advisor's verdict plus the measurements it rests on, so a
    plan review (or a test) can audit WHY."""

    strategy: str  # "broadcast" | "salt" | "shuffle"
    dim_bytes: int  # exact projected bytes at test scale
    dim_bytes_at_scale: int  # dim_bytes * scale_factor (the decision input)
    hot_key: object  # hottest fact key (None for an empty fact)
    hot_share: float  # its share of fact rows
    broadcast_bytes: int  # threshold used
    hot_share_threshold: float  # threshold used


def advise_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    *,
    broadcast_bytes: int = BROADCAST_BYTES_DEFAULT,
    hot_share_threshold: float = HOT_SHARE_THRESHOLD_DEFAULT,
    scale_factor: float = 1.0,
) -> JoinAdvice:
    """Measure, then decide.  ``scale_factor`` extrapolates the dim's
    bytes to target scale (dims that grow with the corpus must not be
    judged broadcastable from a toy sf); the fact side's hot SHARE is
    scale-free, so it needs no extrapolation."""
    dim_bytes = dim_projected_bytes(dim)
    at_scale = int(dim_bytes * scale_factor)
    if at_scale <= broadcast_bytes:
        # a broadcast dim never shuffles the fact side: skew is moot,
        # so the hot-key scan is skipped entirely
        return JoinAdvice(
            "broadcast", dim_bytes, at_scale, None, 0.0,
            broadcast_bytes, hot_share_threshold,
        )
    hot_key, hot_share = fact_hot_share(fact, fact_key)
    strategy = "salt" if hot_share >= hot_share_threshold else "shuffle"
    return JoinAdvice(
        strategy, dim_bytes, at_scale, hot_key, hot_share,
        broadcast_bytes, hot_share_threshold,
    )


# Measured advice keyed by a caller-chosen token (e.g. (sf_dir,
# edge)).  JoinAdvice is plain scalars — no DataFrame, no session
# handle — so a cached verdict is valid across sessions for the same
# data; clear the dict to force re-measurement.  Registered queries
# route through this so building their DataFrame stays LAZY after the
# first measurement: without it, every plan enumeration (bench
# plan-diff, registry contract sweep, each timed bench rep) re-runs
# the advisor's measurement jobs and folds them into query timings
# (review r9).
_ADVICE_CACHE: dict = {}


def advise_join_cached(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    *,
    cache_key,
    **kwargs,
) -> JoinAdvice:
    # the full key includes the join column AND the threshold kwargs:
    # two call sites sharing a cache_key but joining on different keys
    # (or with different broadcast_bytes / hot_share_threshold /
    # scale_factor) must not reuse each other's verdict (r9/r10 ADVICE).
    # Caveat: the cache lives for the process; tests that REGENERATE the
    # data under a cached sf path must clear _ADVICE_CACHE (plan-only
    # impact — answers are strategy-independent by construction).
    full_key = ("join", cache_key, fact_key, tuple(sorted(kwargs.items())))
    if full_key not in _ADVICE_CACHE:
        _ADVICE_CACHE[full_key] = advise_join(fact, dim, fact_key, **kwargs)
    return _ADVICE_CACHE[full_key]


def advised_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    how: str = "inner",
    advice: JoinAdvice | None = None,
    salt_buckets: int = 16,
    dim_hint: str | None = None,
    broadcast_bytes: int = BROADCAST_BYTES_DEFAULT,
    hot_share_threshold: float = HOT_SHARE_THRESHOLD_DEFAULT,
    scale_factor: float = 1.0,
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on ``on`` using the advised
    strategy (measured here unless a cached ``advice`` is passed):

    - ``broadcast`` → ``fact.join(broadcast(dim), ...)``;
    - ``salt``      → ``functions.skew.salted_join`` (fact-preserving
      ``how`` only — the salted path inherits that contract), with
      ``dim_hint`` (default ``"merge"``) pinning the shuffle regime so
      a small test sf cannot broadcast the problem away;
    - ``shuffle``   → the plain join, Catalyst's pick.

    Every strategy returns bit-identical rows to the plain join (the
    equivalence oracle q_advised_star_revenue proves it end-to-end),
    so the advisor can never change ANSWERS, only plans.

    ``how`` is validated against the salted contract UP FRONT, not
    only when the measurement happens to pick salt: otherwise a
    right/full-outer advised join works for months while the dim fits
    the broadcast threshold, then starts raising the day the data
    grows into the salt regime — a data-dependent latent error
    (review r9).  Non-fact-preserving joins must opt out of salting
    explicitly by calling the plain/broadcast join themselves."""
    _SALTABLE = {"inner", "left", "leftouter", "left_outer",
                 "semi", "leftsemi", "left_semi",
                 "anti", "leftanti", "left_anti"}
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _SALTABLE
    }:
        raise ValueError(
            f"advised_join: how={how!r} is not fact-preserving, so the "
            "salt strategy could never apply to it — and deferring the "
            "error until the data grows into the salt regime would "
            "make it a data-dependent runtime failure.  Use a plain "
            f"fact.join(dim, on, {how!r}) (or broadcast(dim)) directly."
        )
    if advice is None:
        advice = advise_join(
            fact, dim, on,
            broadcast_bytes=broadcast_bytes,
            hot_share_threshold=hot_share_threshold,
            scale_factor=scale_factor,
        )
    if advice.strategy == "broadcast":
        return fact.join(F.broadcast(dim), on, how)
    if advice.strategy == "salt":
        from kafkaish_spark.functions.skew import salted_join

        return salted_join(
            fact, dim, on,
            how=how,
            salt_buckets=salt_buckets,
            dim_hint=dim_hint or "merge",
        )
    out_dim = dim.hint(dim_hint) if dim_hint else dim
    return fact.join(out_dim, on, how)


# --------------------------------------------------------- aggregations
# The r9 advisor decided joins; r10 completes it symmetrically for
# group-bys (r9 verdict item 5).  The skew economics differ from joins:
# Spark's own map-side partial aggregation already compresses a
# low-cardinality ALGEBRAIC aggregate to (distinct keys) rows per map
# task, so a hot key rarely hurts a plain count/sum.  Where it DOES
# hurt — and what the salted two-phase plan fixes — is reducer-side
# per-group state that partials can't shrink: count(DISTINCT x) on the
# hot key, collect_list, exact medians, or simply a grouping whose
# value-side cardinality defeats the map-side hash table.  AQE can't
# help either way: OptimizeSkewedJoin splits join partitions, never
# aggregation keys (tools/bench_skew.py; q_agg_salted_skew documents
# the manual spelling this consumer now chooses automatically).


@dataclass(frozen=True)
class AggAdvice:
    """advise_agg's verdict plus the measurement it rests on."""

    strategy: str  # "plain" | "salt"
    hot_key: object  # hottest grouping key
    hot_share: float  # its share of fact rows
    hot_share_threshold: float  # threshold used


def advise_agg(
    fact: DataFrame,
    key: str,
    *,
    hot_share_threshold: float = HOT_SHARE_THRESHOLD_DEFAULT,
) -> AggAdvice:
    """Measure the hottest grouping key's share of the fact rows (the
    same scale-free statistic ``advise_join`` uses — one hash agg with
    map-side partials + a top-1) and decide: ``salt`` when one key
    would saturate its reducer >= 1/threshold× sooner than average,
    else ``plain`` (Catalyst's single hash aggregate is right)."""
    hot_key, hot_share = fact_hot_share(fact, key)
    strategy = "salt" if hot_share >= hot_share_threshold else "plain"
    return AggAdvice(strategy, hot_key, hot_share, hot_share_threshold)


def advise_agg_cached(
    fact: DataFrame,
    key: str,
    *,
    cache_key,
    **kwargs,
) -> AggAdvice:
    """Memoized advise_agg — same contract (and same cache) as
    advise_join_cached: the verdict is plain scalars, valid across
    sessions for the same data, keyed on (caller token, kwargs)."""
    full_key = ("agg", cache_key, key, tuple(sorted(kwargs.items())))
    if full_key not in _ADVICE_CACHE:
        _ADVICE_CACHE[full_key] = advise_agg(fact, key, **kwargs)
    return _ADVICE_CACHE[full_key]


# partial-phase expression and merge-phase expression per aggregate
# kind — the commutative-monoid decompositions that make the salted
# two-phase plan bit-identical to the plain group-by
_AGG_KINDS = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def advised_agg(
    fact: DataFrame,
    key: str,
    aggs: dict,
    *,
    advice: AggAdvice | None = None,
    salt_buckets: int = 64,
    salt_on: list[str] | None = None,
    hot_share_threshold: float = HOT_SHARE_THRESHOLD_DEFAULT,
) -> DataFrame:
    """Group ``fact`` by ``key`` computing ``aggs`` (ordered mapping
    ``name -> (kind, column)`` with kind in count/sum/min/max; column
    ignored for count) using the advised strategy (measured here
    unless a cached ``advice`` is passed):

    - ``plain`` → one hash aggregate, Catalyst's pick;
    - ``salt``  → the q_agg_salted_skew two-phase plan: phase 1
      pre-aggregates (key, pmod(xxhash64(salt_on), salt_buckets)) —
      ``salt_buckets``-way parallel regardless of key skew — and
      phase 2 merges the (keys × buckets) partials, a trivially small
      second shuffle.  The salt is deterministic (xxhash64 of
      ``salt_on``, default every fact column) and never reaches the
      result.

    Only monoid kinds are accepted, which is exactly what makes the
    two plans answer-identical: merge(partials) == direct aggregate
    for count/sum/min/max.  AVG callers compose sum/count; holistic
    aggregates (exact percentiles, collect_*) have no merge phase and
    must not route here.  The equivalence is driver-proven end-to-end
    by q_advised_agg_quantity_stats' plain-SQL oracle."""
    for name, (kind, _col) in aggs.items():
        if kind not in _AGG_KINDS:
            raise ValueError(
                f"advised_agg: kind {kind!r} for {name!r} is not a "
                f"mergeable monoid ({sorted(_AGG_KINDS)}) — a salted "
                "two-phase plan could silently change its answer"
            )
    if advice is None:
        advice = advise_agg(
            fact, key, hot_share_threshold=hot_share_threshold
        )
    partials = [
        _AGG_KINDS[kind][0](col) for kind, col in aggs.values()
    ]
    if advice.strategy == "plain":
        return fact.groupBy(key).agg(
            *[e.alias(n) for n, e in zip(aggs, partials)]
        )
    # internal phase-1 column names must not collide with caller columns:
    # withColumn would silently REPLACE an existing `_salt` (changing the
    # default salt_on input and dropping the caller's column from phase-1
    # grouping) — reject loudly instead, like skew.py's reserved __salt
    # (r10 ADVICE)
    reserved = {"_salt"} | {f"_p_{n}" for n in aggs}
    clash = reserved & set(fact.columns)
    if clash:
        raise ValueError(
            f"advised_agg: fact columns {sorted(clash)} collide with the "
            "salted plan's internal names (_salt, _p_<agg>) — rename them "
            "or pass an explicit salt_on"
        )
    salt_cols = salt_on if salt_on is not None else fact.columns
    partial = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_cols), F.lit(salt_buckets))
    ).groupBy(key, "_salt").agg(
        *[e.alias(f"_p_{n}") for n, e in zip(aggs, partials)]
    )
    return partial.groupBy(key).agg(
        *[
            _AGG_KINDS[kind][1](f"_p_{name}").alias(name)
            for name, (kind, _col) in aggs.items()
        ]
    )


# --------------------------------------------------------------- windows
# The advisor's third leg (r10 verdict item 7): joins (r9) and
# aggregations (r10) close the audit→action loop for shuffles; windows
# are the remaining shuffle consumer, and their skew economics are the
# HARSHEST of the three.  A window's partition is ONE reducer task and
# — unlike aggregation — NO map-side partial exists to shrink it: every
# row of the hottest partition key lands in one task's sort buffer.
# The constant-cardinality window gate (tests/test_registry_contract.py,
# the r5 audit) FAILS bad windows; this advisor supplies the decision
# and advised_rank the rewrite the gate's offenders are told to use
# (the q_train_global_shuffle two-phase plan, generalized).


@dataclass(frozen=True)
class WindowAdvice:
    """advise_window's verdict plus the measurement it rests on."""

    strategy: str  # "plain" | "two_phase"
    hot_key: object  # hottest partition key
    hot_share: float  # its share of fact rows
    hot_share_threshold: float  # threshold used


def advise_window(
    fact: DataFrame,
    partition_key: str,
    *,
    hot_share_threshold: float = HOT_SHARE_THRESHOLD_DEFAULT,
) -> WindowAdvice:
    """Measure the hottest window-partition key's share of the fact
    rows (the same scale-free statistic the join and agg advisors use)
    and decide: ``two_phase`` when one partition would put >=
    ``hot_share_threshold`` of the corpus into a single window task
    (at 100 TB that task is share x corpus — it must be decomposed),
    else ``plain`` (Catalyst's windowed sort is right)."""
    hot_key, hot_share = fact_hot_share(fact, partition_key)
    strategy = (
        "two_phase" if hot_share >= hot_share_threshold else "plain"
    )
    return WindowAdvice(strategy, hot_key, hot_share, hot_share_threshold)


def advise_window_cached(
    fact: DataFrame,
    partition_key: str,
    *,
    cache_key,
    **kwargs,
) -> WindowAdvice:
    """Memoized advise_window — same contract (and same cache) as the
    join/agg variants, keyed on (caller token, partition column,
    kwargs)."""
    full_key = (
        "window", cache_key, partition_key, tuple(sorted(kwargs.items()))
    )
    if full_key not in _ADVICE_CACHE:
        _ADVICE_CACHE[full_key] = advise_window(
            fact, partition_key, **kwargs
        )
    return _ADVICE_CACHE[full_key]


def advised_rank(
    fact: DataFrame,
    partition_key: str,
    order_cols: list[str],
    bucket,
    *,
    rank_name: str = "rnk",
    ascending: bool = True,
    advice: WindowAdvice | None = None,
    hot_share_threshold: float = HOT_SHARE_THRESHOLD_DEFAULT,
    top_k: int | None = None,
) -> DataFrame:
    """``row_number() OVER (PARTITION BY partition_key ORDER BY
    order_cols ASC|DESC)`` as ``rank_name``, using the advised
    strategy (measured here unless a cached ``advice`` is passed):

    - ``plain``     → one window, Catalyst's pick;
    - ``two_phase`` → the q_train_global_shuffle decomposition,
      per-key: (1) histogram rows into ``bucket`` (a caller-supplied
      expression that must be monotone NON-DECREASING in the leading
      order column — rows of bucket b all sort before rows of bucket
      b+1 when ascending; the SAME bucket expression serves DESC, the
      prefix just accumulates from the other end), (2) rank WITHIN
      each (key, bucket) in parallel, (3) add the bucket's starting
      position from a per-key prefix sum over the (key, bucket)
      histogram — a bounded frame (keys x buckets rows), broadcast
      back.  No task ever sorts more than one bucket's slice of the
      hot key.

    ``ascending=False`` ranks 1 = largest, with Spark's DESC null
    placement (nulls last) in both plans: the bucket prefix orders
    buckets DESC nulls-last, mirroring how the NULL order values (→
    NULL bucket, by the bucket-expression contract) sort within the
    plain window.

    ``order_cols`` must be unique per partition (they define
    row_number's total order; with ties the two plans could rank
    differently — same caveat as any deterministic-rank SQL).  NULLs
    are first-class: the histogram join is NULL-safe, so NULL
    partition keys and NULL buckets rank exactly as the plain window
    ranks them (ASC = nulls first) — provided ``bucket`` maps a NULL
    leading order value to NULL (any expression arithmetic on the
    column does), which keeps the NULL bucket sorting before every
    numeric bucket just as NULL order values sort first.  The
    equivalence oracle q_advised_window_order_rank proves plans can
    differ, answers can't.

    ``top_k`` (optimization r13, guide §2.3 "shuffle fewer bytes"): a
    caller that will keep only rows with ``rank_name <= top_k`` can
    declare it here.  The returned frame then GUARANTEES every row
    whose rank is <= top_k (with identical rank values) but MAY omit
    rows ranked beyond it — so the caller's own ``rank <= top_k``
    filter yields identical results while both plans prune early:

    - plain: the filter sits directly above the window, so Catalyst
      inserts a partial WindowGroupLimit BELOW the exchange — each map
      task ships at most top_k rows per partition key instead of all
      of them;
    - two_phase: rows with within-bucket rank > top_k can never reach
      a final rank <= top_k (the bucket offset ``_w_off0`` is >= 0),
      so the same WindowGroupLimit prune applies per (key, bucket);
      and a bucket whose offset is already >= top_k contributes no
      qualifying rows, so the broadcast prefix drops those entries and
      the attach join discards such rows.

    At 100 TB a top-k report over a hot key otherwise shuffles the hot
    key's entire slice just to discard all but k rows of it."""
    reserved = {
        "_wbucket", "_w_r_in", "_w_off0", "_w_pk", "_w_bk", rank_name
    }
    clash = reserved & set(fact.columns)
    if clash:
        raise ValueError(
            f"advised_rank: fact columns {sorted(clash)} collide with "
            "the two-phase plan's internal names (_wbucket, _w_r_in, "
            "_w_off0, _w_pk, _w_bk) or the rank output — rename them"
        )
    if advice is None:
        advice = advise_window(
            fact, partition_key, hot_share_threshold=hot_share_threshold
        )
    from pyspark.sql import Window

    order = [
        F.col(c).asc() if ascending else F.col(c).desc()
        for c in order_cols
    ]
    if advice.strategy == "plain":
        w = Window.partitionBy(partition_key).orderBy(*order)
        ranked = fact.withColumn(rank_name, F.row_number().over(w))
        if top_k is not None:
            ranked = ranked.filter(F.col(rank_name) <= top_k)
        return ranked
    b = fact.withColumn("_wbucket", bucket)
    hist = b.groupBy(partition_key, "_wbucket").agg(
        F.count(F.lit(1)).alias("_w_n")
    )
    # per-key prefix over the HISTOGRAM (keys x buckets rows — the
    # bounded class), never over the corpus.  Bucket order mirrors the
    # row order exactly, including null placement (asc = nulls first,
    # desc = nulls last — Spark's defaults, which the plain window
    # also uses).
    bucket_order = (
        F.col("_wbucket").asc() if ascending else F.col("_wbucket").desc()
    )
    w_prefix = (
        Window.partitionBy(partition_key)
        .orderBy(bucket_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = hist.select(
        F.col(partition_key).alias("_w_pk"),
        F.col("_wbucket").alias("_w_bk"),
        F.coalesce(F.sum("_w_n").over(w_prefix), F.lit(0)).alias("_w_off0"),
    )
    if top_k is not None:
        # a bucket whose starting offset is already >= top_k cannot
        # contain a qualifying row (ranks in it start at _w_off0 + 1);
        # dropping its prefix entry makes the inner attach join discard
        # those rows — legal under the declared top_k contract
        prefix = prefix.filter(F.col("_w_off0") < top_k)
    w_in = Window.partitionBy(partition_key, "_wbucket").orderBy(*order)
    ranked_in = b.withColumn("_w_r_in", F.row_number().over(w_in))
    if top_k is not None:
        # rnk = _w_off0 + _w_r_in with _w_off0 >= 0, so rnk <= top_k
        # requires _w_r_in <= top_k; the filter directly above the
        # window makes Catalyst insert a partial WindowGroupLimit
        # below the (key, bucket) exchange — map tasks ship at most
        # top_k rows per group
        ranked_in = ranked_in.filter(F.col("_w_r_in") <= top_k)
    # NULL-safe join back: a plain equi-join would silently DROP rows
    # whose partition key or bucket is NULL (NULL never equals NULL),
    # letting the measured strategy change row counts, not just plans
    # (review r11).  The histogram keeps NULL groups; so must the join.
    return (
        ranked_in
        .join(
            F.broadcast(prefix),
            F.col(partition_key).eqNullSafe(F.col("_w_pk"))
            & F.col("_wbucket").eqNullSafe(F.col("_w_bk")),
        )
        .withColumn(
            rank_name,
            (F.col("_w_off0") + F.col("_w_r_in")).cast("int"),
        )
        .drop("_wbucket", "_w_r_in", "_w_off0", "_w_pk", "_w_bk")
    )
