"""Skew mitigation for joins on hot keys.

AQE's skew-join split (enabled in session.py) handles most cases at
runtime by splitting oversized shuffle partitions.  ``salted_join`` is
the explicit fallback for the pathological shape AQE can't fix: a
*single* join key so hot that even one split of it overwhelms a task
(the classic null-key / celebrity-user / default-value skew at 100 TB).

Mechanics: the fact side gets a uniform random-ish salt in [0, S);
the dimension side is exploded S times (one row per salt value); the
join key becomes (key, salt), spreading one hot key over S tasks.
Dimension blow-up is S×, so use it only when the dimension is small
relative to the fact side — exactly the situation where skew hurts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    how: str = "inner",
    salt_buckets: int = 16,
    dim_hint: str | None = None,
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on column ``on``, salting the key
    across ``salt_buckets`` shuffle partitions per value.

    The salt mixes the row hash with the row's position
    (monotonically_increasing_id), so even FULLY IDENTICAL duplicate
    rows — the common hot-key shape — spread across buckets; position
    is deterministic for a deterministic input, so retries stay
    consistent (unlike rand()).

    ``dim_hint`` (e.g. ``"merge"``/``"shuffle_hash"``) pins the join
    strategy on the exploded dimension: salting only matters in the
    SHUFFLE-join regime (a broadcastable dim has no skew problem — the
    fact side never shuffles), so a demonstration or a pipeline that
    knows its dim will exceed the broadcast threshold at production
    scale declares the shuffle strategy instead of letting a small test
    sf broadcast the problem away.

    Supported ``how``: fact-preserving joins only (inner, left/
    left_outer, left_semi, left_anti) — each fact row carries exactly
    ONE salt, so these are equivalent to the plain join (property-
    tested).  right/full would keep every unmatched DIM row once per
    salt replica (salt_buckets duplicates), so they are rejected
    loudly instead of returning silently wrong results."""
    allowed = {"inner", "left", "leftouter", "left_outer",
               "semi", "leftsemi", "left_semi",
               "anti", "leftanti", "left_anti"}
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in allowed
    }:
        raise ValueError(
            f"salted_join: how={how!r} is not fact-preserving — the "
            f"exploded dim side would duplicate unmatched rows "
            f"{salt_buckets}x; use one of {sorted(allowed)} or a plain "
            "join for right/full outer"
        )
    fact_salted = fact.withColumn(
        _SALT,
        F.pmod(
            F.xxhash64(F.monotonically_increasing_id(), *[F.col(c) for c in fact.columns]),
            F.lit(salt_buckets),
        ),
    )
    dim_exploded = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    if dim_hint is not None:
        dim_exploded = dim_exploded.hint(dim_hint)
    out = fact_salted.join(dim_exploded, [on, _SALT], how)
    return out.drop(_SALT)
