"""In-flight pipeline metrics via the Observation API — counts and
aggregates collected DURING an action, not by re-scanning.

The anti-pattern at 100 TB is the post-write audit pass: write the
corpus, then run `count()` / null-rate queries over what was just
written — a second full scan that can double a pipeline's cost.
`df.observe()` attaches named aggregate expressions to the plan; Spark
accumulates them on the executors WHILE the main action runs and
delivers the result to the driver when the action finishes.  Zero
extra jobs, zero extra scans, exact values (unlike accumulators,
observed metrics are computed exactly once per row even under task
retries — they ride the successful task set).

The reference has no write-path observability at all (publish fires a
callback per message, src/topic.js:25-40, and that's it); this is the
batch twin of streaming/monitor.py's listener metrics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str, **metrics: Column):
    """Attach named metric expressions to ``df``.  Returns
    ``(df2, observation)``; after the FIRST action on ``df2`` (a write,
    a count, a collect), ``observation.get`` holds the metric dict.

    >>> df2, obs = observed(df, "ingest",
    ...     n=F.count(F.lit(1)),
    ...     null_text=F.sum(F.col("text").isNull().cast("long")))
    >>> df2.write.parquet(path)
    >>> obs.get  # {'n': ..., 'null_text': ...} — no second scan
    """
    obs = Observation(name)
    return df.observe(obs, *[c.alias(k) for k, c in metrics.items()]), obs


def corpus_write_audit(df: DataFrame, path: str, text_col: str = "text"):
    """Write ``df`` as parquet and return the standard corpus-ingest
    audit — rows, null/empty text, total characters — measured inside
    the write job itself (one scan total).

    This is the shape every 100 TB ingest step should end with: the
    numbers a quarantine dashboard needs, at the cost of zero extra
    passes."""
    tc = F.col(text_col)
    df2, obs = observed(
        df,
        "corpus_write_audit",
        n_rows=F.count(F.lit(1)),
        n_null_text=F.sum(tc.isNull().cast("long")),
        n_empty_text=F.sum((F.length(tc) == 0).cast("long")),
        sum_chars=F.sum(F.coalesce(F.length(tc), F.lit(0))),
    )
    df2.write.mode("overwrite").parquet(path)
    return dict(obs.get)
