"""Corpus-quality gates, round 3: vocabulary OOV rate and the
compression-ratio repetition filter — two of the standard
Gopher/CCNet-family heuristics not yet in the quality family
(q_text_quality covers length/punct/stopword ratios; entropy and
repetition-score cover character statistics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
