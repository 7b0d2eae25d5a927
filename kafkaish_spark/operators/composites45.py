"""Round-7 wave: corpus cleaning gates and training-prep plans from the
public LLM-data literature, each as an oracle-paired batch operator.

- Gopher quality rules (Rae et al. 2021, §A1.1): the word-count,
  mean-word-length, stopword, and repetition gates — the rule suite
  every web-corpus cleaner reimplements, reported per source;
- Flesch reading ease (Flesch 1948) as a per-language macro score on
  exact corpus totals — the readability lens of a quality dashboard;
- FIM transformation plan (Bavarian et al. 2022, "Efficient Training
  of Language Models to Fill in the Middle"): the prefix/middle/suffix
  split schedule as deterministic per-doc hash draws (house
  seeded-md5 pattern), PSM/SPM mixed 50/50 at a 7/8 FIM rate;
- embedding-space decontamination (the semantic sibling of
  q_decontaminate_ngram; cf. Lee et al. 2022 / GPT-3 appendix C
  dedup-against-benchmarks): max cosine of every training vector
  against a small benchmark set, flagged above a threshold;
- Wilson lower-bound source ranking (Wilson 1927; the "how not to
  sort by average rating" estimator): rank sources by the 95% lower
  confidence bound of their quality-gate pass rate, so a 25-doc
  source can't outrank a large one on luck;
- Cohen's kappa (Cohen 1960) between two cleaning gates — the
  gate-agreement audit that says whether two filters are redundant.

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB, src/topic.js) computes none of these — [NS] north-star
extensions per SURVEY.md §2.4.  House exactness rules: counts are
exact BIGINTs; rule thresholds compare on integer cross-products
(never a float ratio); the only float expressions are single fixed
IEEE formulas over exact integer aggregates; cosine uses the
sequential-fold vector kernel (bit-identical to DuckDB's list fold);
hash draws are seeded md5 digits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.functions.vectors import cosine_sim
from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# --------------------------------------------------------- Gopher rules
# Thresholds from Rae et al. 2021 §A1.1 where computable on this
# corpus (word count 50..100k, mean word length 3..10, >=2 distinct
# stopwords), plus a top-word-dominance repetition gate at 15%
# (calibrated: ~p90 of this corpus's max-word share).
_STOPWORDS = ("the", "a", "of", "to", "and")


@query(
    "q_text_gopher_rules",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents),
    dom AS (
      SELECT doc_id, MAX(k) AS maxk FROM (
        SELECT doc_id, word, COUNT(*) AS k FROM w GROUP BY doc_id, word)
      GROUP BY doc_id),
    flags AS (
      SELECT d.source,
             len(string_split(d.text, ' ')) AS nw,
             length(d.text) - (len(string_split(d.text, ' ')) - 1) AS sumlen,
             len(list_intersect(list_distinct(string_split(d.text, ' ')),
                 [{', '.join("'" + s + "'" for s in _STOPWORDS)}])) AS nstop,
             dom.maxk
      FROM documents d JOIN dom ON d.doc_id = dom.doc_id)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(count_if(nw < 50 OR nw > 100000) AS BIGINT)
             AS fail_word_count,
           CAST(count_if(sumlen < 3 * nw OR sumlen > 10 * nw) AS BIGINT)
             AS fail_mean_word_len,
           CAST(count_if(nstop < 2) AS BIGINT) AS fail_stopwords,
           CAST(count_if(maxk * 20 > nw * 3) AS BIGINT) AS fail_repetition,
           CAST(count_if(NOT (nw < 50 OR nw > 100000)
                         AND NOT (sumlen < 3 * nw OR sumlen > 10 * nw)
                         AND nstop >= 2
                         AND NOT (maxk * 20 > nw * 3)) AS BIGINT) AS n_pass
    FROM flags GROUP BY source
    """,
)
def q_text_gopher_rules(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher quality-rule audit per source (Rae et al. 2021 §A1.1):
    word count in [50, 100k], mean word length in [3, 10], at least two
    distinct stopwords present, and no single word above 15% of the
    doc's tokens (the repetition gate) — with per-source fail counts
    per rule and the count passing all four, i.e. the crawl-cleaning
    report that decides which sources need re-filtering.

    Scale (100 TB): three of the four rules are pure projections over
    one scan (split/length/array_intersect — codegen, no shuffle); the
    repetition gate is the only one needing token state, computed as
    explode -> (doc, word) partial-count -> per-doc max — two linear
    hash shuffles keyed on doc_id, never a collect, never a window
    over the corpus.  Exactness: every threshold is an integer
    cross-product compare (maxk*20 > nw*3, sumlen < 3*nw), so no float
    enters any rule."""
    d = t(spark, sf, "documents")
    words = F.split(F.col("text"), " ")
    dom = (
        d.select("doc_id", F.explode(words).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("k"))
        .groupBy("doc_id")
        .agg(F.max("k").alias("maxk"))
    )
    flags = (
        d.select(
            "doc_id",
            "source",
            F.size(words).alias("nw"),
            (F.length("text") - (F.size(words) - F.lit(1))).alias("sumlen"),
            F.size(
                F.array_intersect(
                    F.array_distinct(words),
                    F.array(*[F.lit(s) for s in _STOPWORDS]),
                )
            ).alias("nstop"),
        )
        .join(dom, "doc_id")
    )
    f_wc = (F.col("nw") < 50) | (F.col("nw") > 100000)
    f_ml = (F.col("sumlen") < 3 * F.col("nw")) | (
        F.col("sumlen") > 10 * F.col("nw")
    )
    f_sw = F.col("nstop") < 2
    f_rep = F.col("maxk") * 20 > F.col("nw") * 3
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_if(f_wc).cast("long").alias("fail_word_count"),
        F.count_if(f_ml).cast("long").alias("fail_mean_word_len"),
        F.count_if(f_sw).cast("long").alias("fail_stopwords"),
        F.count_if(f_rep).cast("long").alias("fail_repetition"),
        F.count_if(~f_wc & ~f_ml & ~f_sw & ~f_rep)
        .cast("long")
        .alias("n_pass"),
    )


# ------------------------------------------------------ Flesch macro
@query(
    "q_text_flesch_readability",
    oracle="""
    WITH agg AS (
      SELECT lang,
             COUNT(*) AS d,
             SUM(len(string_split(text, ' '))) AS w,
             SUM(len(regexp_extract_all(text, '[aeiouy]+'))) AS s
      FROM documents GROUP BY lang)
    SELECT lang,
           CAST(d AS BIGINT) AS n_docs,
           CAST(w AS BIGINT) AS n_words,
           CAST(s AS BIGINT) AS n_syllables,
           round(206.835 - 1.015 * (w / d) - 84.6 * (s / w), 6)
             AS flesch_macro
    FROM agg
    """,
)
def q_text_flesch_readability(spark: SparkSession, sf: str) -> DataFrame:
    """Flesch reading ease per language as a MACRO score on exact
    corpus totals: 206.835 - 1.015*(words/sentences) - 84.6*
    (syllables/words), with syllables counted as vowel groups
    ([aeiouy]+ runs — the standard heuristic) and sentences = docs
    (this corpus has no terminal punctuation).  Computing the formula
    once on lang-level integer totals instead of averaging per-doc
    floats keeps the result an exact-int -> two-IEEE-divisions
    expression — no float summation order anywhere (house ordered-fold
    rule made moot).

    Scale: one projection (split + regexp_extract_all are codegen) and
    one 5-group rollup with map-side partials — a linear scan."""
    d = t(spark, sf, "documents")
    agg = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("d"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("w"),
        F.sum(
            F.size(F.regexp_extract_all("text", F.lit("[aeiouy]+"), 0))
        ).alias("s"),
    )
    return agg.select(
        "lang",
        F.col("d").cast("long").alias("n_docs"),
        F.col("w").cast("long").alias("n_words"),
        F.col("s").cast("long").alias("n_syllables"),
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (F.col("w") / F.col("d"))
            - F.lit(84.6) * (F.col("s") / F.col("w")),
            6,
        ).alias("flesch_macro"),
    )


# ----------------------------------------------------------- FIM plan
_FIM_SEED = "fim-v1"


@query(
    "q_text_fim_plan",
    oracle=f"""
    WITH base AS (
      SELECT lang,
             len(string_split(text, ' ')) AS nw,
             md5('{_FIM_SEED}' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents),
    draws AS (
      SELECT lang, nw,
             substr(h, 1, 1) NOT IN ('e', 'f') AS apply_fim,
             substr(h, 2, 1) IN ('0','1','2','3','4','5','6','7') AS psm,
             CAST(('0x' || substr(h, 3, 4)) AS BIGINT) % (nw + 1) AS c1,
             CAST(('0x' || substr(h, 7, 4)) AS BIGINT) % (nw + 1) AS c2
      FROM base),
    plan AS (
      SELECT lang,
             CASE WHEN NOT apply_fim THEN 'none'
                  WHEN psm THEN 'psm' ELSE 'spm' END AS fim_mode,
             CASE WHEN apply_fim THEN least(c1, c2) ELSE nw END AS p,
             CASE WHEN apply_fim THEN greatest(c1, c2) - least(c1, c2)
                  ELSE 0 END AS m,
             CASE WHEN apply_fim THEN nw - greatest(c1, c2) ELSE 0 END AS s
      FROM draws)
    SELECT lang, fim_mode,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p) AS BIGINT) AS sum_prefix_words,
           CAST(SUM(m) AS BIGINT) AS sum_middle_words,
           CAST(SUM(s) AS BIGINT) AS sum_suffix_words
    FROM plan GROUP BY lang, fim_mode
    """,
)
def q_text_fim_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Fill-in-the-middle transformation plan (Bavarian et al. 2022):
    each doc draws — deterministically, from seeded md5 digits, the
    house pattern — whether it is FIM-transformed (7/8 rate: first hex
    digit not in {{e,f}}), PSM vs SPM mode (second digit, 50/50), and
    two uniform cut positions over its word count (two 4-hex-digit
    draws mod nw+1); the plan reports per (lang, mode) doc counts and
    the exact prefix/middle/suffix word budgets.  Stating the plan as
    data (not an RNG side effect) is what makes the transformation
    reproducible shard-by-shard at 100 TB and auditable against the
    paper's nominal rates.

    Scale: a pure projection (md5 + substr + conv are codegen) and one
    ~15-group rollup with map-side partials — one linear scan, no
    shuffle wider than the group count.  Exactness: draws are string
    comparisons and integer mods; budgets are exact BIGINT sums."""
    d = t(spark, sf, "documents")
    nw = F.size(F.split(F.col("text"), " "))
    h = F.md5(F.concat(F.lit(_FIM_SEED), F.col("doc_id").cast("string")))
    base = d.select(
        "lang",
        nw.alias("nw"),
        (~F.substring(h, 1, 1).isin("e", "f")).alias("apply_fim"),
        F.substring(h, 2, 1).isin(*list("01234567")).alias("psm"),
        (
            F.conv(F.substring(h, 3, 4), 16, 10).cast("long")
            % (nw + F.lit(1))
        ).alias("c1"),
        (
            F.conv(F.substring(h, 7, 4), 16, 10).cast("long")
            % (nw + F.lit(1))
        ).alias("c2"),
    )
    lo, hi = F.least("c1", "c2"), F.greatest("c1", "c2")
    plan = base.select(
        "lang",
        F.when(~F.col("apply_fim"), F.lit("none"))
        .when(F.col("psm"), F.lit("psm"))
        .otherwise(F.lit("spm"))
        .alias("fim_mode"),
        F.when(F.col("apply_fim"), lo).otherwise(F.col("nw")).alias("p"),
        F.when(F.col("apply_fim"), hi - lo).otherwise(F.lit(0)).alias("m"),
        F.when(F.col("apply_fim"), F.col("nw") - hi)
        .otherwise(F.lit(0))
        .alias("s"),
    )
    return plan.groupBy("lang", "fim_mode").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("p").cast("long").alias("sum_prefix_words"),
        F.sum("m").cast("long").alias("sum_middle_words"),
        F.sum("s").cast("long").alias("sum_suffix_words"),
    )


# ------------------------------------------- embedding decontamination
_DECON_BENCH_MAX = 25  # vec_id < 25 plays the benchmark/eval set
_DECON_TAU = 0.35  # ~p95 of this corpus's max-cos distribution
_DOT = (
    "list_reduce(list_transform(list_zip(CAST({a} AS DOUBLE[]),"
    " CAST({b} AS DOUBLE[])), s -> s[1] * s[2]), (x, y) -> x + y)"
)


@query(
    "q_decontaminate_embedding",
    oracle=f"""
    WITH bench AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id < {_DECON_BENCH_MAX}),
    train AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id >= {_DECON_BENCH_MAX}),
    pairs AS (
      SELECT train.vec_id,
             {_DOT.format(a='train.embedding', b='bench.embedding')}
             / (sqrt({_DOT.format(a='train.embedding', b='train.embedding')})
                * sqrt({_DOT.format(a='bench.embedding', b='bench.embedding')}))
               AS cos
      FROM train, bench)
    SELECT vec_id,
           round(MAX(cos), 6) AS max_cos,
           CAST(MAX(cos) >= {_DECON_TAU} AS BIGINT) AS contaminated
    FROM pairs GROUP BY vec_id
    """,
)
def q_decontaminate_embedding(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic
    sibling of q_decontaminate_ngram (surface overlap misses
    paraphrases; cf. the GPT-3 appendix-C and Lee et al. 2022
    contamination discussions): every training vector's max cosine
    against the benchmark set (vec_id < {_DECON_BENCH_MAX} plays the
    held-out eval suite), flagged at tau = {_DECON_TAU} (~p95 here).

    Scale (100 TB): the benchmark side is small and FIXED (eval suites
    are thousands of rows, not corpus-sized), so the plan is a
    broadcast nested-loop join — linear in the training corpus, the
    same documented-correct shape as q_sim_topk_embeddings — followed
    by one hash aggregate on vec_id.  At larger eval suites the LSH
    bucket path (q_sim_ann_lsh) swaps in as the candidate generator.
    Exactness: each cosine is the sequential-fold kernel
    (bit-identical to DuckDB's list_reduce), max over bit-exact floats
    is order-independent, and the flag compares the UNROUNDED max."""
    e = t(spark, sf, "embeddings")
    bench = e.filter(F.col("vec_id") < _DECON_BENCH_MAX).select(
        F.col("embedding").alias("be")
    )
    train = e.filter(F.col("vec_id") >= _DECON_BENCH_MAX).select(
        "vec_id", F.col("embedding").alias("te")
    )
    pairs = train.join(F.broadcast(bench)).select(
        "vec_id", cosine_sim(F.col("te"), F.col("be")).alias("cos")
    )
    return pairs.groupBy("vec_id").agg(
        F.round(F.max("cos"), 6).alias("max_cos"),
        (F.max("cos") >= F.lit(_DECON_TAU)).cast("long").alias("contaminated"),
    )


# ------------------------------------------------- Wilson source rank
_WILSON_Z, _WILSON_Z2 = 1.96, 3.8416  # z and z^2 as exact literals


@query(
    "q_source_quality_wilson",
    oracle=f"""
    WITH g AS (
      SELECT source,
             COUNT(*) AS n,
             count_if(len(list_intersect(
               list_distinct(string_split(text, ' ')),
               [{', '.join("'" + s + "'" for s in _STOPWORDS)}])) >= 2) AS k
      FROM documents GROUP BY source),
    scored AS (
      SELECT source, n, k,
             ((k / n) + {_WILSON_Z2} / (2 * n)
              - {_WILSON_Z} * sqrt(((k / n) * (1.0 - (k / n))
                                    + {_WILSON_Z2} / (4 * n)) / n))
             / (1.0 + {_WILSON_Z2} / n) AS w
      FROM g)
    SELECT source,
           CAST(n AS BIGINT) AS n_docs,
           CAST(k AS BIGINT) AS n_pass,
           round(w, 6) AS wilson_lb,
           CAST(ROW_NUMBER() OVER (ORDER BY w DESC, source) AS BIGINT)
             AS quality_rank
    FROM scored
    """,
)
def q_source_quality_wilson(spark: SparkSession, sf: str) -> DataFrame:
    """Source quality ranking by the Wilson 95% lower confidence bound
    (Wilson 1927 — the "how not to sort by average rating" estimator)
    of each source's pass rate on the stopword gate: a source with 10
    lucky docs can't outrank one with 10k solid docs, which is exactly
    the property a crawl-budget allocator needs.

    Scale: one linear scan -> per-source exact (n, k) rollup with
    map-side partials; the scoring formula and the ranking window run
    over #sources rows (a constant-size frame after aggregation — the
    documented-safe window class).  Exactness: (n, k) are exact
    BIGINTs; the bound is ONE fixed IEEE expression with literal
    z/z^2, written identically in both engines; the rank orders
    bit-identical doubles with a source-name tiebreak."""
    d = t(spark, sf, "documents")
    passes = (
        F.size(
            F.array_intersect(
                F.array_distinct(F.split(F.col("text"), " ")),
                F.array(*[F.lit(s) for s in _STOPWORDS]),
            )
        )
        >= 2
    )
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.count_if(passes).alias("k")
    )
    phat = F.col("k") / F.col("n")
    w = (
        phat
        + F.lit(_WILSON_Z2) / (2 * F.col("n"))
        - F.lit(_WILSON_Z)
        * F.sqrt(
            (phat * (F.lit(1.0) - phat) + F.lit(_WILSON_Z2) / (4 * F.col("n")))
            / F.col("n")
        )
    ) / (F.lit(1.0) + F.lit(_WILSON_Z2) / F.col("n"))
    scored = g.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.col("k").cast("long").alias("n_pass"),
        w.alias("w"),
    )
    return scored.select(
        "source",
        "n_docs",
        "n_pass",
        F.round("w", 6).alias("wilson_lb"),
        F.row_number()
        .over(Window.orderBy(F.col("w").desc(), F.col("source")))
        .cast("long")
        .alias("quality_rank"),
    )


# --------------------------------------------------- gate agreement
@query(
    "q_gate_agreement_kappa",
    oracle=f"""
    WITH flags AS (
      SELECT len(string_split(text, ' ')) >= 50 AS ga,
             len(list_intersect(list_distinct(string_split(text, ' ')),
                 [{', '.join("'" + s + "'" for s in _STOPWORDS)}])) >= 2 AS gb
      FROM documents),
    c AS (
      SELECT count_if(ga AND gb) AS n11,
             count_if(ga AND NOT gb) AS n10,
             count_if(NOT ga AND gb) AS n01,
             count_if(NOT ga AND NOT gb) AS n00,
             COUNT(*) AS n
      FROM flags)
    SELECT CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
           CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
           round((n11 + n00) / n, 6) AS p_observed,
           round(((n11 + n10) * (n11 + n01)
                  + (n01 + n00) * (n10 + n00)) / (n * n), 6) AS p_expected,
           round(((n11 + n00) / n
                  - ((n11 + n10) * (n11 + n01)
                     + (n01 + n00) * (n10 + n00)) / (n * n))
                 / (1.0 - ((n11 + n10) * (n11 + n01)
                           + (n01 + n00) * (n10 + n00)) / (n * n)), 6)
             AS kappa
    FROM c
    """,
)
def q_gate_agreement_kappa(spark: SparkSession, sf: str) -> DataFrame:
    """Cohen's kappa (Cohen 1960) between two cleaning gates — the
    length gate (>= 50 words) and the stopword gate (>= 2 distinct
    stopwords) — treating each gate as an annotator over the corpus:
    kappa near 1 means the second gate is redundant, near 0 means it
    carries independent signal.  The agreement audit a filter-stack
    owner runs before paying for another pass.

    Scale: both flags are projections over ONE scan; the 2x2 confusion
    is a single global aggregate of four count_ifs (map-side partials,
    one scalar finalize).  Exactness: cells are exact BIGINTs; po, pe,
    kappa are fixed IEEE expressions on those ints (the n*n product
    stays well inside int64 up to ~3e9 docs; past that, cast the
    moments to decimal)."""
    d = t(spark, sf, "documents")
    words = F.split(F.col("text"), " ")
    ga = F.size(words) >= 50
    gb = (
        F.size(
            F.array_intersect(
                F.array_distinct(words),
                F.array(*[F.lit(s) for s in _STOPWORDS]),
            )
        )
        >= 2
    )
    c = d.agg(
        F.count_if(ga & gb).alias("n11"),
        F.count_if(ga & ~gb).alias("n10"),
        F.count_if(~ga & gb).alias("n01"),
        F.count_if(~ga & ~gb).alias("n00"),
        F.count(F.lit(1)).alias("n"),
    )
    po = (F.col("n11") + F.col("n00")) / F.col("n")
    pe = (
        (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00"))
    ) / (F.col("n") * F.col("n"))
    return c.select(
        F.col("n11").cast("long").alias("n11"),
        F.col("n10").cast("long").alias("n10"),
        F.col("n01").cast("long").alias("n01"),
        F.col("n00").cast("long").alias("n00"),
        F.round(po, 6).alias("p_observed"),
        F.round(pe, 6).alias("p_expected"),
        F.round((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
    )
