"""Raw-text ingestion connectors: JSONL and CSV -> DataFrame, with the
corrupt-record hygiene a crawl-scale pipeline needs on day one.

The reference consumes only its own MongoDB collections; a training-data
pipeline's raw inputs are JSON-lines and CSV drops long before they are
parquet.  These helpers wrap ``spark.read.json`` / ``spark.read.csv``
with the contracts that matter at 100 TB:

- **Explicit schema, always.**  Schema inference is a FULL extra pass
  over the data before the real read (2x I/O on the largest files the
  pipeline will ever touch, since raw text predates columnar pruning);
  every entry point here requires a DDL schema string.
- **PERMISSIVE + corrupt-record column.**  A bad line must become an
  auditable row, not a dead executor: malformed records land in
  ``_corrupt_record`` and flow to a quarantine count, so ingest is
  all-or-something rather than all-or-nothing.  (DROPMALFORMED silently
  shrinks the corpus — the one thing a data pipeline must never do.)
- **Text formats split by line**, so a 1 TB JSONL file still reads with
  full parallelism (``spark.sql.files.maxPartitionBytes`` chunks it);
  only multiLine CSV degrades to one task per file, which is why the
  CSV writer here never emits embedded newlines unescaped.

Round-trip queries (documents -> JSONL/CSV -> DataFrame -> exact
aggregate vs the parquet-native oracle) prove losslessness end-to-end, and
the corrupt-line audit proves the quarantine path with a deterministic
10% fault injection.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

# Scratch space for the round-trip fixtures: inside the repo (the
# testdata tree is read-only) and gitignored.  Keyed by sf basename so
# scales never cross; rewritten with mode=overwrite so reruns are
# idempotent.
_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
    "ingest",
)


def _scratch(sf: str, kind: str) -> str:
    return os.path.join(_SCRATCH, os.path.basename(sf.rstrip("/")), kind)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str | None = "_corrupt_record",
) -> DataFrame:
    """JSON-lines -> DataFrame with an explicit schema (never inferred;
    see module docstring) and PERMISSIVE corrupt-record capture: rows
    that fail to parse come back with every data column null and the
    raw line in ``corrupt_col`` for quarantine accounting."""
    reader = spark.read
    if corrupt_col is not None:
        schema = f"{schema}, {corrupt_col} string"
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    return reader.schema(schema).json(path)


# Line-break encoding for the CSV path.  multiLine CSV cannot split
# inside a file (one task per file at 100 TB), so embedded newlines are
# percent-encoded on write and decoded on read instead: % -> %25,
# \n -> %0A, \r -> %0D.  Exactly reversible: in encoded text every '%'
# starts one of %25/%0A/%0D, and the ones starting %0A/%0D are
# precisely the encoded line breaks (a literal "%0A" in the source
# becomes "%250A", which contains no '%' directly before "0A"), so
# decoding %0A/%0D first and %25 last reconstructs the original
# byte-for-byte.


def _encode_linebreaks(col):
    c = F.regexp_replace(col, "%", "%25")
    c = F.regexp_replace(c, "\n", "%0A")
    return F.regexp_replace(c, "\r", "%0D")


def _decode_linebreaks(col):
    c = F.regexp_replace(col, "%0A", "\n")
    c = F.regexp_replace(c, "%0D", "\r")
    return F.regexp_replace(c, "%25", "%")


def _map_string_cols(df: DataFrame, fn, skip: tuple = ()) -> DataFrame:
    cols = []
    for f in df.schema.fields:
        if f.dataType.simpleString() == "string" and f.name not in skip:
            cols.append(fn(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    corrupt_col: str | None = "_corrupt_record",
    decode_linebreaks: bool = False,
) -> DataFrame:
    """CSV -> DataFrame: explicit schema, RFC-4180 quoting (quote-doubling
    escape, so quoted fields round-trip), PERMISSIVE corrupt capture.
    No multiLine: multiLine CSV cannot split inside a file — one task
    per file is the difference between minutes and a day at 100 TB.
    Set ``decode_linebreaks=True`` when the data was written by
    ``write_csv`` (which percent-encodes embedded line breaks) to get
    the original text back byte-for-byte; leave it False for external
    CSV drops, whose literal %0A sequences must survive untouched."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("quote", '"')
        .option("escape", '"')
    )
    if corrupt_col is not None:
        schema = f"{schema}, {corrupt_col} string"
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    out = reader.schema(schema).csv(path)
    if decode_linebreaks:
        out = _map_string_cols(
            out, _decode_linebreaks, skip=(corrupt_col,) if corrupt_col else ()
        )
    return out


def write_jsonl(df: DataFrame, path: str) -> None:
    """DataFrame -> JSON-lines, one object per line (Spark's json sink),
    overwrite mode.  JSON string escaping makes this lossless for any
    text content including newlines and quotes."""
    df.write.mode("overwrite").json(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True,
    encode_linebreaks: bool = True,
) -> None:
    """DataFrame -> CSV with RFC-4180 quote-doubling so quotes/commas
    round-trip through read_csv, and (by default) percent-encoded line
    breaks in every string column so newline-bearing text survives the
    single-line read path too — Spark's writer would otherwise quote
    raw newlines, which a multiLine=false reader routes to
    ``_corrupt_record`` (round-3 ADVICE item 3).  Pair with
    ``read_csv(..., decode_linebreaks=True)`` for a lossless cycle."""
    if encode_linebreaks:
        df = _map_string_cols(df, _encode_linebreaks)
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


# The fidelity fingerprint both round-trip queries aggregate on each
# side of the write/read cycle: counts and exact integer sums that pin
# key columns AND text content (length sum + first-char codepoint sum —
# a one-char corruption anywhere moves at least one of them).
def _fingerprint(df: DataFrame, key: str) -> DataFrame:
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum(F.length("text")).alias("sum_chars"),
        F.sum(F.ascii(F.substring("text", 1, 1)).cast("long")).alias(
            "sum_first_cp"
        ),
        F.sum("n_chars").alias("sum_n_chars"),
    )


_FINGERPRINT_SQL = """
    SELECT {key},
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
           CAST(SUM(ascii(substring(text, 1, 1))) AS BIGINT) AS sum_first_cp,
           CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
    FROM documents GROUP BY {key}
"""


@query(
    "q_ingest_jsonl_roundtrip",
    oracle=_FINGERPRINT_SQL.format(key="lang"),
)
def q_ingest_jsonl_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """documents -> JSONL on disk -> read_jsonl -> per-lang fidelity
    fingerprint; the oracle computes the same fingerprint straight from
    the parquet table, so a match proves the JSONL cycle is lossless
    (and that no line was quarantined: corrupt rows would null the data
    columns and shift every sum).  The write is a real multi-file
    Spark json sink, the read a schema-explicit line-split scan — the
    exact shape of a crawl-dump ingest at scale."""
    d = t(spark, sf, "documents")
    path = _scratch(sf, "jsonl")
    write_jsonl(d, path)
    back = read_jsonl(spark, path, DOCS_SCHEMA)
    return _fingerprint(back.filter(F.col("_corrupt_record").isNull()), "lang")


@query(
    "q_ingest_csv_roundtrip",
    oracle=_FINGERPRINT_SQL.format(key="source"),
)
def q_ingest_csv_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """documents -> CSV (RFC-4180 quoting) -> read_csv -> per-source
    fidelity fingerprint vs the parquet oracle.  CSV is the lossy-est
    common raw format (quoting, empty-vs-null ambiguity), which is why
    the fingerprint sums text content, not just row counts."""
    d = t(spark, sf, "documents")
    path = _scratch(sf, "csv")
    write_csv(d, path)
    back = read_csv(spark, path, DOCS_SCHEMA, decode_linebreaks=True)
    return _fingerprint(
        back.filter(F.col("_corrupt_record").isNull()), "source"
    )


@query(
    "q_ingest_corrupt_jsonl_audit",
    oracle="""
    SELECT CAST(SUM(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quarantined,
           CAST(SUM(CASE WHEN doc_id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_parsed,
           CAST(SUM(CASE WHEN doc_id % 10 <> 0 THEN n_chars END) AS BIGINT)
             AS sum_n_chars
    FROM documents
    """,
)
def q_ingest_corrupt_jsonl_audit(spark: SparkSession, sf: str) -> DataFrame:
    """The quarantine path, fault-injected: every doc_id % 10 == 0 line
    is written as deliberately broken JSON, the rest as valid objects;
    PERMISSIVE read must route EXACTLY the broken lines to
    ``_corrupt_record`` (nothing lost, nothing extra) and parse the
    rest intact.  The oracle derives the same counts from the clean
    table, so any parser drift (a good line rejected, a bad one
    half-parsed) mismatches.  This is the ingest property that keeps a
    100 TB crawl load all-or-something: malformed input becomes an
    audited row count, never a job failure or a silent drop."""
    d = t(spark, sf, "documents")
    line = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(F.lit('{"broken": '), F.col("doc_id").cast("string")),
    ).otherwise(F.to_json(F.struct("doc_id", "lang", "n_chars")))
    path = _scratch(sf, "jsonl_corrupt")
    d.select(line.alias("value")).write.mode("overwrite").text(path)
    back = read_jsonl(spark, path, "doc_id long, lang string, n_chars long")
    bad = F.col("_corrupt_record").isNotNull()
    return back.agg(
        F.sum(bad.cast("long")).alias("n_quarantined"),
        F.sum((~bad).cast("long")).alias("n_parsed"),
        F.sum(F.when(~bad, F.col("n_chars"))).alias("sum_n_chars"),
    )


@query(
    "q_ingest_schema_evolution",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_missing_source,
           CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
             AS sum_n_chars_new,
           CAST(SUM(length(text)) AS BIGINT) AS sum_chars
    FROM documents
    """,
)
def q_ingest_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """Schema evolution across ingest batches — the other thing raw
    drops do besides corrupt lines: batch 1 (even doc_ids) was written
    BEFORE the pipeline tracked source/n_chars, batch 2 (odd) after.
    ``mergeSchema`` unions the parquet footers so old rows surface the
    new columns as nulls instead of failing the read, and the audit
    counts exactly how much of the corpus predates each column (the
    backfill planning number).

    Scale note: mergeSchema reconciles FOOTERS (one ranged read per
    file), not data; the scan itself still prunes columns per file.
    Keep it off for stable tables — footer reconciliation over a
    100 TB file census is pure driver latency when schemas never
    drifted — and turn it on per-read exactly when a drift window is
    known, like here."""
    d = t(spark, sf, "documents")
    base = _scratch(sf, "evolution")
    old = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text", "lang")
    new = d.filter(F.col("doc_id") % 2 == 1)
    old.write.mode("overwrite").parquet(os.path.join(base, "batch=1"))
    new.write.mode("overwrite").parquet(os.path.join(base, "batch=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "batch=1"), os.path.join(base, "batch=2")
    )
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("source").isNull().cast("long")).alias("n_missing_source"),
        F.sum("n_chars").alias("sum_n_chars_new"),
        F.sum(F.length("text")).alias("sum_chars"),
    )


def stream_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    max_files_per_trigger: int | None = None,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Streaming JSONL directory tail: the landing-zone pattern where a
    crawler keeps dropping .json files and the pipeline ingests them
    incrementally (file-source checkpointing makes each file
    exactly-once per query).  Same contracts as read_jsonl — explicit
    schema, PERMISSIVE corrupt capture — so a batch backfill and the
    live tail PARSE IDENTICALLY, which is what makes replay + live
    produce one consistent table.  ``max_files_per_trigger`` is the
    backpressure knob: a backlog of thousands of files drains in
    bounded micro-batches instead of one giant first batch."""
    reader = (
        spark.readStream.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return reader.schema(f"{schema}, {corrupt_col} string").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """DataFrame -> ORC (the other columnar interchange format a lake
    inherits from Hive-era producers), overwrite mode."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """ORC -> DataFrame with an explicit schema — same no-inference
    contract as the text readers (ORC carries its own schema, but
    pinning one makes producer drift a loud analysis error instead of
    a silent column-type change downstream)."""
    return spark.read.schema(schema).orc(path)


# --- XML (built-in since Spark 4) -------------------------------------
def write_xml(df: DataFrame, path: str, row_tag: str = "doc") -> None:
    """DataFrame -> XML files (one row element per record).  The
    writer escapes markup characters, so arbitrary text round-trips
    losslessly; rowTag is the per-record element name."""
    df.write.mode("overwrite").option("rowTag", row_tag).xml(path)


def read_xml(
    spark: SparkSession, path: str, schema: str, row_tag: str = "doc"
) -> DataFrame:
    """XML -> DataFrame with an explicit schema — the same
    no-inference contract as every reader here: inference over XML
    (all-text markup) is even less trustworthy than over CSV, so the
    schema is pinned and drift fails analysis loudly."""
    return (
        spark.read.schema(schema).option("rowTag", row_tag).xml(path)
    )


@query(
    "q_ingest_xml_roundtrip",
    oracle=_FINGERPRINT_SQL.format(key="lang"),
)
def q_ingest_xml_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """documents -> XML -> read_xml -> per-lang fidelity fingerprint vs
    the parquet oracle: the markup interchange path (Spark 4 ships the
    XML source natively — no jar).  Exercises entity escaping both
    directions and schema-pinned reads over an all-text format; any
    mangled character or dropped row moves sum_chars/sum_first_cp.

    Scale note: XML is a line-unsplittable format only when a single
    row element spans lines; Spark's reader still parallelizes by
    file, so a 100 TB landing zone should arrive as many files — the
    same guidance as JSONL, enforced here by writing with the
    upstream partitioning."""
    d = t(spark, sf, "documents")
    path = _scratch(sf, "xml")
    write_xml(d, path)
    return _fingerprint(read_xml(spark, path, DOCS_SCHEMA), "lang")


# --- Avro (two tiers) -------------------------------------------------
# ``spark-avro`` is an EXTERNAL Spark module: the core avro-*.jar files
# ship with pyspark, but the DataSource (org.apache.spark.sql.avro)
# does not.  Bootstrap on any cluster with either
#   spark-submit --packages org.apache.spark:spark-avro_2.13:<spark-ver>
# or by dropping spark-avro_2.13-<spark-ver>.jar into $SPARK_HOME/jars
# (or pointing SPARK_GRAFT_AVRO_JAR at it).  When the jar is absent,
# the path falls back to the pure-Python container-file codec in
# sources/avro_codec.py (spec-implemented from avro.apache.org,
# interop-tested in both directions against the Java Avro library that
# DOES ship in pyspark's core jars) — slower per row but fully
# distributed (mapInPandas both sides), so the Avro leg of the
# interchange matrix works in every environment; the jar tier is
# preferred automatically when present.

def _spark_avro_available() -> bool:
    import glob

    import pyspark

    jar_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    if glob.glob(os.path.join(jar_dir, "spark-avro_*.jar")):
        return True
    extra = os.environ.get("SPARK_GRAFT_AVRO_JAR")
    return bool(extra) and os.path.exists(extra)


HAS_SPARK_AVRO = _spark_avro_available()

AVRO_BOOTSTRAP = (
    "spark-avro is an external module; add it with "
    "`spark-submit --packages org.apache.spark:spark-avro_2.13:<spark-version>` "
    "or place spark-avro_2.13-<spark-version>.jar in $SPARK_HOME/jars "
    "(or set SPARK_GRAFT_AVRO_JAR to its path)"
)


def write_avro(df: DataFrame, path: str) -> None:
    """DataFrame -> Avro (the row-oriented interchange format Kafka
    ecosystems emit), overwrite mode.  Uses the spark-avro jar when
    present, the pure-Python spec codec otherwise (see the tier note
    above)."""
    if HAS_SPARK_AVRO:
        df.write.mode("overwrite").format("avro").save(path)
        return
    from kafkaish_spark.sources.avro_codec import write_avro_py

    write_avro_py(df, path)


def read_avro(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Avro -> DataFrame with an explicit schema (same no-inference
    contract as every reader here)."""
    if HAS_SPARK_AVRO:
        return spark.read.schema(schema).format("avro").load(path)
    from kafkaish_spark.sources.avro_codec import read_avro_py

    return read_avro_py(spark, path, schema)


@query(
    "q_ingest_avro_roundtrip",
    oracle=_FINGERPRINT_SQL.format(key="lang"),
)
def q_ingest_avro_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """documents -> Avro -> read_avro -> per-lang fidelity fingerprint
    vs the parquet oracle: the row-format leg of the interchange matrix
    (JSONL/CSV/ORC/XML/Avro).  Runs on the spark-avro jar when present
    and on the pure-Python container codec (sources/avro_codec.py,
    Java-library interop-tested) otherwise, so the leg is proven in
    every environment — the files on disk are spec Avro either way."""
    d = t(spark, sf, "documents")
    path = _scratch(sf, "avro")
    write_avro(d, path)
    return _fingerprint(read_avro(spark, path, DOCS_SCHEMA), "lang")


@query(
    "q_ingest_avro_embeddings",
    oracle="""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id,
           CAST(SUM(len(embedding)) AS BIGINT) AS sum_dims,
           CAST(SUM(list_sum(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
           ))) AS BIGINT) AS sum_q
    FROM embeddings GROUP BY label
    """,
)
def q_ingest_avro_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """embeddings (vec_id, array<float> embedding, label) -> Avro ->
    read back -> per-label fingerprint vs the parquet oracle, with the
    vector CONTENTS folded in on the repo's integer micro-grid
    (quantize each element to 1e-6 then sum — order-independent and
    bit-exact across engines, unlike a float sum).  Proves the codec's
    array leg end-to-end through Spark: any reordered, truncated, or
    precision-damaged vector moves sum_q.  Uses the deflate tier on
    the pure-Python path — embeddings are the payload where wire
    compression pays at 100 TB."""
    e = t(spark, sf, "embeddings")
    path = _scratch(sf, "avro_emb")
    schema = "vec_id long, embedding array<float>, label int"
    if HAS_SPARK_AVRO:
        e.write.mode("overwrite").format("avro").save(path)
        back = spark.read.schema(schema).format("avro").load(path)
    else:
        from kafkaish_spark.sources.avro_codec import (
            read_avro_py,
            write_avro_py,
        )

        write_avro_py(e, path, codec="deflate")
        back = read_avro_py(spark, path, schema)
    q = F.expr(
        "aggregate(embedding, 0L, (acc, x) -> "
        "acc + CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
    )
    return (
        back.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("vec_id").cast("long").alias("sum_vec_id"),
            F.sum(F.size("embedding")).cast("long").alias("sum_dims"),
            F.sum(q).cast("long").alias("sum_q"),
        )
        .orderBy("label")
    )


@query(
    "q_ingest_orc_roundtrip",
    oracle=_FINGERPRINT_SQL.format(key="lang"),
)
def q_ingest_orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """documents -> ORC -> read_orc -> per-lang fidelity fingerprint vs
    the parquet oracle: the cross-columnar-format path (parquet-born
    corpus served to an ORC-expecting consumer, or vice versa).
    Columnar-to-columnar is lossless by construction; the fingerprint
    guards the ENGINE plumbing (predicate/column pruning paths differ
    between the two readers) rather than the encoding."""
    d = t(spark, sf, "documents")
    path = _scratch(sf, "orc")
    write_orc(d, path)
    return _fingerprint(read_orc(spark, path, DOCS_SCHEMA), "lang")
