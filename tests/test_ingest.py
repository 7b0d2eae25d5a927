"""Raw-text ingestion connectors (sources/ingest.py): schema-explicit
JSONL/CSV readers, RFC-4180 round-trips, and the PERMISSIVE
corrupt-record quarantine path."""

from pyspark.sql import functions as F

TRICKY = [
    (1, 'quote " inside', "en"),
    (2, "comma, inside", "en"),
    (3, 'both, "and" more,', "de"),
    (4, "", "fr"),  # empty string (CSV's classic empty-vs-null trap)
    (5, "plain", "fr"),
]


def _tricky_df(spark):
    return spark.createDataFrame(TRICKY, "doc_id long, text string, lang string")


def test_jsonl_roundtrip_preserves_newlines_and_quotes(spark, tmp_path):
    from kafkaish_spark.sources.ingest import read_jsonl, write_jsonl

    rows = TRICKY + [(6, "line\nbreak\tand tab", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    path = str(tmp_path / "jl")
    write_jsonl(df, path)
    # cache: Spark disallows plans that reference ONLY the corrupt
    # column over raw JSON/CSV (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    back = read_jsonl(spark, path, "doc_id long, text string, lang string").cache()
    try:
        assert back.filter(F.col("_corrupt_record").isNotNull()).count() == 0
        got = {r.doc_id: (r.text, r.lang) for r in back.collect()}
        assert got == {i: (t, lg) for i, t, lg in rows}
    finally:
        back.unpersist()


def test_csv_roundtrip_rfc4180_quoting(spark, tmp_path):
    from kafkaish_spark.sources.ingest import read_csv, write_csv

    path = str(tmp_path / "cs")
    write_csv(_tricky_df(spark), path)
    back = read_csv(spark, path, "doc_id long, text string, lang string").cache()
    assert back.filter(F.col("_corrupt_record").isNotNull()).count() == 0
    got = {r.doc_id: (r.text, r.lang) for r in back.collect()}
    back.unpersist()
    want = {i: (t, lg) for i, t, lg in TRICKY}
    # CSV cannot distinguish empty string from null on read — both are
    # acceptable for doc 4; normalize to '' for the comparison and
    # assert everything else byte-exact
    got = {k: (v[0] or "", v[1]) for k, v in got.items()}
    assert got == want


def test_csv_roundtrip_preserves_newlines_via_percent_encoding(spark, tmp_path):
    """write_csv percent-encodes embedded line breaks (multiLine stays
    off, so files still split) and read_csv(decode_linebreaks=True)
    restores the original byte-for-byte — including text that contains
    LITERAL '%0A'/'%25' sequences, which the % -> %25 step disambiguates
    (round-3 ADVICE item 3)."""
    from kafkaish_spark.sources.ingest import read_csv, write_csv

    rows = TRICKY + [
        (6, "line\nbreak\tand tab", "en"),
        (7, "crlf\r\nline", "en"),
        (8, "literal %0A percent %25 and %", "de"),
        (9, "trailing newline\n", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    path = str(tmp_path / "cs_nl")
    write_csv(df, path)
    back = read_csv(
        spark, path, "doc_id long, text string, lang string",
        decode_linebreaks=True,
    ).cache()
    try:
        assert back.filter(F.col("_corrupt_record").isNotNull()).count() == 0
        got = {r.doc_id: (r.text or "", r.lang) for r in back.collect()}
        assert got == {i: (t, lg) for i, t, lg in rows}
    finally:
        back.unpersist()


def test_jsonl_corrupt_lines_quarantine_exactly(spark, tmp_path):
    from kafkaish_spark.sources.ingest import read_jsonl

    lines = [
        '{"doc_id": 1, "text": "ok"}',
        "{definitely not json",
        '{"doc_id": 2, "text": "fine"}',
        '{"doc_id": 3, "text": "unterminated',
    ]
    p = tmp_path / "mixed"
    p.mkdir()
    (p / "part-0.json").write_text("\n".join(lines) + "\n")
    back = read_jsonl(spark, str(p), "doc_id long, text string").cache()
    try:
        bad = back.filter(F.col("_corrupt_record").isNotNull())
        good = back.filter(F.col("_corrupt_record").isNull())
        assert bad.count() == 2
        # quarantined rows keep the raw line for audit/replay
        raws = sorted(r._corrupt_record for r in bad.collect())
        assert raws == sorted([lines[1], lines[3]])
        assert sorted(r.doc_id for r in good.collect()) == [1, 2]
    finally:
        back.unpersist()


def test_ingest_readers_require_explicit_schema(spark):
    """The no-inference contract is positional: schema is a required
    arg on both readers (a 2x-I/O inference pass at 100 TB is the bug,
    so the API shape forbids it)."""
    import inspect

    from kafkaish_spark.sources.ingest import read_csv, read_jsonl

    for fn in (read_jsonl, read_csv):
        p = inspect.signature(fn).parameters["schema"]
        assert p.default is inspect.Parameter.empty


def test_stream_jsonl_quarantines_and_drains_in_bounded_batches(
    spark, tmp_path
):
    """The streaming tail must (a) parse good lines and quarantine bad
    ones exactly like the batch reader, (b) respect the
    maxFilesPerTrigger backpressure bound, and (c) pick up files
    appearing between runs exactly once (file-source checkpoint)."""
    from kafkaish_spark.sources.ingest import stream_jsonl

    src = tmp_path / "landing"
    src.mkdir()
    for i in range(4):
        lines = [f'{{"doc_id": {i * 10 + j}, "text": "d{i}"}}' for j in range(3)]
        if i == 2:
            lines.append("{broken line")
        (src / f"drop-{i}.json").write_text("\n".join(lines) + "\n")

    got, batches = [], []

    def sink(df, bid):
        rows = df.collect()
        batches.append(len(rows))
        got.extend(rows)

    def drain():
        q = (
            stream_jsonl(spark, str(src), "doc_id long, text string",
                         max_files_per_trigger=1)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert len(batches) >= 4  # 1-file micro-batches, not one big gulp
    good = [r.doc_id for r in got if r._corrupt_record is None]
    bad = [r for r in got if r._corrupt_record is not None]
    assert sorted(good) == sorted(i * 10 + j for i in range(4) for j in range(3))
    assert len(bad) == 1 and bad[0]._corrupt_record == "{broken line"

    # a file landing later is ingested exactly once on the next drain
    (src / "drop-late.json").write_text('{"doc_id": 99, "text": "late"}\n')
    got.clear()
    batches.clear()
    drain()
    assert [r.doc_id for r in got] == [99]


def test_jsonl_roundtrip_property(spark, tmp_path):
    """Property: ANY list of unicode strings survives the JSONL
    write/read cycle byte-exact.  One Spark roundtrip over a
    hypothesis-generated adversarial batch (control chars, quotes,
    backslashes, unicode, empty-adjacent strings) rather than one per
    example — Spark jobs are too slow for per-example fuzzing."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafkaish_spark.sources.ingest import read_jsonl, write_jsonl

    collected = []

    @settings(max_examples=30, deadline=None, database=None)
    @given(st.text(max_size=120))
    def gather(s):
        collected.append(s)

    gather()
    texts = [s for s in dict.fromkeys(collected)]  # dedupe, keep order
    rows = [(i, s) for i, s in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "fuzz")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, "doc_id long, text string").cache()
    try:
        assert back.filter(F.col("_corrupt_record").isNotNull()).count() == 0
        got = {r.doc_id: r.text for r in back.collect()}
    finally:
        back.unpersist()
    assert got == dict(enumerate(texts))


def test_orc_roundtrip_binary_exact(spark, tmp_path):
    from kafkaish_spark.sources.ingest import read_orc, write_orc

    rows = TRICKY + [(6, "line\nbreak\tand tab", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    path = str(tmp_path / "orc")
    write_orc(df, path)
    back = read_orc(spark, path, "doc_id long, text string, lang string")
    got = {r.doc_id: (r.text, r.lang) for r in back.collect()}
    assert got == {i: (t, lg) for i, t, lg in rows}


def test_avro_roundtrip_tricky_rows(spark, tmp_path):
    """Avro tricky-row round-trip must be lossless on WHICHEVER tier
    the environment provides: the spark-avro jar when present, the
    pure-Python container codec (sources/avro_codec.py) otherwise —
    there is no skip path anymore, the leg always runs."""
    from kafkaish_spark.sources import ingest

    rows = TRICKY + [(6, "line\nbreak\tand tab", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    path = str(tmp_path / "av")
    ingest.write_avro(df, path)
    back = ingest.read_avro(
        spark, path, "doc_id long, text string, lang string"
    )
    got = {r.doc_id: (r.text, r.lang) for r in back.collect()}
    assert got == {i: (t, lg) for i, t, lg in rows}


def test_xml_roundtrip_escapes_markup(spark, tmp_path):
    """XML write->read must round-trip markup-hostile text exactly
    (entities escaped out, unescaped back) under a pinned schema."""
    from kafkaish_spark.sources.ingest import read_xml, write_xml

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    rows = [
        (1, "a < b & c > d", "en", "s", 13),
        (2, 'quote " apos \' end', "fr", "s", 18),
        (3, "<tag>not markup</tag>", "de", "s", 21),
    ]
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "xmlrt")
    write_xml(df, path)
    back = read_xml(spark, path, schema)
    got = sorted(tuple(r) for r in back.collect())
    assert got == sorted(rows)
