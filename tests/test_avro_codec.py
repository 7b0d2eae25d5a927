"""Pure-Python Avro container codec (sources/avro_codec.py).

The load-bearing tests here are the JAVA INTEROP pair: a codec that
only round-trips with itself could deviate from the Avro spec
arbitrarily; one whose files the reference Java implementation
(org.apache.avro, shipped inside pyspark's core jars) reads back
value-for-value — and which reads Java-written files — cannot.
"""

import io
import json
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from kafkaish_spark.sources.avro_codec import (
    avro_schema_of,
    read_avro_py,
    read_container,
    write_avro_py,
    write_container,
)

FULL_SCHEMA = T.StructType(
    [
        T.StructField("a", T.LongType(), False),
        T.StructField("b", T.StringType(), True),
        T.StructField("c", T.DoubleType(), True),
        T.StructField("d", T.BooleanType(), False),
        T.StructField("e", T.BinaryType(), True),
        T.StructField("f", T.IntegerType(), True),
    ]
)


def _roundtrip(rows, schema, tmp_path, blocks=None):
    path = str(tmp_path / "t.avro")
    with open(path, "wb") as fh:
        write_container(
            fh, avro_schema_of(schema), iter(blocks or [rows]), seed=path
        )
    _ws, blks = read_container(path)
    return [r for blk in blks for r in blk]


def test_primitive_edge_values_roundtrip(tmp_path):
    rows = [
        (-(2**63), "héllo \n\t\"'", 3.5, True, b"\x00\xff", None),
        (2**63 - 1, None, None, False, None, -(2**31)),
        (0, "", -0.0, True, b"", 2**31 - 1),
        (-1, "☃\U0001f600", float("inf"), False, b"\x80", 0),
    ]
    assert _roundtrip(rows, FULL_SCHEMA, tmp_path) == rows


def test_multi_block_files_concatenate(tmp_path):
    rows = [(i, str(i), float(i), i % 2 == 0, b"x", i) for i in range(100)]
    got = _roundtrip(
        rows, FULL_SCHEMA, tmp_path, blocks=[rows[:7], [], rows[7:]]
    )
    assert got == rows


@settings(max_examples=50, deadline=None, database=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.one_of(st.none(), st.text(max_size=60)),
            st.one_of(
                st.none(),
                st.floats(allow_nan=False),  # NaN != NaN breaks ==
            ),
            st.booleans(),
            st.one_of(st.none(), st.binary(max_size=40)),
            st.one_of(
                st.none(),
                st.integers(min_value=-(2**31), max_value=2**31 - 1),
            ),
        ),
        max_size=25,
    )
)
def test_fuzz_roundtrip(tmp_path_factory, rows):
    tmp = tmp_path_factory.mktemp("avro_fuzz")
    assert _roundtrip(rows, FULL_SCHEMA, tmp) == rows


def test_corruption_fails_loudly(tmp_path):
    path = str(tmp_path / "t.avro")
    rows = [(1, "x", 1.0, True, b"y", 2)]
    with open(path, "wb") as fh:
        write_container(fh, avro_schema_of(FULL_SCHEMA), iter([rows]), seed=path)
    data = open(path, "rb").read()

    bad = str(tmp_path / "bad_magic.avro")
    open(bad, "wb").write(b"Nope" + data[4:])
    with pytest.raises(ValueError, match="magic"):
        read_container(bad)

    torn = str(tmp_path / "torn.avro")
    open(torn, "wb").write(data[:-8] + b"\x00" * 8)  # clobber sync tail
    _ws, blks = read_container(torn)
    with pytest.raises(ValueError, match="sync|block"):
        list(blks)


def test_unsupported_types_refused():
    with pytest.raises(TypeError, match="does not map"):
        avro_schema_of(
            T.StructType(
                [T.StructField("m", T.MapType(T.StringType(), T.LongType()), True)]
            )
        )


ARR_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.ArrayType(T.FloatType(), False), True),
        T.StructField("w", T.ArrayType(T.StringType(), True), False),
    ]
)


def test_arrays_roundtrip(tmp_path):
    rows = [
        (1, [1.5, -2.25, 0.0], ["a", None, ""]),
        (2, None, []),
        (3, [], ["x"] * 300),  # >1 varint byte of count
    ]
    assert _roundtrip(rows, ARR_SCHEMA, tmp_path) == rows


def test_deflate_codec_roundtrip_and_shrinks(tmp_path):
    rows = [(i, "repetitive " * 50, 1.0, True, b"z" * 100, i) for i in range(200)]
    p_null = str(tmp_path / "n.avro")
    p_defl = str(tmp_path / "d.avro")
    for p, codec in ((p_null, "null"), (p_defl, "deflate")):
        with open(p, "wb") as fh:
            write_container(
                fh, avro_schema_of(FULL_SCHEMA), iter([rows]), seed=p,
                codec=codec,
            )
        _ws, blks = read_container(p)
        assert [r for blk in blks for r in blk] == rows
    assert os.path.getsize(p_defl) < os.path.getsize(p_null) / 5


# ----------------------------------------------------------- Java interop


def _java_read(spark, avro_file, field_names):
    jvm = spark._jvm
    fr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(avro_file),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    out = []
    while fr.hasNext():
        rec = fr.next()
        vals = []
        for n in field_names:
            v = rec.get(n)
            # py4j leaves avro's Utf8 and ByteBuffer as JavaObjects
            cls = v.getClass().getName() if hasattr(v, "getClass") else None
            if cls == "org.apache.avro.util.Utf8":
                v = v.toString()
            elif cls == "java.nio.HeapByteBuffer":
                v = bytes(v.array())
            vals.append(v)
        out.append(tuple(vals))
    fr.close()
    return out


def test_java_reads_python_file(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.StringType(), True),
            T.StructField("c", T.DoubleType(), True),
            T.StructField("d", T.BooleanType(), False),
        ]
    )
    rows = [
        (-(2**62), "héllo ☃", 3.5, True),
        (7, None, None, False),
        (0, "", -1e300, True),
    ]
    path = str(tmp_path / "py.avro")
    with open(path, "wb") as fh:
        write_container(fh, avro_schema_of(schema), iter([rows]), seed=path)
    assert _java_read(spark, path, ["a", "b", "c", "d"]) == rows


def test_python_reads_java_file(spark, tmp_path):
    jvm = spark._jvm
    sch_json = json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": ["null", "string"]},
                {"name": "c", "type": "double"},
                {"name": "d", "type": "boolean"},
            ],
        }
    )
    sch = jvm.org.apache.avro.Schema.Parser().parse(sch_json)
    w = jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    dfw = jvm.org.apache.avro.file.DataFileWriter(w)
    path = str(tmp_path / "java.avro")
    dfw.create(sch, jvm.java.io.File(path))
    expect = [
        (-123456789012345, "wörld", 2.25, True),
        (7, None, -1e300, False),
    ]
    for a, b, c, d in expect:
        rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
        rec.put("a", jvm.java.lang.Long.valueOf(a))
        rec.put("b", b)
        rec.put("c", jvm.java.lang.Double.valueOf(c))
        rec.put("d", jvm.java.lang.Boolean.valueOf(d))
        dfw.append(rec)
    dfw.close()
    _ws, blks = read_container(path)
    assert [r for blk in blks for r in blk] == expect


def test_java_interop_deflate_and_arrays(spark, tmp_path):
    """The two extensions beyond scalars — the deflate codec and array
    fields — interop with the Java library in both directions."""
    jvm = spark._jvm
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("v", T.ArrayType(T.DoubleType(), False), False),
        ]
    )
    rows = [(1, [1.5, -2.0]), (2, []), (3, [0.25] * 40)]

    # Python writes deflate+arrays -> Java reads
    py_file = str(tmp_path / "py.avro")
    with open(py_file, "wb") as fh:
        write_container(
            fh, avro_schema_of(schema), iter([rows]), seed=py_file,
            codec="deflate",
        )
    fr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(py_file),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    got = []
    while fr.hasNext():
        rec = fr.next()
        got.append((rec.get("id"), [x for x in rec.get("v")]))
    fr.close()
    assert got == rows

    # Java writes deflate+arrays -> Python reads
    sch = jvm.org.apache.avro.Schema.Parser().parse(
        json.dumps(avro_schema_of(schema))
    )
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    )
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    j_file = str(tmp_path / "java.avro")
    dfw.create(sch, jvm.java.io.File(j_file))
    for rid, arr in rows:
        rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
        rec.put("id", jvm.java.lang.Long.valueOf(rid))
        jlist = jvm.java.util.ArrayList()
        for x in arr:
            jlist.add(jvm.java.lang.Double.valueOf(x))
        rec.put("v", jlist)
        dfw.append(rec)
    dfw.close()
    _ws, blks = read_container(j_file)
    assert [r for blk in blks for r in blk] == rows


# ---------------------------------------------------------- Spark surface


def test_spark_write_read_partitioned(spark, tmp_path):
    df = spark.range(0, 1000, 1, 6).selectExpr(
        "id AS a",
        "CASE WHEN id % 7 = 0 THEN NULL ELSE concat('s', id) END AS b",
        "CAST(id AS DOUBLE) / 3 AS c",
        "id % 2 = 0 AS d",
    )
    path = str(tmp_path / "dir")
    n = write_avro_py(df, path)
    assert n == 1000
    # one container file per input partition
    assert len([f for f in os.listdir(path) if f.endswith(".avro")]) == 6
    back = read_avro_py(
        spark, path, "a long, b string, c double, d boolean"
    )
    # nullability differs by construction (DDL schemas parse nullable);
    # names and types must match exactly
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]
    got = {r.a: (r.b, r.c, r.d) for r in back.collect()}
    want = {r.a: (r.b, r.c, r.d) for r in df.collect()}
    assert got == want


def test_spark_timestamps_survive_session_timezone(spark, tmp_path):
    """timestamp-micros is a UTC instant on disk; the wall-clock a
    session reads back must equal what it wrote regardless of the
    session timezone (the write localizes, the read un-localizes)."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.sql(
            "SELECT * FROM VALUES "
            "(1L, TIMESTAMP '2024-03-15 12:34:56.789', DATE '2024-03-15'),"
            "(2L, NULL, NULL) AS t(id, ts, d)"
        )
        path = str(tmp_path / "ts")
        write_avro_py(df, path)
        back = read_avro_py(spark, path, "id long, ts timestamp, d date")
        got = {r.id: (r.ts, r.d) for r in back.collect()}
        want = {r.id: (r.ts, r.d) for r in df.collect()}
        assert got == want
        # and the on-disk long really is the UTC instant: 12:34 EDT = 16:34 UTC
        ws, blks = read_container(
            os.path.join(
                path,
                sorted(f for f in os.listdir(path) if f.endswith(".avro"))[0],
            )
        )
        micros = [r[1] for blk in blks for r in blk if r[0] == 1][0]
        import datetime

        utc = datetime.datetime.fromtimestamp(
            micros / 1e6, datetime.timezone.utc
        )
        assert utc.hour == 16 and utc.minute == 34
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_union_branch_order_t_null(tmp_path):
    """A writer schema with [T, "null"] (null SECOND — legal Avro) must
    encode/decode with the null branch at index 1, not assume index 0:
    branch-0 long 42 is a VALUE, decoding it as None desyncs every
    following field (r5 advice, medium)."""
    path = str(tmp_path / "tn.avro")
    ws = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "x", "type": ["long", "null"]},
            {"name": "y", "type": ["string", "null"]},
        ],
    }
    rows = [(42, "a"), (None, "b"), (7, None), (None, None)]
    with open(path, "wb") as fh:
        write_container(fh, ws, iter([rows]), seed=path)
    _ws, blks = read_container(path)
    assert [r for blk in blks for r in blk] == rows
    # and the raw encoding really used branch index per the schema:
    # encode a single row by hand and check the first byte is zigzag(0)
    # (= the long branch) followed by zigzag(42)
    from kafkaish_spark.sources.avro_codec import _make_encoder

    buf = bytearray()
    _make_encoder(["long", "null"])(buf, 42)
    assert bytes(buf) == b"\x00\x54"  # branch 0, then zigzag(42)=84
    buf2 = bytearray()
    _make_encoder(["long", "null"])(buf2, None)
    assert bytes(buf2) == b"\x02"  # branch 1 = null
    buf3 = bytearray()
    _make_encoder(["null", "long"])(buf3, None)
    assert bytes(buf3) == b"\x00"  # null-first: branch 0 = null


def test_union_bad_branch_fails_loudly(tmp_path):
    """A branch index outside {0,1} raises instead of silently
    misreading."""
    from kafkaish_spark.sources.avro_codec import _make_decoder

    dec = _make_decoder(["null", "long"])
    with pytest.raises(ValueError, match="branch"):
        dec(b"\x04\x54", 0)  # branch 2 of a 2-branch union


def test_dst_wall_clock_does_not_crash_writer(spark, tmp_path):
    """Ambiguous (fall-back) and nonexistent (spring-forward)
    session-local wall-clock times are legal data: the writer resolves
    them with the documented java.time-compatible policy instead of
    raising pandas Ambiguous/NonExistentTimeError (r5 advice, low)."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.sql(
            "SELECT * FROM VALUES "
            # 2024-11-03 01:30 EDT/EST — the repeated fall-back hour
            "(1L, TIMESTAMP '2024-11-03 01:30:00'),"
            # 2024-03-10 02:30 — inside the spring-forward gap
            "(2L, TIMESTAMP '2024-03-10 02:30:00')"
            " AS t(id, ts)"
        )
        path = str(tmp_path / "dst")
        write_avro_py(df, path)  # must not raise
        back = read_avro_py(spark, path, "id long, ts timestamp")
        got = {r.id: r.ts for r in back.collect()}
        assert len(got) == 2 and all(v is not None for v in got.values())
        # ambiguous hour resolved to the EARLIER instant (EDT, -04):
        # 01:30 EDT == 05:30Z
        ws, blks = read_container(
            os.path.join(
                path,
                sorted(f for f in os.listdir(path) if f.endswith(".avro"))[0],
            )
        )
        import datetime

        rows = [r for blk in blks for r in blk]
        micros = {r[0]: r[1] for r in rows}
        utc1 = datetime.datetime.fromtimestamp(
            micros[1] / 1e6, datetime.timezone.utc
        )
        assert (utc1.hour, utc1.minute) == (5, 30)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
            st.one_of(st.none(), st.text(max_size=40)),
        ),
        max_size=20,
    ),
    st.booleans(),
    st.booleans(),
)
def test_fuzz_union_order_roundtrip(tmp_path_factory, rows, x_first, y_first):
    """Both legal null-union orders, fuzzed: [T, 'null'] and
    ['null', T] writer schemas roundtrip arbitrary null/value mixes
    bit-for-bit (the r5-advice branch-order class, generalized)."""
    import os
    import uuid

    ws = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "x", "type": ["long", "null"] if x_first else ["null", "long"]},
            {"name": "y", "type": ["string", "null"] if y_first else ["null", "string"]},
        ],
    }
    tmp = tmp_path_factory.mktemp("avro_union_fuzz")
    path = os.path.join(str(tmp), f"{uuid.uuid4().hex}.avro")
    with open(path, "wb") as fh:
        write_container(fh, ws, iter([rows]), seed=path)
    _ws, blks = read_container(path)
    assert [r for blk in blks for r in blk] == rows
