"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB at
the given sf, then compares row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted
by their full value tuple).  Exact comparison for non-floats; floats
must match to 1e-9 relative (the driver hashes values, so we ALSO
report whether they match exactly — any non-exact float is a hash risk
and should be fixed at the query level).

Usage: python tools/check_oracle.py [sf_dir] [query ...]

Set SPARK_GRAFT_PLAIN=1 to run on a PLAIN SparkSession (no engine
configs) — the driver's environment; catches config leaks such as the
events nanos-timestamp handling or runtime-conf dependencies.
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

from kafkaish_spark.plans.registry import all_queries
from kafkaish_spark.session import get_spark
from kafkaish_spark.sources.tables import TABLES


# --- dtype-kind gate (round-3 verdict item 2) -------------------------
# The driver's value-hash is dtype-sensitive: a DuckDB column that lands
# in pandas as a different KIND than the Spark column (e.g. HUGEINT ->
# float64 vs Spark int64) hash-mismatches even when every value is
# equal.  Width differences within a kind (int32 vs int64) hash the
# same.  This gate reproduces that failure mode locally so "green here,
# red at the driver" is impossible for the dtype class.

def _duck_kind(t):
    t = t.upper()
    if "HUGEINT" in t:
        return "!hugeint"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "i"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "f"
    if t.startswith("DECIMAL"):
        return "dec"
    if t == "VARCHAR":
        return "s"
    if t == "BOOLEAN":
        return "b"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "ts"
    return "?" + t


def _spark_kind(t):
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "i"
    if t in ("float", "double"):
        return "f"
    if t.startswith("decimal"):
        return "dec"
    if t == "string":
        return "s"
    if t == "boolean":
        return "b"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "ts"
    return "?" + t


def dtype_kind_mismatches(con, oracle_sql, sdf):
    duck = {
        c: _duck_kind(ty)
        for c, ty, *_ in con.execute(f"DESCRIBE ({oracle_sql})").fetchall()
    }
    sprk = {
        f.name: _spark_kind(f.dataType.simpleString())
        for f in sdf.schema.fields
    }
    return [
        f"dtype-kind {col}: duck={dk} spark={sprk[col]}"
        for col, dk in duck.items()
        if col in sprk and dk != sprk[col]
    ]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if hasattr(v, "isoformat"):
                v = v.isoformat()
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda tup: tuple(str(x) for x in tup)), [
        cols[i] for i in order
    ]


def values_equal(a, b):
    if a is None or b is None:
        return a is None and b is None, True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b), str(a) == str(b)
        exact = fa == fb or (math.isnan(fa) and math.isnan(fb))
        close = exact or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
        return close, exact
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        if len(a) != len(b):
            return False, False
        close = exact = True
        for x, y in zip(a, b):
            c, e = values_equal(x, y)
            close &= c
            exact &= e
        return close, exact
    return a == b, a == b


def main():
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if os.environ.get("SPARK_GRAFT_PLAIN"):
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for tname in TABLES:
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM '{sf_dir}/{tname}.parquet'"
        )
    specs = all_queries()
    n_pass = n_fail = n_rowsonly = 0
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(srows)} rows ({time.time()-t0:.1f}s) [rows-only]")
            n_rowsonly += 1
            if len(srows) == 0 and name != "q_join_anti_customers_no_orders":
                print(f"      WARNING: empty result")
            continue
        try:
            cur = con.execute(spec.oracle)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue
        ok = True
        msgs = []
        try:
            kind_bad = dtype_kind_mismatches(con, spec.oracle, sdf)
        except Exception:
            kind_bad = []
        if kind_bad:
            ok = False
            msgs.extend(kind_bad)
        if sorted(scols) != sorted(ocols):
            ok = False
            msgs.append(f"schema {sorted(scols)} vs {sorted(ocols)}")
        if len(srows) != len(orows):
            ok = False
            msgs.append(f"rowcount {len(srows)} vs {len(orows)}")
        exact_all = True
        if ok:
            ns, _ = normalize(srows, scols)
            no, _ = normalize(orows, ocols)
            n_bad = 0
            for sr, orow in zip(ns, no):
                close, exact = values_equal(sr, orow)
                exact_all &= exact
                if not close:
                    n_bad += 1
                    if n_bad <= 3:
                        msgs.append(f"row diff: spark={sr} oracle={orow}")
            if n_bad:
                ok = False
                msgs.append(f"{n_bad} differing rows")
        if ok:
            tag = "PASS " if exact_all else "CLOSE"
            if not exact_all:
                msgs.append("float not bit-exact -> HASH RISK")
            print(
                f"{tag} {name}: {len(srows)} rows ({time.time()-t0:.1f}s) "
                + "; ".join(msgs)
            )
            n_pass += 1
            if not exact_all:
                n_fail += 1
        else:
            print(f"FAIL  {name}: " + "; ".join(msgs))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail/risk, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
