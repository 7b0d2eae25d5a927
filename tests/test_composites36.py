"""Round-6 second wave (operators/composites36.py): label
propagation, fold-leakage audit, MinHash calibration — checked
against pure-python replays on sf0.001 (the oracle gate re-proves
them vs DuckDB at sf0.01)."""

import hashlib

import duckdb

SF = "/root/testdata/sf0.001"


def _edges():
    rows = duckdb.sql(
        f"SELECT DISTINCT o_custkey, l_suppkey FROM "
        f"'{SF}/orders.parquet' o JOIN '{SF}/lineitem.parquet' l "
        f"ON o.o_orderkey = l.l_orderkey"
    ).fetchall()
    e = []
    for ck, sk in rows:
        e.append((f"c{ck}", f"s{sk}"))
        e.append((f"s{sk}", f"c{ck}"))
    return e


def test_label_prop_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites36 import (
        _LP_ROUNDS,
        q_graph_label_prop,
    )

    edges = _edges()
    labels = {src: src for src, _ in edges}
    for _ in range(_LP_ROUNDS):
        votes = {}
        for src, dst in edges:
            votes.setdefault(dst, {})
            lab = labels[src]
            votes[dst][lab] = votes[dst].get(lab, 0) + 1
        labels = {
            node: min(v, key=lambda lab: (-v[lab], lab))
            for node, v in votes.items()
        }
    want = {}
    for node, lab in labels.items():
        n, c, s = want.get(lab, (0, 0, 0))
        want[lab] = (
            n + 1,
            c + node.startswith("c"),
            s + node.startswith("s"),
        )
    got = {
        r["community"]: (r["n_nodes"], r["n_customers"], r["n_suppliers"])
        for r in q_graph_label_prop(spark, SF).collect()
    }
    assert got == want
    # LPA found non-trivial communities (not everyone kept their label)
    assert len(got) < len(labels)


def test_fold_leakage_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites36 import (
        _KFOLDS,
        q_split_fold_leakage,
    )

    rows = duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{SF}/documents.parquet'"
    ).fetchall()
    per_lang = {}
    for doc_id, text, lang in rows:
        per_lang.setdefault(lang, []).append(
            (hashlib.md5(str(doc_id).encode()).hexdigest(), doc_id, text)
        )
    want = {}
    for lang, items in per_lang.items():
        items.sort()
        per_digest = {}
        for rn, (_h, _id, text) in enumerate(items):
            dg = hashlib.md5(text.encode()).hexdigest()
            docs, folds = per_digest.get(dg, (0, set()))
            per_digest[dg] = (docs + 1, folds | {rn % _KFOLDS})
        want[lang] = (
            len(per_digest),
            sum(1 for d, _f in per_digest.values() if d > 1),
            sum(1 for _d, f in per_digest.values() if len(f) > 1),
            sum(d for d, f in per_digest.values() if len(f) > 1),
        )
    got = {
        r["lang"]: (
            r["n_digests"],
            r["n_dup_digests"],
            r["n_leaky_digests"],
            r["n_leaky_docs"],
        )
        for r in q_split_fold_leakage(spark, SF).collect()
    }
    assert got == want
    # invariant: a leaky digest is necessarily a duplicated digest
    for lang, (_n, dup, leaky, _docs) in want.items():
        assert leaky <= dup


def test_minhash_calibration_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites36 import (
        _CAL_PERMS,
        _CAL_SHINGLE,
        q_dedup_minhash_calibration,
    )

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    docs = dict(rows)

    def shingles(text):
        w = text.split(" ")
        return {
            " ".join(w[i : i + _CAL_SHINGLE])
            for i in range(len(w) - _CAL_SHINGLE + 1)
        }

    def minsig(sset, p):
        return min(
            hashlib.md5(f"{p}:{s}".encode()).hexdigest() for s in sset
        )

    bins = {}
    for a in sorted(docs):
        b = a + 1
        if b not in docs:
            continue
        sa, sb = shingles(docs[a]), shingles(docs[b])
        jac = len(sa & sb) / len(sa | sb)
        est = (
            sum(minsig(sa, p) == minsig(sb, p) for p in range(_CAL_PERMS))
            / _CAL_PERMS
        )
        bn = int(jac * 5)
        n, uabs, usgn = bins.get(bn, (0, 0, 0))
        bins[bn] = (
            n + 1,
            uabs + round(abs(est - jac) * 1e9),
            usgn + round((est - jac) * 1e9),
        )
    want = {
        bn: (n, round(uabs / n / 1e9, 6), round(usgn / n / 1e9, 6))
        for bn, (n, uabs, usgn) in bins.items()
    }
    got = {
        r["jac_bin"]: (r["n_pairs"], r["mae"], r["bias"])
        for r in q_dedup_minhash_calibration(spark, SF).collect()
    }
    assert got == want
    # sanity: with 32 perms the MAE should be within a few times the
    # binomial bound sqrt(J(1-J)/p) <= 0.5/sqrt(32) ~ 0.088
    for _bn, (_n, mae, _bias) in got.items():
        assert mae < 0.3
