"""Round-6 tenth wave (operators/composites44.py): randomized
response and MLM masking plan — checked against pure-python replays
on sf0.001 (the oracle gate re-proves them vs DuckDB at sf0.01)."""

import hashlib
import math

import duckdb

SF = "/root/testdata/sf0.001"


def test_rappor_matches_replay_and_concentrates(spark):
    from kafkaish_spark.operators.composites44 import (
        _RR_FLIP_HEX,
        _RR_SEED,
        _RR_TYPES,
        q_privacy_rappor_freq,
    )

    rows = duckdb.sql(
        f"SELECT event_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall()
    obs, truth = {}, {}
    for eid, et in rows:
        h = hashlib.md5(f"{_RR_SEED}{eid}".encode()).hexdigest()
        truth[et] = truth.get(et, 0) + 1
        if h[0] in _RR_FLIP_HEX:
            rep = _RR_TYPES[int(h[1], 16) % len(_RR_TYPES)]
        else:
            rep = et
        obs[rep] = obs.get(rep, 0) + 1
    n = sum(obs.values())
    f = len(_RR_FLIP_HEX) / 16.0
    want = {
        et: (
            obs[et],
            truth[et],
            round((obs[et] - n * f / len(_RR_TYPES)) / (1 - f), 6),
        )
        for et in obs
    }
    got = {
        r["event_type"]: (r["n_observed"], r["n_true"], r["n_debiased"])
        for r in q_privacy_rappor_freq(spark, SF).collect()
    }
    assert got == want
    # the debiased estimate concentrates around the truth: within
    # ~4 sigma of the binomial noise, sigma ~ sqrt(N*f)/(1-f)
    sigma = math.sqrt(n * f) / (1 - f)
    for et, (_o, tr, est) in got.items():
        assert abs(est - tr) < 4 * sigma + 1
    # and the mechanism really flipped something (obs != truth somewhere)
    assert any(got[et][0] != got[et][1] for et in got)


def test_mlm_masking_matches_replay_and_rates(spark):
    from kafkaish_spark.operators.composites44 import (
        _MLM_SEED,
        q_train_mlm_masking,
    )

    rows = duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{SF}/documents.parquet'"
    ).fetchall()
    agg = {}
    per_lang_tokens = {}
    for doc_id, text, lang in rows:
        n_words = len(text.split(" "))
        per_lang_tokens[lang] = per_lang_tokens.get(lang, 0) + n_words
        for pos in range(1, n_words + 1):
            h3 = hashlib.md5(
                f"{_MLM_SEED}{doc_id}:{pos}".encode()
            ).hexdigest()[:3]
            if h3[:2] >= "27":
                act = "unmasked"
            elif h3[2] <= "c":
                act = "mask_token"
            elif h3[2] == "d":
                act = "random_token"
            else:
                act = "keep_token"
            agg[(lang, act)] = agg.get((lang, act), 0) + 1
    want = {
        (lang, act): (n, round(n / per_lang_tokens[lang], 6))
        for (lang, act), n in agg.items()
    }
    got = {
        (r["lang"], r["action"]): (r["n_tokens"], r["rate"])
        for r in q_train_mlm_masking(spark, SF).collect()
    }
    assert got == want
    # realized rates near the nominal BERT plan: ~15.2% selected,
    # split ~80/10/10 — loose bands, the draws are hash-binomial
    for lang in per_lang_tokens:
        sel = sum(
            got.get((lang, a), (0, 0))[0]
            for a in ("mask_token", "random_token", "keep_token")
        )
        tot = per_lang_tokens[lang]
        assert 0.10 < sel / tot < 0.21
        if sel:
            assert got.get((lang, "mask_token"), (0, 0))[0] / sel > 0.6
