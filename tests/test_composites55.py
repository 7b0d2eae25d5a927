"""Round-9 wave 6 tests: full quantile normalization against a
row-level pure-python reference."""

import pytest


def _disc_quantile_map(src_vals, pooled_sorted):
    """Row-level reference: for each source value, its tie-averaged
    rank quantile mapped onto the pooled distribution via the
    percentile_disc pick (smallest pooled value whose inclusive CDF
    covers the scaled rank)."""
    n_s = len(src_vals)
    n = len(pooled_sorted)
    s = sorted(src_vals)
    out = []
    for v in src_vals:
        lo = sum(1 for u in s if u < v)
        cnt = sum(1 for u in s if u == v)
        r2 = 2 * lo + cnt + 1  # 2 x avg rank over 2*n_s
        # pooled pick: smallest pv with r2 * n <= 2 * cum_incl(pv) * n_s
        cum = 0
        pick = pooled_sorted[-1]
        i = 0
        while i < n:
            j = i
            while j + 1 < n and pooled_sorted[j + 1] == pooled_sorted[i]:
                j += 1
            cum = j + 1
            if r2 * n <= 2 * cum * n_s:
                pick = pooled_sorted[i]
                break
            i = j + 1
        out.append(pick)
    return out


def test_quantile_norm_matches_rowlevel(spark, sf_dir):
    from kafkaish_spark.operators.composites55 import q_corpus_quantile_norm

    got = {
        r["source"]: r for r in q_corpus_quantile_norm(spark, sf_dir).collect()
    }
    assert got
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "n_chars")
        .collect()
    )
    by_src: dict[str, list[int]] = {}
    pooled = []
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["n_chars"])
        pooled.append(r["n_chars"])
    pooled.sort()
    for srcname, vals in by_src.items():
        mapped = _disc_quantile_map(vals, pooled)
        g = got[srcname]
        assert g["n_docs"] == len(vals)
        assert g["mean_raw"] == pytest.approx(sum(vals) / len(vals), abs=1e-6)
        assert g["mean_norm"] == pytest.approx(
            sum(mapped) / len(mapped), abs=1e-6
        ), srcname
    # normalization pulls the source means toward each other
    raws = [r["mean_raw"] for r in got.values()]
    norms = [r["mean_norm"] for r in got.values()]
    if len(raws) >= 3:
        assert max(norms) - min(norms) <= max(raws) - min(raws)
