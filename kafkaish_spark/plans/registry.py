"""Central registry pairing each Spark query builder with its DuckDB
oracle SQL (the driver contract in ``__spark_entry__.py``).

Every operator from SURVEY.md §2 registers here via the ``@query``
decorator.  ``oracle=None`` marks rows-only checks (non-SQL-expressible
or engine-specific hashing), which the driver records as weaker checks.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str] = None
    tags: tuple = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple = (), bench: bool = False):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, tags, bench)
        return fn

    return deco


def _load_all() -> None:
    # import for registration side effects
    import kafkaish_spark.operators.relational  # noqa: F401
    import kafkaish_spark.operators.log_queries  # noqa: F401
    import kafkaish_spark.operators.llm  # noqa: F401
    import kafkaish_spark.operators.streaming_twins  # noqa: F401
    import kafkaish_spark.operators.multimodal  # noqa: F401
    import kafkaish_spark.operators.rollup  # noqa: F401
    import kafkaish_spark.operators.pipeline_ops  # noqa: F401
    import kafkaish_spark.operators.composites2  # noqa: F401
    import kafkaish_spark.operators.composites3  # noqa: F401
    import kafkaish_spark.operators.composites4  # noqa: F401
    import kafkaish_spark.operators.composites5  # noqa: F401
    import kafkaish_spark.operators.composites6  # noqa: F401
    import kafkaish_spark.operators.composites7  # noqa: F401
    import kafkaish_spark.operators.composites8  # noqa: F401
    import kafkaish_spark.operators.composites9  # noqa: F401
    import kafkaish_spark.operators.composites10  # noqa: F401
    import kafkaish_spark.operators.composites11  # noqa: F401
    import kafkaish_spark.operators.composites12  # noqa: F401
    import kafkaish_spark.operators.composites13  # noqa: F401
    import kafkaish_spark.operators.composites14  # noqa: F401
    import kafkaish_spark.operators.composites15  # noqa: F401
    import kafkaish_spark.operators.composites16  # noqa: F401
    import kafkaish_spark.operators.composites17  # noqa: F401
    import kafkaish_spark.operators.composites18  # noqa: F401
    import kafkaish_spark.operators.composites19  # noqa: F401
    import kafkaish_spark.operators.composites20  # noqa: F401
    import kafkaish_spark.operators.composites21  # noqa: F401
    import kafkaish_spark.operators.composites22  # noqa: F401
    import kafkaish_spark.operators.composites23  # noqa: F401
    import kafkaish_spark.operators.composites24  # noqa: F401
    import kafkaish_spark.operators.composites25  # noqa: F401
    import kafkaish_spark.operators.composites26  # noqa: F401
    import kafkaish_spark.operators.composites27  # noqa: F401
    import kafkaish_spark.operators.composites28  # noqa: F401
    import kafkaish_spark.operators.composites29  # noqa: F401
    import kafkaish_spark.operators.composites30  # noqa: F401
    import kafkaish_spark.operators.composites31  # noqa: F401
    import kafkaish_spark.operators.composites32  # noqa: F401
    import kafkaish_spark.operators.composites33  # noqa: F401
    import kafkaish_spark.operators.cdc  # noqa: F401
    import kafkaish_spark.sources.ingest  # noqa: F401
    import kafkaish_spark.sources.pyds  # noqa: F401
    import kafkaish_spark.sources.typed  # noqa: F401
    import kafkaish_spark.sources.transactions  # noqa: F401
    import kafkaish_spark.sources.idempotent  # noqa: F401
    # round-6 waves LAST: never-checked queries enter the driver window
    # in registration order, and the round-5 pool has waited longer
    import kafkaish_spark.operators.composites35  # noqa: F401
    import kafkaish_spark.operators.composites36  # noqa: F401
    import kafkaish_spark.operators.composites37  # noqa: F401
    import kafkaish_spark.operators.composites38  # noqa: F401
    import kafkaish_spark.operators.composites39  # noqa: F401
    import kafkaish_spark.operators.composites40  # noqa: F401
    import kafkaish_spark.operators.composites41  # noqa: F401
    import kafkaish_spark.operators.composites42  # noqa: F401
    import kafkaish_spark.operators.composites43  # noqa: F401
    import kafkaish_spark.operators.composites44  # noqa: F401
    # round-7 waves
    import kafkaish_spark.operators.composites45  # noqa: F401
    import kafkaish_spark.operators.composites46  # noqa: F401
    # round-8 waves
    import kafkaish_spark.operators.composites47  # noqa: F401
    import kafkaish_spark.operators.composites48  # noqa: F401
    import kafkaish_spark.operators.composites49  # noqa: F401
    import kafkaish_spark.operators.composites50  # noqa: F401
    import kafkaish_spark.operators.composites51  # noqa: F401
    import kafkaish_spark.operators.composites52  # noqa: F401
    import kafkaish_spark.operators.composites53  # noqa: F401
    import kafkaish_spark.operators.composites54  # noqa: F401
    import kafkaish_spark.operators.composites55  # noqa: F401
    import kafkaish_spark.operators.composites56  # noqa: F401
    import kafkaish_spark.operators.composites57  # noqa: F401
    import kafkaish_spark.operators.composites58  # noqa: F401
    import kafkaish_spark.operators.composites34  # noqa: F401
    import kafkaish_spark.operators.composites59  # noqa: F401
    import kafkaish_spark.operators.composites60  # noqa: F401
    import kafkaish_spark.operators.composites61  # noqa: F401
    import kafkaish_spark.operators.composites62  # noqa: F401
    import kafkaish_spark.operators.composites63  # noqa: F401
    import kafkaish_spark.operators.composites64  # noqa: F401


# The driver's per-round correctness gate samples the FIRST 50 entries
# of queries().  Rounds 1-4 each covered a 50-query window; from round 5
# the rotation is STRUCTURAL (r4 verdict item 1): ``_driver_history``
# parses the CORRECTNESS_r*.json files the driver writes at the repo
# root, so (a) any name whose LATEST driver row is red is automatically
# front-loaded into the next window for a fresh green row, and (b) the
# never-checked pool is computed, never hand-maintained.  The legacy
# frozensets below are kept only as the fallback when no CORRECTNESS
# files exist (fresh clone), and as human-readable history.
_DRIVER_CHECKED_R1 = frozenset(
    {
        "q_project_compute", "q_filter_pred", "q_join_orders_customer",
        "q_join_broadcast_nation_region", "q_join_left_customer_orders",
        "q_join_semi_customers_with_orders", "q_join_anti_customers_no_orders",
        "q_join_range_price_band", "q_join_asof_event_order",
        "q_star_revenue_by_region", "q_agg_pricing_summary",
        "q_agg_distinct_users", "q_agg_approx_distinct_users",
        "q_agg_rollup_region_nation", "q_agg_having_big_orders",
        "q_window_rank_orders_per_cust", "q_window_lag_event_gap",
        "q_window_running_total", "q_sort_orders", "q_topk_revenue_parts",
        "q_topk_per_group_customer_orders", "q_set_union_segments",
        "q_set_except_customers", "q_set_intersect_customers",
        "q_scalar_string_part_names", "q_scalar_date_order_months",
        "q_scalar_math_case", "q_array_explode_embedding", "q_array_stats",
        "q_json_extract_props", "q_subquery_above_avg_price",
        "q_agg_cube_status_priority", "q_window_ntile_customer_value",
        "q_agg_percentiles_quantity", "q_pivot_orders_priority",
        "q_subquery_exists_bulk_supplier", "q_window_first_last_order",
        "q_agg_approx_percentiles", "q_map_props_entries",
        "q_join_cross_region_nation", "q_subquery_not_in_1995",
        "q_window_percent_rank_orders", "q_agg_grouping_sets_geo",
        "q_unpivot_lineitem_metrics", "q_events_pseudonymize",
        "q_agg_stats_dispersion", "q_agg_corr_quantity_price",
        "q_join_asof_forward", "q_agg_bitwise_events", "q_agg_boolean_orders",
    }
)

# Round-2 window: all 50 sampled in CORRECTNESS_r02.json.  49 green;
# q_regex_extract_all_part_nums erred in the driver's canonicalizer
# (array-typed column) — its output is now scalarized, so it goes back
# to the FRONT of the round-3 window for an explicit green row.
_DRIVER_CHECKED_R2 = frozenset(
    {
        "q_latest_offset", "q_replay_from_offset", "q_filter_event_type",
        "q_subscriber_lag", "q_dedup_exact_documents", "q_dedup_ngram_jaccard",
        "q_dedup_near_documents", "q_sim_topk_embeddings", "q_text_token_stats",
        "q_text_lang_dist", "q_text_tf_top_terms", "q_udf_arrow_vowel_ratio",
        "q_udaf_normalize_per_group", "q_stream_tumbling_counts",
        "q_stream_sliding_counts", "q_stream_session_windows",
        "q_embed_kmeans_lloyd2", "q_embed_pca_power", "q_agg_salted_skew",
        "q_join_salted_skew", "q_matview_incremental", "q_merge_upsert",
        "q_diff_snapshots", "q_sample_reservoir", "q_sample_temperature",
        "q_ab_cuped", "q_ab_diff_in_diff", "q_audit_benford",
        "q_audit_chi2_drift", "q_privacy_l_diversity",
        "q_events_seasonal_anomaly", "q_stream_dedup_counts",
        "q_ml_logreg_gd2", "q_ml_stump", "q_ml_auc", "q_ml_auc_binned",
        "q_ml_eval_confusion", "q_events_dau_mau", "q_basket_part_pairs",
        "q_cte_supplier_above_nation_avg", "q_agg_string_listagg",
        "q_window_trailing_30d_spend", "q_tpch_q13_order_distribution",
        "q_tpch_q22_idle_rich_customers", "q_agg_argmax_supplier",
        "q_scd2_priority_intervals", "q_pii_mask_customers",
        "q_window_nth_value_orders", "q_privacy_k_anonymity",
    }
)

# Round-3 window: all 50 sampled in CORRECTNESS_r03.json — 48 green,
# 2 hash-fails that were oracle HUGEINT type bugs (fixed round 4 with
# the dtype-kind contract gate); q_dedup_levenshtein_parts was green
# but its semantics changed round 4 (FastSS dictionary blocking), so
# it re-enters the round-4 window for a fresh row.
_DRIVER_CHECKED_R3 = frozenset(
    {
        "q_regex_extract_all_part_nums", "q_embed_whitening",
        "q_embed_quantize_int8", "q_array_set_functions",
        "q_events_kaplan_meier", "q_ts_mase", "q_events_pattern_match",
        "q_graph_pagerank", "q_events_funnel", "q_events_cohort_retention",
        "q_agg_percentile_disc", "q_agg_weighted_median",
        "q_agg_equidepth_histogram", "q_tpch_q3_shipping_priority",
        "q_tpch_q10_returned_items", "q_tpch_q17_small_quantity",
        "q_tpch_q18_large_orders", "q_events_hourly_gapfill",
        "q_events_hourly_locf", "q_dedup_cc_clusters",
        "q_dedup_embedding_cosine", "q_dedup_sentence_level",
        "q_dedup_levenshtein_parts", "q_dedup_substring_runs",
        "q_dedup_semantic_clustered", "q_dedup_prefix_filter",
        "q_text_quality", "q_text_fingerprint", "q_text_bpe_token_stats",
        "q_text_tfidf_top_terms", "q_text_winnow_fingerprints",
        "q_embed_centroids", "q_embed_normalize", "q_embed_kmeans_assign",
        "q_embed_outliers_maha", "q_embed_pq_codes", "q_sim_hard_negatives",
        "q_sample_stratified", "q_sample_weighted", "q_sample_domain_cap",
        "q_decontaminate_ngram", "q_corpus_prep_report",
        "q_corpus_mixture_weights", "q_pack_sequences",
        "q_events_sessionize", "q_events_attribution_last_touch",
        "q_graph_copurchase_sim", "q_udtf_sentence_split",
        "q_udf_map_in_arrow_tokens", "q_udaf_arrow_regression",
    }
)

_DRIVER_CHECKED = _DRIVER_CHECKED_R1 | _DRIVER_CHECKED_R2 | _DRIVER_CHECKED_R3

# Round-5 explicit priorities: the four round-4 feature-wave queries
# that postdate the r4 window (typed topics, CDC, cross-topic
# transactions, Python DataSource) get their first driver rows right
# after any structural reds.  Everything after them is computed.
_DRIVER_PRIORITY = (
    "q_pyds_topic_scan",
    "q_typed_topic_roundtrip",
    "q_cdc_capture_apply_roundtrip",
    "q_txn_split_publish_union",
)


def _driver_files() -> list[str]:
    """Basenames of the driver's ``CORRECTNESS_r*.json`` files present at
    the repo root, in round order.  ``tools/dump_queries.py`` records this
    list in the QUERIES.md header as the *proof basis*, and the freshness
    contract test recomputes the header from exactly that basis — so a
    CORRECTNESS file the driver drops AFTER the round's final commit can
    never fail a suite the builder already proved (r9 verdict item 1)."""
    import glob
    import os

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    )


def _driver_history(
    files: list[str] | None = None,
) -> tuple[set[str], list[str], dict[str, int]]:
    """Parse the driver's ``CORRECTNESS_r*.json`` files at the repo root.

    Returns ``(checked, reds, latest_round)``: every name that ever
    received a driver row, the names whose LATEST row is red (neither a
    hash-green nor a declared ``no_oracle`` rows-only check), and the
    round number each name's latest row came from.  This makes the
    rotation rule structural (r4 verdict): a driver-red name re-enters
    the next 50-query window automatically, the never-checked pool is
    derived rather than hand-maintained, and — with the pool empty since
    r9 — ``latest_round`` drives least-recently-proven re-proof rotation
    (r9 verdict item 2).  Falls back to the static history sets when no
    files exist (fresh clone / first round).

    ``files``: optional explicit basenames to parse (the QUERIES.md proof
    basis); ``None`` parses everything present.
    """
    import json
    import os
    import re

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    latest: dict[str, dict] = {}
    latest_round: dict[str, int] = {}
    for base in _driver_files() if files is None else files:
        path = os.path.join(root, base)
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", base)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            for name, rec in rows.items():
                if isinstance(rec, dict):
                    latest[name] = rec
                    latest_round[name] = max(rnd, latest_round.get(name, 0))
    if not latest:
        return set(_DRIVER_CHECKED), [], {}

    def _green(rec: dict) -> bool:
        return bool(rec.get("hash_match")) or rec.get("err") == "no_oracle"

    reds = [n for n, rec in latest.items() if not _green(rec)]
    return set(latest), reds, latest_round


def all_queries() -> dict[str, QuerySpec]:
    """Registry in driver-window order: (1) latest-driver-red names
    (structural auto-front-load), (2) explicit new-feature priorities,
    (3) never-driver-checked oracle-backed queries in registration
    order, (4) never-checked rows-only queries, (5) everything already
    green, LEAST-recently-proven first (ties in registration order).
    The driver samples the FIRST 50, so this ordering maximizes
    cumulative proven coverage each round — and once the never-checked
    pool is empty (r9), bucket 5's staleness order makes the 50-slot
    window cycle through the whole converged registry (~8 rounds per
    full re-proof) instead of re-checking the oldest registrations
    forever (r9 verdict item 2)."""
    _load_all()
    checked, reds, latest_round = _driver_history()
    ordered: dict[str, QuerySpec] = {}
    for n in reds:
        if n in _REGISTRY and _REGISTRY[n].oracle is not None:
            ordered[n] = _REGISTRY[n]
    for n in _DRIVER_PRIORITY:
        # a priority name that already HAS a green driver row must not
        # occupy a window slot: with 52 candidates for 50 slots (r6),
        # stale priorities would push never-checked names out
        if n in _REGISTRY and n not in ordered and n not in checked:
            ordered[n] = _REGISTRY[n]
    for n, s in _REGISTRY.items():
        if n not in ordered and n not in checked and s.oracle is not None:
            ordered[n] = s
    for n, s in _REGISTRY.items():
        if n not in ordered and n not in checked:
            ordered[n] = s
    # already-green tail: stalest proof first.  Names absent from
    # latest_round (static-fallback history) sort as round 0 = stalest.
    green_tail = sorted(
        (n for n in _REGISTRY if n not in ordered),
        key=lambda n, _idx={m: i for i, m in enumerate(_REGISTRY)}: (
            latest_round.get(n, 0),
            _idx[n],
        ),
    )
    for n in green_tail:
        ordered[n] = _REGISTRY[n]
    return ordered


def oracle_map() -> dict[str, str]:
    _load_all()
    return {n: s.oracle for n, s in _REGISTRY.items() if s.oracle is not None}
