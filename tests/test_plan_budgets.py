"""Plan-shape regression guard: hard exchange budgets for headline
queries. A refactor that silently adds a shuffle (the classic 100 TB
regression) fails here long before a benchmark would notice."""

from __future__ import annotations

import re

import pytest

from dvh_airflow_kafka_spark.catalog import REGISTRY

# (query, max exchanges in the FINAL adaptive plan). Budgets are the
# intended plan shape, not generous ceilings — tightening one of these
# is fine; loosening one needs a reason in the commit message.
BUDGETS = [
    ("flagship_etl_pipeline", 0),  # single fused projection
    ("envelope_projection", 0),  # scan-fused filter+projection
    ("documents_chunk_windows", 0),  # explode is pipelined, no shuffle
    ("string_schema_envelope", 0),
    ("message_allow_filter", 0),
    ("dedup_exact_survivors", 2),  # one keyed agg (partial+final)
    ("dedup_insert_antijoin", 3),  # shared repartition + anti join
    ("tpch_q1_pricing_summary", 2),  # one keyed agg
    ("events_anomaly_zscore", 1),  # one keyed window
    ("source_frequency_cap", 1),  # one keyed window
    ("k_anonymity_audit", 2),  # one keyed agg
    ("incremental_daily_revenue", 4),  # two partials + merge
    ("corpus_snapshot_diff", 3),  # full-outer join on doc_id
    ("events_rolling_dau", 4),  # pair-dedup + one agg
    ("training_sequence_pack", 3),  # range slice + within-slice window
    ("privacy_scrub_k6", 1),  # broadcast lookup, one scan
    ("pseudonymize_users", 0),  # scan-fused surrogate key
    ("events_to_scd2", 1),  # both windows share the user partition
    ("user_conversion_paths", 3),  # user window + path rollup
    ("doc_rarity_score", 4),  # token rollup + freq join + doc agg
    ("sql_interface_shared_text", 2),  # one join + one agg
    ("token_inverted_index", 2),  # one keyed agg (partial list + final)
    ("quality_token_budget", 3),  # range slice + in-slice window + join
    ("curriculum_schedule", 8),  # two distributed ranks (range+window each)
    ("semantic_dedup_survivors", 4),  # bucket join + dedup + anti-join
    ("temperature_mixture_sample", 2),  # count agg; keep predicate scan-fused
    ("events_value_trend", 2),  # one keyed agg of decimal partials
    ("jpeg_decode_metadata", 1),  # mapInPandas synth+decode, repartition only
    ("length_bucketed_batches", 5),  # distributed rank + batch agg
    ("error_burst_range_join", 3),  # bin equi-join + keyed agg
    ("bm25_topk_docs", 0),  # stats bcast back; scoring scan-fused + top-k
    ("hard_negative_mining", 1),  # linear scan + per-query window
    ("charlm_doc_quality", 0),  # model collected; scoring is one scan
    ("countmin_token_freq", 3),  # sketch agg + exact agg + estimate agg
    ("dsir_domain_selection", 0),  # two collected models; scoring one scan
    ("privacy_erasure_cascade", 1),  # broadcast flagged set + one keyed agg
    ("matryoshka_recall", 3),  # two linear scans + per-query windows + agg
    ("jaccard_prefix_filter_pairs", 5),  # df+rank+prefix join+verify joins
    ("time_decay_engagement", 2),  # one keyed agg of integer partials
    ("multi_topic_fan_in", 0),  # two scan-fused branches, shuffle-free union
    ("ab_experiment_lift", 2),  # per-user flag agg + scalar rollup
    ("events_anomaly_mad", 6),  # two counting passes (agg+window+tot each)
    ("winsorized_value_stats", 4),  # counts agg + window + tot + final agg
    ("source_drift_ks", 4),  # counts agg + CDF window + tot + final agg
    ("ngram_containment_pairs", 2),  # inverted-index join reuses exchanges
    ("token_frequency_profile", 3),  # token counts + counts-of-counts + agg
    ("quality_length_spearman", 6),  # two rank frames + totals + final agg
    ("link_graph_triangles", 5),  # canonical edges checkpointed once
    ("l_diversity_audit", 2),  # one map-side-combined QI aggregate
    ("token_pmi_collocations", 1),  # marginals checkpointed; top-k no sort
    ("fixed_k_per_group_sample", 1),  # one stratum-keyed window
    ("events_cusum_drift", 1),  # two stacked windows share one exchange
    ("session_association_rules", 5),  # basket dedup + pair/marginal aggs
    ("kneser_ney_bigram_lm", 2),  # one corpus-pair agg; stats ride bc
    ("phrase_match_positional", 1),  # postings joins bcast; result sort
    ("timeseries_sax_pairs", 3),  # profile agg + word join + result sort
    ("doc_sentiment_lexicon", 2),  # bcast lexicon probe + per-doc agg + id join
]


def _final_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the adaptive dump appends the pre-execution sketch after the final
    # plan; budget only the plan that actually ran
    return plan.split("+- == Initial Plan ==")[0]


@pytest.mark.parametrize("name,budget", BUDGETS, ids=[b[0] for b in BUDGETS])
def test_exchange_budget(spark, sf_dir, name, budget):
    df = REGISTRY[name].fn(spark, sf_dir)
    plan = _final_plan(df)
    n = len(re.findall(r"Exchange (hash|range)partitioning", plan))
    assert n <= budget, f"{name}: {n} exchanges > budget {budget}\n{plan[:3000]}"


def test_no_global_windows_in_package_source():
    """Static guard: `Window.orderBy(...)` without a partitionBy is the
    single-partition scale-killer this engine spent two rounds removing
    (the distributed two-pass rank/prefix machinery replaced every one).
    Any reappearance in the package source fails here immediately."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).parent.parent / "dvh_airflow_kafka_spark"
    offenders = []
    for path in pkg.rglob("*.py"):
        src = path.read_text()
        for m in re.finditer(r"Window\s*\.\s*orderBy", src):
            line = src[: m.start()].count("\n") + 1
            offenders.append(f"{path.name}:{line}")
    assert not offenders, (
        "global Window.orderBy (no partitionBy) found — use "
        f"ext/ranking.with_global_rank or ext/sampling.with_prefix_sum: {offenders}"
    )
