"""Corpus-pipeline DSL: config validation, stage semantics, and parity
with the hand-built capstone chain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.plans.corpus_dsl import (
    parse_corpus_config,
    run_corpus_pipeline,
)


def test_unknown_stage_rejected():
    with pytest.raises(Exception):
        parse_corpus_config("stages:\n  - op: evaporate\n")


def test_extra_keys_rejected():
    with pytest.raises(Exception):
        parse_corpus_config(
            "stages:\n  - op: quality_gate\n    min_tokens: 5\n    bogus: 1\n"
        )


def test_pack_without_shuffle_raises(spark, sf_dir):
    with pytest.raises(ValueError, match="global_shuffle"):
        run_corpus_pipeline(
            spark, "stages:\n  - op: pack_shards\n    capacity: 512\n", sf_dir
        ).collect()


def test_dedup_and_cap_stages(spark, sf_dir):
    base = run_corpus_pipeline(spark, "stages: []\n", sf_dir)
    n = base.count()
    deduped = run_corpus_pipeline(
        spark, "stages:\n  - op: dedup_exact\n", sf_dir
    )
    assert deduped.count() <= n
    # dedup is idempotent on its own output fingerprints
    capped = run_corpus_pipeline(
        spark,
        "stages:\n  - op: frequency_cap\n    max_per_source: 3\n",
        sf_dir,
    )
    per_source = capped.groupBy("source").count().collect()
    assert per_source and all(r["count"] <= 3 for r in per_source)


def test_yaml_matches_hand_built_recipe(spark, sf_dir):
    from dvh_airflow_kafka_spark.catalog import (
        _CORPUS_YAML,
        pretraining_shard_recipe,
    )

    got = {
        (r.doc_id, r.position, r.n_tokens, r.shard_id, r.offset_in_shard)
        for r in run_corpus_pipeline(spark, _CORPUS_YAML, sf_dir).collect()
    }
    want = {
        (r.doc_id, r.position, r.n_tokens, r.shard_id, r.offset_in_shard)
        for r in pretraining_shard_recipe(spark, sf_dir).collect()
    }
    assert got == want and got


def test_pack_sequences_stage_tiles(spark, sf_dir):
    yaml_text = """
stages:
  - op: global_shuffle
    salt: shuffle-v1
  - op: pack_sequences
    length: 256
"""
    rows = run_corpus_pipeline(spark, yaml_text, sf_dir).collect()
    assert rows
    by_seq: dict[int, int] = {}
    for r in rows:
        assert 0 <= r.offset_in_seq < 256
        assert 1 <= r.n_seq_tokens <= 256
        by_seq[r.seq_id] = by_seq.get(r.seq_id, 0) + r.n_seq_tokens
    seqs = sorted(by_seq)
    assert seqs == list(range(len(seqs)))
    assert all(by_seq[s] == 256 for s in seqs[:-1])  # all but last full


def test_temperature_mixture_stage_matches_catalog(spark, sf_dir):
    """DSL stage with the catalog query's (k, salt) keeps EXACTLY the
    same documents as the oracled temperature_mixture_sample query."""
    from dvh_airflow_kafka_spark.catalog import REGISTRY

    yaml_text = """
stages:
  - op: temperature_mixture
    k: 2.0
    salt: mix-temp-v1
"""
    got = {
        r.doc_id for r in run_corpus_pipeline(spark, yaml_text, sf_dir).collect()
    }
    want = {
        r.doc_id
        for r in REGISTRY["temperature_mixture_sample"].fn(spark, sf_dir).collect()
    }
    assert got == want and got


def test_token_budget_stage_matches_catalog(spark, sf_dir):
    """DSL stage with the catalog query's budget keeps EXACTLY the same
    documents as the oracled quality_token_budget query."""
    from dvh_airflow_kafka_spark.catalog import _TOKEN_BUDGET, REGISTRY

    yaml_text = f"""
stages:
  - op: token_budget
    budget: {_TOKEN_BUDGET}
"""
    got = {
        r.doc_id for r in run_corpus_pipeline(spark, yaml_text, sf_dir).collect()
    }
    want = {
        r.doc_id
        for r in REGISTRY["quality_token_budget"].fn(spark, sf_dir).collect()
    }
    assert got == want and got


def test_temperature_then_budget_composes(spark, sf_dir):
    """Stages compose: the budget selection runs over the mixture
    survivors only (fractions computed AT that stage), and the final
    kept set is a subset of both standalone stages' outputs."""
    yaml_text = """
stages:
  - op: temperature_mixture
    k: 2.0
  - op: token_budget
    budget: 4096
"""
    rows = run_corpus_pipeline(spark, yaml_text, sf_dir).collect()
    mixture_only = {
        r.doc_id
        for r in run_corpus_pipeline(
            spark, "stages:\n  - {op: temperature_mixture, k: 2.0}", sf_dir
        ).collect()
    }
    kept = {r.doc_id for r in rows}
    assert kept and kept < mixture_only


def test_yaml_matches_data_selection_factory(spark, sf_dir):
    """The YAML rendering of capstone #4 (temperature mixture →
    token budget → length batches) is row-identical to the hand-built,
    oracled data_selection_factory query."""
    from dvh_airflow_kafka_spark.catalog import (
        _BATCH_SIZE,
        _TEMP_MIX_K,
        _TEMP_MIX_SALT,
        _TOKEN_BUDGET,
        REGISTRY,
    )

    yaml_text = f"""
stages:
  - op: temperature_mixture
    k: {_TEMP_MIX_K}
    salt: {_TEMP_MIX_SALT}
  - op: token_budget
    budget: {_TOKEN_BUDGET}
  - op: length_batches
    batch_size: {_BATCH_SIZE}
"""
    got = {
        tuple(r)
        for r in run_corpus_pipeline(spark, yaml_text, sf_dir)
        .select("batch_id", "n_docs", "max_tokens", "sum_tokens", "padding_waste")
        .collect()
    }
    want = {
        tuple(r)
        for r in REGISTRY["data_selection_factory"].fn(spark, sf_dir).collect()
    }
    assert got == want and got


def test_length_batches_must_be_terminal():
    with pytest.raises(Exception, match="terminal"):
        parse_corpus_config(
            "stages:\n"
            "  - {op: length_batches, batch_size: 8}\n"
            "  - {op: quality_gate, min_tokens: 1}\n"
        )


def test_charlm_gate_stage_matches_hand_built_filter(spark, sf_dir):
    """The DSL's charlm_gate stage must keep exactly the documents a
    hand-built char-LM filter keeps at the same threshold."""
    from dvh_airflow_kafka_spark.ext import text as xtext
    from dvh_airflow_kafka_spark.io import load_table
    from dvh_airflow_kafka_spark.plans.corpus_dsl import run_corpus_pipeline

    yaml_text = """
table: documents
stages:
  - op: charlm_gate
    min_avg_logprob: -1.74
"""
    got = {
        r["doc_id"]
        for r in run_corpus_pipeline(spark, yaml_text, sf_dir)
        .select("doc_id")
        .collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    t = docs.filter(F.length("text") >= 2).select(
        "doc_id", F.lower(F.col("text")).alias("s")
    )
    model = xtext.charlm_model(t)
    want = {
        r["doc_id"]
        for r in t.select(
            "doc_id",
            (
                xtext.charlm_score_sum(model).cast("double")
                / F.lit(1000000.0)
                / (F.char_length("s") - 1)
            ).alias("alp"),
        )
        .filter(F.col("alp") >= -1.74)
        .collect()
    }
    assert got == want
    # the gate actually discriminates on the fixture
    n_all = docs.count()
    assert 0 < len(got) < n_all


def test_clean_normalize_stage_matches_helper(spark, sf_dir):
    from dvh_airflow_kafka_spark.ext.text import clean_text
    from dvh_airflow_kafka_spark.io import load_table

    got = run_corpus_pipeline(
        spark,
        "stages:\n  - op: clean_normalize\n  - op: quality_gate\n"
        "    min_tokens: 1\n",
        sf_dir,
    ).select("doc_id", "text")
    docs = load_table(spark, sf_dir, "documents")
    want = (
        docs.withColumn("text", clean_text(F.col("text")))
        .filter(F.size(F.split(F.col("text"), r"\s+")) >= 1)
        .select("doc_id", "text")
    )
    assert {(r.doc_id, r.text) for r in got.collect()} == {
        (r.doc_id, r.text) for r in want.collect()
    }


def test_split_filter_stage_matches_hash_split(spark, sf_dir):
    from dvh_airflow_kafka_spark.ext.sampling import hash_split
    from dvh_airflow_kafka_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    for keep in ("train", "test"):
        got = {
            r.doc_id
            for r in run_corpus_pipeline(
                spark,
                f"stages:\n  - op: split_filter\n    keep: {keep}\n",
                sf_dir,
            ).collect()
        }
        want = {
            r.doc_id
            for r in hash_split(docs, "doc_id")
            .filter(F.col("split") == keep)
            .collect()
        }
        assert got == want, keep


def test_split_filter_bad_keep_rejected():
    with pytest.raises(Exception):
        parse_corpus_config(
            "stages:\n  - op: split_filter\n    keep: validation\n"
        )
