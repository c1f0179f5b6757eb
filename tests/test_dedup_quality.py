"""Near-dup / ANN quality gates: the LSH paths must agree with their exact
counterparts on planted duplicates (precision) and find most of them
(recall). These are the non-SQL-expressible ops the driver checks
rows-only — pytest carries the semantic verification."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.ext import dedup as xdedup
from dvh_airflow_kafka_spark.ext import similarity as xsim
from dvh_airflow_kafka_spark.io import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def exact_pairs(docs):
    """Ground truth: exact 3-gram-set Jaccard >= 0.5."""
    out = xdedup.ngram_jaccard_pairs(docs, "doc_id", "text", ngram=3, threshold=0.5)
    return {(r.id_a, r.id_b) for r in out.collect()}


def test_minhash_recall_and_precision(docs, exact_pairs):
    got = xdedup.minhash_near_duplicates(
        docs, "doc_id", "text", ngram=3, num_perm=64, bands=8, threshold=0.5
    )
    pairs = {(r.id_a, r.id_b) for r in got.collect()}
    # verification step makes every reported pair exactly right
    assert pairs <= exact_pairs or not pairs
    if exact_pairs:
        recall = len(pairs & exact_pairs) / len(exact_pairs)
        assert recall >= 0.8, f"minhash recall {recall:.2f}"


def test_simhash_finds_planted_dups(docs, exact_pairs):
    got = xdedup.simhash_near_duplicates(docs, "doc_id", "text", max_hamming=3)
    pairs = {(r.id_a, r.id_b) for r in got.collect()}
    if exact_pairs:
        recall = len(pairs & exact_pairs) / len(exact_pairs)
        assert recall >= 0.6, f"simhash recall {recall:.2f}"


def test_exact_dedup_counts(docs):
    survivors = xdedup.exact_dedup_survivors(docs, ["text"], "doc_id")
    total = docs.count()
    agg = survivors.agg(
        F.sum("n_copies").alias("s"), F.count(F.lit(1)).alias("groups")
    ).collect()[0]
    assert agg.s == total and agg.groups <= total


def test_lsh_ann_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()
    queries = emb.filter(F.col("vec_id") < 10)
    exact = xsim.brute_force_topk(emb, queries, k=5)
    truth = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx = xsim.lsh_bucketed_topk(emb, queries, k=5, n_bits=8, n_tables=4)
    got = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.6, f"ANN recall {recall:.2f}"
