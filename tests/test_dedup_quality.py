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


def test_hot_shingle_cap_bounds_candidates(spark):
    """A stop phrase shared by the whole corpus must not blow up the
    candidate join when max_doc_freq is set; planted real dups survive."""
    from dvh_airflow_kafka_spark.ext.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )
    from dvh_airflow_kafka_spark.ext.text import tokens, word_ngrams_from_tokens

    stop = "this message is confidential please do not distribute"
    rows = [(i, f"unique document body number {i} alpha beta {stop}") for i in range(60)]
    rows.append((1000, rows[0][1]))  # planted exact dup of doc 0
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = ngram_jaccard_pairs(df, "doc_id", "text", ngram=3, threshold=0.2)
    capped = ngram_jaccard_pairs(
        df, "doc_id", "text", ngram=3, threshold=0.2, max_doc_freq=5
    )
    n_uncapped, n_capped = uncapped.count(), capped.count()
    # the stop-phrase shingles pair everyone with everyone without the cap
    assert n_capped < n_uncapped
    assert n_capped < 60  # bounded: no quadratic stop-phrase bucket
    assert {(0, 1000)} <= {(r.id_a, r.id_b) for r in capped.collect()}

    sh = df.select(
        F.col("doc_id"),
        word_ngrams_from_tokens(tokens(F.col("text")), 3).alias("sh"),
    )
    cand = minhash_lsh_candidates(sh, "doc_id", "sh", max_doc_freq=5)
    pairs = {(r.id_a, r.id_b) for r in cand.collect()}
    assert (0, 1000) in pairs
    assert len(pairs) < 200


def test_registered_df_cap_is_transparent_on_fixture(docs):
    """The catalog registers the near-dup queries with max_doc_freq=50 —
    the cap must be ABOVE the fixture's max shingle DF (7 at sf0.01, 25
    at sf0.1), so the capped plan returns byte-identical pairs and the
    DuckDB oracle (which computes exact uncapped Jaccard) stays green."""
    uncapped = xdedup.ngram_jaccard_pairs(docs, "doc_id", "text", ngram=3, threshold=0.2)
    capped = xdedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", ngram=3, threshold=0.2, max_doc_freq=50
    )
    a = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in uncapped.collect()}
    b = {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in capped.collect()}
    assert a == b


def test_ivf_ann_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()
    queries = emb.filter(F.col("vec_id") < 10)
    exact = xsim.brute_force_topk(emb, queries, k=5)
    truth = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx = xsim.ivf_topk(emb, queries, k=5, n_lists=16, n_probe=6)
    got = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.6, f"IVF recall {recall:.2f}"


def test_inverted_index_postings_consistent(spark, sf_dir):
    """postings length == doc_freq, postings sorted unique, and every
    posted doc really contains the token."""
    from dvh_airflow_kafka_spark.catalog import REGISTRY
    from dvh_airflow_kafka_spark.io import load_table

    rows = REGISTRY["token_inverted_index"].fn(spark, sf_dir).collect()
    assert rows
    docs = {
        r.doc_id: set(r.text.lower().split())
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for r in rows:
        # postings is a comma-joined ascending id string (nested arrays are
        # unhashable in the driver's pandas-based compare)
        posted = [int(d) for d in r.postings.split(",")]
        assert len(posted) == r.doc_freq
        assert posted == sorted(set(posted))
        for d in posted:
            assert r.token in docs[d], (r.token, d)


def test_prefix_filter_jaccard_is_lossless_and_prunes(spark, sf_dir):
    """PPJoin law: the prefix-filtered join returns EXACTLY the pairs the
    full inverted-index join returns at the same threshold, while
    indexing strictly fewer shingle occurrences."""
    from dvh_airflow_kafka_spark.ext.dedup import (
        jaccard_prefix_filter_pairs,
        ngram_jaccard_pairs,
    )
    from dvh_airflow_kafka_spark.ext.text import (
        tokens,
        word_ngrams_from_tokens,
    )
    from dvh_airflow_kafka_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    fast = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in jaccard_prefix_filter_pairs(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    full = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert fast == full and fast
    # pruning actually bites: prefix index strictly smaller than full
    sh = docs.select(
        F.array_distinct(
            word_ngrams_from_tokens(tokens(F.col("text")), 3)
        ).alias("s")
    )
    full_rows = sh.select(F.explode("s")).count()
    prefix_rows = sh.select(
        (F.size("s") - F.ceil(F.lit(0.5) * F.size("s")) + 1).cast("long").alias("p")
    ).agg(F.sum("p")).first()[0]
    assert prefix_rows < full_rows


def test_translit_casefold_converges_cross_lingual_spellings(spark):
    """Transliteration law: alternate orthographies of the same content
    normalize to one byte string (the reference F2 Æ/Ø/Å mapping
    generalized), so cross-lingual exact dedup groups them."""
    from dvh_airflow_kafka_spark.ext.text import translit_casefold

    rows = [
        (1, "Æble SMØRBRØD på vei"),      # Norwegian
        (2, "aeble smoerbroed paa vei"),   # ASCII digraph spelling
        (3, "Äble smörbröd på vei"),       # Swedish/German umlauts
        (4, "Grüße straße"),               # German
        (5, "gruesse strasse"),            # ASCII spelling
        (6, "café crème übermäßig"),       # mixed accents
        (7, "cafe creme uebermaessig"),
        (8, "something else entirely"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r.id: r.norm
        for r in df.select(
            "id", translit_casefold(F.col("text")).alias("norm")
        ).collect()
    }
    assert got[1] == got[2] == got[3]
    assert got[4] == got[5]
    assert got[6] == got[7]
    assert got[8] not in {got[1], got[4], got[6]}
    # idempotent: normalizing a normalized string is a no-op
    again = {
        r.id: r.norm2
        for r in df.select(
            "id",
            translit_casefold(
                translit_casefold(F.col("text"))
            ).alias("norm2"),
        ).collect()
    }
    assert again == got
