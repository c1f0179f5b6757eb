"""Catalog family module (mechanical split of catalog.py, round 10).

See ``catalog/__init__.py`` for the module map.  Registration order is
preserved by import order; do not reorder modules or @register blocks.
"""
from __future__ import annotations

from dvh_airflow_kafka_spark.ext import text as xtext
from dvh_airflow_kafka_spark.io import load_table
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from dvh_airflow_kafka_spark.catalog._core import (
    register,
)

# ==========================================================================
# [EXT] round-5 corpus-curation widening: deterministic global shuffle,
# mixture-controlled sampling, per-language stats, quality-priority dedup
# ==========================================================================


@register(
    "corpus_global_shuffle",
    sql="""
    SELECT doc_id,
           CAST((position - 1) % 64 AS INTEGER) AS shard,
           position
    FROM (
        SELECT doc_id,
               row_number() OVER (
                   ORDER BY substr(sha256('shuffle-v1' || CAST(doc_id AS VARCHAR)), 1, 8),
                            doc_id) AS position
        FROM documents)
    """,
)
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Deterministic global corpus shuffle — the pre-training rite:
    order documents by a salted content-hash (reproducible, partition-
    independent pseudo-randomness), take the exact global position via
    the distributed two-pass rank (``ext/ranking.py`` — range slices +
    broadcast offsets, NO single-partition window), and deal positions
    round-robin into 64 shards. Re-running with the same salt yields the
    identical order on any cluster; changing the salt re-shuffles."""
    from dvh_airflow_kafka_spark.ext.ranking import with_global_rank
    from dvh_airflow_kafka_spark.ext.sampling import split_bucket

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", split_bucket(F.col("doc_id"), "shuffle-v1").alias("__b")
    )
    ranked, _ = with_global_rank(keyed, ["__b", "doc_id"], rank_col="position")
    return ranked.select(
        "doc_id",
        ((F.col("position") - 1) % 64).cast("int").alias("shard"),
        "position",
    )


_MIX_FRACS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.75}
_MIX_DEFAULT = 0.1


def _mix_case_sql() -> str:
    from dvh_airflow_kafka_spark.ext.sampling import _hex_threshold

    cases = " ".join(
        f"WHEN '{s}' THEN '{_hex_threshold(f)}'" for s, f in _MIX_FRACS.items()
    )
    return f"CASE source {cases} ELSE '{_hex_threshold(_MIX_DEFAULT)}' END"


@register(
    "domain_mixture_sample",
    sql=f"""
    SELECT source,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM documents
    WHERE substr(sha256('mix-v1' || CAST(doc_id AS VARCHAR)), 1, 8)
          < {_mix_case_sql()}
    GROUP BY source
    """,
)
def domain_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Mixture-controlled corpus sampling: each source keeps a
    configured fraction (the data-mixture knob of a pre-training recipe
    — upsample curated sources, downsample crawl). Same sha-prefix
    bucketing as the train/test split, so the kept set is deterministic,
    engine-independent, and stable as the corpus grows. Pure scan-fused
    predicate: no shuffle before the final per-source rollup."""
    from dvh_airflow_kafka_spark.ext.sampling import _hex_threshold, split_bucket

    docs = load_table(spark, sf_dir, "documents")
    thr = F.lit(_hex_threshold(_MIX_DEFAULT))
    for s, f in _MIX_FRACS.items():
        thr = F.when(F.col("source") == s, F.lit(_hex_threshold(f))).otherwise(thr)
    return (
        docs.filter(split_bucket(F.col("doc_id"), "mix-v1") < thr)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("kept_chars"),
        )
    )


@register(
    "lang_token_stats",
    sql=r"""
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources,
           CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
               AS total_tokens,
           CAST(MIN(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
               AS min_tokens,
           CAST(MAX(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
               AS max_tokens
    FROM documents
    GROUP BY lang
    """,
)
def lang_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Per-language corpus inventory (docs, sources, token mass,
    extremes) — the table a mixture plan is written against. One
    map-side-combined shuffle over |langs| groups; token counts are
    exact integers so every engine agrees bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(xtext.tokens(F.col("text")))
    return (
        docs.select("lang", "source", toks.alias("__t"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
            F.sum("__t").cast("bigint").alias("total_tokens"),
            F.min("__t").cast("bigint").alias("min_tokens"),
            F.max("__t").cast("bigint").alias("max_tokens"),
        )
    )


@register(
    "dedup_survivor_priority",
    sql="""
    WITH pool AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000, text || '  ' FROM documents
    ), fp AS (
        SELECT doc_id,
               sha256(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                   AS fingerprint,
               length(text) AS n_chars
        FROM pool
    ), ranked AS (
        SELECT doc_id, fingerprint, n_chars,
               row_number() OVER (PARTITION BY fingerprint
                                  ORDER BY n_chars DESC, doc_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY fingerprint) AS n_copies
        FROM fp
    )
    SELECT doc_id AS survivor_id, fingerprint,
           CAST(n_copies AS BIGINT) AS n_copies
    FROM ranked WHERE rn = 1
    """,
)
def dedup_survivor_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Quality-priority exact dedup: duplicates collapse on the
    normalized-content fingerprint and the KEPT copy is chosen by an
    explicit priority (longest text, then lowest id) — "keep the best
    copy", not "keep an arbitrary first row". The whitespace-variant
    self-union makes every document a 2-copy group, exercising the
    survivor rule end to end. One key-partitioned window (never global);
    at 100 TB this is a single shuffle on the fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    pool = docs.select("doc_id", "text").unionAll(
        docs.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit("  ")).alias("text"),
        )
    )
    fp = pool.select(
        "doc_id",
        xtext.fingerprint(F.col("text")).alias("fingerprint"),
        F.length("text").alias("n_chars"),
    )
    w = Window.partitionBy("fingerprint")
    ranked = fp.select(
        "doc_id",
        "fingerprint",
        F.row_number()
        .over(w.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc()))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_copies"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        F.col("doc_id").alias("survivor_id"),
        "fingerprint",
        F.col("n_copies").cast("bigint").alias("n_copies"),
    )


_SHARD_RECIPE_SQL = (
    r"""
    WITH kept AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '\S+')) AS n_tokens,
               substr(sha256('shuffle-v1' || CAST(doc_id AS VARCHAR)), 1, 8)
                   AS b
        FROM documents
        WHERE substr(sha256('mix-v1' || CAST(doc_id AS VARCHAR)), 1, 8)
              < """
    + _mix_case_sql()
    + r"""
          AND len(regexp_extract_all(text, '\S+')) >= 20
    ), ranked AS (
        SELECT doc_id, n_tokens,
               row_number() OVER (ORDER BY b, doc_id) AS position
        FROM kept
    ), cum AS (
        SELECT doc_id, position, n_tokens,
               SUM(n_tokens) OVER (ORDER BY position
                                   ROWS UNBOUNDED PRECEDING) - n_tokens
                   AS before
        FROM ranked
    )
    SELECT doc_id, position,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(before // 2048 AS BIGINT) AS shard_id,
           CAST(before % 2048 AS BIGINT) AS offset_in_shard
    FROM cum
    """
)


@register("pretraining_shard_recipe", sql=_SHARD_RECIPE_SQL)
def pretraining_shard_recipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Capstone #3 — the pre-training data recipe end to end, every
    stage the distributed round-5 machinery: (1) mixture-controlled
    per-source sampling (sha-bucket predicate, scan-fused), (2) quality
    gate (min token count), (3) deterministic global shuffle (salted-hash
    order via the two-pass distributed rank), (4) token-budget shard
    packing (two-pass distributed prefix sum, 2048-token shards). No
    global window, no driver collect beyond the O(partitions) offsets —
    the whole recipe survives a 100 TB corpus with two range shuffles as
    its only data-scale movements."""
    from dvh_airflow_kafka_spark.ext.ranking import with_global_rank
    from dvh_airflow_kafka_spark.ext.sampling import _hex_threshold, split_bucket
    from dvh_airflow_kafka_spark.ext.sampling import pack_into_shards

    docs = load_table(spark, sf_dir, "documents")
    thr = F.lit(_hex_threshold(_MIX_DEFAULT))
    for s, f in _MIX_FRACS.items():
        thr = F.when(F.col("source") == s, F.lit(_hex_threshold(f))).otherwise(thr)
    toks = F.size(xtext.tokens(F.col("text")))
    kept = (
        docs.filter(split_bucket(F.col("doc_id"), "mix-v1") < thr)
        .select(
            "doc_id",
            toks.alias("n_tokens"),
            split_bucket(F.col("doc_id"), "shuffle-v1").alias("__b"),
        )
        .filter(F.col("n_tokens") >= 20)
    )
    ranked, _ = with_global_rank(kept, ["__b", "doc_id"], rank_col="position")
    packed = pack_into_shards(
        ranked,
        "position",
        F.col("n_tokens"),
        capacity=2048,
        carry_cols=("doc_id",),
    )
    return packed.select(
        "doc_id",
        "position",
        F.col("size").alias("n_tokens"),
        "shard_id",
        "offset_in_shard",
    )


_CORPUS_YAML = """
table: documents
stages:
  - op: mixture_sample
    fracs: {src0: 1.0, src1: 0.5, src2: 0.25, src3: 0.75}
    default_frac: 0.1
    salt: mix-v1
  - op: quality_gate
    min_tokens: 20
  - op: global_shuffle
    salt: shuffle-v1
  - op: pack_shards
    capacity: 2048
"""


@register("corpus_pipeline_from_yaml", sql=_SHARD_RECIPE_SQL)
def corpus_pipeline_from_yaml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] The corpus-curation surface as a CONFIG product — the same
    'YAML becomes a pipeline' contract the reference ships for its ETL
    spine (``pipeline_from_yaml_config``), applied to the training-data
    domain: ``plans/corpus_dsl.py`` validates the stage list (pydantic,
    unknown keys rejected) and compiles it into ONE lazy plan. This
    config mirrors ``pretraining_shard_recipe``'s stages, so it must
    hash-match that query's oracle bit for bit — the DSL adds zero
    semantic drift over the hand-built chain."""
    from dvh_airflow_kafka_spark.plans.corpus_dsl import run_corpus_pipeline

    return run_corpus_pipeline(spark, _CORPUS_YAML, sf_dir)


@register(
    "duplicated_ngram_spans",
    sql=r"""
    WITH w AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS wl FROM documents
    ), grams AS (
        SELECT doc_id, unnest(
            CASE WHEN len(wl) >= 8
                 THEN list_transform(range(1, len(wl) - 6),
                      i -> wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2] || ' ' ||
                           wl[i+3] || ' ' || wl[i+4] || ' ' || wl[i+5] || ' ' ||
                           wl[i+6] || ' ' || wl[i+7])
                 ELSE [array_to_string(wl, ' ')] END) AS g
        FROM w
    )
    SELECT g AS gram,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occurrences
    FROM grams
    GROUP BY g
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def duplicated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Exact duplicated-span detection — the word-level 8-gram form
    of the exact-substring dedup signal (Lee et al., 'Deduplicating
    Training Data Makes Language Models Better', ACL'22): every 8-token
    span occurring in two or more documents, with corpus-wide occurrence
    counts. Shape: positional shingles via higher-order functions (no
    UDF), explode, ONE map-side-combined aggregate keyed on the gram —
    the same inverted-index skeleton as the n-gram Jaccard dedup, so at
    100 TB the only data-scale movement is the keyed exchange, and a
    max-doc-freq cap (``ext/dedup.drop_hot_shingles``) bolts on
    unchanged when boilerplate spans get hot."""
    docs = load_table(spark, sf_dir, "documents")
    toksdf = docs.select("doc_id", xtext.tokens(F.col("text")).alias("__toks"))
    grams = toksdf.select(
        "doc_id",
        F.explode(xtext.word_ngrams_from_tokens(F.col("__toks"), 8)).alias("gram"),
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )


