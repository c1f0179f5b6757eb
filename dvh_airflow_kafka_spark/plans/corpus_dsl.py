"""[EXT] Declarative corpus-curation pipelines.

The reference's whole product is "a YAML file becomes a pipeline"
(CONSUMER_CONFIG → Mapping.run, reference src/main.py:33-38 +
src/mapping.py:49-57); this module gives the training-data surface the
same shape: an ordered list of stage specs compiles into ONE lazy Spark
plan over the documents table — no materialisation between stages, so
Catalyst fuses the scan-level stages (mixture predicate, quality gate)
into the first pass and the only data-scale movements are the range
shuffles the distributed rank/prefix-sum machinery needs.

Stages (each validated by a pydantic spec, unknown keys rejected):

- ``mixture_sample``  — per-source keep fractions (sha-bucket predicate)
- ``temperature_mixture`` — α=0.5 exponent sampling: ~k·√count docs per
                        source, fractions from runtime counts (capped 1)
- ``token_budget``    — greedy highest-quality selection under a token
                        budget (two-pass distributed prefix sum)
- ``length_batches``  — terminal: sort by length (two-pass rank), cut
                        fixed-size batches, per-batch padding accounting
- ``quality_gate``    — min/max whitespace-token bounds
- ``dedup_exact``     — normalized-fingerprint dedup, longest-text
                        priority survivor
- ``frequency_cap``   — keep at most K docs per source by length priority
- ``global_shuffle``  — salted-hash deterministic order (adds
                        ``position`` via the two-pass distributed rank)
- ``pack_shards``     — token-budget shard packing over ``position``
                        (two-pass distributed prefix sum)

A config that mirrors ``pretraining_shard_recipe``'s stages produces the
bit-identical result — that equality is the catalog oracle for this
module (``corpus_pipeline_from_yaml``).
"""

from __future__ import annotations

from typing import Annotated, Literal, Optional, Union

import yaml
from pydantic import BaseModel, ConfigDict, Field, model_validator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.ext import text as xtext


class MixtureSampleSpec(BaseModel):
    model_config = ConfigDict(extra="forbid")
    op: Literal["mixture_sample"]
    fracs: dict[str, float]
    default_frac: float = 0.1
    salt: str = "mix-v1"


class QualityGateSpec(BaseModel):
    model_config = ConfigDict(extra="forbid")
    op: Literal["quality_gate"]
    min_tokens: int = 1
    max_tokens: Optional[int] = None


class DedupExactSpec(BaseModel):
    model_config = ConfigDict(extra="forbid")
    op: Literal["dedup_exact"]


class FrequencyCapSpec(BaseModel):
    model_config = ConfigDict(extra="forbid")
    op: Literal["frequency_cap"]
    max_per_source: int


class TemperatureMixtureSpec(BaseModel):
    """α=0.5 exponent sampling: keep ~k·√count docs per source, fractions
    computed from the counts AT THIS STAGE of the pipeline (a tiny
    per-source aggregate), capped at 1. The data-dependent cousin of
    ``mixture_sample``'s fixed fractions."""

    model_config = ConfigDict(extra="forbid")
    op: Literal["temperature_mixture"]
    k: float = 2.0
    salt: str = "mix-temp-v1"


class TokenBudgetSpec(BaseModel):
    """Greedy highest-quality selection under a whitespace-token budget
    (documents kept only if they fit entirely, quality desc / id asc)."""

    model_config = ConfigDict(extra="forbid")
    op: Literal["token_budget"]
    budget: int


class LengthBatchesSpec(BaseModel):
    """Terminal stage: sort by token length (distributed rank), cut
    ``batch_size``-sequence batches, emit per-batch padding accounting —
    the padding-minimization loader layout."""

    model_config = ConfigDict(extra="forbid")
    op: Literal["length_batches"]
    batch_size: int = 32


class CharlmGateSpec(BaseModel):
    """Statistical-LM quality gate (the CCNet filter as a DSL stage):
    train the add-one char-bigram model on the documents REACHING this
    stage, score each in-row, and keep documents whose average
    log-probability is at least ``min_avg_logprob`` nats/bigram. The
    model is a bounded |charset|² driver-side collect (eager at plan
    build, like ``temperature_mixture``'s counts); scoring adds no
    shuffle."""

    model_config = ConfigDict(extra="forbid")
    op: Literal["charlm_gate"]
    min_avg_logprob: float = -7.0


class CleanNormalizeSpec(BaseModel):
    """Ingest text normalization as a DSL stage: strip control chars,
    collapse whitespace runs, trim (``ext/text.clean_text`` — the same
    explicit-class regexes the oracled ``text_clean_normalize`` query
    pins cross-engine). Rewrites the ``text`` column in place, so every
    downstream token-derived stage sees the cleaned text. Scan-fused,
    no shuffle. Place BEFORE frequency_cap if byte-exact n_chars
    ordering matters — n_chars stays the raw ingest length."""

    model_config = ConfigDict(extra="forbid")
    op: Literal["clean_normalize"]


class SplitFilterSpec(BaseModel):
    """Train/test split gate: keep only the ``keep`` side of the
    deterministic sha-bucket 80/20 split (``ext/sampling.hash_split``'s
    predicate — same salt conventions as ``documents_train_test_split``).
    Scan-fused predicate, no shuffle."""

    model_config = ConfigDict(extra="forbid")
    op: Literal["split_filter"]
    keep: Literal["train", "test"] = "train"
    train_frac: float = 0.8
    salt: str = "split-v1"


class GlobalShuffleSpec(BaseModel):
    model_config = ConfigDict(extra="forbid")
    op: Literal["global_shuffle"]
    salt: str = "shuffle-v1"


class PackShardsSpec(BaseModel):
    model_config = ConfigDict(extra="forbid")
    op: Literal["pack_shards"]
    capacity: int = 2048


class PackSequencesSpec(BaseModel):
    """Token-level concat-and-split: documents SPAN sequence boundaries
    (unlike pack_shards, which keeps them whole)."""

    model_config = ConfigDict(extra="forbid")
    op: Literal["pack_sequences"]
    length: int = 512


StageSpec = Annotated[
    Union[
        MixtureSampleSpec,
        TemperatureMixtureSpec,
        QualityGateSpec,
        CharlmGateSpec,
        CleanNormalizeSpec,
        SplitFilterSpec,
        DedupExactSpec,
        FrequencyCapSpec,
        TokenBudgetSpec,
        LengthBatchesSpec,
        GlobalShuffleSpec,
        PackShardsSpec,
        PackSequencesSpec,
    ],
    Field(discriminator="op"),
]


class CorpusPipelineSpec(BaseModel):
    model_config = ConfigDict(extra="forbid")
    table: str = "documents"
    stages: list[StageSpec]

    @model_validator(mode="after")
    def _terminal_stage_is_last(self) -> "CorpusPipelineSpec":
        """``length_batches`` replaces the document frame with a batch
        aggregate — any stage after it would hit an unresolved-column
        AnalysisException deep in Spark; reject it at parse time."""
        for i, stage in enumerate(self.stages):
            if isinstance(stage, LengthBatchesSpec) and i != len(self.stages) - 1:
                raise ValueError(
                    "length_batches is a terminal stage; "
                    f"'{self.stages[i + 1].op}' cannot follow it"
                )
        return self


def parse_corpus_config(yaml_text: str) -> CorpusPipelineSpec:
    return CorpusPipelineSpec.model_validate(yaml.safe_load(yaml_text))


def _hex_thr(frac: float) -> str:
    from dvh_airflow_kafka_spark.ext.sampling import _hex_threshold

    return _hex_threshold(frac)


def run_corpus_pipeline(
    spark: SparkSession, yaml_text: str, sf_dir: str
) -> DataFrame:
    """Compile the YAML spec into one lazy plan and return the final
    frame. Pre-shuffle stages keep the full document row; after
    ``global_shuffle`` the frame is the slim (doc_id, n_tokens,
    position) projection; ``pack_shards`` appends shard_id /
    offset_in_shard."""
    from dvh_airflow_kafka_spark.ext.ranking import with_global_rank
    from dvh_airflow_kafka_spark.ext.sampling import (
        pack_into_shards,
        split_bucket,
    )
    from dvh_airflow_kafka_spark.io import load_table
    from pyspark.sql import Window

    spec = parse_corpus_config(yaml_text)
    df = load_table(spark, sf_dir, spec.table)
    toks = F.size(xtext.tokens(F.col("text")))
    shuffled = False

    for st in spec.stages:
        if isinstance(st, MixtureSampleSpec):
            thr = F.lit(_hex_thr(st.default_frac))
            for s, f in st.fracs.items():
                thr = F.when(F.col("source") == s, F.lit(_hex_thr(f))).otherwise(
                    thr
                )
            df = df.filter(split_bucket(F.col("doc_id"), st.salt) < thr)
        elif isinstance(st, TemperatureMixtureSpec):
            from dvh_airflow_kafka_spark.ext.sampling import (
                temperature_mixture_filter,
            )

            df = temperature_mixture_filter(df, k=st.k, salt=st.salt)
        elif isinstance(st, TokenBudgetSpec):
            from dvh_airflow_kafka_spark.ext.sampling import with_prefix_sum

            pre = with_prefix_sum(
                df.select(
                    "doc_id",
                    xtext.quality_score(F.col("text")).alias("__q"),
                    toks.cast("long").alias("__n"),
                ),
                "doc_id",
                F.col("__n"),
                order_by=[-F.col("__q"), F.col("doc_id")],
            )
            kept = pre.filter(
                F.col("before") + F.col("size") <= st.budget
            ).select("doc_id")
            df = df.join(kept, "doc_id", "left_semi")
        elif isinstance(st, LengthBatchesSpec):
            from dvh_airflow_kafka_spark.ext.ranking import length_batch_stats

            sized = df.select(
                "doc_id", toks.cast("long").alias("n_tokens")
            )
            df = length_batch_stats(sized, batch_size=st.batch_size)
        elif isinstance(st, QualityGateSpec):
            df = df.filter(toks >= st.min_tokens)
            if st.max_tokens is not None:
                df = df.filter(toks <= st.max_tokens)
        elif isinstance(st, CharlmGateSpec):
            t = df.filter(F.length("text") >= 2).select(
                "doc_id", F.lower(F.col("text")).alias("s")
            )
            model = xtext.charlm_model(t)
            kept = (
                t.select(
                    "doc_id",
                    (
                        xtext.charlm_score_sum(model).cast("double")
                        / F.lit(1000000.0)
                        / (F.char_length("s") - 1)
                    ).alias("__alp"),
                )
                .filter(F.col("__alp") >= st.min_avg_logprob)
                .select("doc_id")
            )
            df = df.join(kept, "doc_id", "left_semi")
        elif isinstance(st, CleanNormalizeSpec):
            df = df.withColumn("text", xtext.clean_text(F.col("text")))
        elif isinstance(st, SplitFilterSpec):
            thr = F.lit(_hex_thr(st.train_frac))
            b = split_bucket(F.col("doc_id"), st.salt)
            df = df.filter(b < thr if st.keep == "train" else b >= thr)
        elif isinstance(st, DedupExactSpec):
            w = Window.partitionBy(
                xtext.fingerprint(F.col("text"))
            ).orderBy(F.length("text").desc(), F.col("doc_id").asc())
            df = (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        elif isinstance(st, FrequencyCapSpec):
            w = Window.partitionBy("source").orderBy(
                F.col("n_chars").desc(), F.col("doc_id").asc()
            )
            df = (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= st.max_per_source)
                .drop("__rn")
            )
        elif isinstance(st, GlobalShuffleSpec):
            slim = df.select(
                "doc_id",
                toks.alias("n_tokens"),
                split_bucket(F.col("doc_id"), st.salt).alias("__b"),
            )
            df, _ = with_global_rank(slim, ["__b", "doc_id"], rank_col="position")
            df = df.drop("__b")
            shuffled = True
        elif isinstance(st, PackShardsSpec):
            if not shuffled:
                raise ValueError("pack_shards requires a global_shuffle stage first")
            packed = pack_into_shards(
                df,
                "position",
                F.col("n_tokens"),
                capacity=st.capacity,
                carry_cols=("doc_id",),
            )
            df = packed.select(
                "doc_id",
                "position",
                F.col("size").alias("n_tokens"),
                "shard_id",
                "offset_in_shard",
            )
        elif isinstance(st, PackSequencesSpec):
            if not shuffled:
                raise ValueError(
                    "pack_sequences requires a global_shuffle stage first"
                )
            from dvh_airflow_kafka_spark.ext.sampling import (
                explode_token_spans,
                with_prefix_sum,
            )

            pre = with_prefix_sum(
                df.filter(F.col("n_tokens") > 0),
                "position",
                F.col("n_tokens"),
                carry_cols=("doc_id",),
            )
            df = explode_token_spans(
                pre, st.length, id_cols=("doc_id", "position")
            )
    return df
