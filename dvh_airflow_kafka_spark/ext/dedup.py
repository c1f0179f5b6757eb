"""Deduplication operators: exact → MinHash-LSH → SimHash → n-gram
Jaccard → embedding cosine.

Scale design notes (the point of each choice at 100 TB):

- **Exact**: hash-groupBy on a content hash — one shuffle keyed by
  sha256(text); map-side partial aggregation collapses most duplicates
  before the exchange.
- **MinHash**: signatures are computed *per row* with higher-order
  functions (``transform`` + ``array_min`` over the shingle array) — zero
  shuffles, zero Python. Candidate generation is the only shuffle: explode
  ``b`` bands per doc and self-join on (band, signature-slice). This is the
  standard shingle→minhash→band→bucket-join pipeline; the cross-doc blowup
  is bounded by band-bucket collisions, not |docs|².
- **SimHash**: 64-bit signature from token-hash bit votes; near-pairs via
  the pigeonhole band trick (hamming ≤ d ⇒ at least one of d+1 chunks
  equal), so candidate join is equi-join on chunks, never a cross join.
- **Embedding cosine**: exact threshold join is quadratic — kept for
  verification scale; the scale path is LSH bucketing in
  ``ext.similarity``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dvh_airflow_kafka_spark.ext.text import tokens, word_ngrams_from_tokens

# 32-bit universal-hash family over a prime field; coefficients < 2^30
# keep a*h + b within signed-64 range (no overflow, no UDF).
_MERSENNE_P = 4294967311  # smallest prime > 2^32
_HASH_MASK = 4294967295  # 2^32 - 1


def exact_dedup_survivors(
    df: DataFrame, content_cols: Sequence[str], id_col: str
) -> DataFrame:
    """One survivor (min id) per distinct content — hash-groupBy exact
    dedup. Returns (survivor id, n_copies, content hash)."""
    content = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols])
    return (
        df.groupBy(F.sha2(content.cast("binary"), 256).alias("content_hash"))
        .agg(
            F.min(F.col(id_col)).alias("survivor_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _hash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 30, size=num_perm).astype(np.int64)
    b = rng.randint(0, 1 << 30, size=num_perm).astype(np.int64)
    return a, b


def drop_hot_shingles(
    exploded: DataFrame, shingle_col: str, max_doc_freq: int
) -> DataFrame:
    """Remove shingles whose document frequency exceeds ``max_doc_freq``
    from an exploded (id, shingle) frame — standard stop-shingle pruning
    in near-dup pipelines. A shingle shared by p% of a 100 TB corpus
    makes one candidate bucket quadratic in p·|docs|; hot shingles carry
    ~zero similarity signal, so the cap bounds every bucket at
    ``max_doc_freq²`` candidate pairs with negligible recall cost.

    The hot set is tiny by construction (Σ DF is fixed, so at most
    Σ DF / max_doc_freq shingles can exceed the cap) — it broadcasts."""
    hot = (
        exploded.groupBy(shingle_col)
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > max_doc_freq)
        .select(shingle_col)
    )
    return exploded.join(F.broadcast(hot), shingle_col, "left_anti")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    shingles_col: str,
    num_perm: int = 64,
    seed: int = 42,
    max_doc_freq: Optional[int] = None,
) -> DataFrame:
    """(id, array<long> signature) per document: ``min_s (a_i·h(s) + b_i)
    mod p`` for each permutation i.

    Shape: explode shingles → one codegen'd aggregate with num_perm MIN
    columns → array reassembly. The explode+groupBy costs one shuffle
    (map-side partial MINs collapse it to ~|docs| rows per partition
    before the exchange), but every expression stays in whole-stage
    codegen. The shuffle-free alternative — nested higher-order lambdas —
    falls out of codegen into interpreted eval (~10µs per element) and is
    ~50× slower at corpus scale."""
    a, b = _hash_params(num_perm, seed)
    ex = df.select(
        F.col(id_col).alias("__id"), F.explode(F.col(shingles_col)).alias("__s")
    )
    if max_doc_freq is not None:
        ex = drop_hot_shingles(ex, "__s", max_doc_freq)
    ex = ex.select(
        "__id", F.xxhash64(F.col("__s")).bitwiseAND(F.lit(_HASH_MASK)).alias("__h")
    )
    mins = [
        F.min((F.lit(int(ai)) * F.col("__h") + F.lit(int(bi))) % F.lit(_MERSENNE_P))
        .alias(f"__m{i}")
        for i, (ai, bi) in enumerate(zip(a, b))
    ]
    return (
        ex.groupBy("__id")
        .agg(*mins)
        .select(
            "__id",
            F.array(*[F.col(f"__m{i}") for i in range(num_perm)]).alias("__sig"),
        )
    )


def jaccard_sets(a: Column, b: Column) -> Column:
    """Exact Jaccard over the *sets* of two string arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    shingles_col: str,
    num_perm: int = 64,
    bands: int = 8,
    seed: int = 42,
    max_doc_freq: Optional[int] = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding: docs sharing any
    (band, signature-slice) bucket. Returns (id_a, id_b) with id_a < id_b.
    Threshold ≈ (1/bands)^(bands/num_perm); 8 bands × 8 rows ≈ 0.77."""
    rows = num_perm // bands
    sigs = minhash_signatures(df, id_col, shingles_col, num_perm, seed, max_doc_freq)
    # Bucket key = xxhash64 of the signature slice: an 8-byte long on the
    # shuffle wire instead of a JSON string (~10× narrower); 64-bit
    # collisions only ever ADD candidates, and every candidate is
    # exact-Jaccard-verified downstream.
    banded = sigs.select(
        "__id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.slice(F.col("__sig"), i * rows + 1, rows))
                    for i in range(bands)
                ]
            )
        ).alias("__band", "__bucket"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.__band") == F.col("r.__band"))
            & (F.col("l.__bucket") == F.col("r.__bucket"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 3,
    num_perm: int = 64,
    bands: int = 8,
    threshold: float = 0.7,
    seed: int = 42,
    max_doc_freq: Optional[int] = None,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → signature → band →
    bucket-join → exact-Jaccard verification of candidates. Returns
    (id_a, id_b, jaccard) for verified pairs ≥ threshold.

    ``max_doc_freq`` prunes stop-shingles from the signatures (candidate
    generation only — the exact-Jaccard verify still uses full shingle
    sets), bounding bucket sizes at corpus scale."""
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    shingled = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__toks"))
        .select("__id", word_ngrams_from_tokens(F.col("__toks"), ngram).alias("__sh"))
        # localCheckpoint (not cache): shingles are read by candidate
        # generation and verification, and the blocks release when the
        # frame is collected instead of pinning the CacheManager
        .localCheckpoint(eager=False)
    )
    cands = minhash_lsh_candidates(
        shingled, "__id", "__sh", num_perm, bands, seed, max_doc_freq
    )
    a = shingled.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sh_a"))
    b = shingled.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__sh_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            jaccard_sets(F.col("__sh_a"), F.col("__sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def _simhash_from_tokens(toks: DataFrame) -> DataFrame:
    """(__id, __h token-hash) rows -> (__id, simhash): SWAR bit-plane
    aggregation. Instead of 64 per-bit ``sum(when(...))`` aggregates, mask
    the hash into 16 bit-planes — ``(h >> j) & 0x0001000100010001`` puts
    bits j, j+16, j+32, j+48 each in its own 16-bit lane — and SUM the
    planes: one long accumulates FOUR independent bit counters (exact
    while a document has < 65536 tokens; callers cap token streams, and
    the fixture maximum is ~10^2). 16 sums + 1 count replace 64
    conditional sums — a 4x cut in aggregate expressions on the hot
    300k-row explode — then the signature reassembles per doc (one row
    each): bit b set iff ``2*count_b > n`` ≡ the ±1 vote sum being
    positive (tie → 0, same as before). One shuffle (groupBy id) with
    map-side partial aggregation. Shared by the text and binary
    (multimodal) SimHash paths."""
    lane_mask = 0x0001000100010001
    planes = [
        F.sum(
            F.shiftrightunsigned(F.col("__h"), j).bitwiseAND(F.lit(lane_mask))
        ).alias(f"__p{j}")
        for j in range(16)
    ]
    agg = toks.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"), *planes)
    one = F.lit(1).cast("long")
    sig = F.lit(0).cast("long")
    for b in range(64):
        j, k = b % 16, b // 16
        count_b = F.shiftrightunsigned(F.col(f"__p{j}"), 16 * k).bitwiseAND(
            F.lit(0xFFFF)
        )
        sig = sig.bitwiseOR(
            F.when(count_b * 2 > F.col("__n"), F.shiftleft(one, b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return agg.select("__id", sig.alias("simhash"))


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document: tokens vote ±1 on each bit of their
    xxhash64; the signature's bit b is 1 iff the vote sum is positive.
    Entirely JVM-side: explode tokens, 64 conditional sums, bit reassembly."""
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    toks = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("__id"),
            F.explode(tokens(F.col(text_col))).alias("__tok"),
        )
        .withColumn("__h", F.xxhash64(F.col("__tok")))
    )
    return _simhash_from_tokens(toks).select(
        F.col("__id").alias(id_col), "simhash"
    )


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming. Pigeonhole
    banding: split the 64-bit signature into max_hamming+1 chunks — any
    pair within the radius shares at least one exact chunk, so candidates
    come from equi-joins on chunks (never a cross join)."""
    return simhash_band_pairs(
        simhash64(df, id_col, text_col), id_col, max_hamming=max_hamming
    )


def simhash_band_pairs(
    sigs: DataFrame, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """(id, simhash) -> verified near-dup pairs via the pigeonhole chunk
    equi-join. Shared by the text and binary (multimodal) paths."""
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    chunks = sigs.select(
        F.col(id_col).alias("__id"),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    for i in range(n_chunks)
                ]
            )
        ).alias("__chunk_idx", "__chunk"),
    )
    l, r = chunks.alias("l"), chunks.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.__chunk_idx") == F.col("r.__chunk_idx"))
            & (F.col("l.__chunk") == F.col("r.__chunk"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(
            F.col("l.__id").alias("id_a"),
            F.col("r.__id").alias("id_b"),
            F.col("l.simhash").alias("__sa"),
            F.col("r.simhash").alias("__sb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb")))
    return cands.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# --------------------------------------------------------------------------
# n-gram Jaccard (exact, via shingle inverted index)
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 3,
    threshold: float = 0.5,
    max_doc_freq: Optional[int] = None,
) -> DataFrame:
    """Exact n-gram-set Jaccard for every pair sharing ≥1 shingle —
    inverted-index join (explode distinct shingles, self-join on shingle,
    count shared), never a cross join. Output (id_a, id_b, jaccard ≥
    threshold).

    ``max_doc_freq`` drops shingles above that document frequency from
    the similarity computation entirely (set sizes AND intersections —
    self-consistent Jaccard over the informative shingles). A stop-phrase
    shingle shared by 1% of a 100 TB corpus would otherwise make one
    inverted-index bucket quadratic; with the cap every bucket is
    ≤ max_doc_freq² pairs. Default None keeps exact set semantics."""
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    sh = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__toks"))
        .select(
            F.col("__id"),
            F.array_distinct(word_ngrams_from_tokens(F.col("__toks"), ngram)).alias(
                "__sh"
            ),
        )
        # localCheckpoint (not cache) — see minhash_near_duplicates
        .localCheckpoint(eager=False)
    )
    inv = sh.select(F.col("__id"), F.explode(F.col("__sh")).alias("__s"))
    if max_doc_freq is not None:
        inv = drop_hot_shingles(inv, "__s", max_doc_freq)
    # Set sizes derived from the exploded index (shingles are distinct per
    # doc), not from a second shingle build; the join's two shuffles over
    # `inv` are identical subtrees, so ReuseExchange scans/shingles once.
    sizes = inv.groupBy("__id").agg(F.count(F.lit(1)).cast("int").alias("__n"))
    l, r = inv.alias("l"), inv.alias("r")
    shared = (
        l.join(r, (F.col("l.__s") == F.col("r.__s")) & (F.col("l.__id") < F.col("r.__id")))
        .groupBy(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__shared"))
    )
    na = sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    nb = sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    jac = F.col("__shared").cast("double") / (
        F.col("__na") + F.col("__nb") - F.col("__shared")
    ).cast("double")
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 3,
    threshold: float = 0.5,
    max_doc_freq: Optional[int] = None,
) -> DataFrame:
    """Exact n-gram-set CONTAINMENT for every pair sharing ≥1 shingle:
    ``C(A→B) = |A∩B| / |A|`` (Broder, 'On the resemblance and
    containment of documents', SEQUENCES'97).  Containment is the
    asymmetric companion to Jaccard: a short document pasted verbatim
    inside a much longer one has near-zero Jaccard (the union is huge)
    but containment ≈ 1 — the quote/boilerplate/excerpt duplication
    class symmetric near-dup misses entirely.

    Same inverted-index plan as ``ngram_jaccard_pairs`` (explode
    distinct shingles, self-join on shingle, count shared — never a
    cross join; ``max_doc_freq`` caps any bucket at DF² pairs).  Output
    (id_a, id_b, containment_a, containment_b) with ``id_a < id_b``,
    kept when EITHER direction reaches ``threshold``; ``containment_a``
    is the fraction of the *a*-side's shingles shared.

    With ``max_doc_freq`` set, BOTH the intersection and the |A| / |B|
    denominators are measured over the post-``drop_hot_shingles``
    shingle sets — containment over *informative* shingles, the same
    convention ``ngram_jaccard_pairs`` uses.  Unlike Jaccard this
    visibly reinterprets the headline formula: a document made mostly
    of hot boilerplate shingles has a small pruned |A|, so its
    containment reflects only its distinctive content (usually the
    more useful reading, but not literal Broder containment).
    """
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    sh = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__toks"))
        .select(
            F.col("__id"),
            F.array_distinct(word_ngrams_from_tokens(F.col("__toks"), ngram)).alias(
                "__sh"
            ),
        )
        .localCheckpoint(eager=False)
    )
    inv = sh.select(F.col("__id"), F.explode(F.col("__sh")).alias("__s"))
    if max_doc_freq is not None:
        inv = drop_hot_shingles(inv, "__s", max_doc_freq)
    sizes = inv.groupBy("__id").agg(F.count(F.lit(1)).cast("int").alias("__n"))
    l, r = inv.alias("l"), inv.alias("r")
    shared = (
        l.join(r, (F.col("l.__s") == F.col("r.__s")) & (F.col("l.__id") < F.col("r.__id")))
        .groupBy(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__shared"))
    )
    na = sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    nb = sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    ca = F.col("__shared").cast("double") / F.col("__na").cast("double")
    cb = F.col("__shared").cast("double") / F.col("__nb").cast("double")
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            ca.alias("containment_a"),
            cb.alias("containment_b"),
        )
        .filter(
            F.greatest(F.col("containment_a"), F.col("containment_b"))
            >= F.lit(threshold)
        )
    )


def jaccard_prefix_filter_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard ≥ ``threshold`` pairs via PREFIX FILTERING (the
    AllPairs/PPJoin candidate reduction, Bayardo et al. WWW'07; Xiao et
    al. WWW'08) — provably the SAME output as the full inverted-index
    join, from a fraction of its candidate pairs.

    Under any global canonical order of shingles, J(A,B) ≥ t implies
    |A∩B| ≥ ⌈t·|A|⌉, so by pigeonhole A and B must share a shingle
    within the first |A| − ⌈t·|A|⌉ + 1 elements of A (and likewise B):
    indexing ONLY those prefixes loses no qualifying pair. The canonical
    order here is (global document frequency asc, shingle asc) — rarest
    first, so prefixes are maximally selective and hot shingles
    (quadratic buckets, what ``drop_hot_shingles`` exists for) land in
    the UNINDEXED suffix for free. Candidates then verify with an
    in-row ``array_intersect`` on the full shingle arrays — exact set
    semantics, no sampling.

    Plan: shingle build (checkpointed once) → DF count + per-doc rank
    window (both keyed) → prefix-only self-join → bounded candidate
    pairs → two id-keyed joins for in-row verification. At t=0.5 the
    index carries ~half the shingle occurrences and every bucket is a
    rare-shingle bucket; at 100 TB this is the difference between an
    inverted index over everything and one over the selective tail."""
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    sh = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__toks")
        )
        .select(
            F.col("__id"),
            F.array_distinct(
                word_ngrams_from_tokens(F.col("__toks"), ngram)
            ).alias("__sh"),
        )
        .localCheckpoint(eager=False)
    )
    inv = sh.select(F.col("__id"), F.explode(F.col("__sh")).alias("__s"))
    dfreq = inv.groupBy("__s").agg(F.count(F.lit(1)).alias("__df"))
    # |A| directly off the (already-distinct) shingle array: identical to
    # counting inv's exploded rows per __id, minus that branch's explode
    # + aggregation exchange (guide §2.4 — remove shuffles outright)
    sizes = sh.select(
        F.col("__id"), F.size(F.col("__sh")).cast("int").alias("__n")
    )
    w = Window.partitionBy("__id").orderBy("__df", "__s")
    prefix = (
        inv.join(dfreq, "__s")
        .join(sizes, "__id")
        .withColumn("__rk", F.row_number().over(w))
        .filter(
            F.col("__rk")
            <= F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")) + 1
        )
        .select("__id", "__s")
    )
    l, r = prefix.alias("l"), prefix.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.__s") == F.col("r.__s"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(
            F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b")
        )
        .distinct()
        # candidate pairs are tiny BY BYTES (two ids), so AQE coalesces
        # their exchange to a handful of partitions — but each pair costs
        # a full-array intersect downstream, so bytes mispredict CPU and
        # verification ran ~5-wide on a 32-core session.  Repartition to
        # the cluster parallelism and CHECKPOINT: the verify query then
        # starts from materialized wide blocks, and AQE never re-plans
        # (and mid-flight-cancels) the candidate stages inside the verify
        # job — the cancellation is what spammed benign accumulator
        # errors when this was a plain repartition.
        .repartition(
            df.sparkSession.sparkContext.defaultParallelism,
            "id_a",
            "id_b",
        )
        .localCheckpoint()
    )
    a = sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sha"))
    b = sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__shb"))
    inter = F.size(F.array_intersect(F.col("__sha"), F.col("__shb")))
    jac = inter.cast("double") / (
        F.size(F.col("__sha")) + F.size(F.col("__shb")) - inter
    ).cast("double")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# Embedding cosine near-dup (exact, broadcast-probe matmul scan)
# --------------------------------------------------------------------------


def embedding_near_duplicates(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    probe_ids: Optional[DataFrame] = None,
) -> DataFrame:
    """Exact pairs with round(cosine, 6) ≥ threshold and id_a < id_b,
    id_a drawn from the probe side.

    Plan shape: the (small) probe side is collected to a normalized numpy
    matrix broadcast in the UDF closure; the corpus is scanned ONCE by an
    Arrow-batched ``mapInPandas`` doing a single matmul per batch. Linear
    in |corpus|, no join of any kind — replaces the former
    ``l.join(r, id_a < id_b)`` BroadcastNestedLoopJoin that was quadratic
    and paid an interpreted per-element cosine per pair.

    Scale contract: |probe| must fit in executor memory (chunk the probe
    side and union the scans for larger probes). For UNBOUNDED all-pairs
    near-dup at corpus scale, generate candidates with SRP-LSH
    (``similarity.lsh_bucketed_topk``'s bucketer) instead — that path is
    approximate, so this exact scan remains the verification oracle."""
    from dvh_airflow_kafka_spark.ext.similarity import (
        ROUND_DIGITS,
        _collect_matrix,
        _normalize,
        _vstack,
    )
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    import pandas as pd
    from pyspark.sql import types as T

    probe = emb if probe_ids is None else emb.join(
        probe_ids.select(F.col(id_col)), id_col, "left_semi"
    )
    p_ids, p_mat = _collect_matrix(probe, id_col, vec_col)
    pn = _normalize(p_mat).T  # (dim, np)

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def scan(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            sims = np.round(_normalize(_vstack(pdf[vec_col])) @ pn, ROUND_DIGITS)
            mask = (sims >= threshold) & (p_ids[None, :] < ids[:, None])
            bi, pj = np.nonzero(mask)
            if bi.size:
                yield pd.DataFrame(
                    {"id_a": p_ids[pj], "id_b": ids[bi], "cosine": sims[bi, pj]}
                )

    return ensure_parallelism(emb).mapInPandas(scan, schema=out_schema)


# --------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style): cluster by embedding, keep one per
# near-duplicate neighborhood
# --------------------------------------------------------------------------


def semantic_dedup_survivors(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float = 0.3,
    n_bits: int = 8,
    dim: int = 64,
    seed: int = 1337,
    max_bucket_size: Optional[int] = None,
    persist_assignments: bool = True,
) -> DataFrame:
    """Semantic deduplication (Abbas et al., 'SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication', 2023): drop
    every document whose embedding is within ``threshold`` cosine of a
    LOWER-id member of the same semantic cluster; emit the survivors with
    their cluster id.

    The paper clusters with k-means; this operator uses a seeded
    random-hyperplane (SRP) partition instead — one sign-bit bucket per
    vector — because the hyperplanes are DATA-INDEPENDENT: the whole
    pipeline (bucketing included) replays exactly in ANSI SQL, so the
    dedup decision itself is oracle-checkable, and clustering costs one
    linear corpus pass (a single Arrow-batched matmul — no iterative
    assignment passes over 100 TB). A k-means partition can be swapped in
    via ``similarity.ivf_assign_udf`` when a trained quantizer is worth
    the extra passes; the survivor logic below is partition-agnostic.

    Plan shape: bucket (one pandas-UDF matmul pass, no shuffle) →
    self-equi-join ON the bucket (never all-pairs; expected bucket size
    is |corpus| / 2^n_bits) → exact rounded cosine on candidates only →
    ``id_b``-distinct duplicate set → broadcast-able anti-join back onto
    the corpus. Keep-lowest-id is deterministic and engine-independent.

    ``max_bucket_size`` is the hot-bucket cap (the semantic analogue of
    ``drop_hot_shingles``): buckets larger than the cap are EXCLUDED
    from pair generation — their members all survive — bounding any
    bucket's pair count at cap² when embedding mass concentrates (a
    degenerate encoder, zero vectors, template documents). The cap
    trades missed dups inside pathological buckets for a hard join
    bound; ``None`` (default) disables it, and the registered oracled
    query runs uncapped (the cap is not SQL-replayed).

    CACHE LIFETIME (caller-owned): with ``persist_assignments=True`` the
    (id, vector, bucket) assignment frame is pinned in executor storage
    and NOT unpersisted here — the returned frame is lazy and still
    references it. The cache is LRU-evictable (MEMORY_AND_DISK), but a
    long-lived session issuing many calls should either unpersist via
    ``spark.catalog.clearCache()`` between batches, pass
    ``persist_assignments=False`` (the bucketing UDF then re-runs ~5×
    due to optimizer re-evaluation — correct, just slower), or
    materialise assignments to parquet once (the
    ``similarity.ivf_index_build`` pattern) and run the survivor logic
    over the stored table.
    """
    from dvh_airflow_kafka_spark.ext.similarity import (
        _hyperplanes,
        pair_cosine,
        srp_buckets_udf,
    )
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    planes = _hyperplanes(dim=dim, n_bits=n_bits, n_tables=1, seed=seed)
    buckets = srp_buckets_udf(planes)
    # Materialise the cluster assignment ONCE (persist): without it the
    # optimizer's join-key isnotnull pushdown re-evaluates the bucketing
    # UDF up to twice per join side plus once for the anti-join branch —
    # five corpus passes for one logical assignment. This is the
    # SemDeDup "store the cluster assignments" step; a production run at
    # corpus scale writes them to parquet instead (the
    # ``similarity.ivf_index_build`` pattern) and every downstream stage
    # reads the materialised table.
    base = ensure_parallelism(emb).select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
        buckets(F.col(vec_col))[0].alias("semantic_bucket"),
    )
    if persist_assignments:
        base = base.persist()
    pair_src = base
    if max_bucket_size is not None:
        hot = (
            base.groupBy("semantic_bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_bucket_size)
            .select("semantic_bucket")
        )
        pair_src = base.join(F.broadcast(hot), "semantic_bucket", "left_anti")
    l, r = pair_src.alias("l"), pair_src.alias("r")
    dups = (
        l.join(
            r,
            (F.col("l.semantic_bucket") == F.col("r.semantic_bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .filter(pair_cosine(F.col("l.__v"), F.col("r.__v")) >= F.lit(threshold))
        .select(F.col(f"r.{id_col}").alias(id_col))
        .distinct()
    )
    return base.join(dups, id_col, "left_anti").select(id_col, "semantic_bucket")


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
) -> DataFrame:
    """Exact-substring dedup with span REMOVAL (Lee et al., 'Deduplicating
    Training Data Makes Language Models Better', ACL'22): every word-level
    ``ngram``-token span occurring in >= 2 documents is deleted from every
    document EXCEPT the keeper (the minimum id containing that span);
    remaining tokens are re-joined in order. This is the transform that
    *produces* the cleaned corpus, downstream of the detection signal
    ``duplicated_ngram_spans`` emits.

    Output: ``(id_col, n_tokens int, n_removed int, cleaned_sha)`` — one
    row per input document (``cleaned_sha`` = sha256 of the kept tokens
    space-joined; the empty document hashes the empty string).

    Plan shape — the inverted-index skeleton end-to-end, no UDF anywhere:

    1. positional shingles per doc via higher-order functions (zero
       shuffles; docs shorter than ``ngram`` tokens generate none);
    2. ONE map-side-combined aggregate keyed on the gram -> (keeper =
       min id, distinct-doc count) — the same exchange the detection
       query pays; a hot-gram cap (``drop_hot_shingles``) bolts on here
       unchanged when boilerplate spans get hot at corpus scale;
    3. gram-keyed join back to occurrences, positions expanded with
       ``sequence`` + ``explode`` and deduplicated -> covered (doc, pos);
    4. (doc, pos)-keyed LEFT ANTI join deletes covered tokens — at 100 TB
       every exchange so far is keyed by gram or (doc, pos), never
       all-pairs;
    5. per-doc re-assembly: ``collect_list(struct(pos, tok))`` +
       ``array_sort`` (struct sort = pos order) — grouped by doc id, so
       state is bounded by the longest document, not the corpus.
    """
    toks = docs.select(
        id_col, tokens(F.col(text_col)).alias("__wl")
    )
    grams = toks.filter(F.size("__wl") >= ngram).select(
        id_col,
        F.posexplode(word_ngrams_from_tokens(F.col("__wl"), ngram)).alias(
            "__i0", "__g"
        ),
    )
    dup = (
        grams.groupBy("__g")
        .agg(
            F.min(id_col).alias("__keeper"),
            F.count_distinct(id_col).alias("__nd"),
        )
        .filter(F.col("__nd") >= 2)
    )
    covered = (
        grams.join(dup, "__g")
        .filter(F.col(id_col) != F.col("__keeper"))
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("__i0"), F.col("__i0") + (ngram - 1))
            ).alias("__p0"),
        )
        .distinct()
    )
    tokpos = toks.select(
        id_col, F.posexplode("__wl").alias("__p0", "__tok")
    )
    kept = tokpos.join(covered, [id_col, "__p0"], "left_anti")
    kept_agg = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__kept"),
        F.sha2(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__p0", "__tok"))),
                    lambda s: s["__tok"],
                ),
                " ",
            ),
            256,
        ).alias("cleaned_sha"),
    )
    return (
        toks.select(id_col, F.size("__wl").alias("n_tokens"))
        .join(kept_agg, id_col, "left")
        .select(
            id_col,
            F.col("n_tokens").cast("int").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce(F.col("__kept"), F.lit(0)))
            .cast("int")
            .alias("n_removed"),
            F.coalesce(F.col("cleaned_sha"), F.sha2(F.lit(""), 256)).alias(
                "cleaned_sha"
            ),
        )
    )


def jaccard_ingest_gate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    incoming_pred: Column,
    ngram: int = 3,
    threshold: float = 0.5,
    max_doc_freq: Optional[int] = None,
) -> DataFrame:
    """Ingest-time near-dup gate — the LLM-corpus analogue of the
    reference's insert-time EXACT anti-join (`operators/dedup.py`): each
    INCOMING document (rows matching ``incoming_pred``) is admitted only
    if its exact n-gram Jaccard against every EXISTING document stays
    below ``threshold``. Output: one row per incoming doc —
    ``(id_col, max_jaccard double, kept int)``.

    The candidate join is DIRECTIONAL (incoming shingles against
    existing shingles only): incoming x incoming and existing x existing
    pairs are never generated, so a small ingest batch against a 100 TB
    corpus pays |batch-shingles| bucket probes, not corpus pairs. The
    shingle DF cap (``drop_hot_shingles``) applies over the COMBINED
    index before the split so both sides prune the same stop shingles."""
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    sh = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("__id"),
            incoming_pred.alias("__in"),
            tokens(F.col(text_col)).alias("__toks"),
        )
        .select(
            "__id",
            "__in",
            F.array_distinct(word_ngrams_from_tokens(F.col("__toks"), ngram)).alias(
                "__sh"
            ),
        )
        # localCheckpoint (not cache) — see minhash_near_duplicates
        .localCheckpoint(eager=False)
    )
    inv = sh.select("__id", "__in", F.explode("__sh").alias("__s"))
    if max_doc_freq is not None:
        inv = drop_hot_shingles(inv, "__s", max_doc_freq)
    sizes = inv.groupBy("__id").agg(F.count(F.lit(1)).cast("int").alias("__n"))
    newc = inv.filter(F.col("__in")).select(
        F.col("__id").alias("__in_id"), "__s"
    )
    old = inv.filter(~F.col("__in")).select(
        F.col("__id").alias("__ex_id"), "__s"
    )
    shared = (
        newc.join(old, "__s")
        .groupBy("__in_id", "__ex_id")
        .agg(F.count(F.lit(1)).alias("__shared"))
    )
    na = sizes.select(F.col("__id").alias("__in_id"), F.col("__n").alias("__na"))
    nb = sizes.select(F.col("__id").alias("__ex_id"), F.col("__n").alias("__nb"))
    jac = F.col("__shared").cast("double") / (
        F.col("__na") + F.col("__nb") - F.col("__shared")
    ).cast("double")
    best = (
        shared.join(na, "__in_id")
        .join(nb, "__ex_id")
        .select("__in_id", jac.alias("__j"))
        .groupBy("__in_id")
        .agg(F.max("__j").alias("__mx"))
    )
    return (
        sh.filter(F.col("__in"))
        .select(F.col("__id").alias(id_col))
        .join(best, F.col(id_col) == F.col("__in_id"), "left")
        .select(
            id_col,
            F.coalesce(F.col("__mx"), F.lit(0.0)).alias("max_jaccard"),
            (F.coalesce(F.col("__mx"), F.lit(0.0)) < threshold)
            .cast("int")
            .alias("kept"),
        )
    )
