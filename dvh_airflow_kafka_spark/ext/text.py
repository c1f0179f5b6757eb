"""Text-analysis operators over a document corpus.

All pure Column expressions — tokenization, counting, scoring and
fingerprinting run inside whole-stage codegen with zero Python hops, so a
100 TB corpus scan is IO-bound, not CPU-bound.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Tiny per-language stopword heuristics (public common-word lists). The
# lang-id is a deterministic n-gram/stopword heuristic, not a model —
# fasttext-style models would be an external dependency.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "for", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "im", "ein"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
}

# BPE-ish pre-tokenizer: word pieces or single non-space punctuation —
# the classic GPT-2 style split approximation without the merges table.
BPE_TOKEN_RE = r"\w+|[^\w\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (collapsing runs, trimming ends).
    ``split('')`` yields ``['']`` in Spark; the empty-string removal makes
    an empty/whitespace-only document tokenize to ``[]`` — the same
    answer as ``regexp_extract_all(text, '\\S+')`` on the oracle side."""
    trimmed = F.regexp_replace(text.cast("string"), r"^\s+|\s+$", "")
    return F.array_remove(F.split(trimmed, r"\s+"), "")


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: `\\w+` pieces plus standalone punctuation."""
    return F.regexp_count(text.cast("string"), F.lit(BPE_TOKEN_RE))


def stopword_hits(text: Column, stopwords: tuple[str, ...]) -> Column:
    """Occurrences (not distinct) of any stopword among the tokens."""
    stoplist = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(tokens(F.lower(text)), lambda w: F.array_contains(stoplist, w)))


def lang_scores(text: Column, langs: dict[str, tuple[str, ...]] | None = None) -> dict[str, Column]:
    """Per-language stopword-hit counts."""
    langs = langs or LANG_STOPWORDS
    return {lang: stopword_hits(text, words) for lang, words in langs.items()}


def lang_id(text: Column, langs: dict[str, tuple[str, ...]] | None = None) -> Column:
    """argmax language by stopword hits; ties and zero-hit docs resolve to
    the lexicographically-first candidate ('und…' would be dishonest —
    downstream filters can treat ties via the score columns)."""
    scores = lang_scores(text, langs)
    ordered = sorted(scores)  # deterministic tie-break: lexicographic
    best_lang = F.lit(ordered[0])
    best_score = scores[ordered[0]]
    for lang in ordered[1:]:
        is_better = scores[lang] > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return best_lang


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    s = text.cast("string")
    n = F.length(s)
    punct = F.length(F.regexp_replace(s, r"[\w\s]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks).cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Deterministic heuristic quality score in [0, 1] combining length,
    punctuation and stopword signals (the C4/Gopher-style cheap filters):

        0.4·min(1, n_words/50) + 0.3·(1 − min(1, 4·punct_ratio))
        + 0.3·min(1, stopword_ratio·5)

    Pure integer-derived double arithmetic — bit-identical across engines.
    """
    n_words = token_count_ws(text).cast("double")
    sw = stopword_hits(text, LANG_STOPWORDS["en"]).cast("double")
    sw_ratio = F.when(n_words > 0, sw / n_words).otherwise(F.lit(0.0))
    len_term = F.least(F.lit(1.0), n_words / F.lit(50.0))
    punct_term = F.lit(1.0) - F.least(F.lit(1.0), punct_ratio(text) * 4.0)
    sw_term = F.least(F.lit(1.0), sw_ratio * 5.0)
    return len_term * 0.4 + punct_term * 0.3 + sw_term * 0.3


def normalized_text(text: Column) -> Column:
    """Lowercase, strip everything outside [a-z0-9] — canonical form for
    content fingerprinting."""
    return F.regexp_replace(F.lower(text.cast("string")), r"[^a-z0-9]", "")


# Ordered Latin transliteration table — the reference's F2 Æ/Ø/Å code
# mapping (src/transform.py:33-46) generalized to a corpus-curation
# normalizer: digraph expansions for the Scandinavian vowels, German
# umlauts/eszett, and bare accent stripping for the common French/
# Spanish diacritics. Applied AFTER lowercasing, in this exact order;
# the DuckDB oracle chain is generated from this same constant, so the
# two engines cannot drift.
TRANSLIT_MAP: tuple[tuple[str, str], ...] = (
    ("æ", "ae"),
    ("ø", "oe"),
    ("å", "aa"),
    ("ä", "ae"),
    ("ö", "oe"),
    ("ü", "ue"),
    ("ß", "ss"),
    ("é", "e"),
    ("è", "e"),
    ("ê", "e"),
    ("ë", "e"),
    ("à", "a"),
    ("â", "a"),
    ("î", "i"),
    ("ï", "i"),
    ("ô", "o"),
    ("ù", "u"),
    ("û", "u"),
    ("ç", "c"),
    ("ñ", "n"),
)


def translit_casefold(text: Column) -> Column:
    """Casefold + deterministic Latin transliteration: lowercase, then
    the ordered ``TRANSLIT_MAP`` replacements. Different-language
    spellings of the same content ("Æble smørbrød", "AEble
    smoerbroed", "Äble smörbröd") converge to one canonical byte
    string, which makes downstream exact/shingle dedup cross-lingual.
    Pure string codegen (no UDF) — a zero-shuffle map at any scale."""
    y = F.lower(text.cast("string"))
    for a, b in TRANSLIT_MAP:
        y = F.replace(y, F.lit(a), F.lit(b))
    return y


def fingerprint(text: Column) -> Column:
    """Content fingerprint: sha256 hex of the normalized text. Documents
    that differ only in spacing/punctuation/case collide — the standard
    near-canonical dedup key."""
    return F.sha2(normalized_text(text).cast("binary"), 256)


def word_ngrams_from_tokens(toks: Column, n: int = 3) -> Column:
    """Positional word n-gram shingles from a token array — sequence +
    transform higher-order functions (no explode, no UDF). Fewer than n
    tokens yield a single whole-text shingle.

    ``toks`` MUST be a materialized column (a projected attribute), not an
    expression like ``split(...)``: every use inside the lambda re-evaluates
    its subtree per array element, turning an O(w) shingle build into
    O(w²) regex work per row."""
    k = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(F.lit(1), k - F.lit(n - 1)))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Shingles straight from text. Only for ad-hoc use on short strings —
    pipelines should project ``tokens(text)`` first and call
    ``word_ngrams_from_tokens`` on the attribute (see that docstring)."""
    return word_ngrams_from_tokens(tokens(text), n)


def dup_token_fraction(toks: Column) -> Column:
    """Fraction of tokens that are repeats of an earlier token
    (1 − |distinct|/|tokens|) — the cheap repetition signal from the
    Gopher-style quality filters (repetitious docs are low-value training
    data). Pure integer arithmetic → bit-identical across engines.
    ``toks`` should be a projected token-array attribute."""
    n = F.size(toks)
    return F.when(
        n > 0,
        F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n.cast("double"),
    ).otherwise(F.lit(0.0))


# PII patterns kept to regex constructs with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): char classes, bounded repeats, groups —
# no backreferences or lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{2}( [0-9]{2}){4}"  # +NN NN NN NN NN (intl. spaced)

PII_PATTERNS: dict[str, str] = {"<EMAIL>": EMAIL_RE, "<PHONE>": PHONE_RE}


def redact_pii(text: Column, patterns: dict[str, str] | None = None) -> Column:
    """Replace every PII match with its placeholder token — the standard
    pre-training scrub pass. Chained ``regexp_replace`` stays in codegen;
    at 100 TB this fuses into the corpus scan like every other text op."""
    out = text.cast("string")
    for placeholder, pattern in (patterns or PII_PATTERNS).items():
        out = F.regexp_replace(out, pattern, placeholder)
    return out


def pii_counts(text: Column, patterns: dict[str, str] | None = None) -> dict[str, Column]:
    """Per-pattern match counts (audit trail for the scrub pass)."""
    return {
        placeholder: F.regexp_count(text.cast("string"), F.lit(pattern))
        for placeholder, pattern in (patterns or PII_PATTERNS).items()
    }


# --------------------------------------------------------------------------
# BPE merge application (real tokenizer kernel, vocabulary in the closure)
# --------------------------------------------------------------------------

# A tiny English-frequency merge table (rank = priority). Real pipelines
# load the learned merges file of their tokenizer; the ALGORITHM below is
# the standard one (Sennrich et al., 'Neural Machine Translation of Rare
# Words with Subword Units', ACL'16): repeatedly merge the lowest-rank
# adjacent pair, leftmost first on rank ties.
DEFAULT_BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("an", "d"), ("in", "g"), ("t", "o"), ("e", "s"), ("o", "u"),
    ("i", "s"), ("e", "d"), ("a", "l"), ("a", "r"), ("s", "t"),
)


def bpe_encode_udf(merges: tuple[tuple[str, str], ...] | None = None):
    """Arrow-batched pandas UDF applying a BPE merge table: text →
    array<string> of subword pieces (whitespace pre-tokenized; every
    piece sequence concatenates back to its word exactly).

    The merge-rank dict ships in the UDF closure — the numpy-matrix
    analogue of a broadcast vocabulary. Per-batch cost is dominated by
    DISTINCT words, not tokens: a word→pieces memo makes repeated words
    (the overwhelming majority of any natural-language batch) a dict
    hit, which is how production tokenizers amortize the merge loop.
    Python is genuinely the kernel here (iterative data-dependent merges
    have no Column-expression form), so this is the sanctioned
    pandas-UDF slow path, not an accidental one."""
    ranks = {p: i for i, p in enumerate(merges or DEFAULT_BPE_MERGES)}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, tuple[str, ...]] = {}

        def enc_word(w: str) -> tuple[str, ...]:
            hit = cache.get(w)
            if hit is not None:
                return hit
            toks = tuple(w)
            while len(toks) > 1:
                best_rank = None
                best_i = -1
                for i in range(len(toks) - 1):
                    r = ranks.get((toks[i], toks[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_rank is None:
                    break
                toks = (
                    toks[:best_i]
                    + (toks[best_i] + toks[best_i + 1],)
                    + toks[best_i + 2 :]
                )
            cache[w] = toks
            return toks

        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            pieces: list[str] = []
            for w in t.split():
                pieces.extend(enc_word(w))
            out.append(pieces)
        return pd.Series(out)

    return encode


def bpe_learn_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 16,
    min_freq: int = 2,
    capture=None,
) -> list[tuple[str, str, int]]:
    """Distributed BPE merge LEARNING (Sennrich et al. ACL'16 §3.2) —
    the training-side counterpart of ``bpe_encode_udf``'s merge
    application. Returns ``[(left, right, weighted_count), ...]`` in
    merge order.

    Scale shape: ONE corpus aggregate builds the word-frequency table
    (distinct lowercased whitespace words + counts) and the corpus is
    never touched again — every learning iteration runs on the COMPACT
    word table, bounded by vocabulary size, not corpus size (the reason
    production BPE trainers work from word-count dicts). Per iteration:
    adjacent symbol pairs explode weighted by word frequency, ONE
    map-side-combined ``groupBy(pair).sum``, a 1-row TakeOrdered collect
    picks the best pair (count desc, then lexicographic — deterministic
    at any parallelism), and a JVM-side left-to-right ``aggregate`` fold
    rewrites each word's piece sequence (greedy non-overlapping, the
    standard BPE apply order). The word table is ``localCheckpoint``-ed
    each iteration so the fold lineage stays flat across merges.

    ``capture``, when given, is called once per ACCEPTED merge with
    ``(iteration, pair_counts_df)`` — the aggregated
    ``(a, b, c)`` pair-count frame the argmax ran over.  The frame is
    bounded by the symbol vocabulary squared (corpus-size-independent),
    so staging it per iteration is metadata-scale work; the catalog's
    staged-bytes oracle replays the merge SELECTION (count desc, pair
    asc) from those exact bytes.  Counts are exact integer sums, so the
    in-memory argmax and any parquet round-trip of the frame agree
    bit-for-bit."""
    words = (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__f"))
        .select(F.col("__f"), F.split(F.col("__w"), "").alias("__p"))
        # guard against empty-string fragments from the char split
        .withColumn("__p", F.filter(F.col("__p"), lambda c: c != F.lit("")))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = words.filter(F.size("__p") >= 2).select(
            "__f",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__p") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("__p"), i.cast("int")).alias("a"),
                        F.element_at(
                            F.col("__p"), (i + 1).cast("int")
                        ).alias("b"),
                    ),
                )
            ).alias("__pr"),
        )
        agg = pairs.groupBy("__pr.a", "__pr.b").agg(
            F.sum("__f").alias("__c")
        )
        best = (
            agg.orderBy(F.col("__c").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["__c"] < min_freq:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["__c"])
        if capture is not None:
            capture(
                len(merges),
                agg.select("a", "b", F.col("__c").alias("c")),
            )
        merges.append((a, b, c))
        la, lb = F.lit(a), F.lit(b)
        folded = F.aggregate(
            F.col("__p"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == la)
                & (x == lb),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(F.element_at(acc, -1), x)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        words = words.withColumn("__p", folded).localCheckpoint(eager=True)
    return merges


# --------------------------------------------------------------------------
# Char-bigram statistical LM (the CCNet/KenLM quality-filter pattern at
# bigram order). Shared by catalog's charlm_doc_quality /
# dsir_domain_selection and the corpus DSL's charlm_gate stage.
# --------------------------------------------------------------------------


def charlm_bigrams() -> Column:
    """Char-bigram array of the lowercased text column ``s``."""
    return F.expr(
        "transform(sequence(1, char_length(s) - 1), i -> substring(s, i, 2))"
    )


def charlm_model(t: DataFrame) -> tuple[dict, dict, int]:
    """Train the add-one conditional char-bigram model on frame ``t``
    (must expose ``s``): → (bigram → micronats, prefix-char → unseen-
    bigram fallback micronats, global unseen-prefix fallback). The model
    domain is |charset|², so the collect is bounded at ANY corpus size;
    log-probs quantize to integer micronats (floor(ln(p)·1e6 + 0.5),
    mirrored formulaically in the DuckDB oracles) so downstream sums are
    order-free."""
    import math

    from dvh_airflow_kafka_spark.io import ensure_parallelism

    rows = (
        ensure_parallelism(t)
        .select(F.explode(charlm_bigrams()).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    return _charlm_from_counts({r["b"]: int(r["c"]) for r in rows})


def _charlm_from_counts(counts: dict) -> tuple[dict, dict, int]:
    """Model construction from a bigram→count map — the driver-side half
    of :func:`charlm_model`, shared so fused multi-model passes build
    bit-identical models from their split counts."""
    import math

    prefix: dict[str, int] = {}
    for b, c in counts.items():
        prefix[b[0]] = prefix.get(b[0], 0) + c
    vocab = len({b[1] for b in counts})

    def mk(num: float, den: float) -> int:
        return int(math.floor(math.log(num / den) * 1_000_000 + 0.5))

    micronats = {
        b: mk(c + 1.0, prefix[b[0]] + vocab) for b, c in counts.items()
    }
    pre_fb = {c1: mk(1.0, n1 + vocab) for c1, n1 in prefix.items()}
    global_fb = mk(1.0, float(vocab)) if vocab else 0
    return micronats, pre_fb, global_fb


def charlm_two_models(
    t: DataFrame, target_cond: Column
) -> tuple[tuple[dict, dict, int], tuple[dict, dict, int]]:
    """Train the base model over ``t`` AND the model of the
    ``target_cond`` subset in ONE corpus pass: the bigram explode +
    aggregation carries a conditional count beside the full count, so
    the second full scan + shuffle + collect the two separate
    :func:`charlm_model` calls would pay (O(corpus) at scale — the DSIR
    shape trains target and base over the same text) disappears.  Both
    returned models are bit-identical to separately trained ones: the
    split counts feed the same :func:`_charlm_from_counts`."""
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    rows = (
        ensure_parallelism(t)
        .select(
            F.explode(charlm_bigrams()).alias("b"),
            target_cond.cast("long").alias("__t"),
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("__t").alias("ct"),
        )
        .collect()
    )
    base = _charlm_from_counts({r["b"]: int(r["c"]) for r in rows})
    target = _charlm_from_counts(
        {r["b"]: int(r["ct"]) for r in rows if int(r["ct"])}
    )
    return base, target


def charlm_score_sum(model: tuple[dict, dict, int]) -> Column:
    """Per-document micronat log-prob sum: fold the bigram array IN-ROW
    against the literal model map — add-one smoothing handles bigrams the
    model never saw (p = 1/(n1+V), or 1/V for an unseen prefix), so a
    model trained on a SUBSET scores any document (the DSIR case)."""
    micronats, pre_fb, global_fb = model
    m1 = F.create_map(
        *[x for b in sorted(micronats) for x in (F.lit(b), F.lit(micronats[b]))]
    )
    m2 = F.create_map(
        *[x for c in sorted(pre_fb) for x in (F.lit(c), F.lit(pre_fb[c]))]
    )
    return F.aggregate(
        charlm_bigrams(),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.coalesce(
            F.try_element_at(m1, b),
            F.try_element_at(m2, F.substring(b, 1, 1)),
            F.lit(global_fb),
        ).cast("long"),
    )


def compression_ratio_udf(level: int = 6):
    """Arrow-batched pandas UDF: zlib compressed-size / raw-size ratio in
    exact parts-per-million of the UTF-8 text (empty text → 1 000 000).

    The DEFLATE ratio is the classic cheap redundancy signal corpus
    curation uses beside the n-gram repetition stats (highly repetitive
    or templated documents compress far below natural prose; random
    noise compresses above it). Python is the kernel (no SQL/Column
    zlib), so this is a sanctioned pandas-UDF path: one linear scan,
    no shuffle, no state. The ratio depends only on the DEFLATE
    output LENGTH at a fixed level — stable for a given zlib across
    runs (pytest pins determinism and the repetitive≪random ordering).
    """
    import zlib

    @F.pandas_udf(T.LongType())
    def ratio(texts: pd.Series) -> pd.Series:
        def one(t) -> int:
            if not t:
                return 1_000_000
            raw = t.encode("utf-8")
            comp = len(zlib.compress(raw, level))
            return (1_000_000 * comp) // len(raw)

        return texts.map(one)

    return ratio


def deflate_len_udf(level: int = 6):
    """Arrow-batched pandas UDF: zlib DEFLATE output length in bytes of
    the UTF-8 text — the raw kernel output behind the compression-ratio
    signal.  Splitting the kernel (this UDF) from the ratio ARITHMETIC
    lets catalog queries stage the compressed lengths to parquet and
    have a DuckDB oracle recompute the ppm ratio relationally from the
    same bytes (``catalog.doc_compression_ratio``); the fused
    ``compression_ratio_udf`` remains for direct use."""
    import zlib

    @F.pandas_udf(T.LongType())
    def comp_len(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), level))
            if t
            else 0
        )

    return comp_len


def unicode_normalize_udf(form: str = "NFC"):
    """Arrow-batched pandas UDF: Unicode normalization of the text via
    ``unicodedata.normalize`` — the crawl-hygiene step that collapses
    byte-distinct/codepoint-equivalent spellings (decomposed accents,
    compatibility ligatures, width variants) before any hash-keyed dedup
    sees them; without it, 'e'+U+0301 and U+00E9 fingerprint as two
    different documents.  Python IS the kernel here (Spark has no
    normalization builtin); one linear scan, no shuffle, no state.

    Cross-engine note: the NFC form is independently checkable against
    DuckDB's ``nfc_normalize`` (utf8proc) — canonical composition for
    the Latin ranges has been stable across Unicode versions for both
    libraries.  NFKC has no DuckDB builtin; oracles verify it over a
    CLOSED injected compatibility-character set (see
    ``catalog.unicode_nfc_audit``).
    """
    import unicodedata

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"not a Unicode normalization form: {form}")

    @F.pandas_udf(T.StringType())
    def norm(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: unicodedata.normalize(form, t) if t is not None else None
        )

    return norm


# Explicit character classes for cleaning — NOT shorthand \s: Java regex
# (Spark) includes \x0B in \s while RE2 (the DuckDB oracle) does not, so
# shorthand classes silently diverge across engines.
CLEAN_CTRL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
CLEAN_WS_RE = r"[ \t\n\f\r][ \t\n\f\r]+"


def clean_text(text: Column) -> Column:
    """Ingest-grade text normalization: strip control characters,
    collapse whitespace runs to one space, trim. Pure codegen string
    expressions — fuses into the scan."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(text, CLEAN_CTRL_RE, ""), CLEAN_WS_RE, " "
        )
    )
