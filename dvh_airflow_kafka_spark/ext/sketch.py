"""[EXT] Bounded-state sketches for unbounded key domains.

A plain ``explode → groupBy(term).count()`` already bounds its shuffle by
map-side combine — per partition the partial-agg state is the partition's
DISTINCT term set. That is fine for word vocabularies (~10^6) but breaks
for unbounded domains (8-gram spans, URLs, user agents): the per-task
hash map grows with distinct-per-partition and spills. The classic
answer is a mergeable frequency sketch; this module implements
Misra-Gries with the two-pass exact-verify pattern:

1. **Candidate pass** — per-partition Misra-Gries with ``k`` counters
   (``mapInPandas``; a Python kernel is the point here — the algorithm is
   a decrement-counter loop no built-in expresses). Guarantee: any term
   with partition frequency > n_p/k survives that partition's summary, so
   by pigeonhole any term with GLOBAL frequency > N/k survives in at
   least one partition — the union of summaries is a superset of every
   global heavy hitter at threshold N/k.
2. **Verify pass** — exact counts of the candidate terms only (broadcast
   semi-join on the explode), thresholded at > N/k.

The output is therefore EXACT — identical to the full groupBy — but
executor state is O(k) per task instead of O(distinct-per-partition),
and the verify-pass shuffle carries only candidate terms. ``k`` trades
candidate-set size against state; the threshold N/k is scale-free.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Java's \s is ASCII-only; mirror it exactly so the candidate pass
# tokenizes identically to ext/text.tokens() (a divergent split could
# hide a heavy hitter from the sketch and void the superset guarantee).
_JAVA_NONSPACE = re.compile(r"[^ \t\n\x0b\f\r]+")


def _misra_gries_partition(texts: Iterator[pd.DataFrame], k: int):
    """Per-partition Misra-Gries over whitespace tokens of ``__text``."""
    counters: dict[str, int] = {}
    for pdf in texts:
        for text in pdf["__text"]:
            if not text:
                continue
            for tok in _JAVA_NONSPACE.findall(text):
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < k:
                    counters[tok] = 1
                else:
                    # decrement-all: drop every counter by one
                    dead = []
                    for t in counters:
                        counters[t] -= 1
                        if counters[t] == 0:
                            dead.append(t)
                    for t in dead:
                        del counters[t]
    if counters:
        yield pd.DataFrame({"token": list(counters.keys())})


def frequent_tokens(
    docs: DataFrame,
    text_col: Column,
    *,
    k_state: int = 64,
) -> DataFrame:
    """Exact heavy hitters — every token with global frequency > N/k_state
    and its exact count — with O(k_state) executor state in the discovery
    pass. Returns (token, n_occurrences)."""
    from dvh_airflow_kafka_spark.ext.text import tokens
    from dvh_airflow_kafka_spark.io import ensure_parallelism

    slim = ensure_parallelism(docs.select(text_col.alias("__text")))
    candidates = (
        slim.mapInPandas(
            lambda it: _misra_gries_partition(it, k_state),
            schema="token string",
        )
        .distinct()
    )
    toks = slim.select(F.explode(tokens(F.col("__text"))).alias("token"))
    total = toks.agg(F.count(F.lit(1)).alias("__N"))
    counts = (
        toks.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") * k_state > F.col("__N"))
        .select("token", "n_occurrences")
    )
