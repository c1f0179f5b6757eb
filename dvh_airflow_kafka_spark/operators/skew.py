"""Skew-safe salted equi-join.

At 100 TB a power-law join key (one customer with 1% of all orders, one
hot document shingle) concentrates a shuffle partition on a single task.
AQE's skew-join split handles sort-merge joins automatically
(``spark.sql.adaptive.skewJoin``); this operator is the manual fallback
for the cases AQE cannot rewrite — e.g. a shuffled hash join that must
stay a hash join, or a deliberately pinned partitioning.

Technique (standard salting):

- fact side: append a uniform salt in [0, n_salt) to the key;
- dim side: explode each row into all n_salt salt values;
- join on (key, salt) — the hot key's rows now spread over n_salt tasks.

The dim side grows ×n_salt, so this is for genuinely dimension-sized
right sides; result multiplicity is unchanged (each fact row still meets
each matching dim row exactly once).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    *,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with the fact side salted into
    ``n_salt`` sub-keys. Deterministic: the salt is a hash of the whole
    fact row, not a random draw, so re-runs produce identical plans and
    partition assignments (replayable under speculative execution)."""
    if not on:
        raise ValueError("salted_join needs at least one join column")
    salted_fact = fact.withColumn(
        SALT, F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(n_salt))
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salt - 1))
    ).alias(SALT)
    exploded_dim = dim.select("*", salts)
    joined = salted_fact.join(exploded_dim, on=[*on, SALT], how=how)
    return joined.drop(SALT)
