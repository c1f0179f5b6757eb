"""Transform-DSL compiler: ordered mapping rules -> one Spark projection.

The reference applies its rules row-at-a-time in Python (reference
src/transform.py:157-196). Here the whole rule list compiles into a single
``df.select(...)`` — a plain Catalyst projection that fuses with
neighbouring operators under whole-stage codegen; at 100 TB this is a
zero-shuffle, column-pruned map stage.

Rule semantics preserved exactly (reference src/transform.py:168-195):

- ``src`` starting with ``$$`` — engine identifier; only ``$$BATCH_TIME``
  exists: a timestamp constant frozen once per Transform instance
  (src/transform.py:134, 152-155; law: one ``lastet_tid`` per run,
  test_transform.py:46-66).
- ``src`` starting with ``$`` — the literal string after the ``$``.
- otherwise — a dotted keypath into the payload; missing path raises
  KeyError unless ``allow_undefined`` (then NULL).
- ``fun`` (scalar cast from the registry) applies **only** on the keypath
  branch — literals and ``$$BATCH_TIME`` bypass it, a reference quirk we
  keep (src/transform.py:168-195: ``rule.cast`` is inside the keypath
  else-branch).
"""

from __future__ import annotations

import datetime as dt
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dvh_airflow_kafka_spark.config import TransformRuleSpec
from dvh_airflow_kafka_spark.functions import TRANSFORMS

BATCH_TIME_SRC = "$$BATCH_TIME"


def _schema_has_path(schema: T.StructType, parts: list[str]) -> bool:
    """Walk a dotted keypath through nested structs (arrays transparent)."""
    current: T.DataType = schema
    for part in parts:
        while isinstance(current, T.ArrayType):
            current = current.elementType
        if not isinstance(current, T.StructType) or part not in current.fieldNames():
            return False
        current = current[part].dataType
    return True


class Transform:
    """Compiled transform: list of rule specs -> Column projection.

    ``batch_time`` freezes at construction so every row of a run gets the
    identical ``lastet_tid`` (reference src/transform.py:150-155).
    """

    def __init__(
        self,
        rules: list[TransformRuleSpec] | list[dict],
        batch_time: Optional[dt.datetime] = None,
    ) -> None:
        self.rules = [
            r if isinstance(r, TransformRuleSpec) else TransformRuleSpec.model_validate(r)
            for r in rules
        ]
        self.batch_time = batch_time or dt.datetime.now(dt.timezone.utc).replace(
            tzinfo=None
        )
        for r in self.rules:
            if r.src.startswith("$$") and r.src != BATCH_TIME_SRC:
                raise NotImplementedError(f"unsupported identifier `{r.src}`")
            if r.fun is not None and r.fun not in TRANSFORMS:
                raise KeyError(f"unknown fun `{r.fun}` in rule for `{r.dst}`")
            if r.fuzzy and r.fun != "str -> datetime-no":
                raise ValueError(
                    f"`fuzzy: true` only applies to `str -> datetime-no` "
                    f"(rule for `{r.dst}` has fun `{r.fun}`)"
                )

    def _compile_rule(self, df: DataFrame, rule: TransformRuleSpec) -> Column:
        if rule.src == BATCH_TIME_SRC:
            return F.lit(self.batch_time).cast("timestamp").alias(rule.dst)
        if rule.src.startswith("$"):
            return F.lit(rule.src[1:]).alias(rule.dst)
        parts = rule.src.split(".")
        if not _schema_has_path(df.schema, parts):
            if rule.allow_undefined:
                return F.lit(None).alias(rule.dst)
            raise KeyError(f"path `{rule.src}` is undefined")
        col = F.col(".".join(f"`{p}`" for p in parts))
        if rule.fuzzy:
            # relative-date escape hatch, anchored at the frozen batch
            # time so the parse is identical on every re-run
            from dvh_airflow_kafka_spark.functions.registry import (
                str_to_oslo_datetime_fuzzy,
            )

            return str_to_oslo_datetime_fuzzy(self.batch_time)(col).alias(
                rule.dst
            )
        fun = TRANSFORMS.get(rule.fun, None) if rule.fun else None
        if fun is not None:
            col = fun(col)
        return col.alias(rule.dst)

    def columns(self, df: DataFrame) -> list[Column]:
        return [self._compile_rule(df, rule) for rule in self.rules]

    def apply(self, df: DataFrame) -> DataFrame:
        """The entire DSL as ONE narrow projection — Catalyst prunes every
        unreferenced source column all the way down to the scan."""
        return df.select(*self.columns(df))

    __call__ = apply
