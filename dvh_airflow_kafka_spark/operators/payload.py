"""Nested-payload projection operators P1 (field drop) and P2 (presence
flag).

Reference semantics (src/kafka_source.py:84-100): config keypaths match
*through arrays* — enumerated keypaths have their ``[i]`` indexes stripped
before matching, so ``nested6/nested7/key`` hits every element of every
nested list (behaviour spec: reference test_integration.py:269-342).

Two implementations:

1. **Typed path** (`drop_fields` / `flag_fields`): pure Column expressions
   over a known StructType — ``dropFields`` / ``withField`` composed with
   higher-order ``transform()`` at each array level. No UDF, stays in
   codegen; this is the 100 TB path when the payload schema is declared.
2. **Dynamic path** (`filter_json_payload`): the payload is an opaque JSON
   string with no fixed schema (the reference's ``schema: json`` mode).
   An Arrow-batched pandas UDF applies the exact reference walk —
   drop-then-flag, index-stripped matching — and re-serializes with
   Python ``json.dumps(ensure_ascii=False)`` for byte-level canonical-JSON
   parity with the reference (src/kafka_source.py:115).
"""

from __future__ import annotations

import json
from typing import Iterable, Optional

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --------------------------------------------------------------------------
# Typed path: Column-expression rewriting over a known schema
# --------------------------------------------------------------------------


def _element_type(dtype: T.DataType) -> T.DataType:
    while isinstance(dtype, T.ArrayType):
        dtype = dtype.elementType
    return dtype


def _child_type(dtype: T.DataType, name: str) -> Optional[T.DataType]:
    st = _element_type(dtype)
    if isinstance(st, T.StructType) and name in st.fieldNames():
        return st[name].dataType
    return None


def _rewrite(col: Column, dtype: T.DataType, parts: list[str], op: str) -> Column:
    """Rewrite ``col`` (struct or array-of-struct, recursively) so that the
    field at ``parts`` is dropped / flagged. Arrays broadcast the rewrite
    over every element via the higher-order ``transform`` — matching the
    reference's index-stripped keypath semantics."""
    if isinstance(dtype, T.ArrayType):
        inner = dtype.elementType
        return F.transform(col, lambda x: _rewrite(x, inner, parts, op))
    assert isinstance(dtype, T.StructType)
    head, rest = parts[0], parts[1:]
    if head not in dtype.fieldNames():
        return col
    if not rest:
        if op == "drop":
            return col.dropFields(f"`{head}`")
        flagged = F.when(col[head].isNotNull(), F.lit(1)).otherwise(F.lit(0))
        return col.withField(f"`{head}`", flagged)
    child = _rewrite(col[head], dtype[head].dataType, rest, op)
    return col.withField(f"`{head}`", child)


def _apply_keypaths(
    col: Column, schema: T.StructType, keypaths: Iterable[str], sep: str, op: str
) -> Column:
    out = col
    for kp in keypaths:
        out = _rewrite(out, schema, kp.split(sep), op)
    return out


def drop_fields(
    payload: Column, schema: T.StructType, keypaths: Iterable[str], sep: str = "/"
) -> Column:
    """P1 ``message-fields-filter`` (reference src/kafka_source.py:84-92):
    remove the listed keypaths, at any array depth, structure preserved."""
    return _apply_keypaths(payload, schema, keypaths, sep, "drop")


def flag_fields(
    payload: Column, schema: T.StructType, keypaths: Iterable[str], sep: str = "/"
) -> Column:
    """P2 ``flag-field-config`` (reference src/kafka_source.py:94-100):
    replace each listed keypath's value with 1 (non-null) / 0 (null)."""
    return _apply_keypaths(payload, schema, keypaths, sep, "flag")


# --------------------------------------------------------------------------
# Dynamic path: schemaless JSON via Arrow-batched pandas UDF
# --------------------------------------------------------------------------


def _walk(obj, path: tuple, drop: set, flag: set):
    """Depth-first reference walk. ``path`` carries dict keys only — list
    indexes are transparent (the ``[i]``-stripping rule). Drop is applied
    before flag at each level, mirroring the reference's two passes
    (src/kafka_source.py:86-100)."""
    if isinstance(obj, dict):
        for key in list(obj.keys()):
            child_path = path + (key,)
            if child_path in drop:
                del obj[key]
                continue
            if child_path in flag:
                obj[key] = 1 if obj[key] is not None else 0
                continue
            _walk(obj[key], child_path, drop, flag)
    elif isinstance(obj, list):
        for item in obj:
            _walk(item, path, drop, flag)


def _filter_json_str(
    raw: Optional[str], drop: set, flag: set
) -> Optional[str]:
    if raw is None:
        return None
    try:
        obj = json.loads(raw)
    except (ValueError, TypeError):
        return None
    _walk(obj, (), drop, flag)
    return json.dumps(obj, ensure_ascii=False)


def filter_json_payload(
    payload: Column,
    drop_keypaths: Optional[Iterable[str]] = None,
    flag_keypaths: Optional[Iterable[str]] = None,
    sep: str = "/",
) -> Column:
    """P1+P2 over a dynamic JSON string payload; returns the canonical
    filtered JSON (the reference's ``kafka_message``). Arrow-batched, one
    Python hop per batch — acceptable because dynamic-schema mode is
    inherently row-interpretive; declare a schema to get the typed path.
    """
    drop = {tuple(k.split(sep)) for k in (drop_keypaths or [])}
    flag = {tuple(k.split(sep)) for k in (flag_keypaths or [])}

    @F.pandas_udf(T.StringType())
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(lambda x: _filter_json_str(x, drop, flag))

    return _udf(payload)


def python_canonical_json(payload: Column) -> Column:
    """Re-serialize a JSON string exactly as Python ``json.dumps`` would
    (reference src/kafka_source.py:115): preserves document key order,
    ``", "``/``": "`` separators, ``ensure_ascii=False``. Use only when
    byte-parity with reference output matters; ``to_json`` is the fast
    JVM path."""

    @F.pandas_udf(T.StringType())
    def _udf(s: pd.Series) -> pd.Series:
        def canon(x):
            if x is None:
                return None
            try:
                return json.dumps(json.loads(x), ensure_ascii=False)
            except (ValueError, TypeError):
                return None

        return s.map(canon)

    return _udf(payload)
