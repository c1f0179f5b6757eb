"""Scalar-function registry for the transform DSL.

The reference exposes a closed, config-addressable map of unary scalar
Python functions (reference src/transform.py:112-119). Here each ``fun``
name maps to a **Column-expression factory** — pure Catalyst expressions,
no Python UDFs — so the whole transform stays inside whole-stage codegen
and runs JVM-side at 100 TB scale.

Timestamp semantics: the engine's canonical timestamp is the *naive
Europe/Oslo wall clock* (reference src/transform.py:8-21). With
``spark.sql.session.timeZone=UTC``, ``from_utc_timestamp(x, 'Europe/Oslo')``
yields exactly that. (The reference resolves the DST offset at the UTC
wall-clock instant with ``is_dst=True`` — reference src/transform.py:20;
for the ambiguous fall-back hour this differs by at most one hour from the
IANA rules Spark applies. We follow IANA.)
"""

from __future__ import annotations

import datetime as dt
import re
from typing import Callable, Optional

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

OSLO = "Europe/Oslo"

# DVH-utviklingsstandard 2.3 alphabet for code values
_CODE_ALPHABET = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ_"


def identity(c: Column) -> Column:
    """Default when ``fun`` is omitted (reference src/transform.py:24-30)."""
    return c


def str_to_code(c: Column) -> Column:
    """``str -> str-code`` (reference src/transform.py:33-46).

    NULL -> 'UKJENT'; whitespace runs -> '_'; uppercase; Æ->A, Ø->O,
    Å->AA; drop anything outside [0-9A-Z_]; empty -> 'UKJENT'.
    """
    y = F.upper(c.cast("string"))
    # (?U): Java \s is ASCII-only by default; the reference's Python
    # str.split() treats ALL unicode whitespace as separators
    y = F.regexp_replace(y, r"(?U)^\s+|\s+$", "")  # str.split() strips ends
    y = F.regexp_replace(y, r"(?U)\s+", "_")
    y = F.translate(y, "ÆØ", "AO")
    y = F.regexp_replace(y, "Å", "AA")
    y = F.regexp_replace(y, "[^0-9A-Z_]", "")
    # NULL input or empty result both collapse to the UKJENT sentinel
    return F.coalesce(F.when(y != "", y), F.lit("UKJENT"))


# Free-form (dateparser-grade) fallback formats, tried after ordinal
# suffixes ("5th" -> "5") and commas are stripped. %B also matches
# abbreviated names case-insensitively via the %b twin generated below.
_FUZZY_BASE = [
    "%B %d %Y",
    "%d %B %Y",
    "%Y %B %d",
    "%m/%d/%Y",
    "%d-%m-%Y",
]
_FUZZY_FORMATS = [
    base + suffix
    for base in _FUZZY_BASE
    for suffix in ("", " %H:%M", " %H:%M:%S")
]
_FUZZY_FORMATS += [f.replace("%B", "%b") for f in _FUZZY_FORMATS if "%B" in f]
_ORDINAL_RE = re.compile(r"\b(\d{1,2})(st|nd|rd|th)\b", re.IGNORECASE)
_WS_RE = re.compile(r"[\s,]+")
# Relative (dateparser-grade) forms, valid ONLY with an explicit anchor:
# "2 days ago", "in 3 hours", "yesterday", "now" …
_REL_UNITS = {
    "second": dt.timedelta(seconds=1),
    "minute": dt.timedelta(minutes=1),
    "hour": dt.timedelta(hours=1),
    "day": dt.timedelta(days=1),
    "week": dt.timedelta(weeks=1),
}
_REL_AGO_RE = re.compile(
    r"^(?:a|an|\d+) (second|minute|hour|day|week)s? ago$"
)
_REL_IN_RE = re.compile(r"^in (?:a|an|\d+) (second|minute|hour|day|week)s?$")


def _parse_relative(
    s: str, anchor: dt.datetime
) -> Optional[dt.datetime]:
    """'2 days ago' / 'in 3 hours' / 'yesterday' … relative to ``anchor``
    (the run's frozen batch time — NEVER wall-clock ``now``, so re-runs
    stay idempotent). Mirrors the subset of ``dateparser`` the reference
    exercises (src/transform.py:49-60) under dateparser's RELATIVE_BASE
    setting."""
    low = s.lower()
    if low in ("now", "today"):
        return anchor
    if low == "yesterday":
        return anchor - dt.timedelta(days=1)
    if low == "tomorrow":
        return anchor + dt.timedelta(days=1)
    for rx, sign in ((_REL_AGO_RE, -1), (_REL_IN_RE, 1)):
        m = rx.match(low)
        if m:
            head = low.split(" ")[1 if sign > 0 else 0]
            n = 1 if head in ("a", "an") else int(head)
            return anchor + sign * n * _REL_UNITS[m.group(1)]
    return None


def fuzzy_parse_datetime(
    raw: Optional[str], anchor: Optional[dt.datetime] = None
) -> Optional[dt.datetime]:
    """Driver/executor-side free-form parse: 'March 5th 2024',
    '5 Mar 2024 14:30', '03/05/2024'… -> naive datetime, else None.
    Deterministic subset of the reference's ``dateparser`` behaviour.
    Relative forms ('5 days ago', 'yesterday') resolve ONLY when an
    explicit ``anchor`` is passed (the ``fuzzy: true`` escape hatch,
    anchored at the run's frozen batch time); without one they yield
    None, because call-time-dependent parses would break idempotent
    re-runs."""
    if raw is None:
        return None
    s = _WS_RE.sub(" ", _ORDINAL_RE.sub(r"\1", raw.strip()))
    for fmt in _FUZZY_FORMATS:
        try:
            return dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    if anchor is not None:
        return _parse_relative(s, anchor)
    return None


def _make_fuzzy_fill(anchor: Optional[dt.datetime] = None):
    """Build the Arrow-batched residual filler. (fast-parsed ts, raw str)
    -> ts with the Python fuzzy parse filling ONLY the rows the codegen
    cascade missed. The Arrow round trip covers all rows but the per-row
    Python work is bounded by the residual — clean fixed-format data pays
    (almost) nothing."""

    @F.pandas_udf(T.TimestampType())
    def _fuzzy_fill(fast: pd.Series, raw: pd.Series) -> pd.Series:
        out = fast.copy()
        miss = fast.isna() & raw.notna()
        if miss.any():
            out[miss] = raw[miss].map(
                lambda v: fuzzy_parse_datetime(v, anchor)
            )
        return out

    return _fuzzy_fill


_fuzzy_fill = _make_fuzzy_fill(None)

# Java DateTimeFormatter twins of _FUZZY_FORMATS (strptime directive ->
# pattern letter: %B->MMMM, %b->MMM, %d->d, %m->M, %Y->yyyy, %H->H,
# %M->m, %S->s; single-letter numeric patterns accept 1-2 digits like
# strptime's).  Applied to an initcap'd copy because strptime matches
# month names case-insensitively while DateTimeFormatter is exact-case.
_FUZZY_JVM_BASE = [
    "MMMM d yyyy",
    "d MMMM yyyy",
    "yyyy MMMM d",
    "M/d/yyyy",
    "d-M-yyyy",
]
_FUZZY_JVM_FORMATS = [
    base + suffix
    for base in _FUZZY_JVM_BASE
    for suffix in ("", " H:m", " H:m:s")
]
_FUZZY_JVM_FORMATS += [
    f.replace("MMMM", "MMM") for f in _FUZZY_JVM_FORMATS if "MMMM" in f
]


def _fuzzy_jvm_cascade(s: Column) -> Column:
    """Codegen twin of :func:`fuzzy_parse_datetime`'s fixed-format pass
    (the anchor-less residual the default F3 path used to send to a
    pandas UDF).  Whole-stage-codegen ``try_to_timestamp`` attempts over
    the same normalization — unicode end-strip, ordinal-suffix strip,
    ``[\\s,]+`` collapse — so the JVM↔Python boundary disappears from
    the hot path (optimization guide §4.1: prefer built-ins).

    ``coalesce`` evaluates lazily in generated code, so strings the main
    ISO cascade already parsed never reach these attempts, and clean
    data pays nothing.

    Two guards keep strptime parity exact where the pattern grammars
    differ: strptime's ``%Y`` matches EXACTLY four digits (Java ``yyyy``
    accepts 4-19), so any string containing a 5+ digit run is rejected
    outright — no fuzzy format can consume one (numeric fields are
    capped at 2 digits, the year at 4); and Python ``datetime`` has no
    year 0 while Java's proleptic ISO chronology does, so a literal
    ``0000`` year token is rejected too.  Documented deviations (exotic
    inputs only, all yielding NULL here where Python would parse):
    non-ASCII digits and non-Unicode-White_Space control separators
    (``\\x1c``-``\\x1f``) are not normalized."""
    t = F.regexp_replace(s, r"(?U)^\s+|\s+$", "")
    t = F.regexp_replace(t, r"(?i)\b(\d{1,2})(st|nd|rd|th)\b", "$1")
    t = F.initcap(F.regexp_replace(t, r"(?U)[\s,]+", " "))
    parsed = F.coalesce(
        *[F.try_to_timestamp(t, F.lit(f)) for f in _FUZZY_JVM_FORMATS]
    )
    # Shape prefilter: a failed try_to_timestamp costs ~3 µs (exception-
    # driven), so a string that CANNOT match any format must not pay 24
    # of them.  One regex covering exactly the five base shapes (each
    # optionally followed by H:m[:s]) — a strict superset of what the
    # strptime formats accept, so it only skips guaranteed misses.
    # Measured on sf0.1: fuzzy residual 3.8 s -> ~0.1 s for the ~20k
    # unparseable rows.
    shape = (
        r"^(?:[A-Za-z]+ \d{1,2} \d{4}|\d{1,2} [A-Za-z]+ \d{4}"
        r"|\d{4} [A-Za-z]+ \d{1,2}|\d{1,2}/\d{1,2}/\d{4}"
        r"|\d{1,2}-\d{1,2}-\d{4})( \d{1,2}:\d{1,2}(:\d{1,2})?)?$"
    )
    return F.when(
        t.rlike(shape) & ~t.rlike(r"\d{5}") & ~t.rlike(r"(^|\D)0000(\D|$)"),
        parsed,
    )


def _parse_cascade(s: Column) -> Column:
    """Shared codegen ``try_to_timestamp`` cascade for F3 — the single
    source of truth for the fixed-format list, used by both
    :func:`str_to_oslo_datetime` and :func:`str_to_oslo_datetime_fuzzy`
    so the two paths cannot drift when a format is added."""
    return F.coalesce(
        F.try_to_timestamp(s),  # ISO-ish: yyyy-MM-dd HH:mm:ss[.S]
        # every fixed format below requires a digit, so digit-less
        # strings skip the remaining 8 exception-driven parse attempts
        # (~3 µs each per miss); the ungated ISO attempt above keeps the
        # cast-parser's own semantics (incl. its special literals)
        # byte-identical to rounds ≤12
        F.when(
            s.rlike(r"\d"),
            F.coalesce(
                F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
                F.try_to_timestamp(s, F.lit("yyyy-MM-dd")),
                F.try_to_timestamp(s, F.lit("yyyy/MM/dd HH:mm:ss")),
                F.try_to_timestamp(s, F.lit("dd.MM.yyyy HH:mm:ss")),
                F.try_to_timestamp(s, F.lit("dd.MM.yyyy")),
                F.try_to_timestamp(s, F.lit("dd MMM yyyy HH:mm:ss")),
                F.try_to_timestamp(s, F.lit("dd MMM yyyy")),
                F.try_to_timestamp(s, F.lit("MMM dd yyyy")),
            ),
        ),
    )


def str_to_oslo_datetime(c: Column) -> Column:
    """``str -> datetime-no`` (reference src/transform.py:49-60).

    The reference uses ``dateparser`` (free-form English). Common fixed
    formats parse in a codegen ``try_to_timestamp`` cascade; whatever
    that misses falls through to the codegen free-form cascade
    (:func:`_fuzzy_jvm_cascade` — the JVM twin of
    :func:`fuzzy_parse_datetime`'s fixed-format pass, which an
    anchor-less parse is exactly; relative forms need the ``fuzzy:
    true`` escape hatch and its anchor-bound pandas UDF).  Still-
    unparseable strings yield NULL, matching the reference's None.  The
    whole default F3 path is therefore pure whole-stage codegen — no
    JVM↔Python boundary (optimization guide §4.1).  The parsed naive
    datetime is treated as UTC and shifted to Oslo wall clock (the
    reference's ``_adjust_timezone`` does the same to naive inputs).
    """
    s = F.regexp_replace(c.cast("string"), r"^\s+|\s+$", "")
    return F.from_utc_timestamp(
        F.coalesce(_parse_cascade(s), _fuzzy_jvm_cascade(s)), OSLO
    )


def str_to_oslo_datetime_fuzzy(anchor: dt.datetime):
    """F3 escape hatch (``fuzzy: true`` in the transform DSL): the same
    codegen cascade + residual pandas-UDF fill as
    :func:`str_to_oslo_datetime`, but the fill ALSO resolves relative
    forms ('2 days ago', 'yesterday', 'in 3 hours') against ``anchor`` —
    the run's frozen batch time, so the parse is deterministic and
    re-runs are idempotent (the reference's ``dateparser`` call,
    src/transform.py:49-60, resolves them against wall-clock now, which
    is exactly why this is opt-in rather than the default)."""
    fill = _make_fuzzy_fill(anchor)

    def _fn(c: Column) -> Column:
        s = F.regexp_replace(c.cast("string"), r"^\s+|\s+$", "")
        return F.from_utc_timestamp(fill(_parse_cascade(s), s), OSLO)

    return _fn


def epoch_s_to_oslo(c: Column) -> Column:
    """``int-unix-s -> datetime-no`` (reference src/transform.py:63-74)."""
    return F.from_utc_timestamp(F.timestamp_seconds(c), OSLO)


def epoch_ms_to_oslo(c: Column) -> Column:
    """``int-unix-ms -> datetime-no`` — millisecond precision preserved
    (reference src/transform.py:77-87)."""
    return F.from_utc_timestamp(F.timestamp_millis(c.cast("long")), OSLO)


def bool_to_int(c: Column) -> Column:
    """``bool -> int`` — NULL-safe (reference src/transform.py:90-98)."""
    return c.cast("boolean").cast("int")


def to_oslo_wall_clock(c: Column) -> Column:
    """``datetime -> datetime-no`` (reference src/transform.py:101-109):
    interpret a (session-TZ/UTC) timestamp as an instant and render the
    Europe/Oslo wall clock as a naive timestamp."""
    return F.from_utc_timestamp(c.cast("timestamp"), OSLO)


def content_hash(c: Column) -> Column:
    """sha256 hex digest of the raw message bytes -> ``kafka_hash``
    (reference src/kafka_source.py:114)."""
    return F.sha2(c.cast("binary"), 256)


def canonical_json(c: Column) -> Column:
    """Struct -> canonical JSON string -> ``kafka_message``
    (reference src/kafka_source.py:115). JVM ``to_json`` formatting
    (no space after ':'); exact Python-``json.dumps`` parity is available
    via operators.payload.python_canonical_json when byte-level parity
    with the reference is required."""
    return F.to_json(c)


# The config-addressable registry: ``fun`` name -> Column factory.
# (reference src/transform.py:112-119)
TRANSFORMS: dict[str, Callable[[Column], Column]] = {
    "str -> str-code": str_to_code,
    "str -> datetime-no": str_to_oslo_datetime,
    "int-unix-s -> datetime-no": epoch_s_to_oslo,
    "int-unix-ms -> datetime-no": epoch_ms_to_oslo,
    "bool -> int": bool_to_int,
    "datetime -> datetime-no": to_oslo_wall_clock,
}
