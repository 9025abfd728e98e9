"""Multi-format date/datetime parsing — parity with the reference's
date parser (reference src/date_parser.rs:44-116: RFC3339, ISO without
tz at s/ms/µs precision, 12 date-only formats, 13 datetime formats
incl. AM/PM).

Implemented as a ``coalesce(try_to_timestamp(...))`` chain — pure
Catalyst expressions, evaluated in whole-stage codegen, first matching
format wins (same precedence order as the reference). NULL when nothing
matches (the reference falls back to String type at inference time; the
validation layer decides whether that is an error).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (java pattern, duckdb strptime pattern) in reference precedence order.
# Kept as pairs so the DuckDB oracle is generated from the same table.
FORMATS: list[tuple[str, str]] = [
    # RFC3339 / ISO with zone
    ("yyyy-MM-dd'T'HH:mm:ssXXX", "%Y-%m-%dT%H:%M:%S%z"),
    ("yyyy-MM-dd'T'HH:mm:ss.SSSXXX", "%Y-%m-%dT%H:%M:%S.%g%z"),
    ("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX", "%Y-%m-%dT%H:%M:%S.%f%z"),
    # ISO without zone (s / fractional)
    ("yyyy-MM-dd'T'HH:mm:ss", "%Y-%m-%dT%H:%M:%S"),
    ("yyyy-MM-dd'T'HH:mm:ss.SSSSSS", "%Y-%m-%dT%H:%M:%S.%f"),
    ("yyyy-MM-dd'T'HH:mm:ss.SSS", "%Y-%m-%dT%H:%M:%S.%g"),
    # datetime, space separated
    ("yyyy-MM-dd HH:mm:ss", "%Y-%m-%d %H:%M:%S"),
    ("yyyy-MM-dd HH:mm", "%Y-%m-%d %H:%M"),
    ("MM/dd/yyyy HH:mm:ss", "%m/%d/%Y %H:%M:%S"),
    ("MM/dd/yyyy hh:mm a", "%m/%d/%Y %I:%M %p"),
    ("dd.MM.yyyy HH:mm:ss", "%d.%m.%Y %H:%M:%S"),
    # date-only
    ("yyyy-MM-dd", "%Y-%m-%d"),
    ("MM/dd/yyyy", "%m/%d/%Y"),
    ("dd.MM.yyyy", "%d.%m.%Y"),
    ("yyyy/MM/dd", "%Y/%m/%d"),
    ("MMM d, yyyy", "%b %-d, %Y"),
    ("MMMM d, yyyy", "%B %-d, %Y"),
]

# Python strptime twins for the DRIVER-side sample sniffer in
# schema_infer — the cluster-side parse is parse_date_multi. strptime is
# MORE lenient than Java's DateTimeFormatter (accepts non-padded fields
# like "1/5/2023", 1-6 digit fractions, lowercase am/pm), so each format
# is gated behind a STRICT full-string regex matching exactly what the
# corresponding Java pattern in _SHAPE_CLASSES accepts. Without this, a
# column of "1/5/2023" values sniffs as DATETIME but the distributed
# parse NULLs every row.
PY_SHAPE_FORMATS: list[tuple[str, list[str]]] = [
    (
        r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d{3}|\.\d{6})?(Z|[+-]\d{2}:\d{2})?$",
        ["%Y-%m-%dT%H:%M:%S%z", "%Y-%m-%dT%H:%M:%S.%f%z",
         "%Y-%m-%dT%H:%M:%S", "%Y-%m-%dT%H:%M:%S.%f"],
    ),
    (r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}(:\d{2})?$",
     ["%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M"]),
    (r"^\d{4}-\d{2}-\d{2}$", ["%Y-%m-%d"]),
    (r"^\d{2}/\d{2}/\d{4} \d{2}:\d{2}:\d{2}$", ["%m/%d/%Y %H:%M:%S"]),
    (r"^\d{2}/\d{2}/\d{4} \d{2}:\d{2} (AM|PM)$", ["%m/%d/%Y %I:%M %p"]),
    (r"^\d{2}/\d{2}/\d{4}$", ["%m/%d/%Y"]),
    (r"^\d{2}\.\d{2}\.\d{4} \d{2}:\d{2}:\d{2}$", ["%d.%m.%Y %H:%M:%S"]),
    (r"^\d{2}\.\d{2}\.\d{4}$", ["%d.%m.%Y"]),
    (r"^\d{4}/\d{2}/\d{2}$", ["%Y/%m/%d"]),
    # month-name fallback — Java 'd' accepts 1-2 digit days
    (r"^[A-Za-z]{3,9} \d{1,2}, \d{4}$", ["%b %d, %Y", "%B %d, %Y"]),
]


def py_parse_date(value: str):
    """Driver-side twin of the multi-format chain: first match wins,
    None when nothing matches. Includes the reference's cheap
    might-be-a-date prefilter shape (reference src/date_parser.rs:120-173)
    — a value with no digit or no separator is never a date. Accepts
    EXACTLY the string set the distributed parse_date_multi accepts
    (shape-gated; see PY_SHAPE_FORMATS)."""
    import datetime as _dt
    import re as _re

    v = value.strip()
    if len(v) < 6 or not any(ch.isdigit() for ch in v):
        return None
    if not any(sep in v for sep in ("-", "/", ".", ",", ":")):
        return None
    for shape, fmts in PY_SHAPE_FORMATS:
        if not _re.match(shape, v):
            continue
        for fmt in fmts:
            try:
                return _dt.datetime.strptime(v, fmt)
            except ValueError:
                continue
    return None


# Shape-dispatch prefilter (the reference's might_be_date idea,
# src/date_parser.rs:120-173): a cheap anchored regex routes each string
# to the only format family that can parse it, cutting ~17 expensive
# DateTimeFormatter attempts per row to ~2. The classes are disjoint and
# every format's parseable strings fall in exactly one class, so
# first-match-wins semantics are unchanged vs the flat chain.
_SHAPE_CLASSES: list[tuple[str, list[str]]] = [
    (r"^\d{4}-\d{2}-\d{2}T", [
        "yyyy-MM-dd'T'HH:mm:ssXXX",
        "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
        "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
        "yyyy-MM-dd'T'HH:mm:ss",
        "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
        "yyyy-MM-dd'T'HH:mm:ss.SSS",
    ]),
    (r"^\d{4}-\d{2}-\d{2} ", ["yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm"]),
    (r"^\d{4}-\d{2}-\d{2}$", ["yyyy-MM-dd"]),
    (r"^\d{2}/\d{2}/\d{4}$", ["MM/dd/yyyy"]),
    (r"^\d{2}/\d{2}/\d{4} ", ["MM/dd/yyyy HH:mm:ss", "MM/dd/yyyy hh:mm a"]),
    (r"^\d{2}\.\d{2}\.\d{4}$", ["dd.MM.yyyy"]),
    (r"^\d{2}\.\d{2}\.\d{4} ", ["dd.MM.yyyy HH:mm:ss"]),
    (r"^\d{4}/\d{2}/\d{2}$", ["yyyy/MM/dd"]),
]
_SHAPE_FALLBACK = ["MMM d, yyyy", "MMMM d, yyyy"]


def parse_date_multi(col: Column | str, formats: list[tuple[str, str]] | None = None) -> Column:
    """First-match-wins multi-format timestamp parse (NULL if none).

    With the default format table, parsing is shape-dispatched (see
    _SHAPE_CLASSES); a custom ``formats`` list falls back to the flat
    coalesce chain."""
    c = F.col(col) if isinstance(col, str) else col
    if formats is not None:
        return F.coalesce(*[F.try_to_timestamp(c, F.lit(java)) for java, _ in formats])
    expr = None
    for shape_re, fmts in _SHAPE_CLASSES:
        attempt = F.coalesce(*[F.try_to_timestamp(c, F.lit(f)) for f in fmts])
        expr = F.when(c.rlike(shape_re), attempt) if expr is None else expr.when(
            c.rlike(shape_re), attempt
        )
    return expr.otherwise(
        F.coalesce(*[F.try_to_timestamp(c, F.lit(f)) for f in _SHAPE_FALLBACK])
    )


def parse_date_multi_sql(expr: str, formats: list[tuple[str, str]] | None = None) -> str:
    """DuckDB twin: try_strptime with the format list (first match wins)."""
    fmts = formats or FORMATS
    lst = ", ".join(f"'{d}'" for _, d in fmts)
    return f"try_strptime({expr}, [{lst}])"
