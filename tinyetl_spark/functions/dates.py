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


def parse_date_multi(col: Column | str, formats: list[tuple[str, str]] | None = None) -> Column:
    """First-match-wins multi-format timestamp parse (NULL if none)."""
    c = F.col(col) if isinstance(col, str) else col
    fmts = formats or FORMATS
    attempts = [F.try_to_timestamp(c, F.lit(java)) for java, _ in fmts]
    return F.coalesce(*attempts)


def parse_date_multi_sql(expr: str, formats: list[tuple[str, str]] | None = None) -> str:
    """DuckDB twin: try_strptime with the format list (first match wins)."""
    fmts = formats or FORMATS
    lst = ", ".join(f"'{d}'" for _, d in fmts)
    return f"try_strptime({expr}, [{lst}])"
