"""Deterministic 60-bit string hashing that evaluates identically in
Spark SQL and in DuckDB SQL.

Why not ``F.hash``/``F.xxhash64``: those are engine-specific (Murmur3 /
xxHash with Spark's seeds) and have no DuckDB equivalent, so results
could not be oracle-checked. ``md5`` is bit-identical everywhere; we take
the first 15 hex digits (60 bits — fits a signed 64-bit int, always
non-negative) and parse them as an integer:

  Spark : CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
  DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)

Both stay entirely inside the engine (JVM-side / vectorized — no Python
in the hot path), so the construction scales: at 100 TB the hash is
computed inside whole-stage codegen next to the scan.

Each helper in this module comes in two flavors that are kept in one
place so they cannot drift apart:
  * ``*_col(...)``  -> a Spark ``Column``
  * ``*_sql(...)``  -> the equivalent DuckDB SQL fragment (for oracles)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX60 = (1 << 60) - 1  # hash64 values lie in [0, 2^60)


def hash64_col(col: Column | str, seed: int | str | None = None) -> Column:
    """60-bit non-negative deterministic hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(c, F.lit(f"\x1f{seed}"))
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash64_sql(expr: str, seed: int | str | None = None) -> str:
    """DuckDB SQL fragment equivalent to :func:`hash64_col`."""
    if seed is not None:
        expr = f"({expr} || chr(31) || '{seed}')"
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def hash128_col(col: Column | str) -> Column:
    """Full 128-bit md5 as a 32-char hex string — the EXACT-dedup key.

    60 bits is fine for LSH seeds/buckets but not as an identity key:
    birthday collisions reach ~40% probability at ~1.5e9 documents,
    i.e. silent false merges at the 100 TB corpus sizes this engine
    targets. 128 bits pushes that beyond 1e18 docs. The hex string
    groups/shuffles fine (uniform by construction)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def hash128_sql(expr: str) -> str:
    """DuckDB SQL fragment equivalent to :func:`hash128_col`."""
    return f"md5({expr})"
