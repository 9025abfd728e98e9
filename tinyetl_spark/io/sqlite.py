"""Embedded SQLite source/sink.

There is no sqlite JDBC driver jar in this environment, and SQLite is a
single-writer embedded database anyway — parallel executor writes would
serialize on the file lock. So this connector is deliberately
DRIVER-SIDE (SURVEY.md §7.4): reads stream in bounded chunks into Arrow
→ Spark; writes stream ``toLocalIterator()`` batches into chunked
multi-row INSERTs. Rows cross the driver in bounded batches, never all
at once. For a server-grade parallel path use the JDBC connectors.

Parity with the reference (src/connectors/sqlite.rs):
* schema from ``PRAGMA table_info`` (sqlite.rs:76-101)
* auto-DDL ``CREATE TABLE IF NOT EXISTS`` with the same type map
  (sqlite.rs:256-267): string→TEXT, integer→INTEGER, decimal→REAL,
  boolean→INTEGER, date/datetime→TEXT, json→TEXT
* multi-row INSERT chunked to ≤900 bind variables (sqlite.rs:355-358)
* truncate = ``DELETE FROM`` (sqlite.rs:427-434); append supported
"""

from __future__ import annotations

import os
import sqlite3
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAX_BIND_VARS = 900

_SPARK_TO_SQLITE = [
    (T.StringType, "TEXT"),
    (T.LongType, "INTEGER"),
    (T.IntegerType, "INTEGER"),
    (T.ShortType, "INTEGER"),
    (T.ByteType, "INTEGER"),
    (T.BooleanType, "INTEGER"),
    (T.DoubleType, "REAL"),
    (T.FloatType, "REAL"),
    (T.DecimalType, "REAL"),
    (T.TimestampType, "TEXT"),
    (T.TimestampNTZType, "TEXT"),
    (T.DateType, "TEXT"),
    (T.BinaryType, "BLOB"),
]

_SQLITE_TO_SPARK = {
    "INTEGER": T.LongType(),
    "INT": T.LongType(),
    "BIGINT": T.LongType(),
    "REAL": T.DoubleType(),
    "FLOAT": T.DoubleType(),
    "DOUBLE": T.DoubleType(),
    "NUMERIC": T.DoubleType(),
    "BLOB": T.BinaryType(),
}


def _sqlite_type(dt: T.DataType) -> str:
    for cls, name in _SPARK_TO_SQLITE:
        if isinstance(dt, cls):
            return name
    return "TEXT"


def table_exists(db_path: str, table: str) -> bool:
    if not os.path.exists(db_path):
        return False
    with sqlite3.connect(db_path) as con:
        row = con.execute(
            "SELECT name FROM sqlite_master WHERE type='table' AND name=?", (table,)
        ).fetchone()
    return row is not None


def read_table(
    spark: SparkSession, db_path: str, table: str, batch_rows: int = 50_000
) -> DataFrame:
    """PRAGMA-typed read, streamed in bounded chunks."""
    if not os.path.exists(db_path):
        raise FileNotFoundError(f"SQLite file not found: {db_path}")
    with sqlite3.connect(db_path) as con:
        info = con.execute(f'PRAGMA table_info("{table}")').fetchall()
        if not info:
            raise ValueError(f"Table {table!r} not found in {db_path}")
        names = [r[1] for r in info]
        types = [
            _SQLITE_TO_SPARK.get((r[2] or "").upper().split("(")[0], T.StringType())
            for r in info
        ]
        schema = T.StructType(
            [T.StructField(n, t, True) for n, t in zip(names, types)]
        )
        rows: list[tuple] = []
        cur = con.execute(f'SELECT * FROM "{table}"')
        frames = []
        while True:
            chunk = cur.fetchmany(batch_rows)
            if not chunk:
                break
            frames.append(spark.createDataFrame(chunk, schema))
        if not frames:
            return spark.createDataFrame(rows, schema)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _to_bindable(value):
    import datetime as dt

    if isinstance(value, (dt.datetime,)):
        return value.isoformat(sep="T") + "+00:00"  # RFC3339-ish, like TEXT dates
    if isinstance(value, dt.date):
        return value.isoformat()
    if isinstance(value, bool):
        return int(value)
    return value


def write_table(
    df: DataFrame,
    db_path: str,
    table: str,
    truncate: bool = False,
) -> int:
    """Append-first write with auto-DDL; returns rows written."""
    os.makedirs(os.path.dirname(os.path.abspath(db_path)) or ".", exist_ok=True)
    cols = df.columns
    ddl_cols = ", ".join(
        f'"{f.name}" {_sqlite_type(f.dataType)}' for f in df.schema.fields
    )
    rows_per_stmt = max(1, MAX_BIND_VARS // max(1, len(cols)))
    placeholders = "(" + ", ".join("?" for _ in cols) + ")"
    written = 0
    con = sqlite3.connect(db_path)
    try:
        con.execute(f'CREATE TABLE IF NOT EXISTS "{table}" ({ddl_cols})')
        if truncate:
            con.execute(f'DELETE FROM "{table}"')
        buf: list[tuple] = []

        def flush(batch: list[tuple]) -> None:
            if not batch:
                return
            sql = (
                f'INSERT INTO "{table}" ({", ".join(chr(34) + c + chr(34) for c in cols)}) '
                f"VALUES {', '.join([placeholders] * len(batch))}"
            )
            con.execute(sql, [v for row in batch for v in row])

        for row in _iter_rows(df):
            buf.append(tuple(_to_bindable(v) for v in row))
            written += 1
            if len(buf) >= rows_per_stmt:
                flush(buf)
                buf = []
        flush(buf)
        con.commit()
    finally:
        con.close()
    return written


def _iter_rows(df: DataFrame) -> Iterator[tuple]:
    for row in df.toLocalIterator(prefetchPartitions=True):
        yield tuple(row)
