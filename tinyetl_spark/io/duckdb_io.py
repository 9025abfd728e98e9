"""Embedded DuckDB source/sink (reference src/connectors/duckdb.rs).

Like SQLite, DuckDB is an embedded single-file database — the
reference drives it in-process behind a mutex (duckdb.rs:118-128), and
the honest Spark equivalent is a DRIVER-side connector streaming
bounded chunks (the duckdb Python module is in-container; there is no
JDBC jar). Reads use DuckDB's Arrow fast path in record batches;
writes stream ``toLocalIterator`` into a bulk INSERT via a registered
Arrow view — the analogue of the reference's Appender API
(duckdb.rs:16-76). For server-grade parallelism use the JDBC path.

Parity:
* schema via ``DESCRIBE`` (duckdb.rs:140-192)
* auto-DDL ``CREATE TABLE IF NOT EXISTS`` with the reference's type map
  (duckdb.rs:393-406): string→TEXT, integer→BIGINT, decimal→DOUBLE,
  boolean→BOOLEAN, date/datetime→TIMESTAMP, json→JSON
* truncate = ``DELETE FROM``; append supported
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SPARK_TO_DUCK = [
    (T.StringType, "TEXT"),
    (T.LongType, "BIGINT"),
    (T.IntegerType, "BIGINT"),
    (T.BooleanType, "BOOLEAN"),
    (T.DoubleType, "DOUBLE"),
    (T.FloatType, "DOUBLE"),
    (T.DecimalType, "DOUBLE"),
    (T.TimestampType, "TIMESTAMP"),
    (T.TimestampNTZType, "TIMESTAMP"),
    (T.DateType, "DATE"),
    (T.BinaryType, "BLOB"),
]


def _duck_type(dt: T.DataType) -> str:
    for cls, name in _SPARK_TO_DUCK:
        if isinstance(dt, cls):
            return name
    return "TEXT"


def table_exists(db_path: str, table: str) -> bool:
    import duckdb

    if not os.path.exists(db_path):
        return False
    con = duckdb.connect(db_path, read_only=True)
    try:
        rows = con.execute(
            "SELECT table_name FROM information_schema.tables WHERE table_name = ?",
            [table],
        ).fetchall()
        return bool(rows)
    finally:
        con.close()


def read_table(
    spark: SparkSession, db_path: str, table: str, batch_rows: int = 100_000
) -> DataFrame:
    """Arrow-batched read: DuckDB → RecordBatch → Spark."""
    import duckdb

    if not os.path.exists(db_path):
        raise FileNotFoundError(f"DuckDB file not found: {db_path}")
    con = duckdb.connect(db_path, read_only=True)
    try:
        reader = con.execute(f'SELECT * FROM "{table}"').fetch_record_batch(batch_rows)
        frames = []
        while True:
            try:
                batch = reader.read_next_batch()
            except StopIteration:
                break
            if batch.num_rows:
                frames.append(spark.createDataFrame(batch.to_pandas()))
        if not frames:
            import pyarrow as pa

            empty = reader.schema.empty_table() if hasattr(reader.schema, "empty_table") else pa.table(
                {f.name: [] for f in reader.schema}
            )
            return spark.createDataFrame(empty.to_pandas())
    finally:
        con.close()
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def write_table(
    df: DataFrame, db_path: str, table: str, truncate: bool = False, batch_rows: int = 50_000
) -> int:
    """Append-first write with auto-DDL; bulk INSERT from Arrow batches
    (the Appender-equivalent fast path). Returns rows written."""
    import duckdb
    import pandas as pd

    os.makedirs(os.path.dirname(os.path.abspath(db_path)) or ".", exist_ok=True)
    ddl_cols = ", ".join(f'"{f.name}" {_duck_type(f.dataType)}' for f in df.schema.fields)
    con = duckdb.connect(db_path)
    written = 0
    try:
        con.execute(f'CREATE TABLE IF NOT EXISTS "{table}" ({ddl_cols})')
        if truncate:
            con.execute(f'DELETE FROM "{table}"')
        cols = ", ".join(f'"{c}"' for c in df.columns)
        buf: list[tuple] = []

        def flush(rows: list[tuple]) -> None:
            if not rows:
                return
            pdf = pd.DataFrame(rows, columns=df.columns)
            con.register("_tinyetl_batch", pdf)
            con.execute(f'INSERT INTO "{table}" ({cols}) SELECT * FROM _tinyetl_batch')
            con.unregister("_tinyetl_batch")

        for row in df.toLocalIterator(prefetchPartitions=True):
            buf.append(tuple(row))
            written += 1
            if len(buf) >= batch_rows:
                flush(buf)
                buf = []
        flush(buf)
    finally:
        con.close()
    return written
