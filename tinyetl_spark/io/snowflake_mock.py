"""Snowflake connector MOCK — parity with the reference, whose
Snowflake support is itself a simulation (reference
src/protocols/snowflake.rs:192-560: the source fabricates a 2-row
sample table behind a simulated ``COPY INTO`` export; the target stages
rows to a temp parquet and logs simulated ``PUT`` + ``COPY INTO``).

A real deployment swaps this for the spark-snowflake connector
(``spark.read.format("snowflake")``) with the same Location fields —
the mock keeps the URI surface and engine wiring testable offline.
"""

from __future__ import annotations

import logging
import tempfile

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger("tinyetl_spark.snowflake")

# the reference's simulated export sample (snowflake.rs:209-296 shape:
# a tiny typed table representing the COPY INTO result)
_SAMPLE_ROWS = [
    (1, "sample_row_1", "2024-01-01T00:00:00+00:00"),
    (2, "sample_row_2", "2024-01-02T00:00:00+00:00"),
]
_SAMPLE_SCHEMA = "id long, name string, created_at string"


def read_table(spark: SparkSession, uri: str, table: str) -> DataFrame:
    """Simulated COPY INTO export → staged parquet → read back."""
    staged = tempfile.mkdtemp(prefix="tinyetl_sf_stage_")
    log.warning(
        "MOCK snowflake source: simulating COPY INTO @tinyetl_stage FROM %s "
        "(uri=%s) -> %s", table, uri, staged,
    )
    sample = spark.createDataFrame(_SAMPLE_ROWS, _SAMPLE_SCHEMA)
    sample.write.mode("overwrite").parquet(staged)
    return spark.read.parquet(staged)


def write_table(df: DataFrame, uri: str, table: str) -> None:
    """Stage to parquet, log the simulated PUT + COPY INTO."""
    staged = tempfile.mkdtemp(prefix="tinyetl_sf_put_")
    df.write.mode("overwrite").parquet(staged)
    log.warning(
        "MOCK snowflake target: simulated PUT file://%s @tinyetl_stage; "
        "COPY INTO %s FROM @tinyetl_stage (uri=%s)", staged, table, uri,
    )
