"""Structured Streaming twins of the batch event operators.

The reference has NO event-time streaming (SURVEY.md §2.10 — its
"streaming" is bounded-memory batch iteration), so this module is
north-star extension work: the same tumbling/session aggregations that
run in batch (queries.events_tumbling / sessionize_events) expressed as
Structured Streaming queries with watermarks for late data.

Scale notes:
* State lives in the state store keyed by (window, event_type) /
  session key — the watermark bounds state size; without it a 100 TB
  stream accumulates state forever.
* ``session_window`` is Spark's native gap-based session operator —
  the streaming twin of the batch gap-and-islands formulation.
* ``run_bounded`` uses ``Trigger.availableNow`` + a memory sink: it
  drains a bounded directory once and returns the result — this is how
  the correctness gate replays a batch table through the REAL streaming
  engine and compares against the batch oracle.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(
    spark: SparkSession, path_glob: str, schema, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a parquet directory (schema required —
    streaming sources cannot infer)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path_glob)


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of queries.events_tumbling: per-window,
    per-event-type counts + value sums with late-data tolerance."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_aggregates(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of operators.relational.sessionize via the native
    ``session_window`` (gap-based, state bounded by the watermark)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("s"), F.col(key))
        .agg(F.count("*").alias("n_events"))
        .select(
            key,
            F.date_format("s.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("s.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(stream: DataFrame, cols: list[str]) -> DataFrame:
    """Streaming exact dedup: emit only the FIRST row seen per key.

    ``dropDuplicates`` keeps one state entry per distinct key — at
    100 TB pair it with ``dropDuplicatesWithinWatermark`` so keys age
    out once the watermark passes them; a bounded replay (as in the
    correctness gate) can keep full state. Which physical row survives
    is arrival-order-dependent, so project the emitted columns down to
    the KEY itself for deterministic results."""
    return stream.dropDuplicates(cols)


def stateful_running_counts(
    events: DataFrame, key: str = "user_id", weight_col: str | None = None
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` — the
    escape hatch for stream logic Spark's built-in aggregations can't
    express (here: per-key running event counts, the minimal shape that
    proves state carries across micro-batches).

    State is one bigint per key in the state store; every micro-batch
    updates it and emits the new cumulative count ("update" semantics —
    downstream takes the LAST/max row per key). Arrow-batched pandas,
    never row-at-a-time.

    ``weight_col``: when the upstream already carries per-key DELTAS
    (the standard shape for high-volume streams — pre-aggregate per
    micro-batch, then accumulate the small delta rows in state), sum
    that column instead of counting rows; Arrow then moves one row per
    (key, batch) instead of one per event."""
    import pandas as pd  # noqa: F401 — required by the worker closure
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField(key, T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("n", T.LongType())])

    def update_counts(key_tuple, pdf_iter, state: GroupState):
        import pandas as pd

        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += int(pdf[weight_col].sum()) if weight_col else len(pdf)
        state.update((n,))
        yield pd.DataFrame({key: [key_tuple[0]], "n_events": [n]})

    return events.groupBy(key).applyInPandasWithState(
        update_counts,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cond: str,
    time_cond: str,
) -> DataFrame:
    """Stream-stream INNER interval join.

    Both inputs must already carry watermarks; ``time_cond`` must bound
    the two event-time columns against each other (e.g.
    ``v_ts BETWEEN p_ts - INTERVAL 1 HOUR AND p_ts``) — that bound plus
    the watermarks is what lets the state store evict rows, so join
    state is O(rate × (watermark + interval)) per key, not O(stream).
    Inner matches emit as soon as both rows arrive; no waiting on
    watermark expiry (that's only needed for outer sides).

    Scale shape: both streams shuffle once on the equi-key; the range
    predicate is evaluated inside the joined state — the same
    banded-equi-join philosophy as the batch range join
    (operators/relational.py), expressed through Spark's native
    stream-stream join state machine."""
    return left.join(right, F.expr(f"({key_cond}) AND ({time_cond})"), "inner")


def run_bounded(
    stream_df: DataFrame,
    spark: SparkSession,
    mode: str = "complete",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Drain a bounded stream completely (availableNow) into a memory
    sink; returns the materialized result as a batch DataFrame.

    ``mode``: "complete" for full-rewrite aggregations, "update" for
    stateful operators that emit per-batch updates, "append" for
    row-emitting operators (dedup); with availableNow the drained table
    is the full result either way.

    ``state_partitions``: stateful streaming shuffles are sized
    SEPARATELY from batch — each state partition pays a per-micro-batch
    store open/commit, so partition count should track state volume
    (keys × state size), not batch parallelism. The conf is locked into
    the query's checkpoint at start, so it is set just for the start
    call and restored after; pass None to inherit the session value
    (what a production job with a real checkpoint would tune there)."""
    name = f"bounded_{uuid.uuid4().hex[:12]}"
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    if state_partitions is not None:
        spark.conf.set(key, str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        if state_partitions is not None:
            spark.conf.set(key, prev)
    q.awaitTermination()
    return spark.table(name)
