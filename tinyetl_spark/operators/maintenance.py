"""Dataset-maintenance operators a long-lived 100 TB corpus needs
between queries: CDC-style snapshot upserts and small-file compaction.

The reference is a one-shot transfer tool (no merge, no table
maintenance — its append/truncate modes are the whole lifecycle,
src/config.rs mode enum), so both operators here are extensions; they
exist because a training-data lake that is re-crawled and re-scored
weekly lives or dies by them.
"""

from __future__ import annotations

import glob
import math
import os

from pyspark.sql import DataFrame, SparkSession


def upsert_snapshot(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Merge ``updates`` into ``base`` by ``key`` — an updated key's row
    replaces the base row, new keys append, untouched base rows pass
    through (the MERGE/CDC-apply semantic, computed as a new snapshot:
    base ⟕anti updates ∪ updates).

    Columns must match (checked) — partial-column updates should be
    joined into full rows upstream.

    Scale shape: ONE shuffle of the base on ``key`` for the anti-join
    (updates are typically ≪ base and broadcast themselves there), plus
    the union, which is free. With the base stored bucketed by ``key``
    the anti-join needs no shuffle at all — the same ingest-once
    bucketing contract the bucketed-join query demonstrates. Snapshot-
    rewrite is deliberate: without a table format carrying row-level
    deletes, rewriting is the atomic, reader-safe merge.
    """
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            f"upsert column mismatch: base {sorted(base.columns)} "
            f"vs updates {sorted(updates.columns)}"
        )
    survivors = base.join(updates.select(key), key, "left_anti")
    return survivors.unionByName(updates)


def compact_small_files(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_mb: int = 512,
) -> int:
    """Rewrite a parquet directory into ~``target_file_mb`` files — the
    small-files compaction every long-running ingest needs (a thousand
    executors appending hourly produce millions of KB-scale files;
    scan planning then spends longer listing than reading).

    File count is sized from the ACTUAL on-disk bytes, not row counts,
    so compaction is stable across schema/encoding changes. Uses
    coalesce (no shuffle — partitions are merged, not redistributed)
    when shrinking, which is the only direction compaction goes.
    Returns the output file count."""
    n_bytes = sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(src_dir, "**", "*.parquet"), recursive=True)
    ) or sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(src_dir, "part-*"))
    )
    n_files = max(1, math.ceil(n_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_dir)
    df.coalesce(n_files).write.mode("overwrite").parquet(dst_dir)
    return len(glob.glob(os.path.join(dst_dir, "part-*.parquet")))


def dataset_stats(path: str) -> dict:
    """File-layout health check: count/bytes/min/max/mean file size —
    the numbers that tell you a compaction is due."""
    sizes = [
        os.path.getsize(p)
        for p in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    ]
    if not sizes:
        return {"n_files": 0, "total_bytes": 0}
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes),
        "max_bytes": max(sizes),
        "mean_bytes": sum(sizes) // len(sizes),
    }


def zorder_key(cols: list, bits: int = 16):
    """Z-order (Morton) interleave of N non-negative integer columns
    into one clustering key: bit i of each column lands at position
    i*N + column-index, so rows close in EVERY dimension are close in
    the sort order.

    This is the multi-column data-skipping layout (the technique behind
    Delta/Iceberg OPTIMIZE ZORDER BY, from Morton 1966): sort-and-write
    by the z-key and parquet row-group min/max stats become selective
    for range predicates on ANY of the interleaved columns, not just
    the leading sort column. Columns must already be scaled to
    [0, 2^bits) — quantile-rank them first for skewed data.

    Pure bit arithmetic (shiftleft/bitwiseAND/OR folds) — codegen, zero
    shuffle; the one shuffle is the range-partition of the sort that
    uses the key."""
    from pyspark.sql import functions as F

    n = len(cols)
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    acc = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c.cast("bigint"), i).bitwiseAND(F.lit(1))
            acc = acc.bitwiseOR(F.shiftleft(bit, i * n + j))
    return acc


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    n = len(cols)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(f"(((CAST({c} AS BIGINT) >> {i}) & 1) << {i * n + j})")
    return "(" + " | ".join(terms) + ")"


def zorder_write(
    df: DataFrame, path: str, cols: list[str], bits: int = 16, target_files: int | None = None
) -> None:
    """Sort by the z-key and write parquet: repartitionByRange on the
    key (one range shuffle; AQE balances the ranges), sortWithinPartitions,
    write — every output file then covers a tight hyper-rectangle of the
    interleaved columns and row-group pruning works for all of them."""
    from pyspark.sql import functions as F

    keyed = df.withColumn("_z", zorder_key(cols, bits))
    n = target_files or keyed.rdd.getNumPartitions()
    (
        keyed.repartitionByRange(n, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def scd2_history(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    value_col: str,
    ts_col: str,
    seq_col: str,
) -> DataFrame:
    """Slowly-Changing-Dimension type 2: fold a base snapshot plus a
    change stream into versioned validity intervals — each key's value
    timeline becomes rows (key, version, value, valid_from, valid_to,
    is_current), the warehouse pattern for keeping history instead of
    overwriting (the type-1 path is :func:`upsert_snapshot`).

    Inputs share columns (key, value_col, ts_col, seq_col); ``seq_col``
    breaks same-timestamp ties deterministically (give base rows a
    sentinel below any change's). Scale shape: one union (free), ONE
    shuffle on the key, and a single window pass computing lead() and
    row_number() together — no self-join, no per-version scans;
    partition width = versions per key, never corpus size.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    u = base.select(key, value_col, ts_col, seq_col).unionByName(
        changes.select(key, value_col, ts_col, seq_col)
    )
    w = Window.partitionBy(key).orderBy(F.asc(ts_col), F.asc(seq_col))
    return u.select(
        F.col(key),
        F.row_number().over(w).alias("version"),
        F.col(value_col),
        F.date_format(F.col(ts_col), "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(F.lead(ts_col).over(w), "yyyy-MM-dd HH:mm:ss").alias(
            "valid_to"
        ),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )


def scd2_history_sql(
    base_select: str,
    changes_select: str,
    key: str,
    value_col: str,
    ts_col: str,
    seq_col: str,
) -> str:
    """DuckDB twin of :func:`scd2_history` over two SELECT fragments
    producing the same (key, value, ts, seq) shape."""
    return f"""
    WITH u AS ({base_select} UNION ALL {changes_select})
    SELECT {key},
           row_number() OVER w AS version,
           {value_col},
           strftime({ts_col}, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead({ts_col}) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
           lead({ts_col}) OVER w IS NULL AS is_current
    FROM u
    WINDOW w AS (PARTITION BY {key} ORDER BY {ts_col} ASC, {seq_col} ASC)
    """
