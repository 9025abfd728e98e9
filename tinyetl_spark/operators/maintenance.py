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
