#!/usr/bin/env python
"""Round-11 scale probes: the perceptual dHash near-dup tier, the
byte-fallback encode artifact, the six-way tokenizer_compare, and the
codec-complete ann_budget_curve at sf0.1 vs sf1 (10x) — README
scale-table rows.

Same protocol as the earlier round scripts: one fresh JVM, sentinel
first, one warm-up rep off the clock per (query, sf) (which also
absorbs staging builds), then the measured rep.

Usage: python scripts/bench_round11_sf1.py [sf0.1_dir] [sf1_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

from tinyetl_spark.queries import QUERIES
from tinyetl_spark.session import get_spark

NEW = [
    "multimodal_near_dups",
    "multimodal_phash_near_dups",
    "multimodal_audio_near_dups",
    "multimodal_dup_survivors",
    "streaming_perceptual_dedup",
    "multimodal_video_near_dups",
    "multimodal_image_quality",
    "multimodal_audio_quality",
    "wordpiece_byte_fallback_docs",
    "wordpiece_bf_encode_batch_docs",
    "tokenizer_compare",
    "ann_budget_curve",
]


def _run(spark, name: str, sf_dir: str) -> float:
    t0 = time.time()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _sentinel(spark, sf_dir: str) -> float:
    from pyspark.sql import functions as F

    best = None
    for _ in range(2):
        t0 = time.time()
        (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*"))
            .write.format("noop").mode("overwrite").save()
        )
        e = time.time() - t0
        best = e if best is None else min(best, e)
    return best


if __name__ == "__main__":
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/root/scaledata/sf1"
    spark = get_spark(app_name="bench_round11", shuffle_partitions=32)
    spark.read.parquet(f"{sf01}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    print(f"sentinel(sf0.1) = {_sentinel(spark, sf01):.2f}s")
    for name in NEW:
        walls = []
        for sf_dir in (sf01, sf1):
            _run(spark, name, sf_dir)  # warm-up: JVM/codegen + staging
            walls.append(_run(spark, name, sf_dir))
        ratio = walls[1] / walls[0] if walls[0] else float("nan")
        print(
            f"{name}: sf0.1={walls[0]:.2f}s sf1={walls[1]:.2f}s "
            f"growth={ratio:.1f}x"
        )
    print(f"sentinel(end) = {_sentinel(spark, sf01):.2f}s")
