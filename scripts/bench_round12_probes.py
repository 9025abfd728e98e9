#!/usr/bin/env python
"""Round-12 scale probes: the numpy-vectorized media tiers (verdict
item 4 done-when: the 100x walls drop to the einsum cost class) at
sf0.1 vs sf10 (100x) — README scale-table rows.

Same protocol as the earlier round scripts: one fresh JVM, sentinel
first, one warm-up rep off the clock per (query, sf) (which also
absorbs staging builds), then the measured rep.

Usage: python scripts/bench_round12_probes.py [sf0.1_dir] [sf10_dir] [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

from tinyetl_spark.queries import QUERIES
from tinyetl_spark.session import get_spark

NEW = [
    "multimodal_video_near_dups",
    "multimodal_video_temporal_dups",
    "multimodal_image_quality",
    "multimodal_audio_quality",
    "multimodal_audio_near_dups",
    "multimodal_curation_pipeline",
    "streaming_perceptual_dedup",
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


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_small = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    sf_big = args[1] if len(args) > 1 else "/root/scaledata/sf10"
    names = args[2:] or NEW

    spark = get_spark(shuffle_partitions=32)
    print(f"sentinel start: {_sentinel(spark, sf_small):.3f}s")
    for name in names:
        row = [name]
        for sf in (sf_small, sf_big):
            if not os.path.isdir(sf):
                row.append(f"{sf}=ABSENT")
                continue
            _run(spark, name, sf)  # warm-up (absorbs staging)
            row.append(f"{os.path.basename(sf)}={_run(spark, name, sf):.2f}s")
        print("  ".join(row), flush=True)
    print(f"sentinel end: {_sentinel(spark, sf_small):.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
