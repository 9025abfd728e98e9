#!/usr/bin/env python
"""10x scale probe for the round-6 operators: run each new query at
sf0.1 and sf1 (gen_scale output) and print wall clocks, for the
README scale tables. Usage: python scripts/bench_round6_sf1.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

from tinyetl_spark.queries import QUERIES
from tinyetl_spark.session import get_spark

NEW = [
    "dup_passage_spans",
    "dsir_select_docs",
    "unimax_mix_langs",
    "quality_classifier_docs",
    "streaming_classifier_scores",
    "vocab_coverage_curve",
    "inference_batches_docs",
    "bpe_encode_batch_docs",
    "q5_local_supplier_volume",
    "q14_promo_revenue",
    "remove_dup_passages_docs",
    "trigram_search_docs",
    "count_min_heavy_hitters",
    "streaming_count_min",
    "profile_lineitem",
]


def main(sf01: str, sf1: str) -> None:
    spark = get_spark(app_name="bench_round6", shuffle_partitions=32)
    spark.read.parquet(f"{sf01}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    for name in NEW:
        walls = []
        for sf_dir in (sf01, sf1):
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # warm JVM/codegen/footers off the clock
            t0 = time.time()
            # COLD build + execute: driver-side training/collect steps
            # inside a query builder are part of its honest wall
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(time.time() - t0)
        ratio = walls[1] / walls[0] if walls[0] else float("nan")
        print(f"{name}: sf0.1={walls[0]:.2f}s sf1={walls[1]:.2f}s growth={ratio:.1f}x")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1",
    )
