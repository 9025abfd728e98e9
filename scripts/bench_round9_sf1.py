#!/usr/bin/env python
"""10x scale probe for the round-9 operators (asymmetric containment
candidates + recall audit, 3-stage residual-PQ, unigram-LM tokenizer,
stdlib PNG decode) — README scale table. Documents-backed queries see
a true 10x corpus at sf1 (50k -> 500k docs vs sf0.1), now including
~3% planted verbatim short-in-long excerpts (gen_scale.py), so the
containment tier is measured against its actual target class.
Usage: python scripts/bench_round9_sf1.py [sf0.1_dir] [sf1_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

from tinyetl_spark.queries import QUERIES
from tinyetl_spark.session import get_spark

NEW = [
    "containment_dups",
    "containment_recall_audit",
    "ann_rpq3_rerank_topk",
    "ann_recall_rpq3_rerank",
    "unigram_train_vocab",
    "unigram_encode_docs",
    "tokenizer_compare",
    "multimodal_decode_png",
]


def main(sf01: str, sf1: str) -> None:
    spark = get_spark(app_name="bench_round9", shuffle_partitions=32)
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
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(time.time() - t0)
        ratio = walls[1] / walls[0] if walls[0] else float("nan")
        print(f"{name}: sf0.1={walls[0]:.2f}s sf1={walls[1]:.2f}s growth={ratio:.1f}x")


if __name__ == "__main__":
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    main(sf01, sf1)
