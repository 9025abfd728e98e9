#!/usr/bin/env python
"""Round-10 scale probes + the bench-elevation adjudication.

Part 1 — 10x probe for the round-10 operators (likelihood-pruned
unigram trainer, staged tokenized_corpus artifact, ANN serving budget
curve, per-class containment audit) — README scale table. Staged
queries pay their parquet staging in the warm-up rep, so the measured
rep is the steady-state consumer cost (the production read-many shape).

Part 2 — the round-9 verdict's watch item: curation_pipeline and
epoch_order_manifest showed bench elevations with bit-identical code
and plans vs r8. Measure both SOLO, interleaved, in THIS single fresh
JVM right after its sentinel, exactly the head-to-head protocol the
host-noise band requires (README "Bench noise protocol") — if the
same-JVM numbers sit at the r8 level, the bench deltas were shard
position + host drift, not code.

Usage: python scripts/bench_round10_sf1.py [sf0.1_dir] [sf1_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

from tinyetl_spark.queries import QUERIES
from tinyetl_spark.session import get_spark

NEW = [
    "unigram_prune_vocab",
    "tokenized_corpus",
    "ann_budget_curve",
    "containment_recall_audit",
    "tokenizer_compare",
]

WATCH = ["curation_pipeline", "epoch_order_manifest"]


def _run(name: str, sf_dir: str) -> float:
    t0 = time.time()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _sentinel(sf_dir: str) -> float:
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
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    spark = get_spark(app_name="bench_round10", shuffle_partitions=32)
    spark.read.parquet(f"{sf01}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    print(f"sentinel(sf0.1) = {_sentinel(sf01):.2f}s  (bench r9 min was 0.25s)")

    # Part 2 FIRST — the watch queries measured while the JVM is quiet
    # (the probe tier would otherwise pile checkpoint blocks ahead of
    # them; see the within-JVM degradation note in the README).
    for name in WATCH:
        _run(name, sf01)  # warm-up off the clock
    for rep in range(2):
        for name in WATCH:  # interleaved A/B reps
            w = _run(name, sf01)
            print(f"WATCH {name} rep{rep}: {w:.2f}s (r8 bench: "
                  f"{'2.61' if name == 'curation_pipeline' else '1.60'}s)")

    # Part 1 — round-10 tier at sf0.1 vs sf1.
    for name in NEW:
        walls = []
        for sf_dir in (sf01, sf1):
            _run(name, sf_dir)  # warm-up: JVM/codegen/footers + staging
            walls.append(_run(name, sf_dir))
        ratio = walls[1] / walls[0] if walls[0] else float("nan")
        print(f"{name}: sf0.1={walls[0]:.2f}s sf1={walls[1]:.2f}s "
              f"growth={ratio:.1f}x")
    print(f"sentinel(end) = {_sentinel(sf01):.2f}s")
