"""Solo sentinel-anchored re-time of the round-11 watch item
(wordpiece_train_merges, 4.32 -> 6.32 s in BENCH_r11, ~1.45x
host-normalized) — the same fresh-JVM protocol that adjudicated the
r9 (curation_pipeline) and r10 (unigram) watch pairs.

Runs the watch query interleaved with wordpiece_encode_docs (its
shard neighbor and the other candidate for the duplicated-train
hypothesis) for N reps in ONE fresh JVM, brackets the run with the
bench sentinel, and prints per-rep walls + warm minima. Contention
inflates and never deflates, so only sentinel-anchored minima mean
anything.

Usage: python scripts/adjudicate_wordpiece.py [--reps 4] [--sf dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _sentinel  # noqa: E402
import bench  # noqa: E402
from tinyetl_spark.queries import QUERIES  # noqa: E402
from tinyetl_spark.session import get_spark  # noqa: E402

NAMES = ["wordpiece_train_merges", "wordpiece_encode_docs"]


def main() -> int:
    reps = 4
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    if "--reps" in args:
        reps = int(args[args.index("--reps") + 1])
    if "--sf" in args:
        sf = args[args.index("--sf") + 1]
    bench.SF_DIR = sf

    spark = get_spark(shuffle_partitions=32)
    s0 = _sentinel(spark)
    walls: dict[str, list[float]] = {n: [] for n in NAMES}
    for r in range(reps):
        for n in NAMES:
            t0 = time.perf_counter()
            QUERIES[n](spark, sf).write.format("noop").mode("overwrite").save()
            walls[n].append(round(time.perf_counter() - t0, 3))
    s1 = _sentinel(spark)
    print(f"sf={sf} sentinel start={s0} end={s1}")
    for n in NAMES:
        w = walls[n]
        warm = w[1:] if len(w) > 1 else w
        print(f"{n}: reps={w} warm_min={min(warm)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
