"""Time a few queries with the bench.py protocol (fresh JVM, warm-up
off the clock, best-of-2 noop-sink reps) — the fast loop while
optimizing a single operator.

Usage: python scripts/microbench.py name [name ...] [--sf dir] [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 2
    names = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--reps":
            reps = int(next(it))
        else:
            names.append(a)

    from tinyetl_spark.queries import QUERIES
    from tinyetl_spark.session import get_spark

    spark = get_spark(app_name="microbench")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        fn = QUERIES[name]
        best, all_reps = None, []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            e = time.perf_counter() - t0
            all_reps.append(round(e, 3))
            best = e if best is None else min(best, e)
        print(f"{name}: best={best:.3f}s reps={all_reps}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
