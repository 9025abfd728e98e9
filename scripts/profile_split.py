"""Split a query's wall into CONSTRUCTION (building the DataFrame —
driver-side py4j + any collect/stage jobs the builder runs) and
EXECUTION (the noop write of the returned frame) — the diagnostic that
separated ann_budget_curve's 28 s of plan construction from its
compute in the r12 round.

Usage: python scripts/profile_split.py name [name ...] [--sf dir] [--reps N]
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

    spark = get_spark(app_name="profile_split")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        fn = QUERIES[name]
        for rep in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            print(
                f"{name} rep{rep}: construct={t1 - t0:.3f}s "
                f"exec={t2 - t1:.3f}s total={t2 - t0:.3f}s",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
