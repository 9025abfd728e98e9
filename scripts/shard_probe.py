"""Diagnose shard-local JVM contamination: run the first N queries of a
bench shard (crc32 split, alphabetical — exactly bench.py's layout),
then re-time a sentinel query and dump JVM code-cache + GC stats.

Usage: python scripts/shard_probe.py SHARD_IDX N_QUERIES [sentinel_query]
"""

from __future__ import annotations

import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def jvm_stats(spark):
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory
    out = {}
    it = mf.getMemoryPoolMXBeans().iterator()
    while it.hasNext():
        p = it.next()
        name = p.getName()
        if "CodeHeap" in name or "Metaspace" in name:
            u = p.getUsage()
            out[name] = (round(u.getUsed() / 2**20), round(u.getMax() / 2**20))
    gct = 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        g = it.next()
        gct += g.getCollectionTime()
    out["gc_total_ms"] = gct
    return out


def main() -> int:
    shard_idx = int(sys.argv[1])
    n_queries = int(sys.argv[2])
    sentinel = sys.argv[3] if len(sys.argv) > 3 else "q7_volume_shipping"

    from tinyetl_spark.queries import QUERIES
    from tinyetl_spark.session import get_spark

    names = sorted(QUERIES)
    n_shards = max(4, -(-len(names) // 60))
    shard = [n for n in names if zlib.crc32(n.encode()) % n_shards == shard_idx]
    run = shard[:n_queries]

    spark = get_spark(app_name="shard_probe")
    spark.read.parquet(f"{SF_DIR}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    def t(name):
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    print(f"fresh sentinel {sentinel}: {t(sentinel):.2f}s", flush=True)
    print("stats:", jvm_stats(spark), flush=True)
    t_start = time.perf_counter()
    for name in run:
        e = t(name)
        print(f"  {name}: {e:.2f}s", flush=True)
    print(f"shard prefix wall: {time.perf_counter()-t_start:.1f}s", flush=True)
    print("stats:", jvm_stats(spark), flush=True)
    for rep in range(3):
        print(f"post sentinel {sentinel}: {t(sentinel):.2f}s", flush=True)
    print("stats:", jvm_stats(spark), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
