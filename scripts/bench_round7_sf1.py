#!/usr/bin/env python
"""10x scale probe for the round-7 operators (README scale table).
Events-backed queries see a true 10x log at sf1; relational tables are
symlinked there, so TPC-H rows measure fixed plan cost honestly.
Usage: python scripts/bench_round7_sf1.py [sf0.1_dir] [sf1_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

from tinyetl_spark.queries import QUERIES
from tinyetl_spark.session import get_spark

NEW = [
    "hll_distinct_users",
    "rollup_cascade_events",
    "hist_quantiles_prices",
    "bloom_semi_join_orders",
    "scd2_customer_history",
    "perplexity_buckets",
    "tokenizer_fertility",
    "q2_min_cost_supplier",
    "q4_priority_check",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q21_waiting_supplier",
    "q22_idle_customers",
]


def main(sf01: str, sf1: str) -> None:
    spark = get_spark(app_name="bench_round7", shuffle_partitions=32)
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
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1",
    )
