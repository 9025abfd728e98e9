"""Full-registry oracle sweep at the driver's sf0.01 scale.

Runs every entry in tinyetl_spark.queries.QUERIES against its DuckDB
oracle on /root/testdata/sf0.01 using the same normalization as
tests/test_oracle.py, and prints one status line per query plus a
final summary. This is the strongest pre-driver guarantee: the
driver's CORRECTNESS gate samples 50 of these at exactly this scale.

Usage: python scripts/sweep_sf001.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import TABLES  # noqa: E402
from tests.test_oracle import _normalize  # noqa: E402
from tinyetl_spark.queries import ORACLES, QUERIES  # noqa: E402
from tinyetl_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures: list[str] = []
    for name in sorted(QUERIES):
        t0 = time.time()
        try:
            got = QUERIES[name](spark, sf_dir).toPandas()
            if name not in ORACLES:
                ok = len(got) > 0 and bool(list(got.columns))
                status = "ROWS-ONLY-OK" if ok else "ROWS-ONLY-EMPTY"
                if not ok:
                    failures.append(name)
            else:
                want = con.execute(ORACLES[name]).df()
                gc, gr = _normalize(got)
                wc, wr = _normalize(want)
                if gc != wc:
                    status = f"COLS-MISMATCH {gc} vs {wc}"
                    failures.append(name)
                elif len(gr) != len(wr):
                    status = f"ROWS-MISMATCH {len(gr)} vs {len(wr)}"
                    failures.append(name)
                else:
                    bad = [
                        (i, a, b)
                        for i, (a, b) in enumerate(zip(gr, wr))
                        if a != b
                    ]
                    if bad:
                        status = f"VALUE-MISMATCH n={len(bad)} first={bad[0]!r:.300}"
                        failures.append(name)
                    else:
                        status = "OK"
        except Exception:
            status = "ERROR " + traceback.format_exc(limit=3).replace("\n", " | ")[:400]
            failures.append(name)
        print(f"{name:40s} {time.time() - t0:6.1f}s {status}", flush=True)

    print(f"\nSWEEP DONE: {len(QUERIES) - len(failures)}/{len(QUERIES)} green")
    if failures:
        print("FAILED:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
