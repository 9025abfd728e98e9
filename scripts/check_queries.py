"""Targeted oracle compare for a few queries at one or more scales.

Same normalization as tests/test_oracle.py / scripts/sweep_sf001.py,
but only for the names given on the command line — the fast loop while
iterating on a single operator.

Usage: python scripts/check_queries.py name [name ...] [--sf dir ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import TABLES  # noqa: E402
from tests.test_oracle import _normalize  # noqa: E402
from tinyetl_spark.queries import ORACLES, QUERIES  # noqa: E402
from tinyetl_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dirs = []
    names = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dirs.append(next(it))
        else:
            names.append(a)
    if not sf_dirs:
        sf_dirs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = get_spark()
    rc = 0
    for sf_dir in sf_dirs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name in names:
            t0 = time.time()
            got = QUERIES[name](spark, sf_dir).toPandas()
            if name not in ORACLES:
                print(f"{sf_dir} {name}: ROWS-ONLY rows={len(got)}")
                continue
            want = con.execute(ORACLES[name]).df()
            gc, gr = _normalize(got)
            wc, wr = _normalize(want)
            if gc != wc:
                status = f"COLS-MISMATCH {gc} vs {wc}"
            elif len(gr) != len(wr):
                status = f"ROWS-MISMATCH {len(gr)} vs {len(wr)}"
            else:
                bad = [
                    (i, a, b) for i, (a, b) in enumerate(zip(gr, wr)) if a != b
                ]
                status = (
                    "OK"
                    if not bad
                    else f"VALUES-MISMATCH first={bad[0]!r} n={len(bad)}"
                )
            if not status.startswith("OK"):
                rc = 1
            print(
                f"{sf_dir} {name}: {status} rows={len(gr)}"
                f" ({time.time() - t0:.1f}s)"
            )
        con.close()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
