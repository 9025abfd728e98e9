"""Driver-scale oracle leg: re-run the rounding-sensitive queries at
sf0.01 — the scale the driver's correctness gate uses.

Round 5 lesson (`unigram_logprob_docs`): a divide-then-round boundary
can hash-match at sf0.001 (conftest default) yet diverge by 1 ulp at
sf0.01, so the default sweep alone cannot certify queries whose output
carries rounded doubles. This module selects those queries
mechanically — any oracle whose SQL rounds or floors — and runs the
same comparison as tests/test_oracle.py against /root/testdata/sf0.01.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from tests.conftest import TABLES
from tests.test_oracle import _normalize
from tinyetl_spark.queries import ORACLES, QUERIES

# Exhaustive tier (see pytest.ini): sf0.01 is ~10x the default test
# data; this leg rides with the full oracle replay, opt in with -m full.
pytestmark = pytest.mark.full

DRIVER_SF_DIR = "/root/testdata/sf0.01"

ROUNDING_SENSITIVE = sorted(
    n for n, sql in ORACLES.items() if re.search(r"\b(round|floor)\(", sql, re.I)
)


@pytest.fixture(scope="module")
def duck_driver_scale():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{DRIVER_SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", ROUNDING_SENSITIVE)
def test_rounded_query_matches_oracle_at_driver_scale(
    spark, duck_driver_scale, name
):
    got = QUERIES[name](spark, DRIVER_SF_DIR).toPandas()
    want = duck_driver_scale.execute(ORACLES[name]).df()
    got_cols, got_rows = _normalize(got)
    want_cols, want_rows = _normalize(want)
    assert got_cols == want_cols, f"{name}: columns differ: {got_cols} vs {want_cols}"
    assert len(got_rows) == len(want_rows), (
        f"{name}: row count {len(got_rows)} vs oracle {len(want_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(got_rows, want_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"
    )
