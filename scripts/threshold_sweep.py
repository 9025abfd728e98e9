#!/usr/bin/env python
"""Threshold sweep for the near-dup verify knobs against PLANTED
ground truth (round-8 verdict item 7: make the constants defensible).

Builds a corpus with two known duplicate classes on top of the real
testdata documents:

  * tag variants  — each doc re-emitted with one appended tag word
    (the gen_scale near-dup class, word-shingle Jaccard ~0.95);
  * verbatim excerpts — an 18-word slice of every ~29th long doc under
    a fresh id (the short-in-long containment class, shingle Jaccard
    ~0.15, char-5-gram Jaccard ~0.2).

Then sweeps the two verify thresholds over the SAME full pipelines the
registered queries run (union candidates -> containment verify;
minhash candidates -> jaccard verify) and reports, per threshold:
emitted pair count, recall of each planted class, and the background
pair count (emitted pairs that are NOT planted — the operator's
false-positive burden on this corpus).

DuckDB-only (the SQL twins are the same semantics the Spark side
hash-matches against), so the sweep runs in seconds. Output is the
markdown table README.md embeds.

Usage: python scripts/threshold_sweep.py [SRC_DIR]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tinyetl_spark.operators import dedup  # noqa: E402


def main(src: str) -> None:
    con = duckdb.connect()
    nmax = con.sql(
        f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'"
    ).fetchone()[0]
    con.execute(f"""
    CREATE VIEW documents AS
      SELECT doc_id, text FROM '{src}/documents.parquet'
      UNION ALL
      SELECT doc_id + {nmax} AS doc_id, text || ' copytag1' AS text
      FROM '{src}/documents.parquet'
      UNION ALL
      SELECT doc_id + {2 * nmax} AS doc_id,
             array_to_string(string_split(text, ' ')[11:28], ' ') AS text
      FROM '{src}/documents.parquet'
      WHERE doc_id % 29 = 0 AND len(string_split(text, ' ')) >= 60
    """)
    con.execute(f"""
    CREATE VIEW truth_tag AS
      SELECT doc_id AS id_a, doc_id + {nmax} AS id_b
      FROM '{src}/documents.parquet'
    """)
    con.execute(f"""
    CREATE VIEW truth_exc AS
      SELECT doc_id AS id_a, doc_id + {2 * nmax} AS id_b
      FROM '{src}/documents.parquet'
      WHERE doc_id % 29 = 0 AND len(string_split(text, ' ')) >= 60
    """)
    n_tag = con.sql("SELECT count(*) FROM truth_tag").fetchone()[0]
    n_exc = con.sql("SELECT count(*) FROM truth_exc").fetchone()[0]
    print(f"corpus: {con.sql('SELECT count(*) FROM documents').fetchone()[0]} docs, "
          f"planted: {n_tag} tag pairs, {n_exc} excerpt pairs\n")

    print("### containment verify (union candidates), planted-excerpt recall\n")
    print("| threshold | emitted | excerpt recall | tag recall | background pairs |")
    print("|---|---|---|---|---|")
    for tau in (0.3, 0.5, 0.7, 0.8, 0.9, 0.95):
        q = dedup.ngram_containment_full_sql(threshold=tau)
        con.execute(f"CREATE OR REPLACE TEMP TABLE got AS SELECT id_a, id_b FROM ({q})")
        emitted = con.sql("SELECT count(*) FROM got").fetchone()[0]
        hit_exc = con.sql(
            "SELECT count(*) FROM got JOIN truth_exc USING (id_a, id_b)"
        ).fetchone()[0]
        hit_tag = con.sql(
            "SELECT count(*) FROM got JOIN truth_tag USING (id_a, id_b)"
        ).fetchone()[0]
        bg = emitted - hit_exc - hit_tag
        print(f"| {tau} | {emitted} | {hit_exc}/{n_exc} = {hit_exc / n_exc:.2f} "
              f"| {hit_tag}/{n_tag} = {hit_tag / n_tag:.2f} | {bg} |")

    print("\n### jaccard verify (minhash candidates), tag-variant recall\n")
    print("| threshold | emitted | tag recall | excerpt recall | background pairs |")
    print("|---|---|---|---|---|")
    for tau in (0.1, 0.2, 0.3, 0.5, 0.7, 0.9):
        q = dedup.minhash_jaccard_sql(threshold=tau)
        con.execute(f"CREATE OR REPLACE TEMP TABLE got AS SELECT id_a, id_b FROM ({q})")
        emitted = con.sql("SELECT count(*) FROM got").fetchone()[0]
        hit_tag = con.sql(
            "SELECT count(*) FROM got JOIN truth_tag USING (id_a, id_b)"
        ).fetchone()[0]
        hit_exc = con.sql(
            "SELECT count(*) FROM got JOIN truth_exc USING (id_a, id_b)"
        ).fetchone()[0]
        bg = emitted - hit_exc - hit_tag
        print(f"| {tau} | {emitted} | {hit_tag}/{n_tag} = {hit_tag / n_tag:.2f} "
              f"| {hit_exc}/{n_exc} = {hit_exc / n_exc:.2f} | {bg} |")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
