#!/usr/bin/env python
"""Generate a 10x scale factor from an existing testdata dir (default
sf0.1 -> sf1) for local scale-proofing of the heavy operator tier.

documents: 10 id-shifted copies; copies > 0 append a per-copy tag word,
so the corpus gains realistic NEAR-duplicate structure (jaccard ~0.95
to the original) instead of exact dupes — near-dup candidate counts
grow superlinearly exactly like a crawl corpus with mirrored pages.
Plus ~3% planted verbatim excerpts (18-word slices of ≥60-word docs
under fresh ids): near-zero-Jaccard SHORT-IN-LONG containment pairs
(shingle-Jaccard ~0.15, band-collision P ~1e-3), so the asymmetric
containment tier is exercised against its actual target class at
scale.
embeddings: 10 id-shifted copies with a tiny per-copy magnitude
perturbation (cosine-neutral; this tier's scale test measures
throughput, not recall).
Other tables are symlinked from the source dir.

Usage: python scripts/gen_scale.py [SRC_DIR] [DST_DIR]
"""

from __future__ import annotations

import os
import sys

import duckdb


def main(src: str, dst: str, copies: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    nmax = con.sql(f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0]
    con.execute(f"""
    COPY (
      SELECT doc_id + i*{nmax} AS doc_id,
             CASE WHEN i = 0 THEN text ELSE text || ' copytag' || i END AS text,
             * EXCLUDE (doc_id, text, i)
      FROM '{src}/documents.parquet', range({copies}) t(i)
      UNION ALL
      -- planted verbatim short-in-long excerpts (~3% of source docs):
      -- near-zero-Jaccard containment pairs, the class the asymmetric
      -- containment candidate generator exists to catch — scale runs
      -- of containment_dups / containment_recall_audit face the real
      -- failure mode, not only high-Jaccard tag variants
      SELECT doc_id + {copies}*{nmax} AS doc_id,
             array_to_string(string_split(text, ' ')[11:28], ' ') AS text,
             * EXCLUDE (doc_id, text)
      FROM '{src}/documents.parquet'
      WHERE doc_id % 29 = 0 AND len(string_split(text, ' ')) >= 60
      UNION ALL
      -- audit-band plants: excerpts of sources INSIDE the containment
      -- audit slice (doc_id < 300), parked at NEGATIVE ids — collision
      -- free with every real id and < cap by construction, so both
      -- endpoints land in containment_recall_audit's slice and its
      -- excerpt_recall is a standing measured number against planted
      -- ground truth at scale (a different word window than the main
      -- band so the two plant sets never alias)
      SELECT -(doc_id + 1) AS doc_id,
             array_to_string(string_split(text, ' ')[21:38], ' ') AS text,
             * EXCLUDE (doc_id, text)
      FROM '{src}/documents.parquet'
      WHERE doc_id % 29 = 0 AND doc_id < 300
        AND len(string_split(text, ' ')) >= 60
    ) TO '{dst}/documents.parquet' (FORMAT parquet)
    """)
    vmax = con.sql(f"SELECT max(vec_id)+1 FROM '{src}/embeddings.parquet'").fetchone()[0]
    con.execute(f"""
    COPY (
      SELECT vec_id + i*{vmax} AS vec_id,
             list_transform(embedding,
                            x -> CAST(x * (1.0 + 0.0003*i) AS FLOAT)) AS embedding,
             * EXCLUDE (vec_id, embedding, i)
      FROM '{src}/embeddings.parquet', range({copies}) t(i)
    ) TO '{dst}/embeddings.parquet' (FORMAT parquet)
    """)
    # events: copies shift users into fresh id ranges and jitter time by
    # i seconds — 10x the event log with the same per-user temporal
    # shape, so sessions/windows/funnels see real growth (a pure
    # symlink would leave the event tier unscaled)
    emax = con.sql(f"SELECT max(event_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
    umax = con.sql(f"SELECT max(user_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
    con.execute(f"""
    COPY (
      SELECT event_id + i*{emax} AS event_id,
             ts + to_seconds(i) AS ts,
             user_id + i*{umax} AS user_id,
             * EXCLUDE (event_id, ts, user_id, i)
      FROM '{src}/events.parquet', range({copies}) t(i)
    ) TO '{dst}/events.parquet' (FORMAT parquet)
    """)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        p = f"{dst}/{t}.parquet"
        if not os.path.exists(p):
            os.symlink(f"{src}/{t}.parquet", p)
    docs = con.sql(f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0]
    vecs = con.sql(f"SELECT count(*) FROM '{dst}/embeddings.parquet'").fetchone()[0]
    print(f"{dst}: {docs} documents, {vecs} embeddings")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(args[0] if args else "/root/testdata/sf0.1",
         args[1] if len(args) > 1 else "/root/scaledata/sf1")
