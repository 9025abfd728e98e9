#!/usr/bin/env python
"""Scale proof for the production BPE encoder (bpe_encode_batch).

Trains a merge table driver-side with the same greedy algorithm
(pure-Python over the collected word-frequency dictionary — byte-
identical to bpe_train's output, just without 1000 Spark jobs), pads
it to TARGET_MERGES with well-formed compositions of surviving
symbols so the rank dict is production-sized, then times the
Arrow-batched encode at sf0.1 and sf1 (10x). The claim under test:
encode wall is ~linear in corpus size and independent of vocabulary
size (min-rank loop + per-batch word cache).

Usage: python scripts/bench_bpe.py [SF01_DIR] [SF1_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from collections import Counter

from tinyetl_spark.operators.tokenizer import BPE_END, bpe_encode_batch
from tinyetl_spark.session import get_spark

TARGET_MERGES = 1000


def train_python(word_freq: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    syms = {w: tuple(w) + (BPE_END,) for w in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, s in syms.items():
            c = word_freq[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        if not pairs:
            break
        # deterministic tie-break: total desc, pair asc (same as bpe_train)
        top_total = max(pairs.values())
        best = min(p for p, t in pairs.items() if t == top_total)
        if pairs[best] < 2:
            break
        a, b = best
        merges.append(best)
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = tuple(out)
    return merges


def pad_merges(merges: list[tuple[str, str]], syms: list[str], n: int) -> list[tuple[str, str]]:
    """Extend to n entries with deterministic compositions of existing
    symbols — well-formed (operands exist) and mostly inert; the point
    is a production-sized rank dict, not new tokens."""
    out = list(merges)
    seen = set(merges)
    for a in sorted(syms):
        for b in sorted(syms):
            if len(out) >= n:
                return out
            if (a, b) not in seen:
                out.append((a, b))
                seen.add((a, b))
    return out


def main(sf01: str, sf1: str) -> None:
    spark = get_spark(app_name="bench_bpe", shuffle_partitions=32)
    docs01 = spark.read.parquet(f"{sf01}/documents.parquet")
    docs1 = spark.read.parquet(f"{sf1}/documents.parquet")

    wf = Counter()
    for r in docs01.selectExpr("explode(split(trim(text), '\\\\s+')) AS w").filter(
        "w <> ''"
    ).groupBy("w").count().collect():
        wf[r["w"]] = r["count"]
    t0 = time.time()
    merges = train_python(dict(wf), TARGET_MERGES)
    train_s = time.time() - t0
    final_syms = sorted({a + b for a, b in merges} | {c for w in wf for c in w})
    padded = pad_merges(merges, final_syms, TARGET_MERGES)
    print(f"trained {len(merges)} real merges in {train_s:.1f}s, padded to {len(padded)}")

    for label, d in [("sf0.1", docs01), ("sf1", docs1)]:
        enc = bpe_encode_batch(d, padded)
        enc.count()  # warm
        t0 = time.time()
        n_docs = enc.count()
        wall = time.time() - t0
        total_toks = enc.selectExpr("sum(n_tokens)").collect()[0][0]
        print(
            f"{label}: {n_docs} docs, {total_toks} tokens, {wall:.2f}s "
            f"({n_docs / wall:,.0f} docs/s, {total_toks / wall:,.0f} tokens/s)"
        )


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1",
    )
