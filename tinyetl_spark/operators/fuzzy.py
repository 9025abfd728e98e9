"""Scalable edit-distance (fuzzy) string join.

Entity-resolution joins ("acme corp" ~ "acme corp.") can't be equi-joins
and a cross join is quadratic. The classic distributed answer is the
PassJoin segment filter (Li, Deng, Feng — ICDE 2011 / public algorithm):
split every indexed string into ``d+1`` contiguous segments; by
pigeonhole, any string within edit distance ``d`` must contain at least
one segment EXACTLY, at a start position shifted by at most ``d``. That
turns the similarity join into a plain equi-join on
(segment, segment-index, indexed-length) — the shape Spark shuffles
well — followed by a Levenshtein verify on candidates only.

The filter is provably COMPLETE (no true pair is missed), so the
verified output equals the brute-force cross-join result and the DuckDB
oracle can brute-force the same pairs with ``levenshtein`` inside a
length band. Everything below is built-in codegen (substr/explode/
levenshtein) — no Python in the hot path.

Reference parity: the reference has no similarity join (SURVEY.md §2);
this is a training-data/entity-resolution extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tinyetl_spark.functions.hashing import hash64_col, hash64_sql
from tinyetl_spark.operators.text import shingle_stream, words_sql

PHRASE_K = 3       # words per corpus phrase
PROBE_MOD = 149    # hash64(phrase) % MOD == 0 ⇒ phrase seeds a typo probe
EDIT_D = 1         # edit-distance threshold


def phrase_corpus(df: DataFrame, text_col: str = "text", k: int = PHRASE_K) -> DataFrame:
    """The DISTINCT k-word phrases of a corpus — the dictionary side of
    the fuzzy join (one column ``s``). One explode + one distinct."""
    return shingle_stream(df, text_col, k).distinct()


def phrase_corpus_sql(
    table: str = "documents", text_col: str = "text", k: int = PHRASE_K
) -> str:
    w = words_sql(text_col)
    return f"""
      SELECT DISTINCT unnest(list_transform(range(1, len(arr) - {k - 1} + 1),
                             i -> array_to_string(arr[i:i+{k - 1}], ' '))) AS s
      FROM (SELECT {w} AS arr FROM {table} WHERE len({w}) >= {k})
    """


def typo_probes(corpus: DataFrame, mod: int = PROBE_MOD) -> DataFrame:
    """Deterministic typo'd probe set: hash-sample ~1/mod of the corpus
    phrases and delete one character at a hash-chosen position (the
    "dirty input" side of an entity-resolution join). One column ``t``,
    distinct."""
    picked = corpus.filter(hash64_col("s") % mod == 0)
    pos = (hash64_col("s", seed="pos") % F.length("s")).cast("int")  # 0-based
    return picked.select(
        F.concat(
            F.col("s").substr(F.lit(1), pos),
            F.col("s").substr(pos + 2, F.length("s")),
        ).alias("t")
    ).distinct()


def typo_probes_sql(corpus_sql: str, mod: int = PROBE_MOD) -> str:
    h = hash64_sql("s")
    hp = hash64_sql("s", seed="pos")
    return f"""
      SELECT DISTINCT
             substr(s, 1, CAST({hp} % length(s) AS INT))
             || substr(s, CAST({hp} % length(s) AS INT) + 2) AS t
      FROM ({corpus_sql}) WHERE {h} % {mod} = 0
    """


def edit_distance_join(
    corpus: DataFrame, probes: DataFrame, d: int = EDIT_D
) -> DataFrame:
    """All (probe, corpus) pairs within Levenshtein distance ``d`` (=1).

    PassJoin shape for d=1: each corpus string of length L is split
    into 2 segments (lengths L//2 and L-L//2). Each probe of length M
    generates, for every candidate corpus length L in [M-1, M+1] and
    each segment slot, the substrings of the probe at the segment's
    start shifted by -1/0/+1 (<= 18 in-row keys). The equi-join key
    (substring, slot, L) keeps buckets tight; Levenshtein runs on
    candidates only. Both explodes are in-row codegen; the join is one
    hash shuffle sized by |keys|, never |corpus| x |probes|.

    Length-1 corpus strings degenerate to an EMPTY first segment; the
    empty piece "occurs" trivially, so every such string becomes a
    candidate for probes of length <= 2 — still bounded (few strings
    are that short) and required for completeness: filtering those keys
    out silently missed e.g. ('za', 'a')."""
    if d != 1:
        raise NotImplementedError("segment filter is built for d=1")
    # ---- index side: 2 segments per corpus string
    seg = corpus.select(
        F.col("s"),
        F.length("s").alias("_L"),
        F.explode(
            F.expr(
                "array("
                " struct(1 as slot, substr(s, 1, length(s) div 2) as piece),"
                " struct(2 as slot, substr(s, length(s) div 2 + 1,"
                "        length(s) - length(s) div 2) as piece))"
            )
        ).alias("_e"),
    ).select("s", F.col("_L"), F.col("_e.slot").alias("slot"), F.col("_e.piece").alias("piece"))
    # ---- probe side: candidate (substring, slot, L) keys
    keys = probes.select(
        F.col("t"),
        F.explode(
            F.expr(
                # for L in M-1..M+1, slot in 1..2, shift in -1..1:
                #   seg start p = slot==1 ? 1 : L div 2 + 1
                #   seg len  l = slot==1 ? L div 2 : L - L div 2
                #   emit substr(t, p+shift, l) when 1 <= p+shift and
                #        p+shift+l-1 <= length(t)
                "filter(flatten(transform(sequence(length(t)-1, length(t)+1), L -> "
                " flatten(transform(sequence(1, 2), slot -> "
                "  transform(sequence(-1, 1), sh -> struct("
                "   CASE WHEN slot = 1 THEN substr(t, 1 + sh, L div 2)"
                "        ELSE substr(t, L div 2 + 1 + sh, L - L div 2) END as piece,"
                "   slot as slot, L as L,"
                "   CASE WHEN slot = 1 THEN 1 + sh ELSE L div 2 + 1 + sh END as q,"
                "   CASE WHEN slot = 1 THEN L div 2 ELSE L - L div 2 END as sl"
                "  )))))), "
                " k -> k.L >= 1 AND k.q >= 1 AND k.sl >= 0"
                "      AND k.q + k.sl - 1 <= length(t))"
            )
        ).alias("_k"),
    ).select("t", F.col("_k.piece").alias("piece"), F.col("_k.slot").alias("slot"), F.col("_k.L").alias("_L"))
    cand = keys.join(seg, ["piece", "slot", "_L"]).select("t", "s").distinct()
    return cand.filter(F.levenshtein("t", "s") <= d).select(
        F.col("t").alias("probe_text"),
        F.col("s").alias("match_text"),
        F.levenshtein("t", "s").cast("bigint").alias("dist"),
    )


def fuzzy_join_phrases_sql(
    table: str = "documents",
    text_col: str = "text",
    k: int = PHRASE_K,
    mod: int = PROBE_MOD,
    d: int = EDIT_D,
) -> str:
    """Brute-force oracle: cross join inside a +/-d length band (the
    segment filter is complete, so the verified Spark output must equal
    this exactly)."""
    corpus = phrase_corpus_sql(table, text_col, k)
    probes = typo_probes_sql(corpus, mod)
    return f"""
    WITH corpus AS ({corpus}), probes AS ({probes})
    SELECT p.t AS probe_text, c.s AS match_text,
           CAST(levenshtein(p.t, c.s) AS BIGINT) AS dist
    FROM probes p JOIN corpus c
      ON abs(length(p.t) - length(c.s)) <= {d}
     AND levenshtein(p.t, c.s) <= {d}
    """
