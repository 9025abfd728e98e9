"""KMV (k-minimum-values) sketches for cross-corpus overlap estimation.

"How much does corpus A overlap corpus B?" asked exactly is a distinct
intersection join — two corpus-sized shuffles. The KMV sketch
(Bar-Yossef et al. 2002; the bottom-k estimator as analyzed in
Beyer et al., SIGMOD 2007) answers it from two k-row summaries: keep
the k smallest distinct hash values of each side; the kth smallest
value estimates distinct cardinality ((k-1) scaled by the hash range
over the kth value), and the fraction of the union's bottom-k present
in both sketches estimates Jaccard. Each sketch is a TakeOrdered
(bounded top-k, no global sort) over a distinct-hash stream — the only
corpus-sized work is one hash + partial distinct per side, and the
estimate combines k-row tables.

Everything is ``hash64`` (md5-based, engine-portable) so the DuckDB
oracle reproduces the sketch bit-for-bit — the estimator is
deterministic, not just statistically close.

Reference parity: the reference has no sketches (SURVEY.md §2); this
is a training-data-pipeline extension (corpus overlap audits before
mixing/dedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tinyetl_spark.functions.hashing import MAX60, hash64_col, hash64_sql
from tinyetl_spark.operators.text import floor_round, floor_round_sql, shingle_stream, words_sql

KMV_K = 256        # sketch size
OVERLAP_SHINGLE_K = 5  # words per shingle for the corpus-overlap queries


def kmv_sketch(df: DataFrame, item: Column, *, checkpoint: bool = True) -> DataFrame:
    """Bottom-k distinct hashes of an item column — one column ``h``,
    exactly min(k, |distinct|) rows. TakeOrdered (no global sort),
    then checkpointed by default: the sketch is consumed by several
    estimate branches, and without the cut each branch would re-run the
    corpus-sized hash+distinct scan — the exact cost the sketch exists
    to avoid. ``checkpoint=False`` keeps the plan inspectable (the
    plan-shape tests pin the TakeOrdered there)."""
    sk = df.select(hash64_col(item).alias("h")).distinct().orderBy("h").limit(KMV_K)
    return sk.localCheckpoint() if checkpoint else sk


def kmv_overlap(a: DataFrame, b: DataFrame, item: Column) -> DataFrame:
    """One-row overlap estimate between two corpora's item streams:
    (k, n_inter, jaccard_est, union_est, inter_est).

    jaccard_est = |union-bottom-k ∩ A-sketch ∩ B-sketch| / k;
    union_est = (k-1) * RANGE / kth-min of the union sketch;
    inter_est = round(jaccard_est * union_est). All arithmetic is the
    same IEEE ops in both engines, so the oracle matches exactly."""
    sa, sb = kmv_sketch(a, item), kmv_sketch(b, item)
    s = sa.union(sb).distinct().orderBy("h").limit(KMV_K).localCheckpoint()
    stats = s.agg(F.max("h").alias("_hmax"), F.count("*").alias("_n"))
    inter = (
        s.join(sa, "h", "left_semi")
        .join(sb, "h", "left_semi")
        .agg(F.count("*").alias("_ni"))
    )
    jac = F.col("_ni") / F.col("_n")
    union_est = (F.col("_n") - 1) * F.lit(float(MAX60)) / F.col("_hmax")
    return (
        stats.join(F.broadcast(inter))
        .select(
            F.col("_n").cast("bigint").alias("k"),
            F.col("_ni").cast("bigint").alias("n_inter"),
            floor_round(jac, 6).alias("jaccard_est"),
            F.floor(union_est + F.lit(0.5)).cast("bigint").alias("union_est"),
            F.floor(jac * union_est + F.lit(0.5)).cast("bigint").alias("inter_est"),
        )
    )


def _shingles(df: DataFrame, text_col: str, k: int) -> DataFrame:
    return shingle_stream(df, text_col, k)


def corpus_overlap_kmv(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = OVERLAP_SHINGLE_K,
) -> DataFrame:
    """KMV overlap estimate between the even-id and odd-id halves of a
    document corpus, over word shingles — the pre-dedup audit: "how
    much shared text do these two slices carry?"."""
    even = _shingles(df.filter(F.col(id_col) % 2 == 0), text_col, shingle_k)
    odd = _shingles(df.filter(F.col(id_col) % 2 == 1), text_col, shingle_k)
    return kmv_overlap(even, odd, F.col("s"))


def corpus_overlap_kmv_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = OVERLAP_SHINGLE_K,
    k: int = KMV_K,
) -> str:
    w = words_sql(text_col)
    sh = (
        f"SELECT unnest(list_transform(range(1, len(arr) - {shingle_k - 1} + 1), "
        f"i -> array_to_string(arr[i:i+{shingle_k - 1}], ' '))) AS s "
        f"FROM (SELECT {w} AS arr FROM {table} WHERE {id_col} % 2 = {{par}} "
        f"AND len({w}) >= {shingle_k})"
    )
    h = hash64_sql("s")
    jac = "CAST(ni AS DOUBLE) / n"
    union_est = f"(n - 1) * {float(MAX60)!r} / hmax"
    return f"""
    WITH sa AS (SELECT DISTINCT {h} AS h FROM ({sh.format(par=0)}) ORDER BY h LIMIT {k}),
    sb AS (SELECT DISTINCT {h} AS h FROM ({sh.format(par=1)}) ORDER BY h LIMIT {k}),
    s AS (SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb) ORDER BY h LIMIT {k}),
    st AS (SELECT max(h) AS hmax, count(*) AS n FROM s),
    it AS (SELECT count(*) AS ni FROM s
           WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb))
    SELECT CAST(n AS BIGINT) AS k,
           CAST(ni AS BIGINT) AS n_inter,
           {floor_round_sql(jac, 6)} AS jaccard_est,
           CAST(floor({union_est} + 0.5) AS BIGINT) AS union_est,
           CAST(floor(({jac}) * ({union_est}) + 0.5) AS BIGINT) AS inter_est
    FROM st, it
    """


def corpus_overlap_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = OVERLAP_SHINGLE_K,
) -> DataFrame:
    """Exact ground truth for the KMV estimate (same halves, same
    shingles): distinct |A|, |B|, |A∩B|, |A∪B|, true jaccard. Costs the
    two corpus-sized distincts the sketch avoids — registered so the
    estimator's error is itself an oracle-checked number."""
    even = _shingles(df.filter(F.col(id_col) % 2 == 0), text_col, shingle_k).distinct()
    odd = _shingles(df.filter(F.col(id_col) % 2 == 1), text_col, shingle_k).distinct()
    na = even.agg(F.count("*").alias("n_a"))
    nb = odd.agg(F.count("*").alias("n_b"))
    ni = even.join(odd, "s", "left_semi").agg(F.count("*").alias("n_inter"))
    return (
        na.join(F.broadcast(nb))
        .join(F.broadcast(ni))
        .select(
            F.col("n_a").cast("bigint"),
            F.col("n_b").cast("bigint"),
            F.col("n_inter").cast("bigint"),
            (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("bigint").alias("n_union"),
            floor_round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
    )


def corpus_overlap_exact_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = OVERLAP_SHINGLE_K,
) -> str:
    w = words_sql(text_col)
    sh = (
        f"SELECT DISTINCT unnest(list_transform(range(1, len(arr) - {shingle_k - 1} + 1), "
        f"i -> array_to_string(arr[i:i+{shingle_k - 1}], ' '))) AS s "
        f"FROM (SELECT {w} AS arr FROM {table} WHERE {id_col} % 2 = {{par}} "
        f"AND len({w}) >= {shingle_k})"
    )
    return f"""
    WITH a AS ({sh.format(par=0)}), b AS ({sh.format(par=1)}),
    st AS (SELECT (SELECT count(*) FROM a) AS n_a,
                  (SELECT count(*) FROM b) AS n_b,
                  (SELECT count(*) FROM a WHERE s IN (SELECT s FROM b)) AS n_inter)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(n_inter AS BIGINT) AS n_inter,
           CAST(n_a + n_b - n_inter AS BIGINT) AS n_union,
           {floor_round_sql('CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter)', 6)} AS jaccard
    FROM st
    """
