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
    same IEEE ops in both engines, so the oracle matches exactly.

    Under-full regime (union sketch holds < k hashes): the sketch IS
    the entire distinct union, so standard KMV returns the exact
    counts — union_est = n, inter_est = n_inter — instead of adding
    estimator bias/variance where the truth is already in hand."""
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
    full = F.col("_n") >= F.lit(KMV_K)
    return (
        stats.join(F.broadcast(inter))
        .select(
            F.col("_n").cast("bigint").alias("k"),
            F.col("_ni").cast("bigint").alias("n_inter"),
            floor_round(jac, 6).alias("jaccard_est"),
            F.when(full, F.floor(union_est + F.lit(0.5)))
            .otherwise(F.col("_n"))
            .cast("bigint")
            .alias("union_est"),
            F.when(full, F.floor(jac * union_est + F.lit(0.5)))
            .otherwise(F.col("_ni"))
            .cast("bigint")
            .alias("inter_est"),
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
           CAST(CASE WHEN n >= {k} THEN floor({union_est} + 0.5)
                ELSE n END AS BIGINT) AS union_est,
           CAST(CASE WHEN n >= {k} THEN floor(({jac}) * ({union_est}) + 0.5)
                ELSE ni END AS BIGINT) AS inter_est
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


CM_DEPTH = 4      # hash rows
CM_WIDTH = 1024   # counters per row
CM_TOPK = 20      # heavy hitters audited by the registered query


def _cm_hash(k: Column, i: Column) -> Column:
    """Row-seeded hash: md5(key || US || row-index) — the seed is a
    COLUMN here (one explode covers all rows), so it concatenates
    in-expression instead of using hash64_col's literal seed."""
    return hash64_col(F.concat(k, F.lit("\x1f"), i.cast("string")))


def _cm_hash_sql(key_expr: str) -> str:
    return hash64_sql(f"(CAST({key_expr} AS VARCHAR) || chr(31) || CAST(i AS VARCHAR))")


def count_min_table(df: DataFrame, key: Column, depth: int = CM_DEPTH, width: int = CM_WIDTH) -> DataFrame:
    """The Count-Min sketch (Cormode & Muthukrishnan 2005) as a
    relational table: (row i, slot, counter) — each item increments
    one counter per hash row. ONE map-side-combined groupBy builds it;
    the result is depth x width rows no matter how large the stream,
    and two sketches merge by adding counters (the distributed-
    monoid property that makes it a streaming/ingest-time structure).
    All-integer arithmetic: oracle-exact, not just statistically
    close."""
    rows = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i"),
        key.cast("string").alias("_k"),
    ).select("i", (_cm_hash(F.col("_k"), F.col("i")) % width).alias("slot"))
    return rows.groupBy("i", "slot").agg(F.count("*").cast("bigint").alias("c"))


def count_min_heavy_hitters(
    df: DataFrame,
    key_col: str = "user_id",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    topk: int = CM_TOPK,
    sketch: DataFrame | None = None,
) -> DataFrame:
    """Heavy-hitter audit: the CM estimate (min over hash rows of the
    key's counter) against the exact count for the exact top-k keys —
    (key, exact, cm_est, overcount). CM guarantees cm_est >= exact
    with bounded overcount; the registered query makes that bound an
    oracle-checked number.

    Scale shape: the sketch is one grouped scan into depth x width
    rows; the exact top-k is a TakeOrdered; the estimate join touches
    topk x depth sketch rows only. Pass ``sketch`` (a count_min_table
    result, e.g. merged from streaming micro-batches) to probe an
    index that already exists."""
    sk = (
        sketch
        if sketch is not None
        else count_min_table(df, F.col(key_col), depth, width).localCheckpoint()
    )
    top = (
        df.groupBy(key_col)
        .agg(F.count("*").cast("bigint").alias("exact"))
        .orderBy(F.desc("exact"), F.asc(key_col))
        .limit(topk)
    )
    probes = top.select(
        key_col,
        "exact",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i"),
    ).select(
        key_col,
        "exact",
        "i",
        (_cm_hash(F.col(key_col).cast("string"), F.col("i")) % width).alias("slot"),
    )
    return (
        probes.join(F.broadcast(sk), ["i", "slot"])
        .groupBy(key_col, "exact")
        .agg(F.min("c").cast("bigint").alias("cm_est"))
        .select(
            key_col,
            "exact",
            "cm_est",
            (F.col("cm_est") - F.col("exact")).cast("bigint").alias("overcount"),
        )
        .orderBy(F.desc("exact"), F.asc(key_col))
    )


def count_min_heavy_hitters_sql(
    table: str = "events",
    key_col: str = "user_id",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    topk: int = CM_TOPK,
) -> str:
    h = _cm_hash_sql(key_col)
    return f"""
    WITH sk AS (
      SELECT i, {h} % {width} AS slot,
             CAST(count(*) AS BIGINT) AS c
      FROM {table}, range({depth}) t(i) GROUP BY 1, 2),
    top AS (
      SELECT {key_col}, CAST(count(*) AS BIGINT) AS exact
      FROM {table} GROUP BY 1 ORDER BY exact DESC, {key_col} ASC LIMIT {topk}),
    probes AS (
      SELECT {key_col}, exact, i, {h} % {width} AS slot
      FROM top, range({depth}) t(i))
    SELECT p.{key_col}, p.exact,
           CAST(min(s.c) AS BIGINT) AS cm_est,
           CAST(min(s.c) - p.exact AS BIGINT) AS overcount
    FROM probes p JOIN sk s USING (i, slot)
    GROUP BY p.{key_col}, p.exact
    ORDER BY p.exact DESC, p.{key_col} ASC
    """


def kmv_sketch_by(df: DataFrame, group_col: str, item: Column, k: int = KMV_K) -> DataFrame:
    """Bottom-k distinct hashes PER GROUP in one pass: (group, h). A
    window row_number over (group, hash) replaces N separate top-k
    jobs — one shuffle keyed by group, grouped-top-k filter, output
    at most |groups| x k rows."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy("h")
    return (
        df.select(F.col(group_col), hash64_col(item).alias("h"))
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(group_col, "h")
    )


def source_overlap_matrix(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    shingle_k: int = OVERLAP_SHINGLE_K,
    k: int = KMV_K,
) -> DataFrame:
    """Pairwise shingle-overlap estimates between every pair of corpus
    sources: (src_a, src_b, k_pair, n_inter, jaccard_est), src_a <
    src_b — the "which sources mirror each other" audit that decides
    dedup priorities before any join runs.

    Scale shape: the corpus is scanned ONCE (grouped bottom-k
    sketches); every pairwise estimate then works on the |sources| x k
    sketch table only. Per pair, the KMV union trick: the bottom-k of
    A union B is a subset of sketch(A) union sketch(B), so ranking the
    per-pair union of sketch hashes and counting the shared ones inside
    the bottom-k estimates Jaccard with zero further corpus access.
    Pair enumeration crosses only the DISTINCT SOURCE LIST with itself
    (|sources|^2 rows), never data."""
    from pyspark.sql import Window

    sh = shingle_stream(df, text_col, shingle_k, keep=(group_col,))
    sk = kmv_sketch_by(sh, group_col, F.col("s"), k).localCheckpoint()
    srcs = sk.select(F.col(group_col).alias("src")).distinct()
    pairs = (
        srcs.select(F.col("src").alias("src_a"))
        .crossJoin(srcs.select(F.col("src").alias("src_b")))
        .filter(F.col("src_a") < F.col("src_b"))
    )
    ua = pairs.join(
        sk.select(F.col(group_col).alias("src_a"), "h"), "src_a"
    ).select("src_a", "src_b", "h")
    ub = pairs.join(
        sk.select(F.col(group_col).alias("src_b"), "h"), "src_b"
    ).select("src_a", "src_b", "h")
    union = (
        ua.unionByName(ub)
        .groupBy("src_a", "src_b", "h")
        .agg(F.count("*").alias("_sides"))
    )
    w = Window.partitionBy("src_a", "src_b").orderBy("h")
    ranked = union.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    return (
        ranked.groupBy("src_a", "src_b")
        .agg(
            F.count("*").cast("bigint").alias("k_pair"),
            F.sum(F.when(F.col("_sides") == 2, 1).otherwise(0)).cast("bigint").alias("n_inter"),
        )
        .select(
            "src_a",
            "src_b",
            "k_pair",
            "n_inter",
            floor_round(F.col("n_inter") / F.col("k_pair"), 6).alias("jaccard_est"),
        )
    )


def source_overlap_matrix_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
    shingle_k: int = OVERLAP_SHINGLE_K,
    k: int = KMV_K,
) -> str:
    w = words_sql(text_col)
    h = hash64_sql("s")
    return f"""
    WITH sh AS (
      SELECT {group_col} AS g,
             unnest(list_transform(range(1, len(arr) - {shingle_k - 1} + 1),
                    i -> array_to_string(arr[i:i+{shingle_k - 1}], ' '))) AS s
      FROM (SELECT {group_col}, {w} AS arr FROM {table}
            WHERE len({w}) >= {shingle_k})),
    hs AS (SELECT DISTINCT g, {h} AS h FROM sh),
    sk AS (
      SELECT g, h FROM (
        SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM hs)
      WHERE rn <= {k}),
    srcs AS (SELECT DISTINCT g FROM sk),
    pairs AS (
      SELECT a.g AS src_a, b.g AS src_b FROM srcs a, srcs b WHERE a.g < b.g),
    u AS (
      SELECT src_a, src_b, h, count(*) AS sides FROM (
        SELECT p.src_a, p.src_b, s.h FROM pairs p JOIN sk s ON s.g = p.src_a
        UNION ALL
        SELECT p.src_a, p.src_b, s.h FROM pairs p JOIN sk s ON s.g = p.src_b)
      GROUP BY src_a, src_b, h),
    r AS (
      SELECT src_a, src_b, h, sides,
             row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
      FROM u)
    SELECT src_a, src_b,
           CAST(count(*) AS BIGINT) AS k_pair,
           CAST(sum(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_inter,
           {floor_round_sql("CAST(sum(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)} AS jaccard_est
    FROM r WHERE rn <= {k}
    GROUP BY src_a, src_b
    """


# ---------------------------------------------------------------------
# HyperLogLog with an EXACT oracle twin
# ---------------------------------------------------------------------

HLL_M = 256        # registers (b = 8 bucket bits)
_HLL_SCALE = 53    # registers sum in integers scaled by 2^53 (see below)
# alpha_m * m^2 * 2^scale, precomputed once so both engines divide the
# SAME double literal by the same exact integer — no libm anywhere
_HLL_NUM = 0.7213 / (1 + 1.079 / HLL_M) * 2.0 ** (_HLL_SCALE + 16)


def hll_registers(df: DataFrame, key: Column, group_col: str | None = None) -> DataFrame:
    """The HLL register table (Flajolet et al. 2007): bucket = low 8
    hash bits, rho = leading-zero rank of the remaining 52 bits
    (computed portably as 53 - length(bin(w)) — both engines print
    minimal binary), one row per non-zero register with its max rho.

    This is the mergeable form: registers of two streams merge by
    MAX(mx) per bucket — the monoid that makes HLL an ingest-time /
    shard-then-combine structure. One map-side-combined groupBy; the
    table is at most m rows per group no matter the stream size."""
    h = hash64_col(key.cast("string"))
    w = F.shiftright(h, 8)
    rho = F.when(w == 0, F.lit(_HLL_SCALE)).otherwise(
        F.lit(_HLL_SCALE) - F.length(F.bin(w))
    )
    keys = [group_col] if group_col else []
    return (
        df.select(*keys, (h % HLL_M).alias("bucket"), rho.alias("rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").cast("int").alias("mx"))
    )


def hll_estimate(regs: DataFrame, group_col: str | None = None) -> DataFrame:
    """Raw HLL estimate from a register table, deterministically:
    every 2^-mx term is held as the exact integer 2^(53-mx), summed in
    BIGINT (max 256 * 2^53 = 2^61 — no overflow, no float fold-order),
    zero registers contribute 2^53 each; the ONLY float op is the
    final single division of two exact values, so Spark and DuckDB
    produce bit-identical estimates. Raw estimator only (no
    small-range linear-counting branch — that needs ln(), which is
    libm- and engine-dependent); v_zero is emitted so a consumer can
    see when the raw regime doesn't hold."""
    keys = [group_col] if group_col else []
    per = regs.groupBy(*keys).agg(
        # pyspark's shiftleft() helper takes only a literal shift;
        # the SQL form accepts a column expression
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_SCALE} - mx)"))
        .cast("bigint")
        .alias("_s_present"),
        F.count("*").cast("bigint").alias("_n_present"),
    )
    v_zero = (F.lit(HLL_M) - F.col("_n_present")).cast("bigint")
    sum_scaled = F.col("_s_present") + v_zero * F.lit(1 << _HLL_SCALE).cast("bigint")
    est = F.lit(_HLL_NUM) / sum_scaled.cast("double")
    return per.select(
        *keys,
        v_zero.alias("v_zero"),
        floor_round(est, 4).alias("hll_est"),
    )


def hll_distinct(
    df: DataFrame, key_col: str, group_col: str
) -> DataFrame:
    """Registered-query surface: per-group raw HLL estimate next to
    the exact distinct count and the 3-sigma acceptance bool
    (rsd = 1.04/sqrt(256) ~ 6.5%). Unlike approx_count_distinct
    (engine-private HLL++ sketch, only a tolerance bool can be
    checked), this estimate itself is hash-checked against DuckDB.

    Scale shape: registers are one map-side-combined groupBy into
    <= m rows per group; the exact count (for the audit column) is the
    only corpus-sized distinct — drop it in production and the
    operator is a pure sketch."""
    exact = (
        df.groupBy(group_col)
        .agg(F.count_distinct(key_col).cast("bigint").alias("exact_distinct"))
    )
    est = hll_estimate(hll_registers(df, F.col(key_col), group_col), group_col)
    return (
        exact.join(est, group_col)
        .select(
            group_col,
            "exact_distinct",
            "hll_est",
            "v_zero",
            (
                F.abs(F.col("hll_est") - F.col("exact_distinct"))
                / F.col("exact_distinct")
                <= F.lit(0.195)
            ).alias("within_3sigma"),
        )
        .orderBy(group_col)
    )


def hll_distinct_sql(
    table: str = "events", key_col: str = "user_id", group_col: str = "event_type"
) -> str:
    h = hash64_sql(f"CAST({key_col} AS VARCHAR)")
    scale = _HLL_SCALE
    return f"""
    WITH regs AS (
      SELECT {group_col}, h % {HLL_M} AS bucket,
             CAST(max(CASE WHEN (h >> 8) = 0 THEN {scale}
                           ELSE {scale} - length(bin(h >> 8)) END) AS INT) AS mx
      FROM (SELECT {group_col}, {h} AS h FROM {table})
      GROUP BY 1, 2),
    per AS (
      SELECT {group_col},
             CAST(sum(1::BIGINT << ({scale} - mx)) AS BIGINT) AS s_present,
             CAST(count(*) AS BIGINT) AS n_present
      FROM regs GROUP BY 1),
    est AS (
      SELECT {group_col},
             CAST({HLL_M} - n_present AS BIGINT) AS v_zero,
             {floor_round_sql(
                 f"{_HLL_NUM!r} / CAST(s_present + ({HLL_M} - n_present) * (1::BIGINT << {scale}) AS DOUBLE)",
                 4,
             )} AS hll_est
      FROM per),
    ex AS (
      SELECT {group_col}, CAST(count(DISTINCT {key_col}) AS BIGINT) AS exact_distinct
      FROM {table} GROUP BY 1)
    SELECT ex.{group_col}, ex.exact_distinct, est.hll_est, est.v_zero,
           abs(est.hll_est - ex.exact_distinct) / ex.exact_distinct <= 0.195
             AS within_3sigma
    FROM ex JOIN est USING ({group_col})
    ORDER BY ex.{group_col}
    """


# ---------------------------------------------------------------------
# Mergeable histogram quantile sketch
# ---------------------------------------------------------------------

HIST_BINS = 512


def hist_sketch(
    df: DataFrame, value: Column, lo: float, hi: float, bins: int = HIST_BINS
) -> DataFrame:
    """Equi-width histogram sketch over a known value range: one
    map-side-combined groupBy into <= bins rows, mergeable by adding
    counts — the fixed-memory answer to quantiles over a 100 TB column
    (an exact quantile is a global sort; percentile_approx is an
    engine-private digest that no oracle can reproduce). Out-of-range
    values clamp to the edge bins."""
    width = (hi - lo) / bins
    b = F.least(
        F.greatest(F.floor((value - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(bins - 1),
    ).cast("int")
    return df.select(b.alias("bin")).groupBy("bin").agg(
        F.count("*").cast("bigint").alias("c")
    )


def hist_quantiles(
    sketch: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = HIST_BINS,
) -> DataFrame:
    """Quantile estimates from a histogram sketch by linear
    interpolation within the holding bin. All inputs to the float
    interpolation are exact integers (cumulative counts) and exact
    literals, so the estimate is engine-identical — deterministic, not
    just statistically close. The cumulative window runs over <= bins
    rows, never data."""
    width = (hi - lo) / bins
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "bin",
        "c",
        F.sum("c").over(w).cast("bigint").alias("cum"),
    ).withColumn("cum_prev", (F.col("cum") - F.col("c")).cast("bigint"))
    total = sketch.agg(F.sum("c").cast("bigint").alias("n"))
    qdf = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    # rank = q*n; holding bin = first bin with cum >= rank
    cand = (
        qdf.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(cum))
        .filter(F.col("cum") >= F.col("q") * F.col("n"))
        .groupBy("q", "n")
        .agg(F.min("bin").alias("bin"))
    )
    est = (
        cand.join(F.broadcast(cum), "bin")
        .select(
            "q",
            floor_round(
                F.lit(lo)
                + (F.col("bin").cast("double") * F.lit(width))
                + F.lit(width)
                * (F.col("q") * F.col("n") - F.col("cum_prev").cast("double"))
                / F.col("c").cast("double"),
                4,
            ).alias("est"),
        )
        .orderBy("q")
    )
    return est


def hist_quantiles_sql(
    table: str,
    value_expr: str,
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = HIST_BINS,
) -> str:
    width = (hi - lo) / bins
    # Every fractional literal is CAST(... AS DOUBLE): a bare repr
    # would be typed DECIMAL by DuckDB, making the `cum >= q * n` rank
    # test exact-decimal there but IEEE-double in Spark — parity held
    # only by rounding luck (round-7 ADVICE). The cast forces both
    # engines through the identical double arithmetic.
    qvals = ", ".join(f"(CAST({q!r} AS DOUBLE))" for q in qs)
    lo_d = f"CAST({lo!r} AS DOUBLE)"
    width_d = f"CAST({width!r} AS DOUBLE)"
    return f"""
    WITH sk AS (
      SELECT CAST(least(greatest(floor(({value_expr} - {lo_d}) / {width_d}), 0),
                  {bins - 1}) AS INT) AS bin,
             CAST(count(*) AS BIGINT) AS c
      FROM {table} GROUP BY 1),
    cum AS (
      SELECT bin, c,
             CAST(sum(c) OVER (ORDER BY bin
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM sk),
    cum2 AS (SELECT bin, c, cum, CAST(cum - c AS BIGINT) AS cum_prev FROM cum),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM sk),
    qs(q) AS (VALUES {qvals}),
    cand AS (
      SELECT q, n, min(bin) AS bin
      FROM qs CROSS JOIN tot JOIN cum2 ON cum >= q * n
      GROUP BY q, n)
    SELECT cand.q,
           {floor_round_sql(
               f"{lo_d} + CAST(cand.bin AS DOUBLE) * {width_d} + {width_d} * "
               "(cand.q * cand.n - CAST(cum2.cum_prev AS DOUBLE)) / CAST(cum2.c AS DOUBLE)",
               4)} AS est
    FROM cand JOIN cum2 USING (bin)
    ORDER BY cand.q
    """
