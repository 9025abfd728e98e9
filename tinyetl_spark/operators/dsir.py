"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling", public
arXiv/NeurIPS method).

The standard pretraining-data selection recipe: fit two bag-of-hashed-
n-gram models — one on a small TARGET corpus (the distribution you
want, e.g. benchmark-like or curated text) and one on the RAW pool —
and keep the raw documents whose importance weight
``log p_target(x) - log p_raw(x)`` is highest, optionally with Gumbel
noise for proper sampling. Feature hashing bounds the model at
``buckets`` rows no matter how large either corpus's vocabulary is.

Spark-first shape (reference parity: the reference has no selection
tier — SURVEY.md §2 extension):

* ONE corpus scan per side builds the bucket-count tables — the
  per-document unigram+bigram features assemble in-row (array HOFs)
  and explode once, then a map-side-combined groupBy on the bucket id.
* The model is exactly ``buckets`` rows of log-ratios — broadcast back
  into the feature stream; the pool is shuffled only by doc_id for the
  per-document weight sum.
* Selection is a deterministic top-k (count-desc TakeOrdered shape) —
  no global sort of the pool.

Engine-proof arithmetic: per-bucket log-ratios are computed from
exact integer counts and rounded to 9 decimals (both engines round
their own libm ``ln`` — the repo's bm25 convention), summed as
DECIMAL(38,9) so the per-doc score is fold-order-independent, and the
reported score uses the floor_round half-up convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tinyetl_spark.functions.hashing import hash64_col, hash64_sql
from tinyetl_spark.operators.text import floor_round, floor_round_sql, words_col, words_sql

DSIR_BUCKETS = 4096     # hashed-feature space (10k-100k in the paper)
DSIR_KEEP_PCT = 25      # pool fraction the selection query keeps


def _features(df: DataFrame, text_col: str, keep: tuple[str, ...] = ()) -> DataFrame:
    """One row per feature occurrence: (*keep, b) — bucket ids of every
    unigram and bigram of the lower-cased text. The word array
    materializes in its OWN projection before any lambda references it:
    an expression referenced inside a HOF lambda re-evaluates per
    element (the repo's documented re-evaluation trap — the inlined
    form re-split every document once per bigram position, ~14x
    slower), a bound column reference does not. Empty-word artifacts
    (blank docs split to ['']) are filtered before hashing."""
    cols = [F.col(c) for c in keep]
    staged = df.select(
        *cols,
        F.filter(
            words_col(F.lower(F.col(text_col))), lambda w: F.length(w) > 0
        ).alias("_ws"),
    )
    uni = F.transform(F.col("_ws"), lambda w: hash64_col(w) % DSIR_BUCKETS)
    big = F.when(
        F.size("_ws") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_ws") - 1),
            lambda i: hash64_col(
                F.concat_ws(" ", F.element_at("_ws", i), F.element_at("_ws", i + 1))
            )
            % DSIR_BUCKETS,
        ),
    ).otherwise(F.expr("CAST(array() AS array<bigint>)"))
    return staged.select(*cols, F.explode(F.concat(uni, big)).alias("b"))


def _feature_array_sql(text_col: str) -> str:
    w = f"list_filter({words_sql(f'lower({text_col})')}, w -> length(w) > 0)"
    uni = f"list_transform({w}, w -> {hash64_sql('w')} % {DSIR_BUCKETS})"
    big = (
        f"CASE WHEN len({w}) >= 2 THEN "
        f"list_transform(range(1, len({w})), "
        f"i -> {hash64_sql(f'({w})[i] || chr(32) || ({w})[i+1]')} % {DSIR_BUCKETS}) "
        f"ELSE CAST([] AS BIGINT[]) END"
    )
    return f"list_concat({uni}, {big})"


def _bucket_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(b, cnt): hashed-feature occurrence counts — at most
    DSIR_BUCKETS rows after ONE map-side-combined shuffle."""
    return _features(df, text_col).groupBy("b").agg(F.count("*").alias("cnt"))


def dsir_weights(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """The fitted model: (b, lam) for every occupied bucket, where
    lam = round(ln( ((ct+0.5)/(T+0.5B)) / ((cr+0.5)/(R+0.5B)) ), 9)
    with add-half smoothing — an exact rational inside one ln, so the
    9dp rounding is the only float step. Buckets absent from BOTH
    sides contribute nothing (their smoothed ratio is a constant that
    cancels in ranking)."""
    # checkpoint the count tables BEFORE the totals collect: each is
    # <= DSIR_BUCKETS rows by construction, and without the cut both
    # the totals job and the final scoring plan would re-run the
    # corpus-sized feature scans (3 scans of the pool -> 1)
    ct = _bucket_counts(target, text_col).localCheckpoint()
    cr = _bucket_counts(raw, text_col).localCheckpoint()
    t_tot = int(ct.agg(F.sum("cnt")).collect()[0][0] or 0)
    r_tot = int(cr.agg(F.sum("cnt")).collect()[0][0] or 0)
    tn = float(t_tot) + 0.5 * DSIR_BUCKETS
    rn = float(r_tot) + 0.5 * DSIR_BUCKETS
    joined = (
        ct.withColumnRenamed("cnt", "ct")
        .join(cr.withColumnRenamed("cnt", "cr"), "b", "full_outer")
        .select(
            "b",
            F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
            F.coalesce(F.col("cr"), F.lit(0)).alias("cr"),
        )
    )
    lam = F.round(
        F.log(
            ((F.col("ct") + 0.5) / F.lit(tn)) / ((F.col("cr") + 0.5) / F.lit(rn))
        ),
        9,
    )
    return joined.select("b", lam.alias("lam"))


def dsir_scores(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-raw-document importance weight: (doc_id, n_features, score)
    with score = mean bucket log-ratio over the doc's features (mean,
    not sum, so long documents aren't automatically 'more target-like'
    — the paper normalizes comparably). Model broadcast; the pool
    shuffles once on doc_id."""
    model = dsir_weights(target, raw, text_col)
    feats = _features(raw, text_col, keep=(id_col,))
    return (
        feats.join(F.broadcast(model), "b")
        .select(F.col(id_col), F.col("lam").cast("decimal(38,9)").alias("_lam"))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_features"),
            floor_round(
                F.sum("_lam").cast("double") / F.count("*").cast("double"), 6
            ).alias("score"),
        )
    )


def dsir_select(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_pct: int = DSIR_KEEP_PCT,
) -> DataFrame:
    """Keep the top ``keep_pct`` percent of the raw pool by importance
    weight (score desc, doc_id asc — fully deterministic; Gumbel-noise
    sampling drops in by adding seeded-hash noise to the rank key).
    The limit is computed from a count, so the plan is a TakeOrdered,
    never a global sort."""
    n = raw.count()
    k = max(1, (n * keep_pct) // 100)
    return (
        dsir_scores(target, raw, text_col, id_col)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(int(k))
    )


def dsir_select_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_pct: int = DSIR_KEEP_PCT,
    heldout_mod: int = 97,
) -> str:
    """DuckDB twin of the registered query: target = the held-out
    slice (doc_id % heldout_mod == 0, the repo's decontam convention),
    raw pool = everything else, keep the top keep_pct%."""
    fa = _feature_array_sql(text_col)
    return f"""
    WITH tgt AS (SELECT * FROM {table} WHERE {id_col} % {heldout_mod} = 0),
    pool AS (SELECT * FROM {table} WHERE {id_col} % {heldout_mod} <> 0),
    ctf AS (
      SELECT unnest({fa}) AS b FROM tgt),
    crf AS (
      SELECT unnest({fa}) AS b FROM pool),
    ct AS (SELECT b, count(*) AS cnt FROM ctf GROUP BY b),
    cr AS (SELECT b, count(*) AS cnt FROM crf GROUP BY b),
    tot AS (
      SELECT (SELECT coalesce(sum(cnt), 0) FROM ct) + 0.5 * {DSIR_BUCKETS} AS tn,
             (SELECT coalesce(sum(cnt), 0) FROM cr) + 0.5 * {DSIR_BUCKETS} AS rn),
    model AS (
      SELECT coalesce(ct.b, cr.b) AS b,
             round(ln(((coalesce(ct.cnt, 0) + 0.5) / t.tn)
                      / ((coalesce(cr.cnt, 0) + 0.5) / t.rn)), 9) AS lam
      FROM ct FULL OUTER JOIN cr ON ct.b = cr.b CROSS JOIN tot t),
    feats AS (
      SELECT {id_col}, unnest({fa}) AS b FROM pool),
    scored AS (
      SELECT f.{id_col},
             CAST(count(*) AS BIGINT) AS n_features,
             {floor_round_sql(
                 "CAST(sum(CAST(m.lam AS DECIMAL(38,9))) AS DOUBLE)"
                 " / CAST(count(*) AS DOUBLE)", 6)} AS score
      FROM feats f JOIN model m ON f.b = m.b
      GROUP BY f.{id_col})
    SELECT * FROM scored
    ORDER BY score DESC, {id_col} ASC
    LIMIT (SELECT greatest(1, (count(*) * {keep_pct}) // 100) FROM pool)
    """
