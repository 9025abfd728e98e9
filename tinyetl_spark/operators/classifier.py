"""Distributed trained quality classifier — logistic regression via
full-batch gradient descent over hashed bag-of-words features.

The production pattern (RefinedWeb / FineWeb / Llama pipelines): a
heuristic rule set labels a seed corpus, a cheap linear classifier is
trained on those weak labels, and the CLASSIFIER — which generalizes
past the rules' hard thresholds — scores the full crawl. Here the
Gopher composite rule provides the weak labels, features are hashed
lowercase unigram counts (``BUCKETS`` of them, plus a bias), and
training is ``ITERS`` full-batch GD steps.

Spark-first shape: the (doc, bucket, count) feature table and the
label table are built once and checkpointed; each GD iteration is two
bounded-key aggregations — margins per doc (model broadcast, corpus
never reshuffled) and gradients per bucket (map-side combined into at
most BUCKETS+1 rows). The weight vector never exceeds BUCKETS+1 rows.

Engine-proof arithmetic — the part that makes a DuckDB oracle possible
for an ITERATIVE float algorithm: weights are INTEGER MICRO-UNITS
(1e-9), so margins and gradients are exact BIGINT sums (no float fold
order anywhere); the only floating point per iteration is one
deterministic scalar expression per value — the sigmoid
``floor(1e9 / (1 + exp(-m)) + 0.5)`` (both engines' libm exp, half-up
to integer micro-units) and the update step
``floor(lr * grad / n + 0.5)`` — each a single IEEE expression,
bit-identical across engines.

Reference parity: the reference has no ML tier (SURVEY.md §2); this is
a training-data-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tinyetl_spark.functions.hashing import hash64_col, hash64_sql
from tinyetl_spark.operators.text import (
    floor_round,
    floor_round_sql,
    gopher_rules,
    gopher_rules_sql,
    words_col,
    words_sql,
)

BUCKETS = 256      # hashed unigram feature space
BIAS_B = -1        # bucket id of the bias feature (x = 1 on every doc)
ITERS = 10         # full-batch GD steps (0.75 train acc vs 0.60 base rate)
LR = 0.1           # learning rate
_U = 1_000_000_000  # micro-units per 1.0 of weight / probability


def _features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, b, x): hashed lowercase unigram counts + the bias row.
    The word array materializes in its own projection (HOF
    re-evaluation trap); one explode, one map-side-combined groupBy."""
    staged = df.select(
        F.col(id_col),
        F.filter(
            words_col(F.lower(F.col(text_col))), lambda w: F.length(w) > 0
        ).alias("_ws"),
    )
    grams = (
        staged.select(
            F.col(id_col),
            F.explode(
                F.transform(F.col("_ws"), lambda w: hash64_col(w) % BUCKETS)
            ).alias("b"),
        )
        .groupBy(id_col, "b")
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    bias = df.select(
        F.col(id_col), F.lit(BIAS_B).cast("bigint").alias("b"), F.lit(1).cast("bigint").alias("x")
    )
    return grams.unionByName(bias)


def _p_int(margin_units):
    """Sigmoid in micro-units from a micro-unit margin — ONE double
    expression, identical in both engines."""
    m = margin_units.cast("double") / F.lit(float(_U))
    return F.floor(F.lit(float(_U)) / (F.lit(1.0) + F.exp(-m)) + F.lit(0.5)).cast(
        "bigint"
    )


def train_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    iters: int = ITERS,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (weights, feats, labels): weights is (b, w) in integer
    micro-units after ``iters`` GD steps; feats/labels are the
    checkpointed training tables for reuse by the scorer."""
    spark = df.sparkSession
    feats = _features(df, text_col, id_col).localCheckpoint()
    labels = (
        gopher_rules(df, text_col, id_col)
        .select(F.col(id_col), F.col("keep").cast("bigint").alias("y"))
        .localCheckpoint()
    )
    n = labels.count()
    w = feats.select("b").distinct().withColumn(
        "w", F.lit(0).cast("bigint")
    ).localCheckpoint()
    for _ in range(iters):
        margins = (
            feats.join(F.broadcast(w), "b")
            .groupBy(id_col)
            .agg(F.sum(F.col("x") * F.col("w")).alias("_mu"))
            .select(F.col(id_col), _p_int(F.col("_mu")).alias("p"))
        )
        # Each term is up to ~1e9 (micro-units) per token occurrence, so a
        # hot bucket with >~9e9 occurrences would silently wrap a BIGINT
        # sum in Spark (non-ANSI) while DuckDB promotes to HUGEINT.
        # Summing in decimal(38,0) matches the HUGEINT promotion up to
        # 1e38 — ~1e29 token occurrences per bucket, far past any corpus.
        grad = (
            feats.join(F.broadcast(margins), id_col)
            .join(F.broadcast(labels), id_col)
            .groupBy("b")
            .agg(
                F.sum(
                    (F.col("x") * (F.col("p") - F.col("y") * _U)).cast("decimal(38,0)")
                ).alias("g")
            )
        )
        step = F.floor(
            F.lit(LR) * F.col("g").cast("double") / F.lit(float(n)) + F.lit(0.5)
        ).cast("bigint")
        w = (
            w.join(grad, "b", "left")
            .select("b", (F.col("w") - F.coalesce(step, F.lit(0))).alias("w"))
            .localCheckpoint()
        )
    return w, feats, labels


def quality_classifier_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    iters: int = ITERS,
    trained: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Train on the corpus's Gopher weak labels, then score every
    document with the trained model: (doc_id, y, score, pred) with
    score the 6dp margin and pred the thresholded label. The
    interesting rows are where pred disagrees with y — the classifier
    generalizing past the rules' hard thresholds. Pass ``trained``
    (the train_quality_classifier triple) to score with a model that
    already exists — the frozen-tokenizer pattern."""
    w, feats, labels = trained or train_quality_classifier(df, text_col, id_col, iters)
    margins = (
        feats.join(F.broadcast(w), "b")
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.col("w")).alias("_mu"))
    )
    return (
        margins.join(F.broadcast(labels), id_col)
        .select(
            F.col(id_col),
            F.col("y"),
            floor_round(F.col("_mu").cast("double") / F.lit(float(_U)), 6).alias(
                "score"
            ),
            (F.col("_mu") > 0).cast("bigint").alias("pred"),
        )
        .orderBy(id_col)
    )


def score_with_frozen_model(
    df: DataFrame,
    weights: list[int],
    bias_w: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents with a FROZEN model entirely in-row: the 256
    bucket weights fold in as an array literal indexed per word, so
    scoring is stateless codegen at scan speed — works unchanged on a
    batch table or inside Structured Streaming (no join, no state).
    ``weights[b]`` are integer micro-units; margins are exact BIGINT
    sums, byte-equal to the training-side scorer."""
    w_arr = F.expr(
        "CAST(array(" + ",".join(str(int(v)) for v in weights) + ") AS array<bigint>)"
    )
    staged = df.select(
        F.col(id_col),
        F.col(text_col),
        F.filter(
            words_col(F.lower(F.col(text_col))), lambda w: F.length(w) > 0
        ).alias("_wsl"),
    )
    buckets = F.transform(F.col("_wsl"), lambda w: hash64_col(w) % BUCKETS)
    staged = staged.select(F.col(id_col), F.col(text_col), buckets.alias("_bk"))
    mu = F.aggregate(
        F.col("_bk"),
        F.lit(int(bias_w)).cast("bigint"),
        lambda acc, b: acc + F.element_at(w_arr, b.cast("int") + 1),
    )
    staged = staged.select(F.col(id_col), F.col(text_col), mu.alias("_mu"))
    return staged.select(
        F.col(id_col),
        floor_round(F.col("_mu").cast("double") / F.lit(float(_U)), 6).alias("score"),
        (F.col("_mu") > 0).cast("bigint").alias("pred"),
    )


def _iter_sql(k: int, id_col: str) -> str:
    """One unrolled GD iteration for the DuckDB twin."""
    prev = f"w{k - 1}"
    return f"""
    m{k} AS (
      SELECT f.{id_col},
             CAST(floor({float(_U)!r} / (1.0 + exp(-(CAST(sum(f.x * w.w) AS DOUBLE)
                  / {float(_U)!r}))) + 0.5) AS BIGINT) AS p
      FROM feats f JOIN {prev} w USING (b) GROUP BY f.{id_col}),
    g{k} AS (
      SELECT f.b, sum(f.x * (m.p - l.y * {_U})) AS g
      FROM feats f JOIN m{k} m USING ({id_col}) JOIN labels l USING ({id_col})
      GROUP BY f.b),
    w{k} AS MATERIALIZED (
      SELECT w.b,
             w.w - coalesce(CAST(floor({LR!r} * CAST(g.g AS DOUBLE)
                   / CAST(n.n AS DOUBLE) + 0.5) AS BIGINT), 0) AS w
      FROM {prev} w LEFT JOIN g{k} g USING (b) CROSS JOIN nn n)"""


def quality_classifier_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    iters: int = ITERS,
) -> str:
    """DuckDB twin: the GD loop unrolled into ``iters`` materialized
    CTE blocks over the same integer micro-unit arithmetic."""
    w = f"list_filter({words_sql(f'lower({text_col})')}, x -> length(x) > 0)"
    iter_blocks = ",".join(_iter_sql(k, id_col) for k in range(1, iters + 1))
    return f"""
    WITH feats AS MATERIALIZED (
      SELECT {id_col}, b, CAST(count(*) AS BIGINT) AS x FROM (
        SELECT {id_col}, unnest(list_transform({w},
               x -> {hash64_sql('x')} % {BUCKETS})) AS b
        FROM {table})
      GROUP BY {id_col}, b
      UNION ALL
      SELECT {id_col}, CAST({BIAS_B} AS BIGINT) AS b, CAST(1 AS BIGINT) AS x
      FROM {table}),
    labels AS MATERIALIZED (
      SELECT {id_col}, CAST(keep AS BIGINT) AS y
      FROM ({gopher_rules_sql(table, text_col, id_col)})),
    nn AS (SELECT count(*) AS n FROM labels),
    w0 AS MATERIALIZED (
      SELECT DISTINCT b, CAST(0 AS BIGINT) AS w FROM feats),
    {iter_blocks},
    final AS (
      SELECT f.{id_col}, sum(f.x * w.w) AS mu
      FROM feats f JOIN w{iters} w USING (b) GROUP BY f.{id_col})
    SELECT f.{id_col}, l.y,
           {floor_round_sql(f"CAST(mu AS DOUBLE) / {float(_U)!r}", 6)} AS score,
           CAST(mu > 0 AS BIGINT) AS pred
    FROM final f JOIN labels l USING ({id_col})
    ORDER BY f.{id_col}
    """
