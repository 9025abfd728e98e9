"""Distributed BPE tokenizer training (Sennrich et al. 2016).

Training a tokenizer is the first step of every LLM data pipeline and
classically runs single-machine over a sampled corpus. The distributed
re-expression keys everything off the WORD-FREQUENCY table: one groupBy
collapses the corpus (any size) to its distinct words, and every merge
iteration after that is sized by the vocabulary, not the corpus — pair
counts are weighted by word frequency, exactly like the reference
algorithm's dictionary form.

Greedy semantics match the published algorithm: per iteration take the
globally most frequent adjacent symbol pair (ties broken by symbol
pair, ascending, so training is deterministic), merge it left-to-right
within every word, repeat. The merge application is an in-row
``F.aggregate`` fold (codegen, no Python); only the single winning pair
row crosses the driver per iteration.

Reference parity: the reference has no tokenizer (SURVEY.md §2); this
is a training-data-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tinyetl_spark.operators.text import words_col, words_sql

BPE_END = "</w>"   # end-of-word marker symbol (classic BPE)
BPE_TOP = 30       # pairs reported by the pair-count query
BPE_MERGES = 12    # merges learned by the training query


def word_freq(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wcount): the corpus collapsed to its dictionary — the
    only corpus-sized shuffle in BPE training. Empty words (blank
    documents tokenize to ['']) are dropped BEFORE the shuffle: they
    carry no pairs, and an empty word would trip Spark's backwards
    sequence(1, 0) in the symbol init."""
    return (
        df.select(F.explode(words_col(text_col)).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("wcount"))
    )


def _sym_init(word: Column) -> Column:
    """Initial symbol sequence: one symbol per char + the end marker."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(BPE_END)))


def _pair_totals(syms: DataFrame) -> DataFrame:
    """Adjacent-pair totals over (wcount, s) rows, weighted by word
    frequency: (lsym, rsym, total). Fully-merged single-symbol words
    must be dropped first: Spark's sequence(1, 0) steps BACKWARDS
    ([1, 0]), so an unguarded explode would index element 0."""
    pairs = syms.filter(F.size("s") >= 2).select(
        F.col("wcount"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("s") - 1),
                lambda i: F.struct(
                    F.element_at("s", i).alias("lsym"),
                    F.element_at("s", i + 1).alias("rsym"),
                ),
            )
        ).alias("p"),
    )
    return (
        pairs.select("wcount", "p.lsym", "p.rsym")
        .groupBy("lsym", "rsym")
        .agg(F.sum("wcount").cast("bigint").alias("total"))
    )


def bpe_pair_counts(df: DataFrame, text_col: str = "text", top: int = BPE_TOP) -> DataFrame:
    """Iteration-0 pair counts: the top ``top`` adjacent symbol pairs
    by frequency (ties broken by pair, ascending — fully deterministic
    TakeOrdered, no global sort)."""
    syms = word_freq(df, text_col).select("wcount", _sym_init(F.col("word")).alias("s"))
    return (
        _pair_totals(syms)
        .orderBy(F.desc("total"), F.asc("lsym"), F.asc("rsym"))
        .limit(top)
    )


def bpe_pair_counts_sql(
    table: str = "documents", text_col: str = "text", top: int = BPE_TOP
) -> str:
    w = words_sql(text_col)
    return f"""
    WITH wf AS (
      SELECT w AS word, count(*) AS wcount
      FROM (SELECT unnest({w}) AS w FROM {table}) WHERE w <> '' GROUP BY w),
    sy AS (
      SELECT wcount,
             list_append(list_transform(range(1, length(word) + 1),
                                        i -> substr(word, i, 1)), '{BPE_END}') AS s
      FROM wf),
    pr AS (
      SELECT wcount,
             unnest(list_transform(range(1, len(s)),
                    i -> {{'lsym': s[i], 'rsym': s[i+1]}})) AS p
      FROM sy)
    SELECT p.lsym AS lsym, p.rsym AS rsym, CAST(sum(wcount) AS BIGINT) AS total
    FROM pr GROUP BY 1, 2
    ORDER BY total DESC, lsym ASC, rsym ASC LIMIT {top}
    """


def _apply_merge(s: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a+b — an
    in-row fold; literals go through F.lit, never string-interpolated
    SQL, so arbitrary symbols are safe."""
    return F.aggregate(
        s,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame, text_col: str = "text", n_merges: int = BPE_MERGES
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (rank, lsym, rsym, total) in learned order.

    Scale shape: ONE corpus-sized shuffle (the word-frequency groupBy,
    checkpointed ONCE so iterations never rescan the corpus — and so
    exactly one checkpoint's storage is ever held, instead of pinning a
    copy per iteration); each iteration is a vocabulary-sized pair
    count whose single winning row is the only thing the driver sees.
    Iteration i recomputes i in-row folds from that checkpoint —
    O(n_merges^2) folds over the VOCABULARY table, the cheap side of
    the trade at the default 12 merges. A production 32k-merge run
    would stage the symbol table to parquet periodically (same swap
    point as the dedup pipeline)."""
    merges, _ = _train(df, text_col, n_merges)
    return df.sparkSession.createDataFrame(
        merges, "rank bigint, lsym string, rsym string, total bigint"
    )


def _train(
    df: DataFrame, text_col: str, n_merges: int
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Shared training loop: returns (merge table rows, final
    per-WORD symbol table (word, s)) — the symbol table is the encode
    dictionary, already fully merged."""
    cur = (
        word_freq(df, text_col)
        .select("word", "wcount", _sym_init(F.col("word")).alias("s"))
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_totals(cur)
            .orderBy(F.desc("total"), F.asc("lsym"), F.asc("rsym"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["total"] < 2:
            break
        a, b, total = top[0]["lsym"], top[0]["rsym"], top[0]["total"]
        merges.append((rank, a, b, int(total)))
        cur = cur.withColumn("s", _apply_merge(F.col("s"), a, b))
    return merges, cur.select("word", "s")


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to a corpus: per document, tokenize
    each word to chars+end-marker and fold every merge through it in
    learned order (the standard greedy BPE encode). Output:
    (doc_id, n_tokens, tokens) with tokens the flattened per-word
    symbol arrays in document order.

    Scale shape: ENTIRELY in-row — the merge list is folded into the
    expression tree as literals (like the PQ codebook transforms), so
    encoding runs at scan speed with zero shuffle and zero Python. The
    expression grows linearly with the merge count; for a production
    32k-merge vocabulary the same loop would emit a Pandas-UDF batch
    encoder instead — this operator is the plumbing-and-semantics
    contract, pinned by the round-trip property test against the
    single-machine reference encode."""
    words = words_col(text_col)
    per_word = F.transform(
        F.filter(words, lambda w: F.length(w) > 0),
        lambda w: _sym_init(w),
    )
    # bind (a, b) through a factory: PySpark infers the HOF's arity
    # from the lambda's PARAMETER COUNT, so default-arg closures
    # (lambda s, a=a, b=b: ...) mis-declare a 3-ary lambda
    def _merge_fn(a: str, b: str):
        return lambda s: _apply_merge(s, a, b)

    for a, b in merges:
        per_word = F.transform(per_word, _merge_fn(a, b))
    toks = F.flatten(per_word)
    return df.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        toks.alias("tokens"),
    )


def bpe_train_encode(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = BPE_MERGES,
) -> DataFrame:
    """Train on the corpus, then encode the corpus with what was
    learned — the end-to-end tokenizer path a data pipeline actually
    runs.

    Encoding is a DICTIONARY JOIN, not a per-occurrence re-fold: the
    training loop's final symbol table already holds every word fully
    merged, so encode = explode doc words -> equi-join word->symbols ->
    regroup per doc (flattened in document order). Each word's merge
    folds ran ONCE during training, no matter how many billion times
    the word occurs — measured 10x faster than literal-folded re-encode
    at sf0.1 and the gap widens with corpus size. ``bpe_encode`` stays
    the merge-list form for encoding NEW text with a frozen
    tokenizer."""
    merges, vocab = _train(df, text_col, n_merges)
    del merges  # the dictionary already embodies them
    words = df.select(
        F.col(id_col), F.posexplode(words_col(text_col)).alias("_p", "word")
    ).filter(F.length("word") > 0)
    joined = words.join(vocab, "word").select(id_col, "_p", "s")
    toks = F.flatten(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_p", "s"))),
            lambda e: e["s"],
        )
    )
    return (
        joined.groupBy(id_col)
        .agg(
            toks.alias("tokens"),
        )
        .select(
            F.col(id_col),
            F.size("tokens").cast("bigint").alias("n_tokens"),
            F.col("tokens"),
        )
    )
