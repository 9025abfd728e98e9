"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes every implemented operator (one per SURVEY.md §2
item / north-star extension); ``oracle_sql()`` gives the DuckDB twin
for each — see tinyetl_spark/queries.py for the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tinyetl_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


# The correctness driver samples the FIRST 50 entries of queries() in
# dict order. Rounds 1-4 verified the relational/transform tier that
# registers first in tinyetl_spark/queries.py; this priority list
# front-loads the extension tier (ANN/PQ, minhash/simhash dedup,
# decontamination, streaming, multimodal, text analysis) that has so
# far only been verified by the byte-identical local oracle
# (tests/test_oracle.py), so driver-green rows land on it too.
_PRIORITY = [
    # ANN / embeddings tier
    "ann_brute_topk", "ann_lsh_topk", "ann_ivf_topk", "ann_indexed_topk",
    "ann_batch_topk", "pq_encode_vectors", "ann_pq_topk", "ann_ivf_pq_topk",
    "ann_pq_rerank_topk", "ann_rpq_topk", "ann_rpq_rerank_topk",
    "ann_multiprobe_topk", "ann_recall_multiprobe", "ann_recall_ivf",
    "ann_recall_rpq", "ann_recall_rpq_rerank", "kmeans_refine_step",
    # round-5 flagships take the slots of two trivial embedding ops
    # (norms/quantize stay local-oracle green, rotate in later)
    "curation_pipeline", "streaming_index_ingest", "embedding_near_dups",
    # near-dup dedup tier
    "minhash_signatures", "minhash_candidates", "near_dup_jaccard",
    "near_dup_ngram", "simhash_docs", "simhash_near_dups", "dedup_clusters",
    "dedup_survivors", "dedup_incremental",
    # semantic dedup / LM quality / layout / ingest
    "semantic_dup_pairs", "semantic_dedup_survivors",
    "unigram_logprob_docs", "zorder_key_events", "temperature_mix_docs",
    "rag_ingest_pipeline",
    # decontamination / fingerprinting (winnow_fingerprints itself is
    # property-tested + local-green; the decontam composition takes its
    # driver slot)
    "fuzzy_decontam", "decontam_overlap", "winnow_decontam",
    # streaming
    "streaming_tumbling", "streaming_hopping", "streaming_sessions",
    "streaming_dedup", "streaming_user_counts", "streaming_enrich",
    "streaming_interval_join", "streaming_sink_parquet",
    "streaming_foreachbatch_jdbc", "streaming_upsert_snapshot",
    # multimodal
    "multimodal_decode_bmp", "multimodal_decode_wav",
    "multimodal_meta", "multimodal_dedup", "multimodal_byte_histogram",
    "multimodal_frame_sample", "multimodal_thumbnail",
    # text analysis / training-data prep
    "bm25_top_terms", "char_entropy_docs", "epoch_shuffle_docs",
    "pack_sequences_docs", "tfidf_top_terms", "token_stats", "text_quality",
    "lang_id", "chunk_documents", "repetition_stats",
    # next in rotation (locally oracle-green; enter the 50-query driver
    # window as earlier tiers accumulate driver-green rounds)
    "gopher_quality_docs", "bm25_search_docs", "quality_budget_select",
    "cluster_best_survivor", "dup_ngram_frac_docs", "corpus_stats_report",
    "streaming_quality_filter", "event_outliers", "hot_keys_audit",
    "ohlc_bars_events", "funnel_conversion", "cohort_retention",
    "multimodal_resize_bmp", "multimodal_decimate_wav",
    "decontam_report", "bigram_logprob_docs", "corpus_diff", "pagerank_dups",
    "fk_violations_audit", "epoch_order_manifest",
    "embedding_norms", "embedding_quantize",
    "ann_recall_lsh", "ann_recall_pq", "ann_recall_ivf_pq", "ann_recall_rerank",
    "dup_passage_spans", "line_dedup_docs", "fuzzy_join_phrases",
    "bpe_pair_counts", "bpe_train_merges", "corpus_overlap_kmv",
    "corpus_overlap_exact", "source_overlap_matrix", "bpe_encode_docs",
]


def _ordered(mapping: dict) -> dict:
    head = {n: mapping[n] for n in _PRIORITY if n in mapping}
    return head | {n: v for n, v in mapping.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
