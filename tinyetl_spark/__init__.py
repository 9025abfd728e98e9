"""tinyetl_spark — a PySpark-native data engine with the capabilities of
the TinyETL reference (scan → validate → transform → sink) re-expressed as
Spark DataFrame plans, plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Design principles (100 TB posture):
  * Everything is a DataFrame transformation — no driver-side row loops,
    no ``collect()`` in any operator.
  * Catalyst does the optimizing: plans are declared with built-in
    ``pyspark.sql.functions`` so predicate pushdown, column pruning and
    whole-stage codegen apply. Python UDFs only behind explicit escape
    hatches (arbitrary user transforms, multimodal decode).
  * Shuffle-aware operators: broadcast for small dims, HOF ``aggregate``
    instead of explode+groupBy where possible, banding/blocking for
    pairwise ops so nothing is O(n^2) across the whole corpus.
"""

__version__ = "0.1.0"
