"""Multimodal columns: image/audio/video payloads as opaque ``binary``
columns with typed metadata, plus Arrow-batched decode/feature stages.

Reference parity: none — the reference has no binary/multimodal support
(SURVEY.md §1.2: no nested or binary types). This is north-star
extension work for training-data pipelines.

Design (the part that matters at 100 TB):

* A multimodal record is ``(id, modality, payload binary, meta struct)``
  — the payload stays opaque to Catalyst, metadata (byte size, digest,
  declared mime) is computed ONCE with built-in functions and carried
  as columns, so filtering/joining on metadata never touches bytes.
* Metadata-only operations (dedup by digest, size filters, mime
  routing) are pure JVM expressions — codegen, no Python.
* Byte-level features run through ``mapInPandas`` (Arrow batches of
  whole rows, not row-at-a-time UDFs). ``byte_histogram`` is a REAL
  feature (no codec needed); actual image/audio decode needs codec
  libraries that are not in this container, so ``decode_stub`` raises
  ``NotImplementedError`` with the integration contract documented —
  the schema/partitioning/batch plumbing around it is real and tested.
* Partitioning contract: fan heavy decode over
  ``df.repartition(n, 'id')`` first; payloads are large, so target
  ~128 MB of payload per partition (rows_per_partition ≈ 128MB /
  avg_payload) rather than Spark's default row-count heuristics.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "n_bytes bigint, digest string, mime string"


def attach_metadata(
    df: DataFrame, payload_col: str = "payload", mime: str | None = None
) -> DataFrame:
    """Add a typed ``meta`` struct (byte length, md5 digest, mime) —
    built-ins only, stays in codegen."""
    p = F.col(payload_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.length(p).cast("bigint").alias("n_bytes"),
            F.md5(p).alias("digest"),
            F.lit(mime).alias("mime"),
        ),
    )


def dedup_by_digest(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact payload dedup on the 128-bit digest: one uniform-hash
    shuffle, identical shape to text exact_dedup."""
    return (
        df.groupBy(F.col("meta.digest").alias("digest"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
        .select("keep_id", "n_dups")
    )


def byte_histogram(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    bins: int = 16,
) -> DataFrame:
    """Per-payload byte-value histogram (``bins`` buckets over 0..255)
    — a real, codec-free feature via Arrow-batched mapInPandas.
    Output: (id, hist array<bigint>)."""
    schema = f"{id_col} long, hist array<long>"
    width = 256 // bins

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        empty = np.array([], dtype=np.uint8)
        for pdf in batches:
            # zip over columns, not iterrows — iterrows materializes a
            # Series per row and dominates the batch cost
            out_hists = [
                np.bincount(
                    (np.frombuffer(p, dtype=np.uint8) if p else empty) // width,
                    minlength=bins,
                )[:bins].astype("int64").tolist()
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col].values, "hist": out_hists})

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def decode_stub(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    modality: str = "image",
) -> DataFrame:
    """Decode escape hatch — the Spark plumbing is real, the codec is
    not available in this container.

    Integration contract: replace ``_decode`` with a real decoder
    (PIL/librosa/av) returning a fixed-schema dict per payload; the
    surrounding mapInPandas batching, output schema and partitioning
    advice in the module docstring stay unchanged."""
    schema = f"{id_col} long, width int, height int, n_channels int"

    def run(batches: Iterator) -> Iterator:
        def _decode(_payload: bytes) -> dict:
            raise NotImplementedError(
                f"{modality} decode requires codec libraries not present in "
                f"this environment; wire PIL/librosa/av into _decode here"
            )

        for pdf in batches:  # pragma: no cover - raises on first batch
            import pandas as pd

            rows = [
                {id_col: r[id_col], **_decode(r[payload_col])}
                for _, r in pdf.iterrows()
            ]
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)
