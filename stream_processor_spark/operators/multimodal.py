"""Multimodal column conventions: opaque binary payloads + typed metadata.

A multimodal dataset row is ``(id, modality, payload: binary, meta: struct)``
— the payload is opaque to the engine; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so bytes move JVM→Python once per batch, never
per row. Image/audio decoding libraries are not available in this container,
so the decode step is STUBBED (NotImplementedError) while the Spark-side
plumbing — schema, batching, partition-parallel map — is real and tested.

At 100 TB: payloads live in parquet binary columns (or pointer columns to
object storage); feature extraction is a pure map pass with
``spark.sql.files.maxPartitionBytes`` sized so a task's Arrow batches fit in
worker memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, fingerprint string, head string"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (UTF-8 bytes of text).

    Stands in for image/audio bytes in this container; the downstream
    plumbing is identical for real media.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_binary_features(df: DataFrame, id_col: str = "doc_id",
                            payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    Computes (byte length, md5 fingerprint, first-8-bytes preview) per
    payload — deterministic, so the oracle can verify the full pipeline
    including the binary round-trip.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col].map(lambda b: None if b is None else bytes(b))
            # NULL payload → NULL features (SQL length/md5/substring-of-NULL
            # semantics), never a crash or a sentinel
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pd.array(
                        [None if b is None else len(b) for b in payloads],
                        dtype="Int64",
                    ),
                    "fingerprint": payloads.map(
                        lambda b: None if b is None else hashlib.md5(b).hexdigest()
                    ),
                    "head": payloads.map(
                        lambda b: None if b is None else b[:8].decode("utf-8", "replace")
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(gen, schema=BINARY_FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_fp string"


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_size: int = 32,
    every: int = 4,
) -> DataFrame:
    """Frame-sampling plumbing: slice a binary payload into fixed-size
    frames and keep every ``every``-th one, fingerprinted.

    This is the video/audio frame-sample dataflow with the codec swapped
    for byte-slicing (no media libraries in this container): a real
    implementation replaces the slice with container demux + keyframe
    select inside the SAME Arrow-batched ``mapInPandas`` generator — the
    engine-visible contract (one input row → 0..k frame rows, schema,
    batch shape, partition parallelism) is identical. Output cardinality
    is data-dependent (flatMap), which is exactly what ``mapInPandas``
    exists for.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, fps = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                raw = bytes(payload)
                n_frames = -(-len(raw) // frame_size)  # ceil
                for i in range(0, n_frames, every):
                    ids.append(doc_id)
                    idxs.append(i)
                    fps.append(
                        hashlib.md5(
                            raw[i * frame_size:(i + 1) * frame_size]
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": pd.array(ids, dtype="int64"),
                 "frame_idx": pd.array(idxs, dtype="int64"),
                 "frame_fp": pd.array(fps, dtype=object)}
            )

    return df.select(id_col, payload_col).mapInPandas(gen, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = "doc_id long, n_bytes_in long, n_bytes_out long, resized_fp string"


def resize_payloads(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    byte_budget: int = 128,
) -> DataFrame:
    """Resize plumbing: shrink each binary payload to a byte budget and
    fingerprint the result.

    Models the media-resize contract (payload in → smaller payload out →
    downstream fingerprint/features) with budget-truncation standing in
    for the codec — a real implementation swaps PIL resize / audio
    downsampling into the SAME Arrow-batched generator; the
    engine-visible schema, batching, and determinism are identical. Kept
    1-row-per-input (unlike frame sampling's flatMap).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col].map(
                lambda b: None if b is None else bytes(b)
            )
            resized = payloads.map(
                lambda b: None if b is None else b[:byte_budget]
            )
            # NULL payload → NULL sizes/fingerprint (nullable Int64, not a
            # -1 sentinel) — matches SQL `length(NULL) IS NULL` semantics
            # so oracle parity holds on NULL rows too
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes_in": pd.array(
                        [None if b is None else len(b) for b in payloads],
                        dtype="Int64",
                    ),
                    "n_bytes_out": pd.array(
                        [None if b is None else len(b) for b in resized],
                        dtype="Int64",
                    ),
                    "resized_fp": resized.map(
                        lambda b: None if b is None else hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(gen, schema=RESIZE_SCHEMA)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB: real image decode (e.g. Pillow → height/width/channels).

    The container has no imaging libraries; raising keeps the API honest.
    The production implementation is the same ``mapInPandas`` shape as
    :func:`extract_binary_features` with PIL.Image.open per payload.
    """
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; use extract_binary_features for the plumbing-level path"
    )
