"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata, processed with Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBBED (the image/audio libraries are
not available in this environment — see ``decode_image``); everything
Spark-side is real and tested: schemas, batch shapes, partitioning, and
the UDF signatures a production decode would drop into.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# A multimodal asset row: opaque payload + typed metadata. Binary stays
# opaque to Catalyst; metadata columns get pushdown/pruning as usual.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("mime_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_digest", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Decode an image payload into a pixel array.

    STUB: real deployments plug Pillow/libvips here; this container has
    no imaging libraries, so the decode step raises and callers must use
    :func:`extract_features` with ``fake_decode=True`` (a deterministic
    digest-based feature) to exercise the full Spark plumbing.
    """
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; use fake_decode=True for plumbing tests"
    )


def _fake_feature(payload: bytes, dims: int = 8) -> list[float]:
    """Deterministic stand-in feature: bytes of the md5 digest scaled to
    [0, 1) — stable across runs, no external deps."""
    import hashlib

    digest = hashlib.md5(payload or b"").digest()
    return [b / 256.0 for b in digest[:dims]]


def extract_features(assets: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Per-asset feature extraction over Arrow batches.

    Real semantics of the Spark side: binary payloads stream through
    ``mapInPandas`` in Arrow record batches (no per-row Python calls at
    the boundary), and the output schema is fixed and typed. Only the
    innermost decode kernel is stubbed.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = pdf["payload"]
            if not fake_decode:
                payloads.map(decode_image)  # raises NotImplementedError
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(lambda b: len(b or b"")).astype("int64"),
                    "payload_digest": payloads.map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "feature": payloads.map(_fake_feature),
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def documents_as_assets(documents: DataFrame) -> DataFrame:
    """Adapter: treat the text corpus as binary assets so the multimodal
    path has real data to flow through in tests/benchmarks."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
