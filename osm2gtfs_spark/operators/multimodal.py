"""Multimodal column plumbing: opaque media + typed metadata.

Images/audio/video ride as opaque references (``media_ref``) or binary
columns with typed metadata. The Spark-side plumbing — schema, Arrow
batch shapes, ``mapInPandas`` signatures, partitioning — is real and
tested; the actual byte decoding is STUBBED (image/audio libs are not
in this container): ``decode_media(fake=False)`` raises
NotImplementedError, ``fake=True`` produces a deterministic fake
(hash-derived dims + features) so downstream operators are exercised
end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 16


def media_spans(docs: DataFrame) -> DataFrame:
    """Extract (doc_id, media_ref) rows from interleaved docs."""
    return docs.select(
        "doc_id", F.explode(F.filter("spans", lambda s: s.kind == F.lit("image"))).alias("s")
    ).select("doc_id", F.col("s.media_ref").alias("media_ref"))


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decode: dims and features from the ref hash."""
    rows = []
    for doc_id, ref in zip(pdf.doc_id, pdf.media_ref):
        h = hashlib.md5(ref.encode()).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
        rows.append(
            (
                doc_id,
                ref,
                int(64 + h[0] % 192),  # width
                int(64 + h[1] % 192),  # height
                int(1 + h[2] % 30),  # frame-sampled count
                rng.standard_normal(FEATURE_DIM).astype(np.float32).tolist(),
            )
        )
    return pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])


def decode_media(media: DataFrame, fake: bool = True, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas decode/feature-extract over Arrow batches.

    Real decode is NotImplemented in this container (no PIL/ffmpeg);
    the ``fake=True`` path keeps the distributed plumbing honest: same
    schema, same batch iterator shape, same partitioning behavior."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not available; "
                    "use fake=True for the deterministic stub"
                )
            yield _fake_decode_batch(pdf)

    return media.mapInPandas(gen, MEDIA_META_SCHEMA)


def resize_features(meta: DataFrame, target: int = 8) -> DataFrame:
    """'Resize' = downsample the feature vector (slice) — column ops."""
    return meta.withColumn("features_small", F.slice("features", 1, target))
