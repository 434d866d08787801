"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (SURVEY.md §2.8 M5/M6 vision path; reference twin-tower ViT
`vision_matcher.py:33-58`).

The decode step is STUBBED: image/audio codecs aren't in this
container, so `decode_image_udf` raises NotImplementedError unless
`deterministic_fake=True`, which produces a seeded fake feature vector
from the bytes — the Spark-side plumbing (schema, Arrow batch shape,
partitioning) is real and tested either way.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

IMAGE_META_SCHEMA = "width int, height int, format string"


def image_feature_extractor(dim: int = 32, deterministic_fake: bool = False):
    """binary -> float feature vector, as an Arrow-batched pandas UDF.

    Real deployment would decode + embed (ViT per the reference); here
    the decode is a clearly-marked stub. The fake is a pure function of
    the bytes (blake2b-seeded), so tests exercise batching, schema and
    determinism.
    """

    @F.pandas_udf(ArrayType(FloatType()))
    def _extract(content: pd.Series) -> pd.Series:
        out = []
        for b in content:
            if b is None:
                out.append([0.0] * dim)
                continue
            if not deterministic_fake:
                raise NotImplementedError(
                    "image decode requires codec libs not present in this "
                    "container; pass deterministic_fake=True for the "
                    "plumbing-test path"
                )
            h = hashlib.blake2b(bytes(b), digest_size=dim).digest()
            v = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
            v = v / 255.0 * 2 - 1
            n = np.linalg.norm(v)
            out.append([float(x) for x in (v / n if n else v)])
        return pd.Series(out)

    return _extract


def extract_image_features(
    df: DataFrame,
    content_col: str = "content",
    out_col: str = "img_features",
    dim: int = 32,
    deterministic_fake: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """Append image feature vectors. Binary payloads are heavy: an
    explicit repartition ahead of the UDF keeps Arrow batches balanced
    (no hot partition carrying all the bytes)."""
    if partitions:
        df = df.repartition(partitions)
    fx = image_feature_extractor(dim=dim, deterministic_fake=deterministic_fake)
    return df.withColumn(out_col, fx(F.col(content_col)))
