"""Multimodal column plumbing: opaque binary blobs + typed metadata.

Images/audio/video are carried as ``binary`` columns with typed
metadata; decode / feature-extract run as Arrow-batched ``mapInPandas``
over the binary column. The decode itself is STUBBED (no image/audio
libraries in this container — clearly marked below); the Spark-side
plumbing (schema, batch shape, partition behavior) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binary_meta(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Native metadata over a binary column: size + magic prefix hex."""
    return df.select(
        "url",
        F.length(F.col(bin_col)).cast("long").alias("n_bytes"),
        F.hex(F.substring(F.col(bin_col), 1, 4)).alias("magic_hex"),
        F.md5(F.col(bin_col)).alias("content_md5"),
    )


DECODED_SCHEMA = ("url string, n_bytes long, width int, height int, "
                  "n_channels int, feature_norm double")


def decode_features(df: DataFrame, bin_col: str = "payload",
                    deterministic_fake: bool = True) -> DataFrame:
    """'Decode' binary blobs and extract features via mapInPandas.

    STUB: real decode needs image/audio libs not present in this
    container. With deterministic_fake=True a reproducible fake decode
    (dimensions/features derived from blob bytes) exercises the full
    Arrow batch path; with False it raises NotImplementedError exactly
    where a cv2/PIL/ffmpeg call would go.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "binary decode requires an image/audio library; "
                    "plug cv2/PIL/torchaudio here")
            blobs = pdf[bin_col]
            n = blobs.str.len().astype("int64")
            # deterministic fake: pretend the first bytes encode dims
            first = blobs.str[0:1].apply(
                lambda b: b[0] if len(b) else 0).astype("int32")
            yield pd.DataFrame({
                "url": pdf["url"],
                "n_bytes": n,
                "width": (first % 64 + 1).astype("int32"),
                "height": ((first // 64) % 64 + 1).astype("int32"),
                "n_channels": pd.Series([3] * len(pdf), dtype="int32"),
                "feature_norm": (n % 1000) / 1000.0,
            })

    return df.select("url", bin_col).mapInPandas(_decode, DECODED_SCHEMA)
