"""Multimodal column plumbing: opaque binary blobs + typed metadata.

Images/audio/video are carried as ``binary`` columns with typed
metadata; decode / feature-extract run as Arrow-batched ``mapInPandas``
over the binary column. Container-header parsing (format + pixel
dimensions for PNG/GIF/BMP/JPEG) is REAL — implemented from the public
container specs over raw bytes. Only the pixel-level decode is STUBBED
(no image/audio libraries in this container — clearly marked below);
the Spark-side plumbing (schema, batch shape, partition behavior) is
real and tested.
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


def _parse_image_header(b: bytes):
    """(format, width, height) from raw container headers — REAL
    parsing, no image library needed (only the pixel decode is stubbed):
    PNG IHDR, GIF logical screen, BMP info header, JPEG SOF scan."""
    import struct
    if b is None or len(b) < 10:
        return None, None, None
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        return "png", w, h
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return "bmp", w, abs(h)
    if b[:2] == b"\xff\xd8":
        # walk JPEG segments to the first SOFn (baseline/progressive)
        i = 2
        n = len(b)
        while i + 9 < n:
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                          0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                return "jpeg", w, h
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
            i += 2 + seg_len
        return "jpeg", None, None
    return None, None, None


IMAGE_META_SCHEMA = ("url string, format string, width int, height int, "
                     "n_bytes long")


def image_meta(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Image container metadata over a binary column via Arrow-batched
    mapInPandas: format + pixel dimensions parsed from the raw header
    bytes (PNG/GIF/BMP/JPEG). The per-row byte walk is genuinely
    irregular (JPEG segment scan), so it runs as Python inside the
    Arrow batch — a few bytes per row, not a pixel decode."""

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [(u,) + _parse_image_header(b)
                      + (len(b) if b is not None else 0,)
                      for u, b in zip(pdf["url"], pdf[bin_col])]
            yield pd.DataFrame(
                parsed, columns=["url", "format", "width", "height",
                                 "n_bytes"]).astype(
                {"width": "Int32", "height": "Int32", "n_bytes": "int64"})

    return df.select("url", bin_col).mapInPandas(_meta, IMAGE_META_SCHEMA)


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
