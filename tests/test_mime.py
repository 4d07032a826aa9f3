"""Magic-byte MIME sniffing — adversarial byte cases the oracle's
arithmetic replay cannot cover: truncated prefixes, lying extensions
don't exist here (content-only), RIFF sub-kinds, whitespace/BOM-led
HTML, and invalid UTF-8 falling through to octet-stream."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyproj_spark.operators.multimodal import sniff_mime

CASES = [
    (b"%PDF-1.4\n%\xe2\xe3\xcf\xd3", "application/pdf"),
    (b"\x89PNG\r\n\x1a\nIHDR", "image/png"),
    (b"\xff\xd8\xff\xe0\x00\x10JFIF", "image/jpeg"),
    (b"\xff\xd8\xff\xdb", "image/jpeg"),          # no APP0, still jpeg
    (b"GIF87a\x01\x00", "image/gif"),
    (b"GIF89a\x01\x00", "image/gif"),
    (b"BM\x36\x00", "image/bmp"),
    (b"RIFF\x24\x00\x00\x00WAVEfmt ", "audio/wav"),
    (b"RIFF\x24\x00\x00\x00AVI LIST", "video/avi"),
    (b"RIFF\x24\x00\x00\x00WEBPVP8 ", "image/webp"),
    (b"RIFF\x24\x00\x00\x00JUNK", "application/octet-stream"),
    (b"PK\x03\x04\x14\x00", "application/zip"),
    (b"PK\x05\x06" + b"\x00" * 18, "application/zip"),  # empty archive
    (b"\x1f\x8b\x08\x00", "application/gzip"),
    (b"<!DOCTYPE html><html>", "text/html"),
    (b"  \t\r\n<!doctype HTML public>", "text/html"),
    (b"<HTML><BODY>hi", "text/html"),
    (b"<head><title>t</title>", "text/html"),
    (b'<?xml version="1.0"?><svg/>', "text/xml"),
    (b"plain text, no tags", "application/octet-stream"),
    (b"\x00\x01\x02\x03", "application/octet-stream"),
    (b"\xfe\xff\x00<\x00h", "application/octet-stream"),  # utf-16 junk
    (b"", "application/octet-stream"),
    # a PNG signature NOT at offset 0 must not match
    (b"x\x89PNG\r\n\x1a\n", "application/octet-stream"),
    # truncated png signature (6 of 8 bytes) must not match
    (b"\x89PNG\r\n", "application/octet-stream"),
]


def test_sniff_mime_cases(spark):
    pdf = pd.DataFrame({"i": range(len(CASES)),
                        "payload": [c[0] for c in CASES]})
    df = spark.createDataFrame(pdf)
    got = (df.select("i", sniff_mime(F.col("payload")).alias("mime"))
           .toPandas().sort_values("i")["mime"].tolist())
    exp = [c[1] for c in CASES]
    assert got == exp, [
        (i, CASES[i][0][:12], g, e)
        for i, (g, e) in enumerate(zip(got, exp)) if g != e]


def test_sniff_is_pure_catalyst(spark):
    pdf = pd.DataFrame({"payload": [b"GIF89a"]})
    df = spark.createDataFrame(pdf).select(
        sniff_mime(F.col("payload")).alias("m"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
