"""Spectral tone detection (operators/multimodal.py)."""

import numpy as np

from pyproj_spark.kernels.riff import encode_wav
from pyproj_spark.operators.multimodal import audio_tone_detect


def _wav(samples):
    return encode_wav(np.asarray(samples, dtype=np.int64), rate=8000,
                      bits=16)


def test_tone_detection(spark):
    n = np.arange(256)
    pure = np.floor(18000 * np.sin(2 * np.pi * 1000 * n / 8000))
    # 2 kHz dominant + weak 500 Hz: dominant must win, share < 1
    mixed = np.floor(15000 * np.sin(2 * np.pi * 2000 * n / 8000)
                     + 4000 * np.sin(2 * np.pi * 500 * n / 8000))
    silence = np.zeros(256)
    df = spark.createDataFrame(
        [("pure", _wav(pure)), ("mixed", _wav(mixed)),
         ("silence", _wav(silence))],
        "url string, payload binary")
    got = {r.url: r for r in audio_tone_detect(df).collect()}
    assert got["pure"].detected_hz == 1000
    assert got["pure"].energy_share > 0.999
    assert got["mixed"].detected_hz == 2000
    assert 0.8 < got["mixed"].energy_share < 1.0
    assert got["silence"].energy_share == 0.0
