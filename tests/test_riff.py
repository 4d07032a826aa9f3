"""RIFF codecs (kernels/riff.py) + the multimodal operators they feed:
WAV PCM decode, AVI MJPG frame sampling, image resize."""

import numpy as np
import pytest

from pyproj_spark.kernels.jpeg import encode_jpeg
from pyproj_spark.kernels.riff import (
    avi_frames, decode_wav, encode_avi_mjpg, encode_wav,
)

rng = np.random.default_rng(816)


def test_wav_round_trip_bit_depths():
    for bits, lim in ((8, 127), (16, 30000), (32, 2**31 - 1)):
        s = np.round(np.sin(np.arange(800) * 0.05) * (lim - 1)) \
            .astype(np.int64)
        out, rate = decode_wav(encode_wav(s, rate=8000, bits=bits))
        assert rate == 8000
        assert np.array_equal(out[:, 0], s)


def test_wav_stereo_and_word_alignment():
    st = np.stack([np.arange(101), -np.arange(101)], 1)
    out, _ = decode_wav(encode_wav(st, bits=16))
    assert np.array_equal(out, st)
    # odd-length 8-bit data chunk exercises the word-align skip
    out8, _ = decode_wav(encode_wav(np.arange(33) - 16, bits=8))
    assert np.array_equal(out8[:, 0], np.arange(33) - 16)


def test_wav_error_contract():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    # flip the format tag to 3 (IEEE float): NotImplementedError
    b = bytearray(encode_wav(np.arange(10), bits=16))
    i = bytes(b).find(b"fmt ") + 8
    b[i] = 3
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(b))


def test_avi_mjpg_round_trip():
    frames = []
    for i in range(5):
        img = np.full((16, 16), (i * 40) % 256, dtype=np.uint8)
        frames.append(encode_jpeg(img))
    avi = encode_avi_mjpg(frames, fps=12.5)
    got, fps = avi_frames(avi)
    assert fps == pytest.approx(12.5)
    assert got == frames
    with pytest.raises(ValueError):
        avi_frames(b"RIFF\x00\x00\x00\x00WAVE")


def test_resize_kernels():
    from pyproj_spark.operators.multimodal import (
        resize_bilinear, resize_nearest,
    )
    px = rng.integers(0, 256, (12, 16, 3)).astype(np.uint8)
    nn = resize_nearest(px, 4, 4)
    assert nn.shape == (4, 4, 3)
    for i in range(4):
        for j in range(4):
            assert np.array_equal(nn[i, j],
                                  px[(i * 12) // 4, (j * 16) // 4])
    # bilinear of a constant image is that constant; of a linear ramp
    # it stays within the ramp's range
    const = np.full((10, 10, 1), 37.0)
    assert np.allclose(resize_bilinear(const, 3, 7), 37.0)
    ramp = np.arange(16, dtype=np.float64).reshape(1, 16, 1) \
        .repeat(8, axis=0)
    out = resize_bilinear(ramp, 4, 8)
    assert out.min() >= 0.0 and out.max() <= 15.0
    assert np.all(np.diff(out[0, :, 0]) > 0)  # monotone along the ramp


def test_multimodal_operators_spark(spark):
    from pyproj_spark.operators.multimodal import (
        image_resize, video_frame_sample, wav_features,
    )
    rows = []
    for d in range(6):
        s = ((np.arange(40 + d) * 7) % 100) - 50
        wav = encode_wav(s, rate=4000, bits=16)
        frames = [encode_jpeg(np.full((16, 16), (f * 30 + d) % 256,
                                      dtype=np.uint8))
                  for f in range(d % 3 + 2)]
        avi = encode_avi_mjpg(frames, fps=10)
        jpg = encode_jpeg(
            np.repeat(np.repeat((np.arange(4).reshape(2, 2) * 50
                                 + d) % 256, 8, 0), 8, 1)
            .astype(np.uint8))
        rows.append((f"u{d}", bytes(wav), bytes(avi), bytes(jpg)))
    df = spark.createDataFrame(
        rows, "url string, wav binary, avi binary, jpg binary")

    w = {r["url"]: r for r in
         wav_features(df.select("url", F_col("wav").alias("payload")))
         .collect()}
    assert len(w) == 6
    for d in range(6):
        s = ((np.arange(40 + d) * 7) % 100) - 50
        r = w[f"u{d}"]
        assert r["n_samples"] == 40 + d and r["sample_rate"] == 4000
        assert r["peak"] == int(np.abs(s).max())
        assert r["rms"] == pytest.approx(
            float(np.sqrt((s.astype(float) ** 2).mean())))

    v = video_frame_sample(
        df.select("url", F_col("avi").alias("payload")),
        every_k=2).collect()
    for r in v:
        d = int(r["url"][1:])
        assert r["frame_idx"] % 2 == 0
        assert r["mean_luma"] == float((r["frame_idx"] * 30 + d) % 256)
    assert len(v) == sum((d % 3 + 2 + 1) // 2 for d in range(6))

    rz = image_resize(df.select("url", F_col("jpg").alias("payload")),
                      out_h=2, out_w=2, method="nearest").collect()
    assert len(rz) == 6
    for r in rz:
        d = int(r["url"][1:])
        vals = (np.arange(4).reshape(2, 2) * 50 + d) % 256
        assert r["mean_luma"] == pytest.approx(float(vals.mean()))


def F_col(name):
    from pyspark.sql import functions as F
    return F.col(name)


def test_wav_24bit_round_trip():
    s = np.array([0, 1, -1, 8388607, -8388608, 123456, -654321],
                 dtype=np.int64)
    out, rate = decode_wav(encode_wav(s, rate=44100, bits=24))
    assert rate == 44100
    assert np.array_equal(out[:, 0], s)


def test_bmp_round_trip():
    for shape in ((7, 5, 3), (16, 16, 3), (3, 9, 3)):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        from pyproj_spark.kernels.riff import decode_bmp, encode_bmp
        out = decode_bmp(encode_bmp(img))
        assert np.array_equal(out, img)
    from pyproj_spark.kernels.riff import decode_bmp
    with pytest.raises(ValueError):
        decode_bmp(b"not a bmp at all......")


def test_gif_lzw_round_trip():
    from pyproj_spark.kernels.riff import decode_gif, encode_gif
    # repetitive image forces dictionary growth; random forces clears;
    # constant forces long runs
    for img in (np.tile(np.arange(16, dtype=np.uint8), (32, 8)),
                rng.integers(0, 256, (25, 33)).astype(np.uint8),
                np.zeros((70, 70), dtype=np.uint8)):
        out = decode_gif(encode_gif(img))
        assert np.array_equal(out, np.repeat(img[:, :, None], 3, 2))
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a\x00")


def test_decode_image_dispatch():
    from pyproj_spark.kernels.riff import encode_bmp, encode_gif
    from pyproj_spark.operators.multimodal import decode_image
    img = rng.integers(0, 256, (10, 12, 3)).astype(np.uint8)
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    g = rng.integers(0, 256, (10, 12)).astype(np.uint8)
    assert np.array_equal(decode_image(encode_gif(g)),
                          np.repeat(g[:, :, None], 3, 2))
    assert decode_image(encode_jpeg(img)).shape == (10, 12, 3)
    with pytest.raises(ValueError):
        decode_image(b"\x00\x01\x02 garbage")
