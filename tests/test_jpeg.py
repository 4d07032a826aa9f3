"""Baseline JPEG codec (kernels/jpeg.py) — encode->decode round trips.

The decoder is the real surface (operators/multimodal.py jpeg_stats and
the jpeg_decode oracle query); the encoder exists to produce
deterministic fixtures. With an all-ones quantization table the only
loss is DCT-coefficient rounding, so round trips have tight provable
error bounds.
"""

import numpy as np
import pytest

from pyproj_spark.kernels.jpeg import ZIGZAG, decode_jpeg, encode_jpeg

rng = np.random.default_rng(20260816)


def test_constant_blocks_exact():
    # per-8x8-block constant grayscale: only the DC coefficient is
    # nonzero and quant=1 keeps it integer -> bit-exact decode
    vals = rng.integers(0, 256, (4, 6))
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (32, 48, 1)
    assert np.array_equal(out[:, :, 0], img)


def test_grayscale_random_rounding_bound():
    img = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))[:, :, 0]
    # quant=1: error only from rounding 64 DCT coefficients
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_rgb_444_round_trip():
    x = np.linspace(0, 255, 32)
    gx, gy = np.meshgrid(x, x)
    img = np.stack([gx, gy, np.full((32, 32), 77.0)], -1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (32, 32, 3)
    # YCbCr forward+inverse rounding stacks with coefficient rounding
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_rgb_420_subsampled():
    # smooth image: 2x2 chroma averaging stays close; odd dims crop
    x = np.linspace(0, 255, 32)
    gx, gy = np.meshgrid(x, x)
    img = np.stack([gx, gy, np.full((32, 32), 77.0)], -1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, subsample="4:2:0"))
    assert out.shape == (32, 32, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8
    odd = rng.integers(0, 256, (19, 27, 3)).astype(np.uint8)
    assert decode_jpeg(encode_jpeg(odd, subsample="4:2:0")).shape \
        == (19, 27, 3)


def test_non_multiple_of_8_dimensions():
    img = rng.integers(0, 256, (13, 21, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (13, 21, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_lossy_quantization_decodes():
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=16))[:, :, 0]
    # lossy but bounded: max DCT reconstruction error ~ q/2 per coef
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 16


def test_zigzag_is_an_involution_pairing():
    # the zigzag table must be a permutation of 0..63 with the known
    # first diagonal walk (T.81 Figure A.6)
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]


def test_malformed_and_unsupported_inputs():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")
    good = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    i = bytes(good).find(b"\xff\xc0")
    # flip SOF0 -> SOF3 (lossless) and expect NotImplementedError
    bad = bytearray(good)
    bad[i + 1] = 0xC3
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(bad))
    # SOF0 relabeled SOF2: progressive is SUPPORTED now, but a
    # sequential scan header (Ss=0, Se=63) is malformed progressive
    bad = bytearray(good)
    bad[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


def test_jpeg_stats_spark(spark):
    from pyproj_spark.operators.multimodal import jpeg_stats
    imgs = []
    for d in range(8):
        vals = (np.arange(4).reshape(2, 2) * 29 + d * 17) % 256
        img = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
        imgs.append((f"u{d}", bytearray(encode_jpeg(img)),
                     float(vals.mean())))
    df = spark.createDataFrame(
        [(u, bytes(b)) for u, b, _m in imgs], "url string, payload binary")
    got = {r["url"]: r for r in jpeg_stats(df).collect()}
    assert len(got) == 8
    for u, _b, mean in imgs:
        r = got[u]
        assert (r["width"], r["height"], r["n_channels"]) == (16, 16, 1)
        assert r["mean_luma"] == pytest.approx(mean, abs=1e-9)


def test_restart_interval_resync():
    """DRI/RSTn handling: DC predictors reset at each restart marker
    and decode stays exact after resynchronization."""
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    b = encode_jpeg(img, restart_interval=2)
    assert b.count(b"\xff\xdd") == 1  # DRI emitted
    n_rst = sum(b.count(bytes([0xFF, 0xD0 + i])) for i in range(8))
    assert n_rst >= (40 // 8) * (56 // 8) // 2 - 1
    out = decode_jpeg(b)[:, :, 0]
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
    # restart + chroma subsampling compose
    img3 = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    assert decode_jpeg(encode_jpeg(
        img3, subsample="4:2:0", restart_interval=1)).shape \
        == (24, 24, 3)


def test_exif_orientation_parse():
    """EXIF APP1 TIFF-IFD walk (public EXIF spec): both byte orders,
    all 8 orientations, absent/garbage segments return None, and the
    pixel decoder skips APP1 unaffected."""
    from pyproj_spark.kernels.jpeg import _exif_app1, exif_orientation
    base = encode_jpeg(np.full((8, 8), 100, dtype=np.uint8))
    assert exif_orientation(base) is None
    for o in range(1, 9):
        for endian in ("<", ">"):
            b = base[:2] + _exif_app1(o, endian) + base[2:]
            assert exif_orientation(b) == o
            assert decode_jpeg(b).shape == (8, 8, 1)
    assert exif_orientation(b"\x00not a jpeg") is None
    # APP1 that is XMP, not EXIF -> None
    xmp = b"\xff\xe1" + (12).to_bytes(2, "big") + b"http://ns.x"
    assert exif_orientation(base[:2] + xmp + base[2:]) is None


def test_progressive_equals_baseline():
    """Progressive (SOF2) decode must reproduce baseline decode
    EXACTLY: both transmit identical quantized coefficients, so any
    pixel difference is a successive-approximation/EOBRUN bug."""
    from pyproj_spark.kernels.jpeg import encode_jpeg_progressive
    rng = np.random.RandomState(42)
    gray = rng.randint(0, 256, (24, 17), dtype=np.uint8)
    rgb = rng.randint(0, 256, (19, 30, 3), dtype=np.uint8)
    cases = [
        (gray, {}, {}),
        (rgb, {}, {}),
        (rgb, {"subsample": "4:2:0"}, {"subsample": "4:2:0"}),
        (rgb, {"quant": 8}, {"quant": 8}),
        (gray, {}, {"restart_interval": 3}),
        (rgb, {}, {"dc_al": 2, "ac_al": 2,
                   "bands": ((1, 2), (3, 20), (21, 63))}),
        (rgb, {"subsample": "4:2:0"},
         {"subsample": "4:2:0", "restart_interval": 2, "ac_al": 2}),
    ]
    for img, bkw, pkw in cases:
        base = decode_jpeg(encode_jpeg(img, **bkw))
        prog = decode_jpeg(encode_jpeg_progressive(img, **pkw))
        assert np.array_equal(base, prog), (bkw, pkw)


def test_progressive_is_sof2_and_multiscam():
    from pyproj_spark.kernels.jpeg import encode_jpeg_progressive
    b = encode_jpeg_progressive(np.zeros((16, 16), dtype=np.uint8))
    assert b.find(b"\xff\xc2") > 0 and b.find(b"\xff\xc0") < 0
    # DC first + DC refine + (first + refine) per band = 6 scans
    n_sos = 0
    i = 0
    while True:
        i = b.find(b"\xff\xda", i + 1)
        if i < 0:
            break
        n_sos += 1
    assert n_sos == 6


def test_progressive_smooth_image_quality():
    """With a quality-style quant table the progressive pipeline is
    lossy but must stay close on smooth content."""
    from pyproj_spark.kernels.jpeg import encode_jpeg_progressive
    x, y = np.meshgrid(np.arange(32), np.arange(40))
    img = ((x * 3 + y * 2) % 256).astype(np.uint8)
    q = np.clip(np.arange(1, 65), 1, 32)
    out = decode_jpeg(encode_jpeg_progressive(img, quant=q))
    assert out.shape == (40, 32, 1)
    assert np.abs(out[:, :, 0].astype(float) - img).mean() < 8.0
