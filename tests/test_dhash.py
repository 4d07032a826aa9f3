"""dHash perceptual-hash invariance properties."""

import struct
import zlib

import numpy as np

from pyproj_spark.operators.multimodal import image_dhash


def _png(px: np.ndarray) -> bytes:
    h, w = px.shape[:2]
    rows = bytearray()
    for y in range(h):
        rows.append(0)
        rows += px[y].astype(np.uint8).tobytes()

    def chunk(t, data):
        return (struct.pack(">I", len(data)) + t + data
                + struct.pack(">I", zlib.crc32(t + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(rows)))
            + chunk(b"IEND", b""))


def _hash_of(spark, imgs):
    df = spark.createDataFrame(
        [(str(i), _png(px)) for i, px in enumerate(imgs)],
        ["url", "payload"])
    return {r.url: r.dhash for r in image_dhash(df).collect()}


class TestDHash:
    def test_brightness_shift_invariant(self, spark):
        rng = np.random.RandomState(3)
        base = rng.randint(0, 200, (12, 18, 3))
        brighter = np.clip(base + 40, 0, 255)
        h = _hash_of(spark, [base, brighter])
        assert h["0"] == h["1"]

    def test_upscale_invariant(self, spark):
        rng = np.random.RandomState(4)
        base = rng.randint(0, 256, (8, 9, 3))
        up = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
        h = _hash_of(spark, [base, up])
        assert h["0"] == h["1"]

    def test_different_content_differs(self, spark):
        rng = np.random.RandomState(5)
        a = rng.randint(0, 256, (12, 18, 3))
        b = rng.randint(0, 256, (12, 18, 3))
        h = _hash_of(spark, [a, b])
        assert h["0"] != h["1"]
        assert len(h["0"]) == 64 and set(h["0"]) <= {"0", "1"}

    def test_undecodable_blob_skipped(self, spark):
        df = spark.createDataFrame(
            [("ok", _png(np.zeros((12, 18, 3)))),
             ("junk", b"\x00\x01notanimage")],
            ["url", "payload"])
        rows = image_dhash(df).collect()
        assert {r.url for r in rows} == {"ok"}


class TestAudioFingerprint:
    def _fp(self, spark, tracks):
        import numpy as np
        from pyproj_spark.kernels.riff import encode_wav
        from pyproj_spark.operators.multimodal import audio_fingerprint
        df = spark.createDataFrame(
            [(str(i), encode_wav(np.asarray(s), rate=8000, bits=16))
             for i, s in enumerate(tracks)], ["url", "payload"])
        return {r.url: (r.n_frames, r.fp)
                for r in audio_fingerprint(df).collect()}

    def test_volume_invariant(self, spark):
        import numpy as np
        rng = np.random.RandomState(9)
        base = rng.randint(-4000, 4000, 160)
        h = self._fp(spark, [base, base * 2, base // 2])
        assert h["0"][1] == h["1"][1] == h["2"][1]

    def test_different_audio_differs_and_partial_tail_dropped(self, spark):
        import numpy as np
        rng = np.random.RandomState(10)
        a = rng.randint(-4000, 4000, 165)  # 10 frames + 5-sample tail
        b = rng.randint(-4000, 4000, 160)
        h = self._fp(spark, [a, b])
        assert h["0"][0] == 10 and len(h["0"][1]) == 9
        assert h["0"][1] != h["1"][1]
