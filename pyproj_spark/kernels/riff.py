"""RIFF-container codecs — WAV (PCM audio) and AVI (MJPG video) —
stdlib + numpy only.

Together with ``kernels/jpeg.py`` and the PNG decode in
``operators/multimodal.py`` this makes the full multimodal decode
surface real: audio sample extraction (PCM WAV), video frame sampling
(AVI with Motion-JPEG streams, each sampled frame decoded by the
baseline-JPEG decoder). Matching fixture ENCODERS synthesize
deterministic bitstreams for tests and oracle queries. Compressed
audio (MP3/AAC) and inter-frame video codecs (H.264 …) genuinely need
external libraries and stay stubbed in ``decode_features``.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ WAV


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV file to (samples, sample_rate); samples is an
    (n, channels) int32 array of the raw PCM values (8-bit unsigned
    re-centered to signed, 16/24/32-bit signed little-endian). Raises
    ValueError on malformed input, NotImplementedError for
    non-PCM (compressed) formats."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos, n = 12, len(b)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = b[pos:pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4:pos + 8])
        body = b[pos + 8:pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _byte_rate, _align, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(
            f"compressed WAV format {audio_fmt} not supported (PCM only)")
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(
            np.int32) - 128
    elif bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.int32)
    elif bits == 24:
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        samples = (raw[:, 0].astype(np.int32)
                   | (raw[:, 1].astype(np.int32) << 8)
                   | (raw[:, 2].astype(np.int32) << 16))
        samples = np.where(samples >= 1 << 23, samples - (1 << 24),
                           samples)
    elif bits == 32:
        samples = np.frombuffer(data, dtype="<i4").astype(np.int32)
    else:
        raise NotImplementedError(f"{bits}-bit WAV not supported")
    if channels > 1:
        samples = samples[:len(samples) // channels * channels]
    return samples.reshape(-1, channels), rate


def encode_wav(samples: np.ndarray, rate: int = 16000,
               bits: int = 16) -> bytes:
    """Encode an (n,) or (n, channels) integer array as PCM WAV —
    deterministic fixture encoder for the decode path."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    if bits == 16:
        payload = s.astype("<i2").tobytes()
    elif bits == 8:
        payload = (s + 128).astype(np.uint8).tobytes()
    elif bits == 24:
        u = (s.astype(np.int64) & 0xFFFFFF).astype(np.uint32)
        raw = np.zeros((u.size, 3), dtype=np.uint8)
        flat = u.reshape(-1)
        raw[:, 0] = flat & 0xFF
        raw[:, 1] = (flat >> 8) & 0xFF
        raw[:, 2] = (flat >> 16) & 0xFF
        payload = raw.tobytes()
    elif bits == 32:
        payload = s.astype("<i4").tobytes()
    else:
        raise ValueError("fixture encoder supports 8/16/24/32-bit PCM")
    align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * align,
                      align, bits)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ------------------------------------------------------------------ AVI


def avi_frames(b: bytes) -> tuple[list[bytes], float]:
    """Parse an AVI container and return (frame_payloads, fps). Only
    the video stream's compressed chunks ('##dc') are returned, in
    order; decoding is the caller's job (MJPG frames feed
    kernels/jpeg.py decode_jpeg). Raises ValueError on malformed
    input."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    fps = 0.0
    frames: list[bytes] = []

    def walk(pos: int, end: int):
        nonlocal fps
        while pos + 8 <= end:
            cid = b[pos:pos + 4]
            (clen,) = struct.unpack("<I", b[pos + 4:pos + 8])
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + clen)
            elif cid == b"avih" and clen >= 4:
                (usec_per_frame,) = struct.unpack(
                    "<I", b[body_start:body_start + 4])
                if usec_per_frame:
                    fps = 1e6 / usec_per_frame
            elif cid[2:4] == b"dc":
                frames.append(b[body_start:body_start + clen])
            pos = body_start + clen + (clen & 1)

    walk(12, len(b))
    return frames, fps


def encode_avi_mjpg(jpeg_frames: list[bytes], fps: float = 10.0
                    ) -> bytes:
    """Assemble pre-encoded JPEG frames into a minimal valid AVI
    (MJPG fourcc) — deterministic fixture encoder for avi_frames."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    def lst(four: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", four + body)

    avih = struct.pack("<14I", int(1e6 / fps), 0, 0, 0x10,
                       len(jpeg_frames), 0, 1, 0, 0, 0, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, int(fps), 0,
        len(jpeg_frames), 0, 0, 0) + struct.pack("<4H", 0, 0, 0, 0))
    strf = struct.pack("<IiiHH4sIiiII", 40, 0, 0, 1, 24, b"MJPG",
                       0, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh)
                     + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f)
                                 for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
