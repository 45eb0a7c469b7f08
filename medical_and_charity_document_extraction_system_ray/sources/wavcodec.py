"""Pure-python PCM WAV codec (RIFF, stdlib ``struct`` + numpy).

The audio leg of the multimodal surface: real ``.wav`` payloads decode
without an audio library (the compressed formats — mp3/ogg/flac —
remain the documented stub, like tiled TIFF on the image side).

Decode: RIFF/WAVE chunk walk; PCM 8-bit unsigned / 16-bit / 24-bit /
32-bit signed and IEEE float32, any channel count.  Returns
``(samples float32 [n] or [n, ch] in [-1, 1], sample_rate)``.
Encode (fixture generator): 16-bit PCM mono/stereo.
"""

from __future__ import annotations

import struct

import numpy as np


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            audio_fmt, n_ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            fmt = (audio_fmt, n_ch, rate, bits)
        elif cid == b"data":
            samples = body
    if fmt is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, bits = fmt
    if audio_fmt == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(samples, dtype="<f4").astype(np.float32)
    elif audio_fmt == 1 and bits == 16:
        x = np.frombuffer(samples, dtype="<i2").astype(np.float32) / 32768.0
    elif audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(samples, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(samples, dtype="<i4").astype(np.float32) / 2147483648.0
    elif audio_fmt == 1 and bits == 24:
        raw = np.frombuffer(samples, dtype=np.uint8).reshape(-1, 3)
        v = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        x = v.astype(np.float32) / 8388608.0
    else:
        raise ValueError(f"unsupported WAV format {audio_fmt}/{bits}-bit")
    n = x.size - (x.size % n_ch)
    x = x[:n]
    if n_ch > 1:
        x = x.reshape(-1, n_ch)
    return x, rate


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """float [-1, 1] mono (n,) or multi (n, ch) -> 16-bit PCM WAV."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_ch = x.shape[1]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    body = pcm.reshape(-1).tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate,
        sample_rate * n_ch * 2, n_ch * 2, 16,
    )
    out = b"".join(
        [
            b"RIFF",
            struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body)),
            b"WAVE",
            b"fmt ", struct.pack("<I", len(fmt)), fmt,
            b"data", struct.pack("<I", len(body)), body,
        ]
    )
    return out


def frame_signal(x: np.ndarray, frame: int, hop: int) -> np.ndarray:
    """[n] -> [n_frames, frame] zero-copy strided view (drops the tail
    shorter than one frame)."""
    if x.size < frame:
        return np.empty((0, frame), dtype=x.dtype)
    n_frames = 1 + (x.size - frame) // hop
    return np.lib.stride_tricks.as_strided(
        x,
        shape=(n_frames, frame),
        strides=(x.strides[0] * hop, x.strides[0]),
        writeable=False,
    )
