"""Deterministic synthetic media corpus for driver/bench surfaces.

The sf documents tables are text-only, so the multimodal operators
(`prose_spark.operators.multimodal`) had no driver-facing input until
this module: it generates seeded image and audio blobs with tiny
dependency-free ENCODERS (PNG via stdlib zlib, BMP BI_RGB, netpbm P6,
RIFF/WAV PCM16) whose output the REAL decoders consume (``fake=False``)
— the same discipline as sources/pages.py (seeded, reproducible on any
machine, no external data).

Encoders live here rather than in tests/ because the driver contract
(`__spark_entry__.queries()`) imports product code only. They are
deliberately minimal single-variant writers — the decode-side torture
coverage (interlacing, subsampling, RLE edge cases, real third-party
files) stays in tests/.

Reference parity note: tsawler/prose has no media layer; this is part of
the LLM-training-pipeline surface the brief adds on top (multimodal
columns as opaque binary + typed metadata).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "encode_png",
    "encode_bmp",
    "encode_ppm",
    "encode_wav_pcm16",
    "generate_image_rows",
    "generate_audio_rows",
    "write_media_parquet",
]


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG writer: 8-bit RGB, non-interlaced, filter 0 rows,
    one zlib IDAT."""
    h, w, _ = img.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + img[y].astype(np.uint8).tobytes() for y in range(h)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def encode_bmp(img: np.ndarray) -> bytes:
    """Minimal BMP writer: 24-bit BI_RGB, bottom-up, 4-byte row pad."""
    h, w, _ = img.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += img[y, :, ::-1].astype(np.uint8).tobytes()  # RGB->BGR
        body += b"\x00" * pad
    data_off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    )
    return header + bytes(body)


def encode_ppm(img: np.ndarray) -> bytes:
    """netpbm P6 (binary RGB, maxval 255)."""
    h, w, _ = img.shape
    return (f"P6\n{w} {h}\n255\n".encode("ascii")
            + img.astype(np.uint8).tobytes())


def encode_wav_pcm16(x: np.ndarray, sr: int) -> bytes:
    """RIFF/WAV writer: mono 16-bit PCM. ``x`` is float in [-1, 1]."""
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _image_array(i: int, seed: int) -> np.ndarray:
    """Seeded HxWx3 uint8: a two-axis gradient + per-image noise, with
    per-index dimensions so width/height metadata is non-constant."""
    rng = np.random.RandomState(seed * 100_003 + i)
    w = 16 + (i % 5) * 4
    h = 12 + (i % 3) * 4
    gy = np.linspace(0, 255, h)[:, None]
    gx = np.linspace(0, 255, w)[None, :]
    base = np.stack(
        [gy + 0 * gx, 0 * gy + gx, (gy + gx) / 2], axis=2
    )
    noise = rng.randint(-20, 21, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


_IMAGE_ENCODERS = (
    ("png", encode_png),
    ("bmp", encode_bmp),
    ("ppm", encode_ppm),
)


def generate_image_rows(n: int, seed: int = 42):
    """Yield (url, format_name, blob) — formats cycle png/bmp/ppm so one
    query exercises three real decoders."""
    for i in range(n):
        name, enc = _IMAGE_ENCODERS[i % len(_IMAGE_ENCODERS)]
        yield (f"media://img/{i:04d}.{name}", name,
               enc(_image_array(i, seed)))


def generate_audio_rows(n: int, seed: int = 42):
    """Yield (url, format_name, blob): mono PCM16 WAV clips — a seeded
    sine (per-index frequency) plus noise, per-index duration."""
    for i in range(n):
        rng = np.random.RandomState(seed * 200_003 + i)
        sr = 8000
        dur = 0.2 + (i % 3) * 0.1
        t = np.arange(int(sr * dur)) / sr
        freq = 180.0 + 37.0 * i
        x = (0.55 * np.sin(2 * np.pi * freq * t)
             + 0.08 * rng.randn(len(t)))
        yield (f"media://wav/{i:04d}.wav", "wav",
               encode_wav_pcm16(np.clip(x, -1, 1), sr))


def write_media_parquet(path: str, n_images: int, n_audio: int,
                        seed: int = 42) -> None:
    """Materialize the media corpus to parquet with pyarrow (no Spark
    involvement — the blobs provably come from the generator, the same
    independence argument as pages' oracle copy)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        {"url": u, "kind": "image", "fmt": f, "blob": b}
        for u, f, b in generate_image_rows(n_images, seed=seed)
    ] + [
        {"url": u, "kind": "audio", "fmt": f, "blob": b}
        for u, f, b in generate_audio_rows(n_audio, seed=seed)
    ]
    schema = pa.schema([
        ("url", pa.string()), ("kind", pa.string()),
        ("fmt", pa.string()), ("blob", pa.binary()),
    ])
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), path)
