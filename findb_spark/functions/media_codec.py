"""Pure-Python/numpy media codecs: PPM (P6) images and WAV (RIFF PCM16)
audio.

These are REAL byte-format codecs — actual header parse + payload decode —
chosen precisely because they need no external media library (the container
has no PIL/ffmpeg): P6 is `b"P6\\n<w> <h>\\n255\\n" + RGB bytes`, WAV is a
44-byte RIFF header + little-endian int16 samples. The Spark operators in
ops/multimodal.py wrap these in Arrow-batched mapInPandas; swapping in a
JPEG/OPUS codec changes only these two dozen lines, none of the Spark
plumbing.

Synthetic content is a closed-form integer function of (doc_id, position),
so a DuckDB oracle can recompute features *from the formula* while Spark
recomputes them *from the decoded bytes* — the parity check covers the
entire encode → bytes → decode → feature path end-to-end with exact
integer math.
"""

from __future__ import annotations

import struct

import numpy as np

# --- deterministic synthetic content (the "sensor") -----------------------


def image_dims(doc_id: int) -> tuple[int, int]:
    return 8 + doc_id % 5, 6 + doc_id % 4  # (width, height)


def image_pixels(doc_id: int) -> np.ndarray:
    """(h, w, 3) uint8 — pixel(ch, r, c) = (doc_id*31 + r*17 + c*13 + ch*7) % 256."""
    w, h = image_dims(doc_id)
    r = np.arange(h).reshape(h, 1, 1)
    c = np.arange(w).reshape(1, w, 1)
    ch = np.arange(3).reshape(1, 1, 3)
    return ((doc_id * 31 + r * 17 + c * 13 + ch * 7) % 256).astype(np.uint8)


N_SAMPLES = 256
SAMPLE_RATE = 8000


def audio_samples(doc_id: int) -> np.ndarray:
    """int16[N_SAMPLES] — s_i = ((doc_id*7349 + i*4799) % 65536) - 32768."""
    i = np.arange(N_SAMPLES, dtype=np.int64)
    return ((doc_id * 7349 + i * 4799) % 65536 - 32768).astype(np.int16)


# --- PPM (P6) -------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Parse the P6 header and return the (h, w, 3) uint8 pixel array."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, whitespace, width, height, maxval, single whitespace
    parts = payload.split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    maxval = int(parts[2])
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    return np.frombuffer(parts[3], dtype=np.uint8, count=h * w * 3).reshape(h, w, 3)


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (floor index mapping — deterministic)."""
    h, w, _ = pixels.shape
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return pixels[rows][:, cols]


# --- WAV (RIFF PCM16 mono) ------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = SAMPLE_RATE) -> bytes:
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse the RIFF header; return (sample_rate, int16 samples)."""
    (riff, _, wave, fmt, fmt_len, codec, n_ch, rate, _, _, bits, data, data_len) = (
        struct.unpack("<4sI4s4sIHHIIHH4sI", payload[:44])
    )
    if riff != b"RIFF" or wave != b"WAVE" or codec != 1 or bits != 16 or n_ch != 1:
        raise ValueError("unsupported WAV layout")
    return rate, np.frombuffer(payload[44 : 44 + data_len], dtype="<i2")
