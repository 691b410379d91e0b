"""Netpbm (PGM ``P5`` / PPM ``P6``) codec — a REAL image codec for the
multimodal tier, implemented in pure numpy from the public Netpbm format
specification (no PIL/opencv, which this container does not ship).

This closes the "one real public codec" gap behind the injectable slots
of :mod:`flink_bm25_spark.operators.multimodal`: ``pnm_decode`` plugs
into ``decode_images(decoder=...)`` and ``pnm_resize`` into
``resize_images(resizer=...)``.  Payloads that are not valid PNM raise
``ValueError`` — a real decode failure, not a stub.

Format (binary variants): ASCII header ``P5|P6 <width> <height>
<maxval>`` with ``#`` comments allowed between tokens, a single
whitespace byte, then ``width*height`` (P5) or ``width*height*3`` (P6)
raw samples (maxval ≤ 255 → one byte each).
"""

from __future__ import annotations

import numpy as np

_MAGIC_CHANNELS = {b"P5": 1, b"P6": 3}


def _tokenize_header(payload: bytes) -> tuple[list[bytes], int]:
    """First 4 header tokens (magic, w, h, maxval) and the offset of the
    first raster byte.  Comments run ``#`` → end of line."""
    tokens: list[bytes] = []
    i, n = 0, len(payload)
    while len(tokens) < 4 and i < n:
        c = payload[i : i + 1]
        if c in b" \t\r\n":
            i += 1
        elif c == b"#":
            while i < n and payload[i : i + 1] not in b"\r\n":
                i += 1
        else:
            j = i
            while j < n and payload[j : j + 1] not in b" \t\r\n#":
                j += 1
            tokens.append(payload[i:j])
            i = j
    if len(tokens) < 4 or i >= n:
        raise ValueError("truncated PNM header")
    return tokens, i + 1  # single whitespace byte after maxval


def pnm_pixels(payload: bytes) -> np.ndarray:
    """Decode to ``uint8`` array of shape (h, w) for P5 / (h, w, 3) for P6."""
    tokens, off = _tokenize_header(bytes(payload))
    magic = tokens[0]
    if magic not in _MAGIC_CHANNELS:
        raise ValueError(f"not a binary PNM payload (magic {magic!r})")
    w, h, maxval = (int(t) for t in tokens[1:4])
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported maxval {maxval} (1-byte samples only)")
    ch = _MAGIC_CHANNELS[magic]
    need = w * h * ch
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    if raster.size < need:
        raise ValueError("truncated PNM raster")
    return raster.reshape((h, w) if ch == 1 else (h, w, ch))


def pnm_encode(pixels: np.ndarray, maxval: int = 255) -> bytes:
    """Encode (h, w) → P5 or (h, w, 3) → P6, raw binary variant."""
    a = np.ascontiguousarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        magic = b"P5"
    elif a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"unencodable shape {a.shape}")
    h, w = a.shape[:2]
    return magic + f"\n{w} {h}\n{maxval}\n".encode() + a.tobytes()


def pnm_decode(payload: bytes) -> tuple[int, int, str]:
    """(width, height, fmt) — the ``decode_images`` decoder signature."""
    a = pnm_pixels(payload)
    h, w = a.shape[:2]
    return w, h, "pgm" if a.ndim == 2 else "ppm"


def pnm_resize(payload: bytes, target: int) -> bytes:
    """decode → nearest-neighbor scale to target×target → re-encode —
    the ``resize_images`` resizer signature.  Nearest-neighbor index
    mapping is the standard ``floor((i + 0.5) * src / dst)`` center
    sampling, deterministic and engine-independent."""
    a = pnm_pixels(payload)
    h, w = a.shape[:2]
    rows = np.minimum(((np.arange(target) + 0.5) * h / target).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(target) + 0.5) * w / target).astype(np.int64), w - 1)
    out = a[rows][:, cols]
    return pnm_encode(out)


def pnm_dhash(payload: bytes) -> int:
    """64-bit difference hash (dHash) of a PNM image: grayscale,
    nearest-neighbor downscale to 9×8 (the same center-sampling map as
    :func:`pnm_resize`), then one bit per horizontal gradient sign —
    bit (r*8+c) set iff pixel[r,c] > pixel[r,c+1].  Robust to re-encode,
    mild noise and uniform brightness shifts; deterministic everywhere
    (integer arithmetic only).  Returned as a non-negative int < 2^63
    is NOT guaranteed — callers store it as unsigned-in-BIGINT via the
    signed reinterpretation."""
    a = pnm_pixels(payload)
    if a.ndim == 3:
        # integer luma (ITU-R 601 weights scaled by 256) — no floats
        a = (
            a[:, :, 0].astype(np.int64) * 77
            + a[:, :, 1].astype(np.int64) * 150
            + a[:, :, 2].astype(np.int64) * 29
        ) >> 8
    else:
        a = a.astype(np.int64)
    h, w = a.shape
    rows = np.minimum(((np.arange(8) + 0.5) * h / 8).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(9) + 0.5) * w / 9).astype(np.int64), w - 1)
    g = a[rows][:, cols]
    bits = (g[:, :-1] > g[:, 1:]).astype(np.uint64)
    weights = (1 << np.arange(64, dtype=np.uint64)).reshape(8, 8)
    return int(bits.flatten().reshape(8, 8).astype(np.uint64).__mul__(weights).sum())
