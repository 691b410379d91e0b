"""Multimodal columns — image/audio/video as opaque ``binary`` with typed
metadata (large-scale training-data-pipeline extension).

Design: media bytes are an opaque ``binary`` column; every transformation
is an Arrow-batched ``mapInPandas`` stage so payloads move as columnar
batches, never row-at-a-time through Python pickling.  Partitioning,
schemas and batch shapes are real and tested.  Codecs are injectable:
the default is a clearly-marked deterministic fake (this container ships
no PIL/opencv), and :mod:`flink_bm25_spark.functions.pnm` provides a REAL
pure-numpy Netpbm (PPM/PGM) codec — ``decode_images(decoder=pnm_decode)``
/ ``resize_images(resizer=pnm_resize)`` exercise genuine decode → scale →
re-encode end-to-end.

At 100 TB: binary payloads dominate row size, so operators (a) select only
the columns they need (Parquet never materializes the blob for
metadata-only queries), and (b) repartition by byte-size budget, not row
count, before decode stages (see :func:`repartition_by_bytes`).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = "id long, width int, height int, n_pixels long, fmt string"


def attach_binary_metadata(df: DataFrame, bytes_col: str = "payload") -> DataFrame:
    """Typed metadata for an opaque binary column — pure JVM expressions
    (no decode, blob column pruned away by Catalyst if unused later)."""
    return df.withColumns(
        {
            "n_bytes": F.length(F.col(bytes_col)).cast("long"),
            "digest": F.md5(F.col(bytes_col)),
        }
    )


def _make_fake_decoder() -> Callable[[bytes], tuple[int, int, str]]:
    """Build the STUB decoder as a *nested* function so cloudpickle ships
    it by value — executors never need this package importable.  The fake
    derives (width, height, fmt) deterministically from the md5 digest;
    swap in a real codec via the ``decoder`` argument of
    :func:`decode_images`."""

    def fake(payload: bytes) -> tuple[int, int, str]:
        import hashlib  # noqa: PLC0415 — worker-side import

        h = hashlib.md5(payload).digest()
        return 16 + h[0] % 64, 16 + h[1] % 64, ["png", "jpeg", "webp"][h[2] % 3]

    return fake


# driver-side instance for tests / direct use
fake_decode = _make_fake_decoder()


def decode_images(
    df: DataFrame,
    id_col: str = "id",
    bytes_col: str = "payload",
    decoder: Callable[[bytes], tuple[int, int, str]] | None = None,
) -> DataFrame:
    """Decode stage: binary → (width, height, n_pixels, fmt).

    ``mapInPandas`` so each Arrow batch is decoded in one Python call;
    the decoder loads once per partition (RichFunction-``open()`` pattern).
    Raises ``NotImplementedError`` from real-decoder paths that need a
    codec library; defaults to the deterministic fake.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    decode = decoder or _make_fake_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, hgt, fmt = [], [], []
            for payload in pdf[bytes_col]:
                if payload is None:
                    w.append(None), hgt.append(None), fmt.append(None)
                    continue
                wi, hi, fm = decode(bytes(payload))
                w.append(wi), hgt.append(hi), fmt.append(fm)
            out = pd.DataFrame(
                {
                    "id": pdf["id"],
                    "width": pd.array(w, dtype="Int32"),
                    "height": pd.array(hgt, dtype="Int32"),
                    "fmt": fmt,
                }
            )
            out["n_pixels"] = (out["width"] * out["height"]).astype("Int64")
            yield out[["id", "width", "height", "n_pixels", "fmt"]]

    return df.select(
        F.col(id_col).alias("id"), F.col(bytes_col)
    ).mapInPandas(run, schema=IMAGE_META_SCHEMA)


def extract_features(
    df: DataFrame,
    dim: int = 16,
    id_col: str = "id",
    bytes_col: str = "payload",
) -> DataFrame:
    """Feature-extraction stage: binary → ``array<float>`` embedding.

    Real Spark plumbing (Arrow-batched ``mapInPandas``, fixed-width
    ``array<float>`` schema ready for the ANN tier) around a STUB encoder:
    the fake embedding is derived from the md5 digest, deterministic and
    unit-length, standing in for a vision model forward pass.  Swap the
    nested ``embed`` for a real model (loaded once per partition, outside
    the row loop — the RichFunction-``open()`` pattern) to productionize.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    from pyspark.sql.types import (  # noqa: PLC0415
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # noqa: PLC0415
        import math  # noqa: PLC0415

        def embed(payload: bytes) -> list[float]:
            # digest-seeded pseudo-embedding, L2-normalized
            raw = []
            h = hashlib.md5(payload).digest()
            for i in range(dim):
                b = h[i % len(h)] + i
                raw.append((b % 255) / 127.0 - 1.0)
            n = math.sqrt(sum(x * x for x in raw)) or 1.0
            return [x / n for x in raw]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "embedding": [
                        None if p is None else embed(bytes(p))
                        for p in pdf[bytes_col]
                    ],
                }
            )

    return df.select(F.col(id_col).alias("id"), F.col(bytes_col)).mapInPandas(
        run, schema=schema
    )


RESIZED_SCHEMA = "id long, payload binary, width int, height int"


def resize_images(
    df: DataFrame,
    target: int = 224,
    id_col: str = "id",
    bytes_col: str = "payload",
    resizer: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Resize stage: binary → resized binary + output dims.

    Real Spark plumbing (Arrow-batched ``mapInPandas``, binary-out schema,
    nulls passed through) around a STUB codec: the default ``resizer``
    deterministically re-digests the payload (standing in for
    decode→scale→re-encode) and reports ``target``×``target`` output dims.
    Inject a real ``resizer(payload, target) -> bytes`` (PIL/opencv —
    absent from this container) to productionize; it is constructed once
    per partition, never per row.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if resizer is None:
            import hashlib  # noqa: PLC0415

            def do_resize(payload: bytes, tgt: int) -> bytes:
                # STUB: deterministic stand-in for decode→scale→re-encode —
                # output depends on (payload, target) and differs from the
                # input, like a real re-encode would.
                seed = hashlib.md5(payload + tgt.to_bytes(4, "big")).digest()
                return seed + payload[: max(0, len(payload) - len(seed))]

        else:
            do_resize = resizer
        for pdf in batches:
            out_bytes, w = [], []
            for payload in pdf[bytes_col]:
                if payload is None:
                    out_bytes.append(None), w.append(None)
                    continue
                out_bytes.append(do_resize(bytes(payload), target))
                w.append(target)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "payload": out_bytes,
                    "width": pd.array(w, dtype="Int32"),
                    "height": pd.array(w, dtype="Int32"),
                }
            )

    return df.select(F.col(id_col).alias("id"), F.col(bytes_col)).mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


AUDIO_META_SCHEMA = (
    "id long, sample_rate int, n_channels int, n_samples long, duration_s double"
)


def decode_audio(
    df: DataFrame,
    id_col: str = "id",
    bytes_col: str = "payload",
    decoder: Callable[[bytes], tuple[int, int, int, float]] | None = None,
) -> DataFrame:
    """Audio decode stage: binary → (sample_rate, n_channels, n_samples,
    duration_s).  Unlike the image tier, the DEFAULT decoder is REAL: the
    pure-numpy RIFF/WAVE PCM parser (:mod:`flink_bm25_spark.functions.wav`)
    ships with the engine, so no codec library is required.  Invalid
    payloads raise ``ValueError`` (a real decode failure); NULL payloads
    pass through as NULL metadata.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    if decoder is None:
        from flink_bm25_spark.functions.wav import wav_meta  # noqa: PLC0415

        decoder = wav_meta

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rate, ch, ns, dur = [], [], [], []
            for payload in pdf[bytes_col]:
                if payload is None:
                    rate.append(None), ch.append(None)
                    ns.append(None), dur.append(None)
                    continue
                r, c, n, d = decoder(bytes(payload))
                rate.append(r), ch.append(c), ns.append(n), dur.append(d)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "sample_rate": pd.array(rate, dtype="Int32"),
                    "n_channels": pd.array(ch, dtype="Int32"),
                    "n_samples": pd.array(ns, dtype="Int64"),
                    "duration_s": pd.array(dur, dtype="Float64"),
                }
            )

    return df.select(F.col(id_col).alias("id"), F.col(bytes_col)).mapInPandas(
        run, schema=AUDIO_META_SCHEMA
    )


def extract_audio_features(
    df: DataFrame,
    n_bands: int = 8,
    id_col: str = "id",
    bytes_col: str = "payload",
) -> DataFrame:
    """Audio feature stage: binary → ``array<float>`` of real DSP
    features (rms, zero-crossing rate, spectral centroid, FFT band
    log-energies) — genuine signal processing via the numpy WAV codec,
    Arrow-batched like every multimodal stage.  The fixed-width vector
    feeds the ANN/k-means tier directly."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    from pyspark.sql.types import (  # noqa: PLC0415
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flink_bm25_spark.functions.wav import wav_features  # noqa: PLC0415

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "features": [
                        None
                        if p is None
                        else [float(x) for x in wav_features(bytes(p), n_bands)]
                        for p in pdf[bytes_col]
                    ],
                }
            )

    return df.select(F.col(id_col).alias("id"), F.col(bytes_col)).mapInPandas(
        run, schema=schema
    )


def sample_frames_demuxed(
    df: DataFrame,
    every_n: int = 30,
    id_col: str = "id",
    bytes_col: str = "payload",
    demuxer: Callable[[bytes], list[bytes]] | None = None,
) -> DataFrame:
    """REAL frame-sampling for video payloads: demux the container, keep
    every ``every_n``-th frame chunk, emit ``(id, frame_idx, frame)``.
    The default demuxer is the engine's own AVI/RIFF parser
    (:mod:`flink_bm25_spark.functions.avi`) — no external library.
    Arrow-batched ``mapInPandas``; NULL payloads yield no rows (an empty
    video has no frames)."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    if demuxer is None:
        from flink_bm25_spark.functions.avi import avi_frames  # noqa: PLC0415

        demuxer = avi_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, payload in zip(pdf["id"], pdf[bytes_col]):
                if payload is None:
                    continue
                for j, fr in enumerate(demuxer(bytes(payload))):
                    if j % every_n == 0:
                        ids.append(rid), idxs.append(j), frames.append(fr)
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(F.col(id_col).alias("id"), F.col(bytes_col)).mapInPandas(
        run, schema="id long, frame_idx int, frame binary"
    )


def sample_frames(
    df: DataFrame, every_n: int = 30, id_col: str = "id", bytes_col: str = "payload"
) -> DataFrame:
    """Frame-sampling stage for video payloads — STUB decode, real plumbing:
    emits one row per sampled frame index (1→N via posexplode), frame bytes
    left NULL where a real demuxer would fill them.  For actual containers
    use :func:`sample_frames_demuxed` (real AVI demux)."""
    n_frames = (F.length(F.col(bytes_col)) % 300 + 1).cast("int")
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(idx).alias("pos", "frame_idx"),
    ).select("id", "frame_idx", F.lit(None).cast("binary").alias("frame"))


def repartition_by_bytes(
    df: DataFrame, bytes_col: str = "payload", target_mb: int = 256
) -> DataFrame:
    """Repartition a blob table so each partition carries roughly
    ``target_mb`` of payload — decode stages are sized by bytes, not rows.

    Uses a single total-size scan (cheap: sum of lengths, column-pruned) to
    pick the partition count.
    """
    total = df.select(F.sum(F.length(F.col(bytes_col))).alias("b")).first()["b"] or 0
    parts = max(1, int(total / (target_mb * 1024 * 1024)) + 1)
    return df.repartition(parts)


def image_dhash(
    df: DataFrame,
    id_col: str = "id",
    bytes_col: str = "payload",
    hasher: Callable[[bytes], int] | None = None,
) -> DataFrame:
    """``(id, dhash)`` — 64-bit perceptual difference hash per image
    (:func:`flink_bm25_spark.functions.pnm.pnm_dhash` by default: REAL
    decode via the pure-numpy Netpbm codec, 9×8 luma downscale, one bit
    per horizontal gradient sign).  Arrow-batched ``mapInPandas``; the
    unsigned 64-bit hash is stored in BIGINT via signed
    reinterpretation (band extraction below uses unsigned shifts, so
    the sign bit is just bit 63)."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    if hasher is None:
        from flink_bm25_spark.functions.pnm import pnm_dhash  # noqa: PLC0415

        hasher = pnm_dhash

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf[bytes_col]:
                if payload is None:
                    out.append(None)
                    continue
                h = hasher(bytes(payload))
                out.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame(
                {"id": pdf["id"], "dhash": pd.array(out, dtype="Int64")}
            )

    return df.select(F.col(id_col).alias("id"), F.col(bytes_col)).mapInPandas(
        run, schema="id long, dhash long"
    )


def image_near_dup_pairs(
    hashes: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """``(d1, d2, hamming)`` — image pairs whose dHashes differ in at
    most ``max_hamming`` bits, from a banded equi-join: 4 bands × 16
    bits, so by pigeonhole hamming ≤ 3 leaves at least one band intact
    — candidate generation has EXACTLY 100% recall (the same argument
    as the SimHash tier), and the verify is one ``bit_count(xor)`` per
    candidate.  Input: the ``(id, dhash)`` relation of
    :func:`image_dhash`."""
    legs = []
    for b in range(4):
        legs.append(
            hashes.select(
                "id",
                "dhash",
                F.lit(b).alias("band"),
                # Mask, don't mod: shiftrightunsigned(h, 0) is the identity,
                # and signed % would split a band-0 key L into L vs L-65536
                # for negative (bit-63-set) hashes, silently losing pairs
                # whose only intact band is band 0.
                F.shiftrightunsigned(F.col("dhash"), 16 * b)
                .bitwiseAND(F.lit(0xFFFF))
                .cast("int")
                .alias("bkey"),
            )
        )
    keyed = legs[0]
    for leg in legs[1:]:
        keyed = keyed.unionByName(leg)
    a = keyed.select(
        F.col("id").alias("d1"), F.col("dhash").alias("h1"), "band", "bkey"
    )
    b_ = keyed.select(
        F.col("id").alias("d2"), F.col("dhash").alias("h2"), "band", "bkey"
    )
    cand = (
        a.join(b_, ["band", "bkey"])
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2", "h1", "h2")
        .distinct()
    )
    return cand.select(
        "d1",
        "d2",
        F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))).alias("hamming"),
    ).where(F.col("hamming") <= F.lit(max_hamming))


def video_near_dup_pairs(
    videos: DataFrame,
    min_shared: int = 2,
    every_n: int = 1,
    max_hash_freq: int = 50,
    id_col: str = "id",
    bytes_col: str = "payload",
    hasher: Callable[[bytes], int] | None = None,
) -> DataFrame:
    """``(d1, d2, n_shared)`` — video pairs sharing at least
    ``min_shared`` distinct sampled-frame perceptual hashes: demux
    (:func:`sample_frames_demuxed`, the real AVI parser), dHash each
    sampled frame (:func:`image_dhash`), then the same
    fingerprint-store join discipline as the text winnowing path —
    frame hashes appearing in more than ``max_hash_freq`` videos
    (black frames, title cards, test patterns) are pruned BEFORE the
    self-join, so no join bucket exceeds ``max_hash_freq²``.

    dHash's 9×8 gradient granularity absorbs re-encode noise (equal
    hashes, not merely close — pinned in ``test_multimodal``), so
    exact-match candidate generation suffices; lower ``every_n`` for
    higher recall on cut-heavy content.
    """
    frames = sample_frames_demuxed(
        videos, every_n=every_n, id_col=id_col, bytes_col=bytes_col
    )
    fh = (
        image_dhash(frames, id_col="id", bytes_col="frame", hasher=hasher)
        .where(F.col("dhash").isNotNull())
        .distinct()
    )
    rare = (
        fh.groupBy("dhash")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") <= F.lit(max_hash_freq))
        .select("dhash")
    )
    pruned = fh.join(rare, "dhash")
    a = pruned.select(F.col("id").alias("d1"), "dhash")
    b = pruned.select(F.col("id").alias("d2"), "dhash")
    return (
        a.join(b, "dhash")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= F.lit(min_shared))
    )
