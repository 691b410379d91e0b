"""Multimodal plumbing tests — binary columns, Arrow-batched decode stage
(stubbed codec), byte-budget repartitioning."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from flink_bm25_spark.operators.multimodal import (
    attach_binary_metadata,
    decode_images,
    fake_decode,
    repartition_by_bytes,
    resize_images,
    sample_frames,
)
from flink_bm25_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def blobs(spark):
    # opaque binary payloads synthesized from the documents fixture
    return (
        load_table(spark, "documents", SF_DIR)
        .limit(50)
        .select(
            F.col("doc_id").alias("id"),
            F.encode(F.col("text"), "utf-8").alias("payload"),
        )
    )


def test_metadata_no_decode(spark, blobs):
    out = attach_binary_metadata(blobs)
    row = out.orderBy("id").first()
    assert row.n_bytes > 0 and len(row.digest) == 32


def test_decode_images_stub(spark, blobs):
    out = decode_images(blobs)
    assert out.columns == ["id", "width", "height", "n_pixels", "fmt"]
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == 50
    # deterministic fake: spot-check against a driver-side recomputation
    src = {r.id: bytes(r.payload) for r in blobs.collect()}
    for i, payload in list(src.items())[:5]:
        w, h, fmt = fake_decode(payload)
        assert (rows[i].width, rows[i].height, rows[i].fmt) == (w, h, fmt)
        assert rows[i].n_pixels == w * h


def test_decode_null_payload(spark):
    df = spark.createDataFrame([(1, None)], "id long, payload binary")
    row = decode_images(df).first()
    assert row.width is None and row.n_pixels is None


def test_resize_plumbing_stub_codec(spark, blobs):
    out = resize_images(blobs, target=64)
    rows = out.collect()
    assert out.columns == ["id", "payload", "width", "height"]
    assert len(rows) == blobs.count()
    assert all(r.width == 64 and r.height == 64 for r in rows)
    # deterministic and payload-dependent (stands in for re-encode)
    again = {r.id: bytes(r.payload) for r in resize_images(blobs, target=64).collect()}
    orig = {r.id: bytes(r.payload) for r in blobs.collect()}
    for r in rows:
        assert bytes(r.payload) == again[r.id]
        assert bytes(r.payload) != orig[r.id]
    # a different target produces different bytes (decode→scale→re-encode)
    other = {r.id: bytes(r.payload) for r in resize_images(blobs, target=32).collect()}
    assert any(other[i] != again[i] for i in again)
    # injectable real codec slot
    ident = resize_images(blobs, target=8, resizer=lambda b, t: b)
    assert {r.id: bytes(r.payload) for r in ident.collect()} == orig


def test_resize_null_payload(spark):
    df = spark.createDataFrame([(1, None)], "id long, payload binary")
    row = resize_images(df).first()
    assert row.payload is None and row.width is None


def test_sample_frames_plumbing(spark, blobs):
    out = sample_frames(blobs, every_n=30)
    rows = out.groupBy("id").count().collect()
    assert all(r["count"] >= 1 for r in rows)
    assert out.columns == ["id", "frame_idx", "frame"]


def test_repartition_by_bytes(spark, blobs):
    out = repartition_by_bytes(blobs, target_mb=1)
    assert out.rdd.getNumPartitions() >= 1
    assert out.count() == 50


def test_digest_matches_python_md5(spark, blobs):
    row = attach_binary_metadata(blobs).orderBy("id").first()
    src = blobs.orderBy("id").first()
    assert row.digest == hashlib.md5(bytes(src.payload)).hexdigest()


def test_extract_features_shape_and_determinism(spark, blobs):
    from flink_bm25_spark.operators.multimodal import extract_features

    out = extract_features(blobs, dim=16)
    assert dict(out.dtypes) == {"id": "bigint", "embedding": "array<float>"}
    rows = {r.id: r.embedding for r in out.collect()}
    assert len(rows) == 50
    for emb in rows.values():
        assert len(emb) == 16
        norm = sum(x * x for x in emb) ** 0.5
        assert abs(norm - 1.0) < 1e-5  # unit-length, ANN-tier ready
    again = {r.id: r.embedding for r in extract_features(blobs, dim=16).collect()}
    assert rows == again  # deterministic stub


def test_extract_features_null_payload(spark):
    from flink_bm25_spark.operators.multimodal import extract_features

    df = spark.createDataFrame([(1, None)], "id long, payload binary")
    [r] = extract_features(df).collect()
    assert r.embedding is None


# --- real codec: pure-numpy Netpbm (PPM/PGM) -----------------------------

import numpy as np

from flink_bm25_spark.functions.pnm import (
    pnm_decode,
    pnm_encode,
    pnm_pixels,
    pnm_resize,
)


def _ppm(w, h, seed=0):
    rng = np.random.RandomState(seed)
    return pnm_encode(rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8))


@pytest.fixture(scope="module")
def pnm_blobs(spark):
    rows = [
        (0, _ppm(8, 6, 0)),
        (1, _ppm(33, 17, 1)),
        (2, pnm_encode(np.arange(64, dtype=np.uint8).reshape(8, 8))),  # P5
        (3, None),
    ]
    return spark.createDataFrame(rows, "id long, payload binary")


def test_pnm_roundtrip_and_comments():
    px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    assert np.array_equal(pnm_pixels(pnm_encode(px)), px)
    # header comments are part of the public format
    commented = b"P6 # rgb\n# size next\n4 2\n255\n" + px.tobytes()
    assert np.array_equal(pnm_pixels(commented), px)


def test_pnm_rejects_garbage():
    for bad in (b"", b"JFIF....", b"P6\n4 2\n255\n\x00"):
        with pytest.raises(ValueError):
            pnm_pixels(bad)


def test_decode_images_real_codec(spark, pnm_blobs):
    out = {
        r.id: r
        for r in decode_images(pnm_blobs, decoder=pnm_decode).collect()
    }
    assert (out[0].width, out[0].height, out[0].fmt) == (8, 6, "ppm")
    assert (out[1].width, out[1].height, out[1].n_pixels) == (33, 17, 561)
    assert (out[2].width, out[2].height, out[2].fmt) == (8, 8, "pgm")
    assert out[3].width is None and out[3].fmt is None


def test_resize_real_codec_roundtrips(spark, pnm_blobs):
    out = {
        r.id: r
        for r in resize_images(
            pnm_blobs.where("id in (0, 1)"), target=4, resizer=pnm_resize
        ).collect()
    }
    for i in (0, 1):
        px = pnm_pixels(bytes(out[i].payload))
        assert px.shape == (4, 4, 3)
        assert (out[i].width, out[i].height) == (4, 4)
    # distributed result == local reference resize
    local = pnm_pixels(pnm_resize(_ppm(8, 6, 0), 4))
    assert np.array_equal(pnm_pixels(bytes(out[0].payload)), local)


def test_nearest_neighbor_preserves_constant_regions():
    # a half-black/half-white image stays half/half under NN resize
    px = np.zeros((10, 10, 3), dtype=np.uint8)
    px[:, 5:, :] = 255
    small = pnm_pixels(pnm_resize(pnm_encode(px), 4))
    assert np.array_equal(small[:, :2, :], np.zeros((4, 2, 3), np.uint8))
    assert np.array_equal(small[:, 2:, :], np.full((4, 2, 3), 255, np.uint8))


# ---------------------------------------------------------------------------
# REAL audio codec: RIFF/WAVE PCM16 (functions/wav.py) + audio stages
# ---------------------------------------------------------------------------

from flink_bm25_spark.functions.wav import (  # noqa: E402
    wav_decode,
    wav_encode,
    wav_features,
    wav_meta,
)
from flink_bm25_spark.operators.multimodal import (  # noqa: E402
    decode_audio,
    extract_audio_features,
)


def _sine_wav(freq_hz: float, rate: int = 8000, secs: float = 0.5, ch: int = 1):
    t = np.arange(int(rate * secs)) / rate
    x = (np.sin(2 * np.pi * freq_hz * t) * 20000).astype(np.int16)
    if ch > 1:
        x = np.stack([x] * ch, axis=1)
    return wav_encode(x, rate)


def test_wav_roundtrip_and_chunk_walk():
    x = (np.sin(np.arange(1000) / 7.0) * 30000).astype(np.int16)
    payload = wav_encode(x, 16000)
    rate, back = wav_decode(payload)
    assert rate == 16000 and back.shape == (1000, 1)
    assert np.array_equal(back[:, 0], x)
    # chunk walking: an extra LIST chunk before data must be skipped
    import struct
    head, data_chunk = payload[:36], payload[36:]
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = (
        b"RIFF"
        + struct.pack("<I", len(payload[8:]) + len(extra))
        + payload[8:36]
        + extra
        + data_chunk
    )
    rate2, back2 = wav_decode(spliced)
    assert rate2 == 16000 and np.array_equal(back2, back)


def test_wav_rejects_garbage():
    for bad in (b"", b"RIFFxxxxWAVE", b"not audio at all" * 10):
        with pytest.raises(ValueError):
            wav_decode(bad)


def test_wav_meta_and_stereo():
    payload = _sine_wav(440, rate=8000, secs=0.25, ch=2)
    rate, ch, n, dur = wav_meta(payload)
    assert (rate, ch, n) == (8000, 2, 2000)
    assert abs(dur - 0.25) < 1e-9


def test_wav_features_are_real_dsp():
    lo, hi = wav_features(_sine_wav(200)), wav_features(_sine_wav(1600))
    # spectral centroid tracks the tone frequency (within FFT leakage)
    assert abs(lo[2] - 200) < 40 and abs(hi[2] - 1600) < 80
    # zero-crossing rate of a sine ≈ 2f/rate
    assert abs(lo[1] - 2 * 200 / 8000) < 0.01
    assert abs(hi[1] - 2 * 1600 / 8000) < 0.02
    # band energies: the energetic band moves up with frequency
    assert int(np.argmax(lo[3:])) < int(np.argmax(hi[3:]))


def test_decode_audio_real_default(spark):
    rows = [
        (1, bytearray(_sine_wav(440, secs=0.5))),
        (2, bytearray(_sine_wav(880, rate=16000, secs=0.25, ch=2))),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r.id: r for r in decode_audio(df).collect()}
    assert out[1].sample_rate == 8000 and out[1].n_channels == 1
    assert out[1].n_samples == 4000 and abs(out[1].duration_s - 0.5) < 1e-9
    assert out[2].sample_rate == 16000 and out[2].n_channels == 2
    assert out[3].sample_rate is None


def test_extract_audio_features_feeds_ann_tier(spark):
    rows = [
        (1, bytearray(_sine_wav(300))),
        (2, bytearray(_sine_wav(300))),
        (3, bytearray(_sine_wav(2400))),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    feats = extract_audio_features(df, n_bands=8)
    got = {r.id: r.features for r in feats.collect()}
    assert got[4] is None
    assert len(got[1]) == 11  # rms, zcr, centroid + 8 bands
    assert got[1] == got[2]  # deterministic
    # identical tones match exactly; distant tones separate on the BAND
    # profile (the raw vector's centroid component dominates a plain
    # cosine — standardize features before feeding the ANN tier)
    import math
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))
    assert cos(got[1], got[2]) > 0.999999
    assert cos(got[1][3:], got[3][3:]) < 0.5
    assert got[1][2] != got[3][2]  # centroids track the tones


# ---------------------------------------------------------------------------
# REAL video demux: AVI/RIFF (functions/avi.py) + frame sampling
# ---------------------------------------------------------------------------

from flink_bm25_spark.functions.avi import avi_encode, avi_frames  # noqa: E402
from flink_bm25_spark.operators.multimodal import sample_frames_demuxed  # noqa: E402


def test_avi_roundtrip_and_rejects_garbage():
    frames = [b"frame-%d" % i for i in range(7)]  # odd lengths force padding
    assert avi_frames(avi_encode(frames)) == frames
    for bad in (b"", b"RIFF\x00\x00\x00\x00WAVE", b"junk" * 8):
        with pytest.raises(ValueError):
            avi_frames(bad)


def test_sample_frames_demuxed_real_default(spark):
    vids = [
        (1, bytearray(avi_encode([b"f%02d" % i for i in range(10)]))),
        (2, bytearray(avi_encode([b"solo"]))),
        (3, None),
    ]
    df = spark.createDataFrame(vids, "id long, payload binary")
    out = sample_frames_demuxed(df, every_n=3).collect()
    got = {(r.id, r.frame_idx): bytes(r.frame) for r in out}
    assert got == {
        (1, 0): b"f00", (1, 3): b"f03", (1, 6): b"f06", (1, 9): b"f09",
        (2, 0): b"solo",
    }


def test_image_dhash_near_dup_via_real_codec(spark):
    """End-to-end perceptual dedup on REAL Netpbm images: a noisy
    re-encode pairs with its source (hamming ~0), unrelated images do
    not; banding recall is exact for hamming <= 3 (pigeonhole)."""
    import numpy as np

    from flink_bm25_spark.functions.pnm import pnm_dhash, pnm_encode
    from flink_bm25_spark.operators.multimodal import (
        image_dhash,
        image_near_dup_pairs,
    )

    rng = np.random.default_rng(11)
    base = rng.integers(0, 255, (24, 24), dtype=np.uint8)
    noisy = np.clip(base.astype(np.int16) + rng.integers(-3, 4, base.shape), 0, 255).astype(np.uint8)
    rgb = np.stack([base] * 3, axis=-1)  # same content as P6
    rows = [
        (1, bytearray(pnm_encode(base))),
        (2, bytearray(pnm_encode(noisy))),
        (3, bytearray(pnm_encode(rng.integers(0, 255, (24, 24), dtype=np.uint8)))),
        (4, bytearray(pnm_encode(rgb))),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    hashes = image_dhash(df)
    got = {r.id: r.dhash for r in hashes.collect()}
    assert got[5] is None
    # the driver-side hash agrees with the distributed one (signed reinterp)
    h1 = pnm_dhash(pnm_encode(base))
    assert got[1] == (h1 - (1 << 64) if h1 >= (1 << 63) else h1)

    pairs = {
        (r.d1, r.d2): r.hamming
        for r in image_near_dup_pairs(hashes.where("dhash is not null")).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    # grayscale and its RGB re-encode are perceptually identical
    assert (1, 4) in pairs and pairs[(1, 4)] == 0
    assert all({d1, d2} != {1, 3} and {d1, d2} != {2, 3} for d1, d2 in pairs)


def test_image_dhash_banding_recall_exhaustive(spark):
    """Every hash pair with hamming <= 3 MUST be found (pigeonhole on
    4x16-bit bands): check against brute force on a synthetic batch of
    close and far hashes, including sign-bit (bit 63) flips."""
    import itertools
    import random

    from flink_bm25_spark.operators.multimodal import image_near_dup_pairs

    rng = random.Random(2)
    hs = [rng.getrandbits(64) for _ in range(12)]
    hs += [hs[0] ^ 1, hs[0] ^ (1 << 63), hs[1] ^ 0b111, hs[2] ^ ((1 << 62) | 3)]
    signed = [h - (1 << 64) if h >= (1 << 63) else h for h in hs]
    df = spark.createDataFrame(list(enumerate(signed)), "id long, dhash long")
    got = {(r.d1, r.d2) for r in image_near_dup_pairs(df).collect()}
    want = {
        (i, j)
        for i, j in itertools.combinations(range(len(hs)), 2)
        if bin(hs[i] ^ hs[j]).count("1") <= 3
    }
    assert got == want and want


def test_image_dhash_band0_sign_safe(spark):
    """Regression (r02 advice): a positive/negative hash pair agreeing on
    bits 0-15 whose <=3 differing bits all lie in bands 1-3 (incl. bit
    63) has band 0 as its ONLY intact band.  Signed ``% 65536`` band
    keys split that key into L vs L-65536 and silently drop the pair;
    the mask-based key must keep it."""
    from flink_bm25_spark.operators.multimodal import image_near_dup_pairs

    h1 = 5
    h2 = 5 | (1 << 63) | (1 << 47) | (1 << 31)  # hamming 3, bands 1-3 dirty
    signed = [h - (1 << 64) if h >= (1 << 63) else h for h in (h1, h2)]
    df = spark.createDataFrame(list(enumerate(signed)), "id long, dhash long")
    got = {(r.d1, r.d2, r.hamming) for r in image_near_dup_pairs(df).collect()}
    assert got == {(0, 1, 3)}


def test_video_near_dup_via_shared_frame_hashes(spark):
    """Real end-to-end video dedup: AVI demux -> frame dHash -> shared
    fingerprint join.  A re-cut sharing frames pairs with its source;
    a ubiquitous black frame does not pair otherwise-unrelated videos."""
    import numpy as np

    from flink_bm25_spark.functions.avi import avi_encode
    from flink_bm25_spark.functions.pnm import pnm_encode
    from flink_bm25_spark.operators.multimodal import video_near_dup_pairs

    rng = np.random.default_rng(7)
    def img(seed=None, arr=None):
        if arr is None:
            arr = rng.integers(0, 255, (16, 16), dtype=np.uint8)
        return pnm_encode(arr)

    black = pnm_encode(np.zeros((16, 16), dtype=np.uint8))
    shared = [img() for _ in range(3)]
    v1 = avi_encode([black] + shared + [img()])
    v2 = avi_encode([black] + shared[1:] + [img(), img()])   # shares 2 frames
    v3 = avi_encode([black] + [img() for _ in range(3)])     # only black shared
    videos = spark.createDataFrame(
        [(1, bytearray(v1)), (2, bytearray(v2)), (3, bytearray(v3))],
        "id long, payload binary",
    )
    pairs = {
        (r.d1, r.d2): r.n_shared
        for r in video_near_dup_pairs(videos, min_shared=2, max_hash_freq=2).collect()
    }
    assert pairs == {(1, 2): 2}  # black frame (freq 3 > cap 2) pruned


def test_custom_id_col_plumbing(spark):
    """Regression (r02 advice): every mapInPandas op aliases id_col to
    'id' before the worker runs, so a non-default id_col (doc_id) must
    not KeyError inside the Arrow batch."""
    from flink_bm25_spark.functions.pnm import pnm_encode
    from flink_bm25_spark.operators.multimodal import (
        decode_audio,
        decode_images,
        image_dhash,
        resize_images,
    )
    from flink_bm25_spark.functions.wav import wav_encode

    img = pnm_encode([[0, 255], [255, 0]])
    wav = wav_encode([0, 1000, -1000, 0], sample_rate=8000)
    df = spark.createDataFrame(
        [(7, bytearray(img), bytearray(wav))],
        "doc_id long, img binary, audio binary",
    )
    assert image_dhash(df, bytes_col="img", id_col="doc_id").count() == 1
    assert decode_images(df, bytes_col="img", id_col="doc_id").count() == 1
    assert decode_audio(df, bytes_col="audio", id_col="doc_id").count() == 1
    assert (
        resize_images(df, target=1, bytes_col="img", id_col="doc_id").count()
        == 1
    )
