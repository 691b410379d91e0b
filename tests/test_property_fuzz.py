"""Property-based fuzzing (hypothesis) for the cross-engine primitives —
the components whose guarantee is "bit-identical in any engine" must hold
for arbitrary inputs, not just the fixture vocabulary."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_bm25_spark.functions.pnm import pnm_encode, pnm_pixels, pnm_resize

# ---------------------------------------------------------------------------
# Netpbm codec: decode(encode(x)) == x for any uint8 image
# ---------------------------------------------------------------------------


@st.composite
def images(draw):
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    ch = draw(st.sampled_from([1, 3]))
    data = draw(
        st.binary(min_size=h * w * ch, max_size=h * w * ch)
    )
    a = np.frombuffer(data, dtype=np.uint8)
    return a.reshape((h, w) if ch == 1 else (h, w, ch))


@settings(max_examples=60, deadline=None)
@given(images())
def test_pnm_roundtrip_any_image(px):
    assert np.array_equal(pnm_pixels(pnm_encode(px)), px)


@settings(max_examples=30, deadline=None)
@given(images(), st.integers(1, 16))
def test_pnm_resize_shape_and_value_domain(px, target):
    out = pnm_pixels(pnm_resize(pnm_encode(px), target))
    assert out.shape[:2] == (target, target)
    # nearest-neighbor never invents values
    assert set(np.unique(out)) <= set(np.unique(px))


# ---------------------------------------------------------------------------
# POS rule tagger: the Spark Column chain and the generated DuckDB CASE
# agree on ARBITRARY lowercase tokens (the cross-engine oracle contract)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def _pos_twins(spark):
    import duckdb

    from flink_bm25_spark.functions.pos import nature_expr, nature_sql

    con = duckdb.connect()

    def run(words: list[str]) -> None:
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(w,) for w in words], "word string")
        spark_tags = {
            r["word"]: r["nature"]
            for r in df.withColumn("nature", nature_expr(F.col("word"))).collect()
        }
        duck_tags = dict(
            con.execute(
                f"SELECT word, {nature_sql('word')} AS nature FROM "
                "(SELECT unnest($1) AS word)",
                [words],
            ).fetchall()
        )
        assert spark_tags == duck_tags

    return run


def test_pos_twins_agree_on_fuzzed_tokens(_pos_twins):
    # one batched property check (per-example Spark jobs would be minutes):
    # hypothesis-style coverage via an explicit generator sweep
    import random

    rng = random.Random(0xBEEF)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    suffixes = ["", "ly", "ing", "ed", "ous", "ful", "ive", "able", "ible",
                "ic", "al", "er", "tion"]
    words = set()
    for _ in range(400):
        stem_len = rng.randint(1, 8)
        stem = "".join(rng.choice(alphabet) for _ in range(stem_len))
        words.add(stem + rng.choice(suffixes))
    words |= {"1", "42", "007", "the", "a", "early", "being"}
    _pos_twins(sorted(words))


# ---------------------------------------------------------------------------
# FMM segmenter: structural invariants for arbitrary dictionaries/text
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from("被告人民法院判决的北京大学 abz"), max_size=24
    ),
    st.sets(
        st.text(alphabet=st.sampled_from("被告人民法院判决"), min_size=1, max_size=4),
        max_size=6,
    ),
)
def test_fmm_invariants(text, dictionary):
    from flink_bm25_spark.functions.text import _is_cjk, make_fmm_segmenter

    seg = make_fmm_segmenter(dictionary)
    out = seg(text)
    joined = "".join(out)
    # every CJK char of the input appears in the output (possibly twice,
    # via overlapping bigrams); no token is empty; dictionary matches are
    # emitted verbatim
    for ch in text:
        if _is_cjk(ch):
            assert ch in joined
    assert all(tok for tok in out)
    for tok in out:
        if len(tok) > 2 and all(_is_cjk(c) for c in tok):
            assert tok in dictionary


@given(
    st.integers(1, 3),
    st.integers(1, 200),
    st.integers(1000, 96000),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_any_pcm(ch, n, rate, seed):
    import numpy as np

    from flink_bm25_spark.functions.wav import wav_decode, wav_encode

    rng = np.random.RandomState(seed % 2**31)
    x = rng.randint(-32768, 32768, size=(n, ch)).astype(np.int16)
    got_rate, got = wav_decode(wav_encode(x, rate))
    assert got_rate == rate and np.array_equal(got, x)


@given(st.lists(st.binary(min_size=0, max_size=64), max_size=16))
@settings(max_examples=30, deadline=None)
def test_avi_roundtrip_any_frames(frames):
    from flink_bm25_spark.functions.avi import avi_encode, avi_frames

    assert avi_frames(avi_encode(frames)) == frames


@given(
    st.integers(2, 40),   # height
    st.integers(2, 40),   # width
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_pnm_dhash_invariants(h, w, seed):
    """dHash is deterministic, RGB-stacking-invariant (gray == its own
    3-channel re-encode), and lands in [0, 2^64)."""
    from flink_bm25_spark.functions.pnm import pnm_dhash, pnm_encode

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 255, (h, w), dtype=np.uint8)
    g = pnm_dhash(pnm_encode(a))
    assert 0 <= g < (1 << 64)
    assert g == pnm_dhash(pnm_encode(a))  # deterministic
    rgb = np.stack([a] * 3, axis=-1)
    assert pnm_dhash(pnm_encode(rgb)) == g  # luma of gray == gray


@given(st.integers(0, 2**32 - 1), st.integers(1, 120))
@settings(max_examples=60, deadline=None)
def test_winnowing_adjacent_dedupe_equals_distinct(seed, n):
    """Pure-python mirror of the winnowing selection: the rightmost-
    argmin position is monotone in the window start, so adjacent-
    neighbor dedupe == set-distinct — the claim dedup.py's O(m) filter
    relies on (heavy ties forced via a tiny hash alphabet)."""
    import random

    rng = random.Random(seed)
    w = 4
    h = [rng.randint(0, 6) for _ in range(n)]
    picks = []
    for s in range(max(n - w + 1, 1)):
        sl = h[s:s + w]
        mn = min(sl)
        j = max(i for i, v in enumerate(sl) if v == mn)
        picks.append((s + j, mn))
    adj = [p for i, p in enumerate(picks) if i == 0 or p != picks[i - 1]]
    assert len(adj) == len(set(adj)) == len(set(picks))
    # monotonicity itself
    assert all(a[0] <= b[0] for a, b in zip(picks, picks[1:]))


@settings(max_examples=40, deadline=None)
@given(
    st.text(alphabet=st.sampled_from("的一是不了人我在有他"), max_size=24),
    st.sets(
        st.text(
            alphabet=st.sampled_from("的一是不了人我在有他"),
            min_size=2,
            max_size=5,
        ),
        max_size=8,
    ),
)
def test_fmm_full_coverage_is_exact_partition(text, multi_words):
    """The q_cjk_fmm gate contract: when every single char is in the
    dictionary (no OOV fallback can fire), FMM emits an exact partition
    of the input — concatenation identity — and each token is either a
    dictionary word or a single char whose every longer prefix extension
    is absent (greed)."""
    from flink_bm25_spark.functions.text import make_fmm_segmenter

    dictionary = set("的一是不了人我在有他") | multi_words
    seg = make_fmm_segmenter(dictionary)
    out = seg(text)
    assert "".join(out) == text
    pos = 0
    for tok in out:
        assert tok in dictionary
        # greedy: no LONGER dictionary word matches at this position
        for ln in range(len(tok) + 1, min(8, len(text) - pos) + 1):
            assert text[pos : pos + ln] not in dictionary
        pos += len(tok)
