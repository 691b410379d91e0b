"""Property-based tests (hypothesis) for the cross-engine hash math —
Python reference vs DuckDB SQL twin, no Spark needed (fast).

These pin the portability contract of
:mod:`flink_bm25_spark.functions.hashing`: any string, any engine, same
bits.  Spark-side equality is covered transitively by the oracle-parity
suite (Spark == DuckDB on the fixtures).
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_bm25_spark.config import HASH_PRIME

con = duckdb.connect()

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=80
)


def py_h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_h60_matches_duckdb(s):
    got = con.execute(
        "SELECT ('0x' || substring(md5(?), 1, 15))::BIGINT", [s]
    ).fetchone()[0]
    assert got == py_h60(s)


@settings(max_examples=100, deadline=None)
@given(texts, st.integers(min_value=0, max_value=63))
def test_universal_hash_in_range_and_matches(s, i):
    p = HASH_PRIME
    a = (2_654_435_761 * (i + 1) + 1) % p
    b = (40_503 * (i + 1) + 7) % p
    want = (a * (py_h60(s) % p) + b) % p
    got = con.execute(
        f"SELECT ({a} * (('0x' || substring(md5(?), 1, 15))::BIGINT % {p})"
        f" + {b}) % {p}",
        [s],
    ).fetchone()[0]
    assert got == want
    assert 0 <= got < p


@settings(max_examples=100, deadline=None)
@given(st.lists(texts.filter(lambda s: s != ""), min_size=1, max_size=20))
def test_rolling_fingerprint_matches_duckdb(words):
    p = HASH_PRIME
    acc = 0
    for w in words:
        acc = (acc * 31 + py_h60(w) % p) % p
    got = con.execute(
        f"""SELECT list_reduce(
              list_transform(?, w -> ('0x' || substring(md5(w), 1, 15))::BIGINT % {p}),
              (a, b) -> (a * 31 + b) % {p})""",
        [words],
    ).fetchone()[0]
    assert got == acc


@pytest.mark.parametrize("s", ["", "a", "räksmörgås", "多语言", "x" * 500])
def test_h60_fits_in_60_bits(s):
    assert 0 <= py_h60(s) < (1 << 60)


# ---------------------------------------------------------------------------
# Pure-Python properties of the layout/sketch math (no Spark, fast)
# ---------------------------------------------------------------------------


def py_morton2(a: int, b: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


@given(
    st.integers(min_value=0, max_value=(1 << 16) - 1),
    st.integers(min_value=0, max_value=(1 << 16) - 1),
)
@settings(max_examples=200, deadline=None)
def test_morton_key_is_bijective_and_monotone(a, b):
    # deinterleaving recovers both coordinates (bijection on the domain)
    z = py_morton2(a, b, 16)
    ra = sum(((z >> (2 * i)) & 1) << i for i in range(16))
    rb = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (ra, rb) == (a, b)
    # dominance monotonicity: growing either coordinate grows the key
    if a + 1 < (1 << 16):
        assert py_morton2(a + 1, b, 16) != z
    assert py_morton2(a, b, 16) == z  # determinism


@given(
    st.lists(st.integers(min_value=0, max_value=499), min_size=1, max_size=200),
    st.lists(st.integers(min_value=0, max_value=499), min_size=1, max_size=200),
)
@settings(max_examples=100, deadline=None)
def test_histogram_merge_associative_and_exact(xs, ys):
    # per-bin counting is a homomorphism: hist(A) + hist(B) == hist(A+B)
    def hist(vals, lo=0.0, hi=500.0, nb=64):
        out = [0] * nb
        w = (hi - lo) / nb
        for x in vals:
            out[min(nb - 1, max(0, int(round((x - lo) / w, 9) // 1)))] += 1
        return out

    merged = [a + b for a, b in zip(hist(xs), hist(ys))]
    assert merged == hist(xs + ys)
    assert sum(merged) == len(xs) + len(ys)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=1, max_value=600),
        ),
        min_size=1,
        max_size=120,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=32, max_value=1024),
)
@settings(max_examples=100, deadline=None)
def test_pack_sequences_reference_invariants(docs, budget):
    # reference model of pack_sequences (single shard): contiguous
    # offsets in key order; every sequence except possibly the last per
    # shard holds > 0 docs; seq boundaries at budget multiples
    docs = sorted(docs)
    run, rows = 0, []
    for k, n in docs:
        rows.append((k, n, run, run // budget))
        run += n
    # offsets reconstruct the running sum bijectively
    total = 0
    for k, n, off, seq in rows:
        assert off == total
        assert seq == off // budget
        total += n
    # seq ids are non-decreasing and dense from 0
    seqs = [seq for *_, seq in rows]
    assert seqs == sorted(seqs)
    assert seqs[0] == 0


def py_copies(key: int, w: float, buckets: int = 10_000) -> int:
    whole = int(w)
    frac_thr = int(round((w - whole) * buckets))
    salted = py_h60(f"{key}:t") % buckets
    return whole + (1 if salted < frac_thr else 0)


@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
             max_size=300, unique=True),
    st.floats(min_value=0.0, max_value=4.0, allow_nan=False),
)
@settings(max_examples=50, deadline=None)
def test_temperature_copy_counts_bounds_and_mean(keys, w):
    # every key gets floor(w) or ceil(w) copies; the mean tracks w
    ns = [py_copies(k, w) for k in keys]
    assert all(n in (int(w), int(w) + 1) for n in ns)
    if len(keys) >= 100:
        assert abs(sum(ns) / len(ns) - w) <= 0.55  # hash-slice variance


def py_kmv(rows: list[tuple[int, float]], k: int, seed: str = "kmv:0"):
    """Python twin of sketches.kmv_sketch: bottom-k by (hash, key)."""
    keyed = [
        (py_h60(f"{seed}:{rid}"), str(rid), v) for rid, v in rows
    ]
    return sorted(keyed)[:k]


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
        ),
        max_size=200,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=0, max_value=200),
)
def test_kmv_merge_law_property(rows, k, cut):
    # bottom-k of the merge of any partition == bottom-k of the whole —
    # the law that makes the quantile sketch distributive.
    cut = min(cut, len(rows))
    left, right = rows[:cut], rows[cut:]
    merged = sorted(py_kmv(left, k) + py_kmv(right, k))[:k]
    assert merged == py_kmv(rows, k)
    # idempotent: sketching a sketch changes nothing
    back = [(int(key), v) for _h, key, v in py_kmv(rows, k)]
    assert py_kmv(back, k) == py_kmv(rows, k)
