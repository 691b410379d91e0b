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
