"""Engine-wide constants.

These pin down the semantics the reference leaves implicit or
nondeterministic (SURVEY.md §5):

- The reference keeps the top ``MAX_WORD_COUNT = 30`` terms per document
  (``BatchBM25PreMain.java:50``) — :data:`TOP_K_TERMS`.
- The reference's stopword list is a single hardcoded token
  (``BatchBM25PreMain.java:46-48``); ours is a small fixed English list
  matched to the synthetic fixtures.
- The reference never ships the final BM25 scoring formula — it
  materializes TF/DF/doc-length and stops. We complete the capability with
  the standard Robertson–Spärck Jones BM25 (k1=1.2, b=0.75).
- The reference sorts TF ties nondeterministically
  (``BatchBM25PreMain.java:219-227``); we always tiebreak ascending by word.
- The reference computes IDF with *integer* division
  (``util/TfIdfUtil.java:121``); we use true float division
  ``ln(N / (df + 1))`` and declare that in every oracle.
"""

# Top-k terms kept per document (reference MAX_WORD_COUNT, BatchBM25PreMain.java:50).
TOP_K_TERMS = 30

# Stopword list (reference: BatchBM25PreMain.java:46-48, single CJK token).
# Fixed tuple so closures capture a tiny immutable constant.
STOPWORDS = ("the", "a")

# BM25 hyperparameters (Robertson–Spärck Jones; not present in the reference,
# which stops at the sufficient statistics — SURVEY.md §0, §2.4 F3).
BM25_K1 = 1.2
BM25_B = 0.75

# Flagship query terms for the BM25 ranking demo over the `documents` fixture.
DEFAULT_QUERY_TERMS = ("spark", "stream", "join")

# Mersenne prime 2^31-1 — modulus for all deterministic integer hashing
# (minhash, fingerprints).  Chosen so every intermediate product fits in a
# signed 64-bit integer in BOTH Spark and DuckDB (no overflow divergence):
# operands are < 2^31, products < 2^62.
HASH_PRIME = 2_147_483_647

# MinHash / LSH parameters: 64 hash functions, 16 bands x 4 rows
# (s-curve threshold ~ (1/16)^(1/4) ~= 0.5).
MINHASH_NUM_HASHES = 64
MINHASH_BANDS = 16
MINHASH_ROWS_PER_BAND = 4

# SimHash: 60-bit signatures (15 hex chars of md5), 4 bands x 15 bits.
# Pigeonhole: hamming distance <= 3 over 4 bands guarantees at least one
# identical band, so banded candidate generation has 100% recall for d<=3.
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 15
SIMHASH_MAX_HAMMING = 3

# Shingle size for near-duplicate detection (word n-grams).
SHINGLE_SIZE = 3
