"""Measure the near-dup family's candidate recall/precision against
exact ground truth at sf0.01 — the empirical check behind the banding
math quoted in docstrings (MinHash 16×4: miss ≈ (1-j⁴)¹⁶; SimHash ≤3
bits: pigeonhole-exact; winnowing: guaranteed fingerprint per shared
(w+k-1)-token run).

Ground truth: exact n-gram Jaccard ≥ 0.8 over all pairs (the uncapped
discovery path — affordable at this sf).  Each tier's pair set is
compared as candidate recall (found / true) and precision at its own
acceptance rule.

Run: python scripts/dedup_recall.py   # prints a markdown table
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from flink_bm25_spark.operators.dedup import (
        jaccard_pairs,
        minhash_dedup_pairs,
        shingles,
        simhash_pairs,
        simhash_signatures_from_tokens,
        winnowing_dedup_pairs,
    )
    from flink_bm25_spark.operators.tokenize import filter_stopwords, tokenize
    from flink_bm25_spark.session import get_spark
    from flink_bm25_spark.sources.tables import load_documents

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="dedup_recall")
    docs = load_documents(spark, sf_dir).cache()

    truth = {
        (r.d1, r.d2)
        for r in jaccard_pairs(
            shingles(docs), threshold=0.8, max_gram_df=None
        ).collect()
    }

    tiers = {
        "minhash_lsh (j>=0.8 verify)": {
            (r.d1, r.d2) for r in minhash_dedup_pairs(docs, 0.8).collect()
        },
        "simhash (hamming<=3)": {
            (r.d1, r.d2)
            for r in simhash_pairs(
                simhash_signatures_from_tokens(filter_stopwords(tokenize(docs)))
            ).collect()
        },
        "winnowing (>=2 shared fps)": {
            (r.d1, r.d2) for r in winnowing_dedup_pairs(docs).collect()
        },
    }

    print(f"\nexact Jaccard>=0.8 ground truth: {len(truth)} pairs\n")
    print("| tier | pairs | recall vs truth | extra (own rule) |")
    print("|---|---|---|---|")
    for name, got in tiers.items():
        hit = len(got & truth)
        rec = hit / len(truth) if truth else 1.0
        print(f"| {name} | {len(got)} | {rec:.3f} ({hit}/{len(truth)}) | {len(got - truth)} |")
    spark.stop()


if __name__ == "__main__":
    main()
