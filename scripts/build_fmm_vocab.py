"""Build the packaged FMM vocabulary from the reference's committed
golden TF files.

The reference tokenizes with the ansj_seg dictionary segmenter
(``pom.xml:21-25``, ``BatchBM25PreMain.java:186``); its repo commits the
per-document ``(word, count)`` outputs under ``output/{pid}.txt`` — i.e.
the segmenter's actual vocabulary on the target domain (Chinese legal
text).  This script extracts every pure-CJK word from those goldens and
writes it to ``flink_bm25_spark/resources/ansj_derived_vocab.txt``, the
dictionary behind :func:`flink_bm25_spark.functions.text.load_reference_vocab`.

Only DATA (the word list) is derived — the segmentation algorithm itself
is the textbook forward-maximum-matching implementation in
``functions/text.py``, not ansj code.

Run: python scripts/build_fmm_vocab.py [golden_dir] [out_path]
"""

from __future__ import annotations

import os
import re
import sys

LINE_RE = re.compile(r"^\((?P<w>.+),(?P<c>\d+)\)$")


def _is_cjk(ch: str) -> bool:
    o = ord(ch)
    return 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF


def main() -> None:
    golden_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/output"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "flink_bm25_spark",
            "resources",
            "ansj_derived_vocab.txt",
        )
    )
    words: set[str] = set()
    n_files = 0
    for name in sorted(os.listdir(golden_dir)):
        if not name.endswith(".txt"):
            continue
        n_files += 1
        with open(os.path.join(golden_dir, name), encoding="utf-8") as f:
            for ln in f:
                m = LINE_RE.match(ln.rstrip("\n"))
                if not m:
                    continue
                w = m.group("w")
                if 1 <= len(w) <= 8 and all(_is_cjk(ch) for ch in w):
                    words.add(w)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(
            "# FMM dictionary derived from the reference's committed ansj\n"
            "# golden TF outputs (output/{pid}.txt, %d files): every\n"
            "# pure-CJK word the reference segmenter emitted on its own\n"
            "# corpus.  Regenerate with scripts/build_fmm_vocab.py.\n"
            % n_files
        )
        for w in sorted(words):
            f.write(w + "\n")
    print(f"wrote {len(words)} words from {n_files} goldens to {out_path}")


if __name__ == "__main__":
    main()
