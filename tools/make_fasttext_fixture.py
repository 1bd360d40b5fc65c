"""Generate tests/golden/tiny_fasttext.bin — a small seeded DENSE
fastText model in the published .bin layout (functions/fasttext_io.py),
used by the ``encoding_fasttext`` query and its golden oracle.

Vocabulary = the testdata's core word set (the gazetteer surfaces +
relation lexicon + frequent fillers), so most tokens hit vocab rows and
the rest exercise the subword path.

Usage: python tools/make_fasttext_fixture.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from bioner_ray.functions.fasttext_io import write_fasttext_bin  # noqa: E402

OUT = "/root/repo/tests/golden/tiny_fasttext.bin"
DIM, BUCKET, SEED = 16, 256, 20260818

VOCAB = sorted(
    set(
        "customer table row column vector key window line part batch dup "
        "join merge filter sort scan group hash the a of to and in is on "
        "data value with for query index".split()
    )
)


def main():
    rng = np.random.default_rng(SEED)
    mat = rng.normal(0.0, 0.3, (len(VOCAB) + BUCKET, DIM)).astype(np.float32)
    write_fasttext_bin(OUT, VOCAB, mat, bucket=BUCKET, minn=3, maxn=5)
    print(f"wrote {OUT}: {len(VOCAB)} words, dim {DIM}, bucket {BUCKET}")


if __name__ == "__main__":
    main()
