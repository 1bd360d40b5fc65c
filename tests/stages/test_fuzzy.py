"""stages/fuzzy.py — deletion-neighborhood edit-distance-1 join over
the alias_groups pos%4 surface universe."""

from __future__ import annotations

import itertools
import re

import pyarrow as pa


def _ds(texts, parts=3):
    import ray.data as rd

    t = pa.table({"text": pa.array(texts, type=pa.string())})
    return rd.from_arrow(t).repartition(parts)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _surfaces(texts):
    """Reference surface vocab under the pos%4 transform (1-based
    positions over the raw split INCLUDING empties, like the tok CTE)."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        toks = re.split(r"\s+", t.lower())
        for pos, w in enumerate(toks, 1):
            if not w:
                continue
            if pos % 4 == 1:
                s = w + "7"
            elif pos % 4 == 2:
                s = w + "."
            else:
                s = w
            if re.fullmatch(r"[a-z0-9.]+", s):
                vocab[s] += 1
    return vocab


def _ref_pairs(texts):
    vocab = _surfaces(texts)
    out = []
    for a, b in itertools.combinations(sorted(vocab), 2):
        if abs(len(a) - len(b)) <= 1 and _lev(a, b) == 1:
            out.append((a, b, vocab[a], vocab[b]))
    return sorted(out)


def test_matches_bruteforce_reference():
    from bioner_ray.stages.fuzzy import fuzzy_word_pairs

    texts = [
        "cat cot cart act at a b ab abc",
        "word word7 words sword wird",
        "hello hallo hell help held",
        "x1 x2 xx2 1 2 12",
        "same same same same same",
        "punct! dropped? yes",
    ]
    got = fuzzy_word_pairs(_ds(texts)).to_pandas()
    got_t = sorted(
        (r.a, r.b, int(r.ca), int(r.cb)) for r in got.itertuples(index=False)
    )
    want = _ref_pairs(texts)
    assert got_t == want
    assert len(want) > 10  # corpus chosen to exercise many classes


def test_planted_variants_are_mutual_neighbors():
    from bioner_ray.stages.fuzzy import fuzzy_word_pairs

    # one doc repeating a word across positions plants batch/batch7/batch.
    got = fuzzy_word_pairs(_ds(["batch batch batch batch batch"])).to_pandas()
    pairs = {(r.a, r.b) for r in got.itertuples(index=False)}
    assert pairs == {("batch", "batch7"), ("batch", "batch."), ("batch.", "batch7")}


def test_counts_ride_along_and_empty_keeps_schema():
    from bioner_ray.stages.fuzzy import fuzzy_word_pairs

    got = fuzzy_word_pairs(_ds(["dog dig dog dig dog"])).to_pandas()
    # surfaces: dog7(x1? pos1), dig.(pos2), dog(pos3), dig(pos4+... )
    want = _ref_pairs(["dog dig dog dig dog"])
    got_t = sorted((r.a, r.b, int(r.ca), int(r.cb)) for r in got.itertuples(index=False))
    assert got_t == want and len(want) > 0
    empty_ds = fuzzy_word_pairs(_ds(["", "!! ??"]))
    # Dataset-level schema survives an all-empty result (to_pandas on a
    # fully-empty Dataset drops columns by construction — iter_batches
    # yields no batches — so assert on the Dataset schema)
    assert empty_ds.schema().names == ["a", "b", "ca", "cb"]
    assert empty_ds.count() == 0
