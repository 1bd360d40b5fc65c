"""stages/colloc.py — PMI collocation mining."""

from __future__ import annotations

import math
from collections import Counter

import pyarrow as pa


def _ds(texts, parts=3):
    import ray.data as rd

    t = pa.table({"text": pa.array(texts, type=pa.string())})
    return rd.from_arrow(t).repartition(parts)


def _ref(texts, k, min_count):
    uni: Counter = Counter()
    bg: Counter = Counter()
    for t in texts:
        toks = [w for w in t.lower().split() if w]
        uni.update(toks)
        bg.update(zip(toks, toks[1:]))
    total = sum(uni.values())
    out = []
    for (a, b), nab in bg.items():
        if nab < min_count:
            continue
        pmi = math.floor(
            math.log(float(nab * total) / (float(uni[a]) * float(uni[b]))) * 1e6
        )
        out.append((a, b, nab, pmi))
    out.sort(key=lambda x: (-x[3], x[0], x[1]))
    return out[:k]


def test_matches_reference_and_ranks_glued_pair_first():
    from bioner_ray.stages.colloc import collocations

    # "new york" always adjacent (high PMI); "the" everywhere (low PMI)
    texts = [
        "new york is the big apple in the north",
        "i moved to new york last year for the job",
        "new york new york the city so nice",
        "the weather in new york beats the rain",
    ] * 3
    got = [
        tuple(r.values())
        for r in collocations(_ds(texts), k=10, min_count=3).to_pylist()
    ]
    want = _ref(texts, 10, 3)
    assert got == want
    # PMI favors the rarer perfectly-glued pair; the frequent one and
    # the stopword pair rank below it
    assert got[0][:2] == ("big", "apple")
    assert ("new", "york") in {g[:2] for g in got}


def test_support_filter_and_empty():
    from bioner_ray.stages.colloc import collocations

    got = collocations(_ds(["a b", "a b", "c d"]), k=5, min_count=2).to_pylist()
    assert [(r["a"], r["b"], r["n_ab"]) for r in got] == [("a", "b", 2)]
    assert collocations(_ds(["", "solo"]), k=5, min_count=1).num_rows == 0
