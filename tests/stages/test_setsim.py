"""stages/setsim.py — prefix-filtered set-similarity join.

Contract: identical output to dedup.jaccard_pairs (the full
inverted-index plan) on the same input and threshold.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ds(texts, parts=3):
    import ray.data as rd

    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )
    return rd.from_arrow(t).repartition(parts)


def _canon(df):
    return df.sort_values(["a", "b"], ignore_index=True)


TEXTS = [
    "the quick brown fox jumps over the lazy dog today",
    "the quick brown fox jumps over the lazy cat today",   # near-dup of 0
    "the quick brown fox jumps over the lazy dog today",   # exact dup of 0
    "completely different text with other words entirely here now",
    "completely different text with other words entirely here soon",  # near-dup of 3
    "one two three four five six seven eight nine ten",
    "short text",
]


def test_matches_inverted_index_plan():
    from bioner_ray.stages.dedup import jaccard_pairs
    from bioner_ray.stages.setsim import setsim_prefix_pairs

    for t in (0.3, 0.5, 0.8):
        a = _canon(setsim_prefix_pairs(_ds(TEXTS), threshold=t).to_pandas())
        b = _canon(jaccard_pairs(_ds(TEXTS), k=3, threshold=t).to_pandas())
        assert a.columns.tolist() == b.columns.tolist()
        assert len(a) == len(b), f"t={t}: {len(a)} vs {len(b)}"
        assert (a["a"] == b["a"]).all() and (a["b"] == b["b"]).all()
        assert (a["n_common"] == b["n_common"]).all()
        np.testing.assert_array_equal(
            a["jaccard"].to_numpy(), b["jaccard"].to_numpy()
        )


def test_exact_dup_and_threshold_edge():
    from bioner_ray.stages.setsim import setsim_prefix_pairs

    got = setsim_prefix_pairs(_ds(TEXTS), threshold=0.5).to_pandas()
    pairs = {(r.a, r.b): r.jaccard for r in got.itertuples()}
    assert pairs[(0, 2)] == 1.0  # exact duplicate
    assert (0, 1) in pairs and (1, 2) in pairs  # near-dups
    assert (3, 4) in pairs
    assert all(j >= 0.5 for j in pairs.values())
    assert (0, 3) not in pairs  # unrelated docs


def test_identical_singleton_and_empty():
    from bioner_ray.stages.setsim import setsim_prefix_pairs

    # docs shorter than k shingles produce no rows; empty corpus too
    got = setsim_prefix_pairs(_ds(["a b", "a b"]), threshold=0.5).to_pandas()
    assert len(got) == 0
    got = setsim_prefix_pairs(_ds(["", "  "]), threshold=0.5).to_pandas()
    assert len(got) == 0


def test_high_threshold_prunes_but_keeps_borderline():
    from bioner_ray.stages.setsim import setsim_prefix_pairs

    # two docs sharing exactly half their shingles: J = 1/3 < 0.5;
    # and two with J exactly at threshold must be kept (>=)
    texts = [
        "w1 w2 w3 w4 w5 w6",      # shingles: 4
        "w1 w2 w3 w4 x5 x6",      # shares 2 of each's 4 → J = 2/6
    ]
    got = setsim_prefix_pairs(_ds(texts), threshold=1.0 / 3.0).to_pandas()
    assert len(got) == 1 and got["jaccard"].iloc[0] == 1.0 / 3.0
    got = setsim_prefix_pairs(_ds(texts), threshold=0.34).to_pandas()
    assert len(got) == 0
