"""Dedup operators: golden behavior on a corpus with planted dups.

Fixture: 8 base docs, doc 100 = exact copy of doc 0, doc 101 = near-dup
of doc 1 (one token changed), doc 102 = unrelated.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from bioner_ray.stages.dedup import (
    exact_dedup,
    exact_dedup_filter,
    jaccard_pairs,
    minhash_dedup_pairs,
    minhash_signature,
    _minhash_params,
    shingle_set,
    simhash64,
    simhash_pairs,
)

BASE = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "one two three four five six seven eight nine ten eleven twelve",
    "red orange yellow green blue indigo violet crimson amber teal",
    "north south east west up down left right front back",
    "apple banana cherry date elderberry fig grape honeydew kiwi lemon",
    "table chair lamp sofa shelf desk stool bench cabinet drawer",
    "run walk jump swim climb crawl sprint stroll march dash",
    "wind rain snow hail sleet fog mist storm thunder lightning",
]


@pytest.fixture(scope="module")
def corpus():
    texts = list(BASE)
    ids = list(range(len(BASE)))
    texts.append(BASE[0])  # exact dup of 0
    ids.append(100)
    texts.append(BASE[1].replace("seven", "SEVEN7"))  # near dup of 1
    ids.append(101)
    texts.append("completely different words entirely here now")
    ids.append(102)
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts})


class TestExactDedup:
    def test_groups_and_representatives(self, corpus):
        out = exact_dedup(rd.from_arrow(corpus)).to_pandas()
        assert len(out) == 10  # 11 docs, one exact pair
        dup = out[out.n_copies == 2]
        assert len(dup) == 1 and dup.iloc[0].keep_id == 0

    def test_filter_form_drops_copies(self, corpus):
        kept = exact_dedup_filter(rd.from_arrow(corpus)).to_pandas()
        assert len(kept) == 10
        assert 100 not in set(kept.doc_id)
        assert 0 in set(kept.doc_id)


class TestJaccard:
    def test_exact_pair_is_found(self, corpus):
        out = jaccard_pairs(rd.from_arrow(corpus), threshold=0.9).to_pandas()
        assert {(0, 100)} == set(zip(out.a, out.b))
        assert out.iloc[0].jaccard == 1.0

    def test_near_pair_at_lower_threshold(self, corpus):
        out = jaccard_pairs(rd.from_arrow(corpus), threshold=0.3).to_pandas()
        pairs = set(zip(out.a, out.b))
        assert (0, 100) in pairs and (1, 101) in pairs
        near = out[(out.a == 1) & (out.b == 101)].iloc[0]
        # 12 tokens → 10 shingles; one changed token kills 3 shingles
        assert near.n_common == 7
        assert near.jaccard == pytest.approx(7 / 13)

    def test_stop_shingle_cap_drops_group(self, corpus):
        out = jaccard_pairs(rd.from_arrow(corpus), threshold=0.9, max_shingle_docs=1)
        assert out.count() == 0


class TestMinhash:
    def test_signature_estimates_jaccard(self):
        a, b = _minhash_params(256)
        s1 = minhash_signature(BASE[1].split(), a, b)
        s2 = minhash_signature(BASE[1].replace("seven", "x").split(), a, b)
        est = float((s1 == s2).mean())
        true = 7 / 13
        assert abs(est - true) < 0.15
        # identical inputs → identical signatures (determinism)
        assert (minhash_signature(BASE[1].split(), a, b) == s1).all()

    def test_lsh_finds_planted_pairs(self, corpus):
        out = minhash_dedup_pairs(rd.from_arrow(corpus)).to_pandas()
        pairs = set(zip(out.a, out.b))
        assert (0, 100) in pairs  # exact dup always collides
        exact = out[(out.a == 0) & (out.b == 100)].iloc[0]
        assert exact.est_jaccard == 1.0 and exact.n_bands == 16

    def test_payload_modes_agree_on_pairs(self, corpus):
        """Pair selection is band-hash equality either way: the light
        bandhash payload and the join-free signature payload must emit
        the SAME (a, b, n_bands) set; only est_jaccard granularity
        differs (band-level vs slot-wise)."""
        light = minhash_dedup_pairs(rd.from_arrow(corpus), payload="bandhash").to_pandas()
        full = minhash_dedup_pairs(rd.from_arrow(corpus), payload="signature").to_pandas()
        key = lambda df: sorted(zip(df.a, df.b, df.n_bands))  # noqa: E731
        assert key(light) == key(full)
        # exact dup estimates 1.0 in both estimators
        for df in (light, full):
            assert df[(df.a == 0) & (df.b == 100)].iloc[0].est_jaccard == 1.0


class TestSimhash:
    def test_identical_and_near(self):
        h1 = simhash64(BASE[2].split())
        h2 = simhash64(BASE[2].split())
        assert h1 == h2
        h3 = simhash64(BASE[2].replace("blue", "navy").split())
        assert bin(h1 ^ h3).count("1") <= 16  # one-token change: few bits

    def test_pairs_include_exact_dup(self, corpus):
        out = simhash_pairs(rd.from_arrow(corpus), max_hamming=3).to_pandas()
        pairs = set(zip(out.a, out.b))
        assert (0, 100) in pairs
        assert out[(out.a == 0) & (out.b == 100)].iloc[0].hamming == 0


class TestShingles:
    def test_shingle_set_is_distinct_sorted(self):
        s = shingle_set(["a", "b", "a", "b", "a"], 2)
        assert s == ["a b", "b a"]

    def test_short_doc_empty(self):
        assert shingle_set(["a", "b"], 3) == []


class TestSegmentDedup:
    def test_first_occurrence_wins(self):
        from bioner_ray.stages.dedup import segment_dedup

        # doc 0: segments A B (25 tokens -> segs of 10/10/5)
        a = " ".join(f"w{i}" for i in range(10))
        b = " ".join(f"x{i}" for i in range(10))
        tail = "t0 t1 t2 t3 t4"
        # doc 1 repeats segment A at its head, then fresh tokens
        c = " ".join(f"y{i}" for i in range(10))
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], type=pa.int64()),
                    "text": [f"{a} {b} {tail}", f"{a} {c}"],
                }
            )
        )
        out = segment_dedup(ds, window=10).to_pandas().set_index("doc_id").sort_index()
        assert out.loc[0, "n_segs"] == 3 and out.loc[0, "n_kept"] == 3
        assert out.loc[1, "n_segs"] == 2 and out.loc[1, "n_kept"] == 1

    def test_within_doc_repeat_kept_once(self):
        from bioner_ray.stages.dedup import segment_dedup

        seg = " ".join(f"z{i}" for i in range(10))
        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array([7], type=pa.int64()), "text": [f"{seg} {seg}"]})
        )
        out = segment_dedup(ds, window=10).to_pandas()
        assert out.iloc[0]["n_segs"] == 2 and out.iloc[0]["n_kept"] == 1

    def test_empty_doc_emits_no_rows(self):
        from bioner_ray.stages.dedup import segment_dedup

        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array([1, 2], type=pa.int64()), "text": ["", "only five words here now"]})
        )
        out = segment_dedup(ds, window=10).to_pandas()
        assert sorted(out["doc_id"]) == [2]


def test_containment_catches_short_in_long_that_jaccard_misses(ray_session, tmp_path):
    """A short doc embedded verbatim in a much longer one: containment
    = 1.0 flags it (contained_id = the short side) while Jaccard at
    the same threshold misses the pair entirely."""
    import pyarrow as pa
    import ray.data as rd

    from bioner_ray.stages.dedup import containment_pairs, jaccard_pairs

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"filler{i} tokena{i} tokenb{i}" for i in range(30))
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": [short, long, "completely different words here entirely now"],
            }
        )
    )
    cont = containment_pairs(ds, threshold=0.9).to_pandas()
    assert len(cont) == 1
    assert (cont.loc[0, "a"], cont.loc[0, "b"]) == (1, 2)
    assert cont.loc[0, "containment"] == 1.0
    assert cont.loc[0, "contained_id"] == 1  # the short doc is the removal candidate
    ds2 = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": [short, long, "completely different words here entirely now"],
            }
        )
    )
    jac = jaccard_pairs(ds2, threshold=0.9).to_pandas()
    assert len(jac) == 0  # symmetric Jaccard is blind to the wrap
