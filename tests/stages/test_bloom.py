"""Bloom-filter decontamination (stages/bloom.py): membership
semantics, occurrence counting, deliberate false positives, and the
bounded-build contract."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from bioner_ray.stages.bloom import (
    bloom_contamination_stats,
    bloom_params,
    build_bloom,
    _gram_hashes,
    _positions,
)


def _docs(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )
    ).repartition(2)


class TestBloom:
    def test_membership_and_occurrence_counts(self):
        ev = _docs([(0, "the quick brown fox jumps over it")])
        bloom = build_bloom(ev, n=5)
        train = _docs(
            [
                # contains "the quick brown fox jumps" TWICE (overlapping text)
                (1, "the quick brown fox jumps x the quick brown fox jumps"),
                (2, "totally unrelated words that never appeared anywhere near"),
                (3, "tiny"),  # < n tokens → zero grams
            ]
        )
        out = {
            r["doc_id"]: r
            for r in bloom_contamination_stats(train, bloom, n=5).take_all()
        }
        assert out[1]["contaminated"] and out[1]["n_hits"] == 2  # per occurrence
        assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
        assert out[3]["n_grams"] == 0 and not out[3]["contaminated"]

    def test_false_positives_are_deterministic_not_hidden(self):
        # a deliberately tiny filter (m=16 bits) saturates → the clean
        # doc false-positives; the point is the behavior is exact and
        # reproducible, not that it cannot happen
        ev = _docs([(0, " ".join(f"w{i}" for i in range(40)))])
        bloom = build_bloom(ev, n=5, m_bits=16)
        train = _docs([(1, "clean words with no overlap at all here")])
        out = bloom_contamination_stats(train, bloom, n=5, m_bits=16).take_all()
        out2 = bloom_contamination_stats(train, bloom, n=5, m_bits=16).take_all()
        assert out[0]["n_hits"] == out2[0]["n_hits"]  # deterministic
        assert out[0]["n_hits"] > 0  # saturated filter: FPs occur

    def test_positions_vectorized_matches_scalar(self):
        a, b = bloom_params(4)
        h = _gram_hashes(["alpha beta", "gamma delta"])
        got = _positions(h, a, b, 1 << 20)
        for i, hv in enumerate(h):
            for j in range(4):
                want = ((int(a[j]) * int(hv) + int(b[j])) % 2**64) % (1 << 20)
                assert got[i, j] == want

    def test_build_is_positions_not_strings(self):
        # the broadcast object is the packed bit array: m/8 bytes
        import ray

        ev = _docs([(0, "one two three four five six")])
        ref = build_bloom(ev, n=5, m_bits=1 << 12)
        packed = ray.get(ref)
        assert isinstance(packed, np.ndarray) and packed.nbytes == (1 << 12) // 8
