"""KMV bottom-k distinct sketch: exact branch, estimator accuracy,
and block-merge correctness (the synopsis must be identical no matter
how rows are split across blocks)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from bioner_ray.stages.sketch import kmv_distinct


def _events(n_rows: int, n_users: int, repeat: int = 3) -> pa.Table:
    ids = [(i * 7919) % n_users for i in range(n_rows * repeat)]
    return pa.table(
        {
            "event_type": pa.array(["t"] * len(ids)),
            "user_id": pa.array(ids, type=pa.int64()),
        }
    )


def _run(tbl: pa.Table, k: int, blocks: int):
    ds = rd.from_arrow(tbl).repartition(blocks)
    return {r["event_type"]: r for r in kmv_distinct(ds, "event_type", "user_id", k=k).take_all()}


class TestKMV:
    def test_exact_branch_below_k(self):
        out = _run(_events(40, 40), k=64, blocks=4)["t"]
        assert out["n_synopsis"] == 40
        assert out["est_distinct"] == 40.0

    def test_estimator_accuracy_above_k(self):
        true = 5000
        out = _run(_events(true, true), k=64, blocks=8)["t"]
        assert out["n_synopsis"] == 64
        # std error ~ 1/sqrt(k-2) ~ 13%; allow 3 sigma
        assert abs(out["est_distinct"] - true) / true < 0.4

    def test_block_split_invariance(self):
        tbl = _events(500, 300)
        a = _run(tbl, k=64, blocks=1)["t"]
        b = _run(tbl, k=64, blocks=16)["t"]
        assert (a["n_synopsis"], a["kth_hash"], a["est_distinct"]) == (
            b["n_synopsis"],
            b["kth_hash"],
            b["est_distinct"],
        )


class TestHllDistinct:
    def _brute(self, values, p=8):
        import hashlib

        import numpy as np

        m = 1 << p
        tail_bits = 61 - p
        regs = {}
        for v in set(values):
            h = int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big") % (1 << 61)
            b = h >> tail_bits
            w = h & ((1 << tail_bits) - 1)
            rank = (tail_bits + 1) - w.bit_length()
            regs[b] = max(regs.get(b, 0), rank)
        v_zero = m - len(regs)
        s_int = sum(1 << (tail_bits + 1 - r) for r in regs.values()) + (v_zero << (tail_bits + 1))
        alpha = 0.7213 / (1.0 + 1.079 / float(m))
        est = alpha * float(m) * float(m) * float(1 << (tail_bits + 1)) / float(s_int)
        if est <= 2.5 * m and v_zero > 0:
            import math

            est = float(m) * math.log(float(m) / float(v_zero))
        return v_zero, s_int, est

    def test_raw_branch_matches_bruteforce_and_is_accurate(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.sketch import hll_distinct

        n = 5000  # >> 2.5 * 256 -> raw harmonic estimator branch
        vals = np.arange(n, dtype=np.int64)
        t = pa.table({"k": pa.array(["a"] * n), "v": pa.array(vals)})
        out = hll_distinct(rd.from_arrow(t), "k", "v").to_pandas()
        v_zero, s_int, est = self._brute(vals.tolist())
        assert out.iloc[0]["v_zero"] == v_zero
        assert out.iloc[0]["s_int"] == s_int
        assert out.iloc[0]["est_distinct"] == est
        assert abs(est - n) / n < 0.15  # within HLL's ~1.04/sqrt(256) band

    def test_merge_is_block_shape_independent(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.sketch import hll_distinct

        vals = np.arange(1000, dtype=np.int64)
        t = pa.table({"k": pa.array(["a"] * 1000), "v": pa.array(vals)})
        one = hll_distinct(rd.from_arrow(t), "k", "v").to_pandas()
        many = hll_distinct(
            rd.from_arrow(t).repartition(7), "k", "v"
        ).to_pandas()
        assert one.iloc[0]["s_int"] == many.iloc[0]["s_int"]
        assert one.iloc[0]["est_distinct"] == many.iloc[0]["est_distinct"]


class TestCountMin:
    @staticmethod
    def _ds(texts, parts=3):
        import ray.data as rd

        return rd.from_arrow(pa.table({"text": texts})).repartition(parts)

    @staticmethod
    def _exact(texts):
        from collections import Counter

        c = Counter()
        for t in texts:
            c.update(w for w in t.lower().split() if w)
        return c

    def test_upper_bound_and_exact_when_wide(self, ray_session):
        from bioner_ray.stages.sketch import cms_estimates, cms_word_counts

        texts = ["a b b c c c", "c d d a", "e e e e a b"]
        exact = self._exact(texts)
        # wide sketch: 26 words into 4x4096 cells -> no collisions, est == exact
        regs, words = cms_word_counts(self._ds(texts), width=4096)
        got = dict(
            zip(*cms_estimates(regs, words, width=4096).to_pandas().T.values.tolist())
        )
        assert got == dict(exact)

    def test_narrow_sketch_overcounts_never_undercounts(self, ray_session):
        from bioner_ray.stages.sketch import cms_estimates, cms_word_counts

        texts = [" ".join(f"w{i%17}" for i in range(200)), "x y z w0 w1 w2"]
        exact = self._exact(texts)
        regs, words = cms_word_counts(self._ds(texts), width=4)
        out = cms_estimates(regs, words, width=4).to_pandas()
        assert len(out) == len(exact)
        for word, est in zip(out["word"], out["est"]):
            assert est >= exact[word]

    def test_merge_is_partitioning_invariant(self, ray_session):
        from bioner_ray.stages.sketch import cms_estimates, cms_word_counts

        texts = [f"t{i % 7} shared tail" for i in range(40)]
        outs = []
        for parts in (1, 8):
            regs, words = cms_word_counts(self._ds(texts, parts=parts), width=8)
            df = cms_estimates(regs, words, width=8).to_pandas()
            outs.append(sorted(zip(df["word"], df["est"])))
        assert outs[0] == outs[1]
