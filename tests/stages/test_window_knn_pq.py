"""Edge-behavior tests for the round-3 close stages: grouped running
sums, the exact k-NN graph (and its size gate), and PQ codes — the
oracle parametrization in test_analytics covers end-to-end values;
these pin the contracts the oracles can't see (gates, asserts,
degenerate groups)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _ds(tbl: pa.Table):
    return rd.from_arrow(tbl)


class TestGroupedRunningSum:
    def test_single_key_prefix_sums(self):
        from bioner_ray.stages.window import grouped_running_sum

        t = pa.table(
            {
                "k": pa.array([1, 1, 1], type=pa.int64()),
                "o": pa.array([3, 1, 2], type=pa.int64()),
                "v": pa.array([10, 1, 100], type=pa.int64()),
            }
        )
        out = (
            grouped_running_sum(_ds(t), "k", ["o"], "v", out_col="cum")
            .to_pandas()
            .sort_values("o")
        )
        # order is by o: values 1, 100, 10 → prefixes 1, 101, 111
        assert out["cum"].tolist() == [1, 101, 111]

    def test_keys_do_not_leak_across_segments(self):
        from bioner_ray.stages.window import grouped_running_sum

        t = pa.table(
            {
                "k": pa.array([1, 2, 1, 2], type=pa.int64()),
                "o": pa.array([1, 1, 2, 2], type=pa.int64()),
                "v": pa.array([5, 7, 5, 7], type=pa.int64()),
            }
        )
        out = grouped_running_sum(_ds(t), "k", ["o"], "v").to_pandas()
        got = {(r.k, r.o): r.cum for r in out.itertuples()}
        assert got == {(1, 1): 5, (1, 2): 10, (2, 1): 7, (2, 2): 14}


class TestKnnGraph:
    def _emb(self, n=6, d=4, seed=3):
        rng = np.random.default_rng(seed)
        return pa.table(
            {
                "vec_id": pa.array(range(n), type=pa.int64()),
                "embedding": pa.array(
                    rng.normal(size=(n, d)).astype(np.float32).tolist(),
                    type=pa.list_(pa.float32()),
                ),
            }
        )

    def test_excludes_self_and_ranks_dense(self):
        from bioner_ray.stages.similarity import knn_graph

        out = knn_graph(_ds(self._emb()), k=3).to_pandas()
        assert (out["vec_id"] != out["nbr_id"]).all()
        per = out.groupby("vec_id")["rank"].apply(list)
        assert all(sorted(r) == [1, 2, 3] for r in per)
        # rank 1 really is the best: score non-increasing within a vector
        for _, g in out.groupby("vec_id"):
            s = g.sort_values("rank")["score"].to_numpy()
            assert (np.diff(s) <= 1e-15).all()

    def test_size_gate_raises(self):
        from bioner_ray.stages.similarity import knn_graph

        with pytest.raises(ValueError, match="gated"):
            knn_graph(_ds(self._emb(n=6)), k=2, max_exact_rows=5)


class TestPqCodes:
    def test_dims_must_divide(self):
        from bioner_ray.stages.cluster import pq_codes

        t = pa.table(
            {
                "vec_id": pa.array([0, 1], type=pa.int64()),
                "embedding": pa.array(
                    [[0.1] * 6, [0.2] * 6], type=pa.list_(pa.float32())
                ),
            }
        )
        with pytest.raises(AssertionError, match="not divisible"):
            pq_codes(_ds(t), m=4, k=2, iters=1)

    def test_long_form_shape_and_code_range(self):
        from bioner_ray.stages.cluster import pq_codes

        rng = np.random.default_rng(11)
        n, d, m, k = 12, 8, 2, 3
        t = pa.table(
            {
                "vec_id": pa.array(range(n), type=pa.int64()),
                "embedding": pa.array(
                    rng.normal(size=(n, d)).astype(np.float32).tolist(),
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        out = pq_codes(_ds(t), m=m, k=k, iters=2).to_pandas()
        assert len(out) == n * m
        assert set(out["sub"]) == {0, 1}
        assert out["code"].between(0, k - 1).all()
        assert (out["dist2"] >= 0).all()
