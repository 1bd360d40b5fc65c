"""Similarity search: exact top-k against a numpy oracle; IVF recall;
cosine near-dup pairs in exact and LSH modes."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from bioner_ray.stages.similarity import (
    cosine_dup_pairs,
    knn_brute_force,
    knn_ivf,
)

N, D = 200, 16


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(7)
    m = rng.normal(size=(N, D))
    m[50] = m[10] + rng.normal(scale=0.01, size=D)  # planted near-dup of 10
    return m


@pytest.fixture(scope="module")
def vec_ds(vectors):
    tbl = pa.table(
        {
            "vec_id": pa.array(range(N), type=pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32).tolist() for row in vectors],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    return rd.from_arrow(tbl)


def numpy_topk(vectors, q, k):
    m = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
    qq = q / np.linalg.norm(q)
    sims = m @ qq
    return [int(i) for i in np.argsort(-sims)[:k]]


class TestBruteForce:
    def test_matches_numpy_oracle(self, vectors, vec_ds):
        # float32 storage → compare against the same float32-rounded input
        stored = vectors.astype(np.float32).astype(np.float64)
        q = stored[:3]
        out = knn_brute_force(vec_ds, q, k=5)
        df = out.to_pandas()
        for qi in range(3):
            got = list(df[df.query_id == qi].sort_values("rank").vec_id)
            assert got == numpy_topk(stored, stored[qi], 5)

    def test_self_is_rank_one(self, vectors, vec_ds):
        stored = vectors.astype(np.float32).astype(np.float64)
        df = knn_brute_force(vec_ds, stored[:1], k=3).to_pandas()
        top = df[df["rank"] == 1].iloc[0]
        assert top.vec_id == 0 and top.score == pytest.approx(1.0)


class TestIVF:
    def test_recall_vs_brute(self, vectors, vec_ds):
        stored = vectors.astype(np.float32).astype(np.float64)
        q = stored[:4]
        brute = knn_brute_force(vec_ds, q, k=10).to_pandas()
        approx = knn_ivf(vec_ds, q, k=10, n_clusters=8, n_probe=4).to_pandas()
        recalls = []
        for qi in range(4):
            b = set(brute[brute.query_id == qi].vec_id)
            a = set(approx[approx.query_id == qi].vec_id)
            recalls.append(len(a & b) / len(b))
        assert np.mean(recalls) >= 0.5  # half the lists probed


class TestCosinePairs:
    def test_exact_mode_finds_planted(self, vec_ds):
        df = cosine_dup_pairs(vec_ds, threshold=0.95).to_pandas()
        assert (10, 50) in set(zip(df.a, df.b))
        assert (df.a < df.b).all()

    def test_lsh_mode_finds_planted(self, vec_ds):
        df = cosine_dup_pairs(vec_ds, threshold=0.95, n_planes=6).to_pandas()
        assert (10, 50) in set(zip(df.a, df.b))


class TestIVFIndex:
    def test_index_matches_in_memory_scan_and_prunes(self, vectors, vec_ds, tmp_path):
        """build_ivf_index + knn_ivf_index must return EXACTLY what the
        in-memory knn_ivf returns (same centroid seed), while reading
        only the probe-union partition directories."""
        import os

        from bioner_ray.stages.similarity import build_ivf_index, knn_ivf, knn_ivf_index

        idx_dir = str(tmp_path / "ivf")
        build_ivf_index(vec_ds, idx_dir, n_clusters=8)
        q = vectors[:4]
        mem = knn_ivf(vec_ds, q, k=5, n_clusters=8, n_probe=3).to_pandas()
        via_idx = knn_ivf_index(idx_dir, q, k=5, n_probe=3).to_pandas()
        cols = ["query_id", "rank"]
        mem = mem.sort_values(cols).reset_index(drop=True)
        via_idx = via_idx.sort_values(cols).reset_index(drop=True)
        assert mem.equals(via_idx)
        # the index really is partitioned: several list dirs exist, and a
        # 3-of-8 probe read touches a strict subset of them
        dirs = [d for d in os.listdir(idx_dir) if d.startswith("list_id=")]
        assert len(dirs) >= 4
