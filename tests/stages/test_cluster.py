"""stages/cluster.py — deterministic integer k-means."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ds(vecs, parts=3):
    import ray.data as rd

    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], type=pa.list_(pa.float32())
            ),
        }
    )
    return rd.from_arrow(t).repartition(parts)


class TestFloorDivExact:
    def test_matches_python_floor_division(self):
        from bioner_ray.stages.cluster import _floor_div_exact

        s = np.array([7, -7, 6, -6, 0, -1], dtype=np.int64)
        n = np.array([2, 2, 3, 3, 5, 4], dtype=np.int64)
        want = np.array([a // b for a, b in zip(s.tolist(), n.tolist())])
        assert (_floor_div_exact(s, n) == want).all()


class TestKmeansAssign:
    def test_two_blobs_separate(self, ray_session):
        from bioner_ray.stages.cluster import kmeans_assign

        # ids 0,1 seed the two clusters; 4 points near (0,0), 4 near (10,10)
        vecs = [
            (0.0, 0.1), (10.0, 10.1), (0.2, 0.0), (0.1, 0.2),
            (9.9, 10.0), (10.2, 9.8), (0.05, 0.05), (10.0, 10.0),
        ]
        out = kmeans_assign(_ds(vecs), k=2, iters=2).to_pandas()
        got = dict(zip(out["vec_id"], out["cluster"]))
        low = {0, 2, 3, 6}
        assert {got[i] for i in low} == {0}
        assert {got[i] for i in sorted(set(range(8)) - low)} == {1}

    def test_partitioning_invariant(self, ray_session):
        from bioner_ray.stages.cluster import kmeans_assign

        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(40, 8)).tolist()
        outs = []
        for parts in (1, 9):
            df = kmeans_assign(_ds(vecs, parts=parts), k=3, iters=2).to_pandas()
            outs.append(sorted(zip(df["vec_id"], df["cluster"], df["dist2"])))
        assert outs[0] == outs[1]

    def test_empty_cluster_keeps_previous_centroid(self, ray_session):
        from bioner_ray.stages.cluster import kmeans_assign

        # seed 1 (vec 1) is an outlier that instantly loses all members:
        # every point sits nearer seed 0 after round 1, so cluster 1
        # keeps its init centroid and the run still terminates cleanly
        vecs = [(0.0,), (100.0,), (0.1,), (0.2,), (0.3,)]
        out = kmeans_assign(_ds(vecs), k=2, iters=3).to_pandas()
        got = dict(zip(out["vec_id"], out["cluster"]))
        assert got[1] == 1  # the outlier still claims its own centroid
        assert {got[i] for i in (0, 2, 3, 4)} == {0}

    def test_negative_coordinates_exact(self, ray_session):
        from bioner_ray.stages.cluster import kmeans_assign

        # negative sums exercise the floor-div identity
        vecs = [(-1.0, -2.0), (1.0, 2.0), (-1.1, -1.9), (0.9, 2.1), (-0.95, -2.05)]
        out = kmeans_assign(_ds(vecs), k=2, iters=2).to_pandas()
        got = dict(zip(out["vec_id"], out["cluster"]))
        assert got[0] == got[2] == got[4] == 0
        assert got[1] == got[3] == 1


class TestGramMatrix:
    def test_matches_numpy_reference(self):
        from bioner_ray.stages.cluster import gram_matrix

        rng = [[0.5, -0.25, 0.125], [1.0, 0.0, -1.0], [0.3, 0.3, 0.3], [-0.7, 0.2, 0.9]]
        got = gram_matrix(_ds(rng)).to_pandas().sort_values(["i", "j"], ignore_index=True)
        X = np.floor(np.array(rng, dtype=np.float32).astype(np.float64) * 1e6).astype(
            np.int64
        )
        G = X.T @ X
        iu, ju = np.triu_indices(3)
        assert got["i"].tolist() == iu.tolist()
        assert got["j"].tolist() == ju.tolist()
        assert got["gram_sum"].tolist() == G[iu, ju].tolist()

    def test_partition_invariant(self):
        from bioner_ray.stages.cluster import gram_matrix

        vecs = [[(i * 7 % 13) / 10.0 - 0.5, (i * 3 % 11) / 10.0] for i in range(50)]
        a = gram_matrix(_ds(vecs, parts=1)).to_pandas().sort_values(["i", "j"], ignore_index=True)
        b = gram_matrix(_ds(vecs, parts=7)).to_pandas().sort_values(["i", "j"], ignore_index=True)
        assert a.equals(b)


class TestPCATopComponent:
    def test_aligns_with_numpy_eigenvector(self):
        from bioner_ray.stages.cluster import pca_top_component

        # anisotropic cloud: dominant direction ~ (1, 1)/sqrt(2), with
        # negative-coordinate points so truncating division is exercised
        vecs = [[0.9, 0.8], [-0.85, -0.9], [0.7, 0.75], [-0.6, -0.65], [0.05, -0.04]]
        got = pca_top_component(_ds(vecs), iters=6).to_pandas()
        v = got.sort_values("dim")["loading"].to_numpy().astype(np.float64)
        X = np.floor(np.array(vecs, dtype=np.float32).astype(np.float64) * 1e6).astype(
            np.int64
        )
        G = (X.T @ X).astype(np.float64)
        w, V = np.linalg.eigh(G)
        top = V[:, np.argmax(w)]
        cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
        assert cos > 0.999

    def test_matches_bigint_replay(self):
        from bioner_ray.stages.cluster import _trunc_div, pca_top_component

        vecs = [[0.3, -0.9, 0.1], [-0.2, 0.8, -0.5], [0.6, 0.1, 0.4]]
        got = pca_top_component(_ds(vecs, parts=3), iters=3).to_pandas()
        X = np.floor(np.array(vecs, dtype=np.float32).astype(np.float64) * 1e6).astype(
            np.int64
        )
        G = [[int(x) for x in row] for row in (X.T @ X).tolist()]
        d, scale = 3, 10**6
        v = [scale] * d
        for _ in range(3):
            u = [sum(G[i][j] * v[j] for j in range(d)) for i in range(d)]
            div = max(1, max(abs(x) for x in u) // scale)
            v = [_trunc_div(x, div) for x in u]
        assert got.sort_values("dim")["loading"].tolist() == v


class TestSemanticDedup:
    def test_near_pair_dropped_later_kept_earlier(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.cluster import semantic_dedup

        rng = np.random.RandomState(7)
        base = rng.randn(6, 8).astype(np.float32)
        # vec 5 = vec 0 scaled (cosine 1.0); vec 4 = orthogonal-ish noise
        base[5] = base[0] * 2.0
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(6, dtype=np.int64)),
                "embedding": pa.array([list(r) for r in base], type=pa.list_(pa.float32())),
            }
        )
        out = (
            semantic_dedup(rd.from_arrow(t).repartition(2), k=2, iters=2, tau=0.99)
            .to_pandas()
            .set_index("vec_id")
        )
        assert len(out) == 6
        assert out.loc[0, "kept"] == 1  # earlier of the duplicate pair
        assert out.loc[5, "kept"] == 0  # dominated by vec 0 (same cluster: identical direction)
        assert out.kept.sum() == 5

    def test_verdict_partition_invariance(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.cluster import semantic_dedup

        rng = np.random.RandomState(11)
        m = rng.randn(40, 8).astype(np.float32)
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(40, dtype=np.int64)),
                "embedding": pa.array([list(r) for r in m], type=pa.list_(pa.float32())),
            }
        )
        a = semantic_dedup(rd.from_arrow(t).repartition(1), k=3, iters=2, tau=0.5).to_pandas()
        b = semantic_dedup(rd.from_arrow(t).repartition(7), k=3, iters=2, tau=0.5).to_pandas()
        assert sorted(map(tuple, a.values.tolist())) == sorted(map(tuple, b.values.tolist()))
