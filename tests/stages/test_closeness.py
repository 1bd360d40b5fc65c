"""Sampled harmonic closeness (stages/graph.harmonic_centrality):
hand-checked path graph plus the zero-for-unreachable contract."""

from __future__ import annotations

import pyarrow as pa
import pytest


def _run(edges: list[tuple[str, str]], **kw):
    import ray.data as rd

    from bioner_ray.stages.graph import harmonic_centrality

    ds = rd.from_arrow(
        pa.table(
            {
                "subj": [a for a, _ in edges],
                "obj": [b for _, b in edges],
            }
        )
    )
    df = harmonic_centrality(ds, **kw).to_pandas()
    return dict(zip(df["node"], df["hc_micro"]))


@pytest.mark.usefixtures("ray_session")
class TestHarmonicCentrality:
    def test_path_graph_exact(self):
        # path a—b—c—d, seeds = 2 lexicographic smallest = {a, b}
        hc = _run([("a", "b"), ("b", "c"), ("c", "d")], n_seeds=2, max_hops=3)
        assert hc == {
            "a": 1_000_000,  # from b at dist 1
            "b": 1_000_000,  # from a at dist 1
            "c": 1_500_000,  # a:2 → 500_000, b:1 → 1_000_000
            "d": 833_333,    # a:3 → 333_333, b:2 → 500_000
        }

    def test_unreachable_is_zero(self):
        # two components; seeds {a, b} never reach the x—y island
        hc = _run([("a", "b"), ("x", "y")], n_seeds=2, max_hops=3)
        assert hc["x"] == 0 and hc["y"] == 0
        assert hc["a"] == 1_000_000 and hc["b"] == 1_000_000

    def test_hop_cap(self):
        # d is 3 hops from the single seed a; cap at 2 → unreached
        hc = _run([("a", "b"), ("b", "c"), ("c", "d")], n_seeds=1, max_hops=2)
        assert hc["d"] == 0 and hc["c"] == 500_000

    def test_self_loops_ignored(self):
        hc = _run([("a", "a"), ("a", "b")], n_seeds=1, max_hops=2)
        assert hc == {"a": 0, "b": 1_000_000}

    def test_sigma_diamond(self):
        import ray.data as rd

        from bioner_ray.stages.graph import shortest_path_counts

        # diamond a—{b,c}—d: two shortest paths a→d
        ds = rd.from_arrow(
            pa.table({"subj": ["a", "a", "b", "c"], "obj": ["b", "c", "d", "d"]})
        )
        df = shortest_path_counts(ds, n_seeds=1, max_hops=3).to_pandas()
        got = {(r.node): (r.dist, r.sigma) for r in df.itertuples()}
        assert got == {"a": (0, 1), "b": (1, 1), "c": (1, 1), "d": (2, 2)}

    def test_hop_histogram_path(self):
        import ray.data as rd

        from bioner_ray.stages.graph import hop_histogram

        ds = rd.from_arrow(
            pa.table({"subj": ["a", "b", "c"], "obj": ["b", "c", "d"]})
        )
        # seeds {a, b}: a reaches b/c/d at 1/2/3, b reaches a/c at 1, d at 2
        df = hop_histogram(ds, n_seeds=2, max_hops=3).to_pandas()
        assert dict(zip(df["dist"], df["n_pairs"])) == {1: 3, 2: 2, 3: 1}
