"""Quantized pivot betweenness (stages/graph.betweenness_centrality):
hand-checked path/star graphs plus a brute-force Brandes replay on a
random graph under the same micro-unit floor arithmetic."""

from __future__ import annotations

from collections import deque

import pyarrow as pa
import pytest


def _run(edges: list[tuple[str, str]], **kw):
    import ray.data as rd

    from bioner_ray.stages.graph import betweenness_centrality

    ds = rd.from_arrow(
        pa.table(
            {
                "subj": [a for a, _ in edges],
                "obj": [b for _, b in edges],
            }
        )
    )
    df = betweenness_centrality(ds, **kw).to_pandas()
    return dict(zip(df["node"], df["bc_micro"]))


def _brute(edges, n_seeds, max_hops):
    """Reference Brandes with the engine's quantization: contribution
    floor(sigma_v * (10^6 + delta_w) / sigma_w) summed over BFS-DAG
    successors, distances capped at max_hops."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    tot = {v: 0 for v in nodes}
    for s in nodes[:n_seeds]:
        dist, sigma, order = {s: 0}, {s: 1}, []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            if dist[u] >= max_hops:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    sigma[v] = 0
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
        delta = {v: 0 for v in dist}
        for u in reversed(order):
            for v in adj[u]:
                if dist.get(v) == dist[u] + 1:
                    delta[u] += (sigma[u] * (10**6 + delta[v])) // sigma[v]
            if u != s:
                tot[u] += delta[u]
    return tot


@pytest.mark.usefixtures("ray_session")
class TestBetweenness:
    def test_path_graph_exact(self):
        # path a—b—c—d, seeds {a, b, c}: b brokers a↔{c,d}, c brokers
        # {a,b}↔d — hand values in micro-units
        bc = _run([("a", "b"), ("b", "c"), ("c", "d")], n_seeds=3, max_hops=3)
        # seed a: delta(c)=1e6 (from d), delta(b)=1e6+ (1e6+1e6)=3e6... replay:
        assert bc == _brute([("a", "b"), ("b", "c"), ("c", "d")], 3, 3)
        assert bc["b"] > bc["c"] > 0 and bc["a"] == 0 and bc["d"] == 0

    def test_star_center_brokers_everything(self):
        edges = [("hub", f"s{i}") for i in range(5)]
        bc = _run(edges, n_seeds=3, max_hops=3)
        assert bc == _brute(edges, 3, 3)
        assert bc["hub"] > 0
        assert all(bc[f"s{i}"] == 0 for i in range(5))

    def test_clique_is_all_zero(self):
        nodes = [f"n{i}" for i in range(4)]
        edges = [(a, b) for a in nodes for b in nodes if a < b]
        bc = _run(edges, n_seeds=3, max_hops=3)
        assert all(v == 0 for v in bc.values())

    def test_random_graph_matches_brute_force(self):
        import random

        rng = random.Random(7)
        nodes = [f"v{i:02d}" for i in range(24)]
        edges = sorted(
            {
                tuple(sorted(rng.sample(nodes, 2)))
                for _ in range(60)
            }
        )
        bc = _run(edges, n_seeds=4, max_hops=3)
        assert bc == _brute(edges, 4, 3)

    def test_hop_cap_limits_accumulation(self):
        # chain of 5: with max_hops=2 the far ends never route through
        edges = [(f"c{i}", f"c{i+1}") for i in range(4)]
        bc2 = _run(edges, n_seeds=2, max_hops=2)
        assert bc2 == _brute(edges, 2, 2)
