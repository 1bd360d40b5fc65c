"""connected_components vs a union-find brute force on random graphs."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from bioner_ray.stages.graph import connected_components


def _union_find(pairs, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _run(pairs, distributed=False):
    tbl = pa.table(
        {
            "a": pa.array([p[0] for p in pairs], type=pa.int64()),
            "b": pa.array([p[1] for p in pairs], type=pa.int64()),
        }
    )
    # driver_max_pairs=0 forces the distributed label-propagation path
    got = connected_components(
        rd.from_arrow(tbl), driver_max_pairs=0 if distributed else 2_000_000
    )
    return {r["node"]: r["component"] for r in got.take_all()}


class TestConnectedComponents:
    def test_two_triangles_and_a_chain(self):
        pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (20, 21), (21, 22), (22, 23)]
        nodes = sorted({x for p in pairs for x in p})
        assert _run(pairs) == _union_find(pairs, nodes)

    def test_driver_and_distributed_paths_agree(self):
        rng = np.random.default_rng(11)
        pairs = sorted(
            {tuple(sorted(p)) for p in rng.integers(0, 60, size=(80, 2)) if p[0] != p[1]}
        )
        assert _run(pairs) == _run(pairs, distributed=True)

    def test_long_chain_needs_iterations(self):
        pairs = [(i, i + 1) for i in range(12)]
        got = _run(pairs)
        assert set(got.values()) == {0}
        assert len(got) == 13

    def test_very_long_chain_pointer_jumps(self):
        # diameter 300 ≫ max_iters: plain propagation would need 300
        # rounds; pointer jumping must converge in O(log d) on the
        # DISTRIBUTED path (the driver path is trivially exact)
        pairs = [(i, i + 1) for i in range(300)]
        got = _run(pairs, distributed=True)
        assert set(got.values()) == {0}
        assert len(got) == 301

    def test_random_graph_matches_union_find(self):
        rng = np.random.default_rng(5)
        pairs = sorted(
            {tuple(sorted(p)) for p in rng.integers(0, 40, size=(60, 2)) if p[0] != p[1]}
        )
        nodes = sorted({x for p in pairs for x in p})
        assert _run(pairs) == _union_find(pairs, nodes)
