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


class TestEdgeWeightedJaccard:
    def _run(self, rows, **kw):
        from bioner_ray.stages.graph import edge_weighted_jaccard

        t = pa.table(
            {
                "subj": pa.array([r[0] for r in rows], type=pa.string()),
                "obj": pa.array([r[1] for r in rows], type=pa.string()),
                "weight": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )
        ds = rd.from_arrow(t).repartition(3)
        out = edge_weighted_jaccard(ds, **kw).to_pandas()
        return {(r.lo, r.hi): r for r in out.itertuples()}

    def test_hand_computed_triangle(self):
        # undirected collapse: ab=3, ac=1, bc=1
        got = self._run([("a", "b", 2), ("b", "a", 1), ("a", "c", 1), ("b", "c", 1)])
        # strengths: s(a)=4, s(b)=4, s(c)=2
        # (a,b): common nbr c -> min(1,1)=1; wj = 1/(4+4-1)
        r = got[("a", "b")]
        assert r.w == 3 and r.min_sum == 1 and r.s_lo == 4 and r.s_hi == 4
        np.testing.assert_allclose(r.wjaccard, 1.0 / 7.0)
        # (a,c): common nbr b -> min(ab=3, bc=1)=1; wj = 1/(4+2-1)
        np.testing.assert_allclose(got[("a", "c")].wjaccard, 1.0 / 5.0)
        assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}

    def test_no_common_neighbors_zero_fill(self):
        got = self._run([("a", "b", 5)])
        r = got[("a", "b")]
        assert r.min_sum == 0 and r.wjaccard == 0.0

    def test_self_loops_dropped(self):
        got = self._run([("a", "a", 9), ("a", "b", 1)])
        assert set(got) == {("a", "b")}

    def test_twin_shape_scores_high_with_weak_direct_edge(self):
        # the alias shape kg_merge_groups thresholds: x/y share 3 strong
        # neighbors, weak direct edge -> wjaccard near 1
        rows = []
        for n in ("p", "q", "r"):
            rows += [("x", n, 30), ("y", n, 30)]
        rows += [("x", "y", 1)]
        got = self._run(rows)
        r = got[("x", "y")]
        # min_sum = 90; s(x)=s(y)=91; wj = 90/(91+91-90)
        np.testing.assert_allclose(r.wjaccard, 90.0 / 92.0)
        # and a strong direct edge between unrelated hubs scores low
        assert got[("p", "x")].wjaccard < 0.2

    def test_hub_cap_drops_wedges_not_edges(self):
        # center 'h' exceeds the cap -> its wedges are skipped (min_sum
        # contributions lost) but every edge still emits a row
        rows = [("h", f"n{i}", 1) for i in range(6)]
        got = self._run(rows, max_center_degree=4)
        assert len(got) == 6
        assert all(r.min_sum == 0 for r in got.values())


class TestKCore:
    def _run(self, pairs, k=3, **kw):
        from bioner_ray.stages.graph import kcore_nodes

        t = pa.table(
            {
                "subj": pa.array([a for a, b in pairs], type=pa.string()),
                "obj": pa.array([b for a, b in pairs], type=pa.string()),
            }
        )
        out = kcore_nodes(rd.from_arrow(t).repartition(2), k=k, **kw).to_pandas()
        if out.empty:  # Ray drops columns from fully-empty datasets
            return {}
        return dict(zip(out["node"], out["deg"]))

    def test_clique_survives_whiskers_peel(self):
        # K4 core with a 3-node whisker chain hanging off it
        clique = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
        whisker = [("d", "w1"), ("w1", "w2"), ("w2", "w3")]
        got = self._run(clique + whisker, k=3)
        assert got == {"a": 3, "b": 3, "c": 3, "d": 3}

    def test_path_graph_has_no_2core(self):
        path = [(f"n{i}", f"n{i+1}") for i in range(6)]
        assert self._run(path, k=2) == {}
        # but a cycle IS its own 2-core
        cycle = path + [("n6", "n0")]
        got = self._run(cycle, k=2)
        assert set(got) == {f"n{i}" for i in range(7)} and all(v == 2 for v in got.values())

    def test_multi_edges_and_self_loops_collapse(self):
        tri = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "a")]
        got = self._run(tri, k=2)
        assert got == {"a": 2, "b": 2, "c": 2}

    def test_deep_peel_needs_multiple_rounds(self):
        # chain of triangles: peeling the tail triangle exposes the next
        tri = [("a", "b"), ("b", "c"), ("c", "a")]
        chain = [("c", "x1"), ("x1", "x2"), ("x2", "x3"), ("x3", "x4")]
        got = self._run(tri + chain, k=2, max_rounds=10)
        assert set(got) == {"a", "b", "c"}


class TestBfsDistances:
    def test_chain_distances_and_hop_cap(self):
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.graph import bfs_distances

        # chain a-b-c-d-e-f plus an isolated self-loop (dropped)
        edges = pa.table(
            {
                "subj": ["a", "b", "c", "d", "e", "x"],
                "obj": ["b", "c", "d", "e", "f", "x"],
            }
        )
        out = (
            bfs_distances(rd.from_arrow(edges), n_seeds=1, max_hops=3)
            .to_pandas()
            .set_index("node")["dist"]
            .to_dict()
        )
        # seed = lexicographically smallest node "a"
        assert out == {"a": 0, "b": 1, "c": 2, "d": 3}

    def test_multi_seed_min_distance(self):
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.graph import bfs_distances

        # chain a-b-c-d; seeds {a, b} -> c is 1 hop from b
        edges = pa.table({"subj": ["a", "b", "c"], "obj": ["b", "c", "d"]})
        out = (
            bfs_distances(rd.from_arrow(edges), n_seeds=2, max_hops=2)
            .to_pandas()
            .set_index("node")["dist"]
            .to_dict()
        )
        assert out == {"a": 0, "b": 0, "c": 1, "d": 2}

    def test_early_exit_on_exhausted_frontier(self):
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.graph import bfs_distances

        edges = pa.table({"subj": ["a"], "obj": ["b"]})
        out = bfs_distances(rd.from_arrow(edges), n_seeds=1, max_hops=5).to_pandas()
        assert sorted(zip(out["node"], out["dist"])) == [("a", 0), ("b", 1)]


class TestLabelPropagation:
    @staticmethod
    def _run(edges, rounds=4):
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.graph import label_propagation

        t = pa.table(
            {
                "subj": pa.array([s for s, _, _ in edges], type=pa.string()),
                "obj": pa.array([o for _, o, _ in edges], type=pa.string()),
                "weight": pa.array([w for _, _, w in edges], type=pa.int64()),
            }
        )
        out = label_propagation(
            rd.from_arrow(t).repartition(3), rounds=rounds
        ).to_pandas()
        return dict(zip(out["node"], out["label"]))

    def test_two_triangles_weak_bridge(self):
        # two weight-3 triangles joined by a single weight-1 bridge:
        # the bridge can't outvote the in-community mass
        e = [
            ("a", "b", 3), ("b", "c", 3), ("c", "a", 3),
            ("x", "y", 3), ("y", "z", 3), ("z", "x", 3),
            ("c", "x", 1),
        ]
        got = self._run(e)
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "x"}

    def test_weight_beats_count(self):
        # m has two unit edges into the a-side but one weight-10 edge to
        # z: the weighted argmax must side with z (one round isolates
        # the argmax itself — synchronous LPA 2-cycles on mutually
        # dominant pairs, per the docstring, so convergence isn't the
        # property under test)
        e = [("a", "b", 5), ("m", "a", 1), ("m", "b", 1), ("m", "z", 10), ("z", "q", 5)]
        got = self._run(e, rounds=1)
        assert got["m"] == "z" and got["q"] == "z"

    def test_multi_edges_and_self_loops_collapse(self):
        # duplicate directed pairs sum; self-loop contributes nothing
        e = [("a", "b", 1), ("b", "a", 2), ("a", "a", 99), ("b", "c", 1)]
        got = self._run(e, rounds=2)
        assert set(got) == {"a", "b", "c"}

    def test_weightless_edges_default_to_one(self):
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.graph import label_propagation

        t = pa.table({"subj": ["a", "b"], "obj": ["b", "c"]})
        out = label_propagation(rd.from_arrow(t), rounds=2).to_pandas()
        got = dict(zip(out["node"], out["label"]))
        # path a-b-c, unit weights: b sees {a,c} -> min "a"; a and c see
        # only b's label; round 2 propagates the swap deterministically
        assert set(got) == {"a", "b", "c"}
        assert len(set(got.values())) >= 1  # deterministic completion

    def test_deterministic_across_partitionings(self):
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.graph import label_propagation

        e = [("a", "b", 3), ("b", "c", 3), ("c", "a", 3), ("c", "x", 1),
             ("x", "y", 3), ("y", "z", 3), ("z", "x", 3)]
        t = pa.table(
            {
                "subj": pa.array([s for s, _, _ in e], type=pa.string()),
                "obj": pa.array([o for _, o, _ in e], type=pa.string()),
                "weight": pa.array([w for _, _, w in e], type=pa.int64()),
            }
        )
        a = label_propagation(rd.from_arrow(t).repartition(1), rounds=3).to_pandas()
        b = label_propagation(rd.from_arrow(t).repartition(7), rounds=3).to_pandas()
        assert sorted(zip(a["node"], a["label"])) == sorted(zip(b["node"], b["label"]))


class TestCommunityStats:
    def test_two_triangles_decomposition(self):
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.graph import community_stats

        # two weight-3 triangles + a weight-1 bridge: LP yields {a,b,c}
        # and {x,y,z}; by hand, each community has degree mass
        # 6+6+7 = 19 (the bridge endpoint carries the +1) and internal
        # directed-double-counted weight 6 pairs x 3 = 18; the bridge's
        # 2x1 mass is the cut
        e = [
            ("a", "b", 3), ("b", "c", 3), ("c", "a", 3),
            ("x", "y", 3), ("y", "z", 3), ("z", "x", 3),
            ("c", "x", 1),
        ]
        t = pa.table(
            {
                "subj": pa.array([s for s, _, _ in e], type=pa.string()),
                "obj": pa.array([o for _, o, _ in e], type=pa.string()),
                "weight": pa.array([w for _, _, w in e], type=pa.int64()),
            }
        )
        out = community_stats(rd.from_arrow(t).repartition(3), rounds=4).to_pandas()
        got = {
            r.label: (r.n_nodes, r.degree_w, r.intra_w) for r in out.itertuples()
        }
        assert got == {"a": (3, 19, 18), "x": (3, 19, 18)}
        # modularity check: Q = sum(intra/2m - (deg/2m)^2), 2m = 38
        q = sum(iw / 38 - (dw / 38) ** 2 for _, dw, iw in got.values())
        assert abs(q - (2 * (18 / 38 - (19 / 38) ** 2))) < 1e-12


class TestClusteringCoefficients:
    def test_crafted_graph(self):
        from bioner_ray.stages.graph import clustering_coefficients

        # triangle a-b-c, pendant d off a (deg 1 → coeff 0), isolated
        # pair e-f (deg 1 each), and a wedge a-b-c plus b-x a-x making
        # {a,b,x} a second triangle sharing edge a-b
        edges = pa.table(
            {
                "subj": ["a", "b", "a", "a", "e", "b", "a"],
                "obj": ["b", "c", "c", "d", "f", "x", "x"],
            }
        )
        out = (
            clustering_coefficients(rd.from_arrow(edges).repartition(3), num_buckets=8)
            .to_pandas()
            .set_index("node")
            .sort_index()
        )
        # degrees: a=4 (b,c,d,x), b=3 (a,c,x), c=2, d=1, e=1, f=1, x=2
        assert out.loc["a", "deg"] == 4 and out.loc["b", "deg"] == 3
        assert out.loc["d", "deg"] == 1 and out.loc["e", "deg"] == 1
        # triangles: {a,b,c} and {a,b,x} → a:2, b:2, c:1, x:1, d/e/f:0
        assert out.loc["a", "n_triangles"] == 2
        assert out.loc["b", "n_triangles"] == 2
        assert out.loc["c", "n_triangles"] == 1
        assert out.loc["x", "n_triangles"] == 1
        assert out.loc["d", "n_triangles"] == 0
        # coeffs: a = 2*2/(4*3) = 1/3; b = 2*2/(3*2) = 2/3; c = 1.0;
        # deg<2 nodes pinned to 0.0
        assert abs(out.loc["a", "coeff"] - 1 / 3) < 1e-12
        assert abs(out.loc["b", "coeff"] - 2 / 3) < 1e-12
        assert out.loc["c", "coeff"] == 1.0
        assert out.loc["d", "coeff"] == 0.0 and out.loc["f", "coeff"] == 0.0

    def test_duplicate_and_self_edges_ignored(self):
        from bioner_ray.stages.graph import clustering_coefficients

        edges = pa.table(
            {
                "subj": ["a", "b", "a", "a", "b", "c", "a"],
                "obj": ["b", "a", "b", "c", "c", "b", "a"],
            }
        )
        out = (
            clustering_coefficients(rd.from_arrow(edges), num_buckets=4)
            .to_pandas()
            .set_index("node")
        )
        assert set(out.index) == {"a", "b", "c"}
        assert (out["coeff"] == 1.0).all()
        assert (out["n_triangles"] == 1).all()


class TestStringComponents:
    def _run(self, pairs, distributed=False):
        from bioner_ray.stages.graph import string_components

        tbl = pa.table(
            {
                "lo": pa.array([p[0] for p in pairs], type=pa.string()),
                "hi": pa.array([p[1] for p in pairs], type=pa.string()),
            }
        )
        got = string_components(
            rd.from_arrow(tbl), driver_max_pairs=0 if distributed else 2_000_000
        )
        return {r["node"]: r["rep"] for r in got.take_all()}

    def test_driver_path_min_string_rep(self):
        pairs = [("pd-1", "pd1"), ("pd1", "pdcd1"), ("il6", "il-6"), ("tnf", "tnfa")]
        got = self._run(pairs)
        assert got == {
            "pd-1": "pd-1",
            "pd1": "pd-1",
            "pdcd1": "pd-1",
            "il6": "il-6",
            "il-6": "il-6",
            "tnf": "tnf",
            "tnfa": "tnf",
        }

    def test_driver_and_distributed_paths_agree(self):
        rng = np.random.default_rng(7)
        pairs = sorted(
            {
                (f"n{min(a, b):03d}", f"n{max(a, b):03d}")
                for a, b in rng.integers(0, 40, size=(60, 2))
                if a != b
            }
        )
        assert self._run(pairs) == self._run(pairs, distributed=True)
