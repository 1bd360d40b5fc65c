"""degree_stats / pagerank vs exact driver-side replays.

The pagerank brute force replays the SAME scaled-integer recurrence
with Python big-ints (arbitrary precision — the oracle's HUGEINT
analog), so the distributed result must match bit-for-bit regardless
of summation order.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from bioner_ray.stages.graph import _pagerank_contrib, degree_stats, pagerank


def _edges_table(rows):
    subj, obj, w = zip(*rows)
    return pa.table(
        {
            "subj": pa.array(subj, type=pa.string()),
            "obj": pa.array(obj, type=pa.string()),
            "weight": pa.array(w, type=pa.int64()),
        }
    )


EDGES = [
    ("a", "b", 3),
    ("a", "c", 1),
    ("b", "c", 2),
    ("c", "a", 5),
    ("c", "d", 1),
    ("d", "d", 2),  # self loop
    ("e", "a", 4),  # e is dangling-in only from a's view; e has out-edge
]


def _brute_pagerank(rows, iters=3, scale=10**12, dn=850, dd=1000):
    from collections import defaultdict

    ew = defaultdict(int)
    for s, o, w in rows:
        ew[(s, o)] += w
    outw = defaultdict(int)
    for (s, _o), w in ew.items():
        outw[s] += w
    nodes = sorted({s for s, _ in ew} | {o for _, o in ew})
    base = ((dd - dn) * scale) // dd
    r = {n: scale for n in nodes}
    for _ in range(iters):
        nxt = {n: base for n in nodes}
        for (s, o), w in ew.items():
            nxt[o] += (dn * r[s] * w) // (dd * outw[s])
        r = nxt
    return r


def test_degree_stats_exact():
    ds = rd.from_arrow(_edges_table(EDGES)).repartition(3)
    got = {r["node"]: r for r in degree_stats(ds).take_all()}
    # hand-checked: a: out (b,3),(c,1); in (c,5),(e,4)
    assert got["a"]["out_degree"] == 2 and got["a"]["out_weight"] == 4
    assert got["a"]["in_degree"] == 2 and got["a"]["in_weight"] == 9
    assert got["d"]["out_degree"] == 1 and got["d"]["in_degree"] == 2
    assert got["d"]["out_weight"] == 2 and got["d"]["in_weight"] == 3
    assert got["e"]["out_degree"] == 1 and got["e"]["in_degree"] == 0
    # degree sums balance: Σout_degree == Σin_degree == #edges
    assert sum(r["out_degree"] for r in got.values()) == len(EDGES)
    assert sum(r["in_degree"] for r in got.values()) == len(EDGES)


def test_pagerank_matches_bigint_replay():
    ds = rd.from_arrow(_edges_table(EDGES)).repartition(3)
    got = {r["node"]: r["rank"] for r in pagerank(ds, iters=3).take_all()}
    want = _brute_pagerank(EDGES, iters=3)
    assert got == want
    # sink-heavy node c (in-weight 3) outranks pure-source e (base only)
    assert got["c"] > got["e"]
    assert got["e"] == ((1000 - 850) * 10**12) // 1000


def test_pagerank_multiedge_collapse():
    # duplicate (s,p,o)-style multi-edges must collapse to summed weight
    rows = [("x", "y", 1), ("x", "y", 2), ("y", "x", 1)]
    ds = rd.from_arrow(_edges_table(rows)).repartition(2)
    got = {r["node"]: r["rank"] for r in pagerank(ds, iters=2).take_all()}
    assert got == _brute_pagerank(rows, iters=2)


def test_contrib_overflow_fallback_matches_bigint():
    # ranks near 2^62: the int64 fast path would overflow; the fallback
    # must produce the exact big-int floor-division result
    r = np.array([2**62, 2**61 + 12345], dtype=np.int64)
    w = np.array([7, 3], dtype=np.int64)
    ow = np.array([10, 10], dtype=np.int64)
    got = _pagerank_contrib(r, w, ow, 850, 1000)
    want = [(850 * int(ri) * int(wi)) // (1000 * int(oi)) for ri, wi, oi in zip(r, w, ow)]
    assert got.tolist() == want


def test_contrib_fast_path_matches_bigint():
    rng = np.random.default_rng(7)
    r = rng.integers(1, 10**12, 256)
    w = rng.integers(1, 50, 256)
    ow = rng.integers(50, 500, 256)
    got = _pagerank_contrib(r, w, ow, 850, 1000)
    want = [(850 * int(ri) * int(wi)) // (1000 * int(oi)) for ri, wi, oi in zip(r, w, ow)]
    assert got.tolist() == want


def test_hash_walks_matches_bruteforce():
    import hashlib

    from bioner_ray.stages.graph import _walk_params, hash_walks

    rows = EDGES
    ds = rd.from_arrow(_edges_table(rows)).repartition(3)
    got = {r["start"]: (r["n1"], r["n2"], r["n3"]) for r in hash_walks(ds, length=3).take_all()}

    a, b, c = _walk_params(3, seed=42)
    mask61 = (1 << 61) - 1

    def hv(s: str) -> int:
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") & mask61

    def step_h(i: int, cur: str, nxt: str) -> int:
        return (int(a[i - 1]) * hv(cur) + int(b[i - 1]) * hv(nxt) + int(c[i - 1])) % 2**64

    adj = {}
    for s, o, _w in rows:
        adj.setdefault(s, set()).add(o)
    want = {}
    for start in sorted(adj):
        cur, path, ok = start, [], True
        for i in (1, 2, 3):
            nbrs = sorted(adj.get(cur, ()))
            if not nbrs:
                ok = False
                break
            cur = min(nbrs, key=lambda n, c=cur, i=i: (step_h(i, c, n), n))
            path.append(cur)
        if ok:
            want[start] = tuple(path)
    assert got == want
    assert len(got) > 0


def test_triangle_counts_matches_bruteforce():
    from itertools import combinations

    from bioner_ray.stages.graph import triangle_counts

    rng = np.random.default_rng(11)
    nodes = [f"n{i:02d}" for i in range(20)]
    rows = []
    for a, b in combinations(nodes, 2):
        if rng.random() < 0.25:
            # random direction, sometimes both + a self loop sprinkled in
            rows.append((a, b, 1) if rng.random() < 0.5 else (b, a, 1))
            if rng.random() < 0.2:
                rows.append((b, a, 2))
    rows.append(("n00", "n00", 5))  # self loop must be ignored
    ds = rd.from_arrow(_edges_table(rows)).repartition(3)
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(ds).take_all()}

    und = {frozenset((a, b)) for a, b, _ in rows if a != b}
    want = {}
    for tri in combinations(nodes, 3):
        a, b, c = tri
        if (
            frozenset((a, b)) in und
            and frozenset((b, c)) in und
            and frozenset((a, c)) in und
        ):
            for n in tri:
                want[n] = want.get(n, 0) + 1
    assert got == want
    assert sum(want.values()) % 3 == 0 and len(want) > 0


def test_edge_support_matches_bruteforce():
    from itertools import combinations

    from bioner_ray.stages.graph import edge_support

    rng = np.random.default_rng(23)
    nodes = [f"m{i:02d}" for i in range(16)]
    rows = []
    for a, b in combinations(nodes, 2):
        if rng.random() < 0.3:
            rows.append((a, b, 1))
    rows.append(("z0", "z1", 1))  # isolated edge: support 0, jaccard 0.0
    ds = rd.from_arrow(_edges_table(rows)).repartition(3)
    got = {(r["lo"], r["hi"]): r for r in edge_support(ds).take_all()}

    und = {tuple(sorted((a, b))) for a, b, _ in rows if a != b}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert set(got) == und
    for (a, b), r in got.items():
        common = len(adj[a] & adj[b])
        assert r["support"] == common
        assert r["deg_lo"] == len(adj[a]) and r["deg_hi"] == len(adj[b])
        denom = len(adj[a]) - 1 + len(adj[b]) - 1 - common
        want = 0.0 if denom == 0 else common / denom
        assert r["jaccard"] == want, (a, b)


def test_reach2_kmv_matches_bruteforce():
    import hashlib

    from bioner_ray.stages.graph import reach2_kmv
    from bioner_ray.stages.sketch import _M61

    rng = np.random.default_rng(31)
    # 40 nodes, enough fanout that some nodes exceed k=8 two-hop reach
    nodes = [f"r{i:02d}" for i in range(40)]
    rows = []
    for a in nodes:
        for b in rng.choice(nodes, size=6, replace=False):
            if a != b:
                rows.append((a, b, 1))
    ds = rd.from_arrow(_edges_table(rows)).repartition(4)
    got = {r["node"]: r for r in reach2_kmv(ds, k=8).take_all()}

    adj = {}
    for a, b, _ in rows:
        adj.setdefault(a, set()).add(b)
    for a in sorted(adj):
        two_hop = set()
        for u in adj[a]:
            two_hop |= adj.get(u, set())
        hs = sorted(
            int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big") % _M61
            for w in two_hop
        )
        kept = hs[:8]
        r = got[a]
        assert r["n_synopsis"] == len(kept) and r["kth_hash"] == kept[-1]
        want = float(len(kept)) if len(kept) < 8 else 7 * 2305843009213693952.0 / kept[-1]
        assert r["est_reach2"] == want
        if len(two_hop) >= 8:
            # estimator sanity: within 3x of truth for k=8 (loose bound)
            assert 0.2 < r["est_reach2"] / len(two_hop) < 5.0


def test_contrib_denominator_overflow_falls_back():
    # numerator product fits int64 but damp_den * ow does not: the
    # vectorized path would silently wrap the denominator — the guard
    # must route this batch to the big-int fallback
    r = np.array([1000, 1000], dtype=np.int64)
    w = np.array([2, 5], dtype=np.int64)
    ow = np.array([2**61, 2**61 + 7], dtype=np.int64)
    got = _pagerank_contrib(r, w, ow, 850, 1000)
    want = [(850 * int(ri) * int(wi)) // (1000 * int(oi)) for ri, wi, oi in zip(r, w, ow)]
    assert got.tolist() == want


def test_local_topk_zero_column_guard():
    import pyarrow as pa

    from bioner_ray.stages.rank import _local_topk

    empty = pa.table({})
    out = _local_topk(empty, "k", [("v", "descending")], 2, with_rank=True)
    assert out.num_rows == 0 and out.num_columns == 0


def _brute_ppr(rows, seeds, iters=3, scale=10**12, dn=850, dd=1000):
    from collections import defaultdict

    ew = defaultdict(int)
    for s, o, w in rows:
        ew[(s, o)] += w
    outw = defaultdict(int)
    for (s, _o), w in ew.items():
        outw[s] += w
    nodes = sorted({s for s, _ in ew} | {o for _, o in ew})
    base = ((dd - dn) * scale) // dd
    r = {n: (scale if n in seeds else 0) for n in nodes}
    for _ in range(iters):
        nxt = {n: (base if n in seeds else 0) for n in nodes}
        for (s, o), w in ew.items():
            nxt[o] += (dn * r[s] * w) // (dd * outw[s])
        r = nxt
    return r


def test_personalized_pagerank_matches_replay_and_localizes():
    ds = rd.from_arrow(_edges_table(EDGES)).repartition(3)
    seeds = ["a"]
    got = {
        r["node"]: r["rank"]
        for r in pagerank(ds, iters=3, seed_nodes=seeds).take_all()
    }
    assert got == _brute_ppr(EDGES, set(seeds), iters=3)
    # pure-source e is unreachable from a and not a seed → exactly 0
    assert got["e"] == 0
    # absent seed contributes nothing, present rows unchanged
    got2 = {
        r["node"]: r["rank"]
        for r in pagerank(ds, iters=3, seed_nodes=["a", "zzz-absent"]).take_all()
    }
    assert got2 == got


def _brute_hits(rows, iters=2, scale=10**6):
    from collections import defaultdict

    ew = defaultdict(int)
    for s, o, w in rows:
        ew[(s, o)] += w
    nodes = sorted({s for s, _ in ew} | {o for _, o in ew})
    h = {n: scale for n in nodes}
    a = {n: 0 for n in nodes}

    def half(src, key_in):
        raw = {n: 0 for n in nodes}
        for (s, o), w in ew.items():
            tgt, origin = (o, s) if key_in == "subj" else (s, o)
            raw[tgt] += src[origin] * w
        div = max(1, max(raw.values()) // scale)
        return {n: v // div for n, v in raw.items()}

    for _ in range(iters):
        a = half(h, "subj")
        h = half(a, "obj")
    return {n: (h[n], a[n]) for n in nodes}


def test_hits_matches_bigint_replay():
    from bioner_ray.stages.graph import hits

    ds = rd.from_arrow(_edges_table(EDGES))
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(ds, iters=2).take_all()}
    assert got == _brute_hits(EDGES, iters=2)


def test_hits_star_graph_hub_auth_split():
    # center -> leaves: the center is the only hub, leaves the only
    # authorities — the defining HITS asymmetry pagerank can't express.
    from bioner_ray.stages.graph import hits

    rows = [("hub", f"leaf{i}", 1) for i in range(4)]
    ds = rd.from_arrow(_edges_table(rows))
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(ds, iters=2).take_all()}
    assert got == _brute_hits(rows, iters=2)
    assert got["hub"][0] > 0 and got["hub"][1] == 0
    for i in range(4):
        assert got[f"leaf{i}"][1] > 0 and got[f"leaf{i}"][0] == 0
