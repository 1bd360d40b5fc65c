"""katz() vs an exact driver-side big-int replay of the same
scaled-integer recurrence (the oracle's HUGEINT analog), so the
distributed result must match bit-for-bit regardless of summation
order or partitioning."""

import pyarrow as pa
import ray.data as rd

from bioner_ray.stages.graph import katz


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
    ("d", "d", 2),
    ("e", "a", 4),
    ("a", "b", 2),  # multi-edge: collapses to a->b weight 5
]


def _brute_katz(rows, iters=3, scale=10**6, an=1, ad=8):
    from collections import defaultdict

    w = defaultdict(int)
    for s, o, x in rows:
        w[(s, o)] += x
    nodes = sorted({n for e in w for n in e})
    k = {n: scale for n in nodes}
    for _ in range(iters):
        raw = {n: scale for n in nodes}
        for (s, o), x in w.items():
            raw[o] += (an * k[s] * x) // ad
        div = max(1, max(raw.values()) // scale)
        k = {n: raw[n] // div for n in nodes}
    return k


def test_katz_matches_bigint_replay():
    ds = rd.from_arrow(_edges_table(EDGES)).repartition(3)
    got = {r["node"]: r["katz"] for r in katz(ds).take_all()}
    assert got == _brute_katz(EDGES)


def test_katz_rewards_unnormalized_in_mass():
    # hub h receives heavy in-edges from many nodes; leaf gets one
    # light edge — Katz must rank h strictly above leaf AND above its
    # spokes (no out-degree normalization to dilute the spokes' sends)
    rows = [(f"s{i}", "h", 10) for i in range(6)] + [("s0", "leaf", 1)]
    ds = rd.from_arrow(_edges_table(rows)).repartition(2)
    got = {r["node"]: r["katz"] for r in katz(ds).take_all()}
    assert got == _brute_katz(rows)
    assert got["h"] > got["leaf"]
    assert got["h"] > got["s1"]
