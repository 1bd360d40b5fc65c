"""Crafted-graph semantics for kg_metapaths (in×out factorization) and
kg_neighbor_sample (deterministic fanout cap + worker-count stability),
independent of the shared trip-extraction path the SQL gate exercises."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _edges_ds(rows):
    import ray.data as rd

    subj, pred, obj = zip(*rows)
    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array(subj, type=pa.string()),
                "pred": pa.array(pred, type=pa.string()),
                "obj": pa.array(obj, type=pa.string()),
                "weight": pa.array(np.ones(len(rows), dtype=np.int64)),
                "first_url": pa.array(["u"] * len(rows), type=pa.string()),
            }
        )
    )


def test_metapaths_counts_path_instances():
    from bioner_ray.pipelines.analytics import kg_metapaths

    # through m: p∘q = 2 in × 2 out = 4 paths, p∘r = 2×1 = 2;
    # through x: q∘q = 1; through a (via x -q-> a): q∘p = 1.
    rows = [
        ("a", "p", "m"),
        ("b", "p", "m"),
        ("m", "q", "x"),
        ("m", "q", "y"),
        ("m", "r", "z"),
        ("x", "q", "a"),
    ]
    got = {
        (r["p1"], r["p2"]): r["n_paths"]
        for r in kg_metapaths("unused", edges=_edges_ds(rows)).take_all()
    }
    assert got == {("p", "q"): 4, ("p", "r"): 2, ("q", "q"): 1, ("q", "p"): 1}


def test_neighbor_sample_caps_fanout_and_is_stable():
    from bioner_ray.pipelines.analytics import kg_neighbor_sample

    rows = [("hub", f"p{j % 3}", f"n{j}") for j in range(10)] + [("leaf", "p0", "hub")]
    a = kg_neighbor_sample("unused", fanout=4, edges=_edges_ds(rows)).to_pandas()
    per = a.groupby("node").size().to_dict()
    assert per == {"hub": 4, "leaf": 1}
    assert sorted(a[a.node == "hub"].rk) == [1, 2, 3, 4]
    # repartitioned input (different block boundaries) → identical draw
    b = kg_neighbor_sample(
        "unused", fanout=4, edges=_edges_ds(rows).repartition(7)
    ).to_pandas()
    key = ["node", "pred", "nbr", "rk"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )
