"""KMV bottom-k distinct sketch: exact branch, estimator accuracy,
and block-merge correctness (the synopsis must be identical no matter
how rows are split across blocks)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from bioner_ray.stages.sketch import kmv_distinct


def _events(n_rows: int, n_users: int, repeat: int = 3) -> pa.Table:
    ids = [(i * 7919) % n_users for i in range(n_rows * repeat)]
    return pa.table(
        {
            "event_type": pa.array(["t"] * len(ids)),
            "user_id": pa.array(ids, type=pa.int64()),
        }
    )


def _run(tbl: pa.Table, k: int, blocks: int):
    ds = rd.from_arrow(tbl).repartition(blocks)
    return {r["event_type"]: r for r in kmv_distinct(ds, "event_type", "user_id", k=k).take_all()}


class TestKMV:
    def test_exact_branch_below_k(self):
        out = _run(_events(40, 40), k=64, blocks=4)["t"]
        assert out["n_synopsis"] == 40
        assert out["est_distinct"] == 40.0

    def test_estimator_accuracy_above_k(self):
        true = 5000
        out = _run(_events(true, true), k=64, blocks=8)["t"]
        assert out["n_synopsis"] == 64
        # std error ~ 1/sqrt(k-2) ~ 13%; allow 3 sigma
        assert abs(out["est_distinct"] - true) / true < 0.4

    def test_block_split_invariance(self):
        tbl = _events(500, 300)
        a = _run(tbl, k=64, blocks=1)["t"]
        b = _run(tbl, k=64, blocks=16)["t"]
        assert (a["n_synopsis"], a["kth_hash"], a["est_distinct"]) == (
            b["n_synopsis"],
            b["kth_hash"],
            b["est_distinct"],
        )
