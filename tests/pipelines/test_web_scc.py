"""Structural tests for the FW-BW coloring SCC (VERDICT r3, Next #2 —
replaces the path-doubling transitive closure; state must stay
node-sized). The sf-level hash parity vs the recursive-CTE twin is
covered by SQL_CHECKED (web_host_scc); here the algorithm runs on
crafted graphs whose SCC structure is known by hand, including the
shapes the closure version was weak on (one-way tiers, multi-round
class shattering)."""

import pyarrow as pa
import pytest
import ray.data as rd

from bioner_ray.pipelines.web import scc_min_label


def _scc(edges: list[tuple[str, str]], **kw) -> dict[str, str]:
    t = pa.table(
        {
            "a": pa.array([x for x, _ in edges], type=pa.string()),
            "b": pa.array([y for _, y in edges], type=pa.string()),
        }
    )
    out = scc_min_label(rd.from_arrow(t), **kw).to_pandas()
    assert len(out) == len(set(out["host"]))  # one row per node
    return dict(zip(out["host"], out["scc_id"]))


class TestSCCMinLabel:
    def test_rings_chain_and_one_way_tiers(self):
        # ring {a,b,c} ← one-way from 2-ring {f,g}; chain a→d→e; h→d
        edges = [
            ("a", "b"), ("b", "c"), ("c", "a"),
            ("a", "d"), ("d", "e"),
            ("f", "g"), ("g", "f"), ("f", "a"),
            ("h", "d"),
        ]
        assert _scc(edges) == {
            "a": "a", "b": "a", "c": "a",
            "d": "d", "e": "e",
            "f": "f", "g": "f",
            "h": "h",
        }

    def test_pure_dag_every_node_singleton(self):
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]
        assert _scc(edges) == {v: v for v in "abcd"}

    def test_chain_of_rings_needs_class_shattering(self):
        # r1 → r2 → r3: forward minima differ from backward minima for
        # downstream rings in round one, so they settle via recursion
        # on within-class edges — the multi-outer-round path
        edges = []
        rings = [("a1", "a2"), ("b1", "b2"), ("c1", "c2")]
        for x, y in rings:
            edges += [(x, y), (y, x)]
        edges += [("a1", "b1"), ("b1", "c1")]
        assert _scc(edges) == {
            "a1": "a1", "a2": "a1",
            "b1": "b1", "b2": "b1",
            "c1": "c1", "c2": "c1",
        }

    def test_single_giant_ring(self):
        vs = [f"v{i:02d}" for i in range(12)]
        edges = list(zip(vs, vs[1:] + vs[:1]))
        got = _scc(edges)
        assert set(got.values()) == {"v00"}
        assert len(got) == 12

    def test_reverse_chain_labels(self):
        # min label at the SINK: backward propagation carries it against
        # edge direction — a direction-swap bug flips this case
        edges = [("z", "m"), ("m", "a")]
        assert _scc(edges) == {"z": "z", "m": "m", "a": "a"}

    def test_two_node_cycle_with_pendant(self):
        edges = [("x", "y"), ("y", "x"), ("y", "q")]
        assert _scc(edges) == {"x": "x", "y": "x", "q": "q"}

    def test_nonconvergence_guard(self):
        edges = [("a", "b"), ("b", "c"), ("c", "a")]
        with pytest.raises(RuntimeError, match="not converged"):
            _scc(edges, max_inner=1)

    def test_non_ascii_hosts_beat_the_sentinel(self):
        # raw-IDN labels (bytes ≥ 0x80) sort ABOVE an ASCII-range
        # sentinel under UTF-8 byte comparison — with the old '\x7f\x7f'
        # placeholder the absent-side marker could win min() and corrupt
        # the fixpoint labels (ADVICE r4). Ring of two unicode hosts +
        # a pendant; labels must be real hosts, never the sentinel.
        ja, de, asc = "日本語.example", "münchen.example", "a.example"
        edges = [(ja, de), (de, ja), (ja, asc)]
        got = _scc(edges)
        assert set(got) == {ja, de, asc}
        assert got[ja] == got[de] == min(ja, de)
        assert got[asc] == asc
        assert all("\U0010ffff" not in v for v in got.values())
