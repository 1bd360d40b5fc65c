"""End-to-end KG pipeline + checkpoint/resume tests."""

import json
import os

import pyarrow.parquet as pq
import pytest

from bioner_ray.fixtures import write_pages_parquet
from bioner_ray.pipelines.kg import run_kg_pipeline


@pytest.fixture(scope="module")
def kg_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("kg")
    pages = str(root / "pages")
    out = str(root / "out")
    write_pages_parquet(pages, n_pages=80, shards=2)
    summary = run_kg_pipeline(pages, out, concurrency=2)
    return pages, out, summary


class TestPipeline:
    def test_counts_consistent(self, kg_run):
        _, out, summary = kg_run
        assert summary["documents"] == 80
        assert summary["tagged"] == 80
        assert summary["mentions"] > 0
        assert summary["edges"] <= summary["triples"]
        assert summary["nodes"] > 0

    def test_outputs_are_partitioned_parquet_with_manifests(self, kg_run):
        _, out, _ = kg_run
        for stage in ("documents", "tagged", "mentions", "triples", "edges", "nodes"):
            d = os.path.join(out, stage)
            assert os.path.exists(os.path.join(d, "_SUCCESS")), stage
            assert any(f.endswith(".parquet") for f in os.listdir(d)), stage

    def test_lineage_columns_present(self, kg_run):
        _, out, _ = kg_run
        t = pq.read_table(os.path.join(out, "edges"))
        assert "_lineage_stage" in t.schema.names
        assert set(t.column("_lineage_stage").to_pylist()) == {"edges"}

    def test_edge_weights_sum_to_triples(self, kg_run):
        _, out, summary = kg_run
        edges = pq.read_table(os.path.join(out, "edges"))
        assert sum(edges.column("weight").to_pylist()) == summary["triples"]

    def test_mentions_link_to_concepts(self, kg_run):
        _, out, _ = kg_run
        mentions = pq.read_table(os.path.join(out, "mentions"))
        cids = set(mentions.column("concept_id").to_pylist())
        assert any(c.startswith("C") for c in cids)

    def test_resume_skips_all_stages(self, kg_run):
        pages, out, summary = kg_run
        import time

        t0 = time.monotonic()
        summary2 = run_kg_pipeline(pages, out, concurrency=2)
        assert summary2 == summary
        assert time.monotonic() - t0 < 5.0

    def test_resume_recomputes_torn_stage(self, kg_run):
        pages, out, summary = kg_run
        # simulate a torn write: remove the manifest of the last stage
        os.remove(os.path.join(out, "edges", "_SUCCESS"))
        summary3 = run_kg_pipeline(pages, out, concurrency=2)
        assert summary3["edges"] == summary["edges"]
        assert os.path.exists(os.path.join(out, "edges", "_SUCCESS"))

    def test_deterministic_across_runs(self, kg_run, tmp_path):
        pages, out, summary = kg_run
        out2 = str(tmp_path / "out2")
        summary2 = run_kg_pipeline(pages, out2, concurrency=1)
        assert {k: summary[k] for k in ("documents", "mentions", "triples", "edges", "nodes")} == {
            k: summary2[k] for k in ("documents", "mentions", "triples", "edges", "nodes")
        }
        e1 = pq.read_table(os.path.join(out, "edges")).to_pylist()
        e2 = pq.read_table(os.path.join(out2, "edges")).to_pylist()
        key = lambda e: (e["subj"], e["pred"], e["obj"])
        assert sorted(((key(e), e["weight"], e["first_url"]) for e in e1)) == sorted(
            ((key(e), e["weight"], e["first_url"]) for e in e2)
        )
