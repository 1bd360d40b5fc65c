"""Config-driven pipeline surface (SURVEY §2.10): build-time
validation, equivalence with direct stage calls, and the CLI form."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest
import ray.data as rd

from bioner_ray.pipeline_config import STAGES, build_pipeline, run_config

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"


class TestValidation:
    def test_unknown_stage_fails_at_build(self):
        with pytest.raises(ValueError, match="unknown stage 'nope'"):
            build_pipeline([{"stage": "nope"}])

    def test_unknown_param_fails_at_build(self):
        with pytest.raises(ValueError, match="unknown params \\['bogus'\\]"):
            build_pipeline([{"stage": "quality_filter", "params": {"bogus": 1}}])

    def test_registry_is_populated(self):
        for name in ("extract", "segment", "quality_filter", "stratified_sample"):
            assert name in STAGES
            assert STAGES[name].doc


class TestEquivalence:
    def test_matches_direct_composition(self):
        cfg = {
            "stages": [
                {"stage": "lang_filter", "params": {"lang": "en"}},
                {"stage": "quality_filter", "params": {"min_tokens": 20, "min_ttr": 0.3}},
                {"stage": "select_columns", "params": {"columns": ["doc_id"]}},
            ]
        }
        got = sorted(
            r["doc_id"]
            for r in build_pipeline(cfg)(rd.read_parquet(SF_DOCS)).take_all()
        )
        import pyarrow.compute as pc

        from bioner_ray.stages.textstats import quality_filter_stage

        ds = rd.read_parquet(SF_DOCS).map_batches(
            lambda t: t.filter(pc.equal(t["lang"], "en")), batch_format="pyarrow"
        )
        want = sorted(
            r["doc_id"]
            for r in quality_filter_stage(ds, min_tokens=20, min_ttr=0.3)
            .select_columns(["doc_id"])
            .take_all()
        )
        assert got == want and len(got) > 0

    def test_run_config_writes_parquet(self, tmp_path):
        cfg = [
            {"stage": "token_stats"},
            {"stage": "limit", "params": {"n": 50}},
        ]
        out = str(tmp_path / "out")
        summary = run_config(cfg, SF_DOCS, out)
        assert summary["rows"] == 50
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        assert files
        t = pq.read_table(out)
        assert "n_tokens" in t.schema.names


def test_cli_run(tmp_path):
    cfg_file = tmp_path / "pipe.json"
    cfg_file.write_text(
        json.dumps(
            {
                "stages": [
                    {"stage": "quality_filter", "params": {"min_tokens": 20}},
                    {"stage": "select_columns", "params": {"columns": ["doc_id", "lang"]}},
                ]
            }
        )
    )
    env = dict(os.environ, PYTHONPATH="/root/repo")
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "bioner_ray.cli",
            "run",
            "--config",
            str(cfg_file),
            "--input",
            SF_DOCS,
            "--output",
            str(tmp_path / "out"),
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=180,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["rows"] > 0 and summary["stages"] == ["quality_filter", "select_columns"]
