"""Sampling / shard-packing / decontamination stages: golden values on
handcrafted corpora plus naive-recomputation equivalence for the
distributed prefix sum."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from bioner_ray.stages.contamination import decontaminate_stage, eval_gram_set
from bioner_ray.stages.sampling import (
    hash_permille,
    stratified_sample_stage,
    token_shards,
)
from bioner_ray.stages.textstats import repetition_stats_stage, tokenize_ws


def _corpus(n: int = 200, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    texts = [
        " ".join(rng.choice(words, size=rng.integers(0, 40))) for _ in range(n)
    ]
    langs = [("en" if i % 3 == 0 else "de") for i in range(n)]
    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": texts,
            "lang": langs,
        }
    )


class TestTokenShards:
    def test_matches_naive_prefix_sum(self):
        t = _corpus()
        # bucket_width far below n → the multi-bucket (level-1 offsets)
        # path is exercised; many blocks → partial sums cross blocks
        out = (
            token_shards(
                rd.from_arrow(t).repartition(8), budget=100, bucket_width=16
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        n_tok = np.array([len(tokenize_ws(x)) for x in t.column("text").to_pylist()])
        excl = np.concatenate(([0], np.cumsum(n_tok[:-1])))
        assert (out["n_tok"].to_numpy() == n_tok).all()
        assert (out["shard"].to_numpy() == excl // 100).all()

    def test_shards_fill_to_budget(self):
        t = _corpus(300, seed=11)
        out = (
            token_shards(rd.from_arrow(t), budget=64, bucket_width=32)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        # every shard except the last holds >= budget tokens once the
        # overflowing doc that closes it is counted in the next shard's
        # exclusive sum — equivalently shard ids are nondecreasing and
        # skip nothing
        shards = out["shard"].to_numpy()
        assert (np.diff(shards) >= 0).all()
        assert set(np.unique(shards)) == set(range(shards.max() + 1))
        totals = out.groupby("shard")["n_tok"].sum()
        assert (totals.iloc[:-1] + out["n_tok"].max() >= 64).all()


class TestStratifiedSample:
    def test_deterministic_and_sql_replayable(self):
        t = _corpus(500)
        ds = stratified_sample_stage(
            rd.from_arrow(t).repartition(6), {"en": 500}, 100
        )
        got = sorted(r["doc_id"] for r in ds.take_all())
        # identical under a different partitioning (cluster-size independence)
        got2 = sorted(
            r["doc_id"]
            for r in stratified_sample_stage(rd.from_arrow(t), {"en": 500}, 100).take_all()
        )
        assert got == got2
        con = duckdb.connect()
        con.register("docs", t.to_pandas())
        want = [
            r[0]
            for r in con.execute(
                """SELECT doc_id FROM docs
                   WHERE (CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296) % 1000
                         < CASE WHEN lang = 'en' THEN 500 ELSE 100 END
                   ORDER BY doc_id"""
            ).fetchall()
        ]
        assert got == want

    def test_rates_roughly_hold(self):
        t = _corpus(3000, seed=3)
        kept = stratified_sample_stage(rd.from_arrow(t), {"en": 500}, 100).to_pandas()
        frac_en = (kept["lang"] == "en").sum() / 1000
        frac_de = (kept["lang"] == "de").sum() / 2000
        assert 0.4 < frac_en < 0.6
        assert 0.05 < frac_de < 0.15

    def test_hash_permille_range(self):
        h = hash_permille(pa.array(range(10_000), type=pa.int64()))
        assert h.min() >= 0 and h.max() < 1000


class TestDecontaminate:
    def test_planted_overlap(self):
        eval_docs = pa.table(
            {
                "doc_id": pa.array([100], type=pa.int64()),
                "text": ["the secret benchmark answer is forty two exactly"],
            }
        )
        train = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": [
                    "totally clean document with fresh words only",
                    # shares the 5-gram "secret benchmark answer is forty"
                    "a leak the secret benchmark answer is forty one maybe",
                    "short",
                ],
            }
        )
        ref = eval_gram_set(rd.from_arrow(eval_docs), n=5)
        kept = decontaminate_stage(rd.from_arrow(train), ref, n=5).to_pandas()
        assert sorted(kept["doc_id"]) == [0, 2]

    def test_no_eval_grams_keeps_everything(self):
        empty_eval = pa.table(
            {"doc_id": pa.array([], type=pa.int64()), "text": pa.array([], type=pa.string())}
        )
        train = _corpus(50)
        ref = eval_gram_set(rd.from_arrow(empty_eval), n=5)
        kept = decontaminate_stage(rd.from_arrow(train), ref, n=5)
        assert kept.count() == 50


class TestTrainingShardExport:
    def test_write_partitioned_and_resume(self, tmp_path):
        from bioner_ray.pipelines.corpus import write_training_shards

        out = str(tmp_path / "shards")
        s1 = write_training_shards("/root/testdata/sf0.001", out, budget=512, resume=False)
        assert s1["rows"] > 0
        import os

        shard_dirs = [d for d in os.listdir(s1["out"]) if d.startswith("shard=")]
        assert len(shard_dirs) > 1  # one directory per shard, never one file
        # resume skips the clean stage (manifest exists) and rewrites shards
        s2 = write_training_shards("/root/testdata/sf0.001", out, budget=512, resume=True)
        assert s2["rows"] == s1["rows"]
        import pyarrow.parquet as pq

        t = pq.read_table(s1["out"])
        assert {"doc_id", "n_tok", "text"} <= set(t.schema.names)

    def test_passthrough_survives_shuffle(self):
        t = _corpus(120, seed=5)
        out = (
            token_shards(
                rd.from_arrow(t).repartition(5),
                budget=64,
                bucket_width=16,
                passthrough_cols=("text",),
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert list(out["text"]) == t.column("text").to_pylist()


class TestRepetitionStats:
    def test_golden(self):
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": ["a a a b", "x y x y x", ""],
            }
        )
        out = repetition_stats_stage(rd.from_arrow(docs)).to_pandas().set_index("doc_id")
        # doc 0: 4 tokens, top "a"×3; bigrams (a,a)(a,a)(a,b) → 3 total 2 distinct
        assert out.loc[0, "top_token_frac"] == pytest.approx(3 / 4)
        assert out.loc[0, "dup_bigram_frac"] == pytest.approx(1 / 3)
        # doc 1: bigrams xy yx xy yx → 4 total 2 distinct
        assert out.loc[1, "top_token_frac"] == pytest.approx(3 / 5)
        assert out.loc[1, "dup_bigram_frac"] == pytest.approx(2 / 4)
        assert out.loc[2, "top_token_frac"] == 0.0
        assert out.loc[2, "dup_bigram_frac"] == 0.0
