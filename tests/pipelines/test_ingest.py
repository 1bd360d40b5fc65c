"""Incremental ingest: candidate-set equivalence with the batch LSH
pass, idempotent shard append, and multi-shard accumulation."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from bioner_ray.pipelines.ingest import ingest_shard, init_store
from bioner_ray.stages.dedup import minhash_dedup_pairs

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"
SPLIT = 250


def _half(old: bool):
    def f(batch: pa.Table) -> pa.Table:
        mask = pc.less(batch.column("doc_id"), SPLIT)
        return batch.filter(mask if old else pc.invert(mask))

    return f


def _pairs(ds):
    return {
        (r["a"], r["b"]): (r["n_bands"], round(r["est_jaccard"], 9))
        for r in ds.take_all()
    }


class TestIngest:
    def test_matches_batch_lsh_on_new_involving_pairs(self, tmp_path):
        docs = rd.read_parquet(SF_DOCS, columns=["doc_id", "text"])
        store = str(tmp_path / "store")
        init_store(docs.map_batches(_half(True), batch_format="pyarrow"), store)
        got = _pairs(
            ingest_shard(
                docs.map_batches(_half(False), batch_format="pyarrow"), store, "delta"
            )
        )
        full = _pairs(minhash_dedup_pairs(docs))
        want = {k: v for k, v in full.items() if k[0] >= SPLIT or k[1] >= SPLIT}
        assert got == want and len(got) > 0

    def test_reingest_is_idempotent_and_second_shard_sees_first(self, tmp_path):
        docs = rd.read_parquet(SF_DOCS, columns=["doc_id", "text"])
        store = str(tmp_path / "store")
        init_store(docs.map_batches(_half(True), batch_format="pyarrow"), store)
        new = docs.map_batches(_half(False), batch_format="pyarrow")
        _ = _pairs(ingest_shard(new, store, "delta"))
        # re-ingest of the same shard name: store unchanged (manifest)
        shard_dir = os.path.join(store, "bands", "delta")
        before = sorted(os.listdir(shard_dir))
        ingest_shard(new, store, "delta")
        assert sorted(os.listdir(shard_dir)) == before
        # second shard = duplicate copies of three old docs under new ids:
        # each must collide with its original ACROSS the store
        clones = pa.table(
            {
                "doc_id": pa.array([100001, 100002, 100003], type=pa.int64()),
                "text": [
                    r["text"]
                    # take_all row order is not guaranteed; pin by doc_id
                    for r in sorted(docs.take_all(), key=lambda r: r["doc_id"])
                    if r["doc_id"] in (0, 1, 2)
                ],
            }
        )
        p3 = _pairs(ingest_shard(rd.from_arrow(clones), store, "delta2"))
        hit_lows = {a for (a, b) in p3 if b in (100001, 100002, 100003)}
        assert {0, 1, 2} <= hit_lows
        # exact clones agree on every band
        for orig, clone in ((0, 100001), (1, 100002), (2, 100003)):
            assert p3[(orig, clone)][0] == 16  # all bands

    def test_reingest_does_not_double_count_in_shard_pairs(self, tmp_path):
        # Idempotent-retry correctness: re-ingesting a shard that is
        # ALREADY in the store must return the same pair set with the
        # same n_bands — the shard's own store rows are excluded from
        # the old side, so new-new pairs are not emitted twice.
        docs = rd.read_parquet(SF_DOCS, columns=["doc_id", "text"])
        store = str(tmp_path / "store")
        init_store(docs.map_batches(_half(True), batch_format="pyarrow"), store)
        new = docs.map_batches(_half(False), batch_format="pyarrow")
        first = _pairs(ingest_shard(new, store, "delta"))
        again = _pairs(ingest_shard(new, store, "delta"))
        assert again == first and len(first) > 0


class TestKgIncrementalEdges:
    SF = "/root/testdata/sf0.001"

    def test_merged_store_equals_batch_build(self, tmp_path):
        from bioner_ray.pipelines.analytics import kg_edges
        from bioner_ray.pipelines.ingest import kg_incremental_edges

        inc = (
            kg_incremental_edges(self.SF, store_root=str(tmp_path / "store"))
            .to_pandas()
            .sort_values(["subj", "pred", "obj"], ignore_index=True)
        )
        b = (
            kg_edges(self.SF)
            .to_pandas()
            .sort_values(["subj", "pred", "obj"], ignore_index=True)
        )
        assert inc[["subj", "pred", "obj", "weight", "first_url"]].equals(
            b[["subj", "pred", "obj", "weight", "first_url"]]
        )

    def test_crash_between_parquet_and_marker_reingests_cleanly(self, tmp_path):
        import os
        import shutil

        from bioner_ray.pipelines.analytics import kg_edges
        from bioner_ray.pipelines.ingest import kg_incremental_edges

        store = str(tmp_path / "store2")
        # simulate: shard 0 parquet written but crash before _DONE
        half = os.path.join(store, "shard=0")
        kg_edges(self.SF, doc_parity=0).write_parquet(half)
        assert not os.path.exists(os.path.join(half, "_DONE"))
        # full run wipes and rebuilds deterministically; result matches
        inc = (
            kg_incremental_edges(self.SF, store_root=store)
            .to_pandas()
            .sort_values(["subj", "pred", "obj"], ignore_index=True)
        )
        b = (
            kg_edges(self.SF)
            .to_pandas()
            .sort_values(["subj", "pred", "obj"], ignore_index=True)
        )
        assert len(inc) == len(b) and (inc["weight"] == b["weight"]).all()
        shutil.rmtree(store, ignore_errors=True)


def test_kg_daily_increment_resume_skips_day0(tmp_path):
    """The production resume property: the second call with the same
    persistent root must SKIP day-0 state building (band store +
    base-edge checkpoint manifests) and produce identical deltas from
    the persisted artifacts."""
    import os

    import pandas as pd

    from bioner_ray.pipelines.ingest import kg_daily_increment

    sf = "/root/testdata/sf0.001"
    root = str(tmp_path / "daily")
    out1 = (
        kg_daily_increment(sf, store_root=root)
        .to_pandas()
        .sort_values(["subj", "pred", "obj"], ignore_index=True)
    )
    assert len(out1) > 0
    assert set(out1["status"]) <= {"added", "changed"}
    band_manifest = os.path.join(root, "bands_store", "_SUCCESS")
    edges_manifest = os.path.join(root, "base_edges", "_DONE")
    assert os.path.exists(band_manifest) and os.path.exists(edges_manifest)
    t_band = os.path.getmtime(band_manifest)
    t_edges = os.path.getmtime(edges_manifest)

    out2 = (
        kg_daily_increment(sf, store_root=root)
        .to_pandas()
        .sort_values(["subj", "pred", "obj"], ignore_index=True)
    )
    # day-0 state untouched (not rebuilt), deltas identical
    assert os.path.getmtime(band_manifest) == t_band
    assert os.path.getmtime(edges_manifest) == t_edges
    pd.testing.assert_frame_equal(out1, out2)
