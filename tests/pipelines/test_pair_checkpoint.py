"""Dedup pair-table checkpoint (VERDICT r4, Next #7): the shared
jaccard/minhash candidate tables persist as manifest-gated Parquet
under a corpus fingerprint, so a FRESH PROCESS serves the eight
dependent queries from disk; a changed corpus file invalidates the
fingerprint and recomputes."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(sf, texts):
    sf.mkdir(exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": texts,
            }
        ),
        sf / "documents.parquet",
    )


def test_pair_tables_checkpoint_and_invalidate(tmp_path):
    from bioner_ray.pipelines import corpus as co
    from bioner_ray.state.checkpoint import MANIFEST

    sf = tmp_path / "sf"
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    _write_docs(sf, [dup, dup, "totally different words here now ok then"])

    fp1 = co._corpus_fingerprint(str(sf))
    root1 = os.path.join(co._PAIR_STATE_ROOT, fp1)
    shutil.rmtree(root1, ignore_errors=True)

    got1 = co.dedup_jaccard_pairs(str(sf)).to_pandas()
    assert len(got1) == 1 and {got1["a"][0], got1["b"][0]} == {0, 1}
    stage_dir = os.path.join(root1, "jaccard-k3-t0.5")
    assert os.path.exists(os.path.join(stage_dir, MANIFEST))

    # second call is manifest-gated: poison the stage dir's parquet with
    # a sentinel table — if the pipeline recomputed, we'd see the real
    # pairs; we must see the sentinel (proof the on-disk table is read)
    for f in os.listdir(stage_dir):
        if f.endswith(".parquet"):
            os.remove(os.path.join(stage_dir, f))
    pq.write_table(
        pa.table(
            {
                "a": pa.array([7], type=pa.int64()),
                "b": pa.array([9], type=pa.int64()),
                "n_common": pa.array([1], type=pa.int64()),
                "jaccard": pa.array([1.0], type=pa.float64()),
            }
        ),
        os.path.join(stage_dir, "sentinel.parquet"),
    )
    got2 = co.dedup_jaccard_pairs(str(sf)).to_pandas()
    assert got2["a"].tolist() == [7] and got2["b"].tolist() == [9]

    # rewriting the corpus file changes the fingerprint → recompute
    _write_docs(sf, [dup, dup, dup])
    fp2 = co._corpus_fingerprint(str(sf))
    assert fp2 != fp1
    got3 = co.dedup_jaccard_pairs(str(sf)).to_pandas()
    assert len(got3) == 3  # all three docs pair up now
    shutil.rmtree(root1, ignore_errors=True)
    shutil.rmtree(os.path.join(co._PAIR_STATE_ROOT, fp2), ignore_errors=True)
