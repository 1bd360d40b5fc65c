"""minhash_recall: the miss half of the sketch calibration pair. The
driver fixture's near-dups are all jaccard >= 0.86 (every pair found,
oracle pins the join/fill logic); the found=0 branch is pinned HERE on
crafted borderline docs (~0.3-0.5 jaccard), where 16 bands x 4 rows has
substantial miss probability — the audit must surface those pairs with
found=0, not drop them."""

import pyarrow as pa
import pyarrow.parquet as pq


def _crafted_docs(tmp_path):
    vocab = [f"w{i}" for i in range(100)]
    docs = []
    for d in range(40):
        shared = " ".join(vocab[:12])
        docs.append((2 * d, shared + " " + " ".join(vocab[20 + d * 2 : 38 + d * 2])))
        docs.append((2 * d + 1, shared + " " + " ".join(vocab[21 + d * 2 : 39 + d * 2])))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in docs], type=pa.int64()),
                "text": pa.array([t for _, t in docs], type=pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    return str(tmp_path)


def test_missed_pairs_surface_with_found_zero(tmp_path):
    from bioner_ray.pipelines.corpus import minhash_recall

    sf = _crafted_docs(tmp_path)
    out = minhash_recall(sf, threshold=0.3).to_pandas()
    assert len(out) > 100
    n_missed = int((out.found == 0).sum())
    n_found = int((out.found == 1).sum())
    # both branches live: the sketch finds the high-sim pairs and
    # misses a substantial borderline fraction
    assert n_missed > 0 and n_found > 0
    # every miss really is a truth pair (jaccard >= threshold)
    assert (out[out.found == 0].jaccard >= 0.3).all()


def test_driver_fixture_perfect_recall_documented(tmp_path):
    # at the driver corpus's >= 0.5 threshold the dup population is
    # high-sim and recall is 1.0 — the property the oracle hash pins
    from bioner_ray.pipelines.corpus import minhash_recall

    out = minhash_recall("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert (out.found == 1).all()
