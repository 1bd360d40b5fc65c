"""encode_stage (A1/M6 actor encoder), shuffle_documents (O2) and
sample_error_documents (O3)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from bioner_ray.functions.bio import B, I, O
from bioner_ray.functions.embed import hash_embedding
from bioner_ray.stages.encode import EmbeddingEncoder, encode_stage
from bioner_ray.stages.metrics import sample_error_documents, shuffle_documents

SENT_TYPE = pa.struct(
    [
        ("sent_id", pa.int32()),
        ("token_text", pa.list_(pa.string())),
        ("gold_tags", pa.list_(pa.uint8())),
        ("pred_tags", pa.list_(pa.uint8())),
    ]
)


def _eval_docs(doc_specs):
    """doc_specs: list of (url, [(gold, pred), ...])."""
    rows = []
    for url, pairs in doc_specs:
        rows.append(
            {
                "url": url,
                "sentences": [
                    {
                        "sent_id": i,
                        "token_text": [f"t{j}" for j in range(len(g))],
                        "gold_tags": g,
                        "pred_tags": p,
                    }
                    for i, (g, p) in enumerate(pairs)
                ],
            }
        )
    tbl = pa.table(
        {
            "url": [r["url"] for r in rows],
            "sentences": pa.array([r["sentences"] for r in rows], type=pa.list_(SENT_TYPE)),
        }
    )
    return rd.from_arrow(tbl)


class TestEncodeStage:
    def _docs(self):
        sent_type = pa.struct([("sent_id", pa.int32()), ("token_text", pa.list_(pa.string()))])
        tbl = pa.table(
            {
                "url": ["a", "b"],
                "sentences": pa.array(
                    [
                        [{"sent_id": 0, "token_text": ["x", "y"]}],
                        [{"sent_id": 0, "token_text": ["z"]}, {"sent_id": 1, "token_text": []}],
                    ],
                    type=pa.list_(sent_type),
                ),
            }
        )
        return rd.from_arrow(tbl)

    def test_hash_backend_shapes_and_determinism(self):
        out = {r["url"]: r for r in encode_stage(self._docs(), dim=8).take_all()}
        enc_a = out["a"]["encodings"]
        assert len(enc_a) == 1 and len(enc_a[0]) == 2 and len(enc_a[0][0]) == 8
        np.testing.assert_allclose(
            np.asarray(enc_a[0][0]), hash_embedding("x", 8).astype(np.float32), rtol=0, atol=0
        )
        assert out["b"]["encodings"][1] == []  # empty sentence → no vectors

    def test_fasttext_backend_is_gated_stub(self):
        with pytest.raises((NotImplementedError, ValueError)):
            EmbeddingEncoder(backend="fasttext", model_path="/nonexistent.bin")

    def test_unknown_backend(self):
        with pytest.raises(ValueError):
            EmbeddingEncoder(backend="word2vec")


class TestShuffleAndSampling:
    def test_shuffle_preserves_rows_deterministically(self):
        docs = _eval_docs([(f"u{i}", [([B, O], [B, O])]) for i in range(20)])
        s1 = [r["url"] for r in shuffle_documents(docs, seed=3).take_all()]
        docs2 = _eval_docs([(f"u{i}", [([B, O], [B, O])]) for i in range(20)])
        s2 = [r["url"] for r in shuffle_documents(docs2, seed=3).take_all()]
        assert s1 == s2
        assert sorted(s1) == sorted(f"u{i}" for i in range(20))

    def test_sample_error_documents_only_errors(self):
        specs = [("good0", [([B, I, O], [B, I, O])]), ("bad0", [([B, I, O], [B, O, O])])]
        specs += [(f"good{i}", [([O, B], [O, B])]) for i in range(1, 6)]
        specs += [(f"bad{i}", [([O, B], [O, O])]) for i in range(1, 6)]
        got = [r["url"] for r in sample_error_documents(_eval_docs(specs), n=4, seed=1).take_all()]
        assert len(got) == 4
        assert all(u.startswith("bad") for u in got)

    def test_sample_fewer_errors_than_n(self):
        specs = [("bad0", [([B], [O])]), ("good0", [([B], [B])])]
        got = [r["url"] for r in sample_error_documents(_eval_docs(specs), n=5, seed=1).take_all()]
        assert got == ["bad0"]


class TestWeightedSample:
    def test_matches_bruteforce_priorities(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.sampling import (
            _MOD61,
            _PRIO_A,
            _PRIO_B,
            weighted_sample_stage,
        )

        ids = np.arange(200, dtype=np.int64)
        w = (ids % 7 + 1) * 10
        w[5] = 0  # zero weight must be excluded
        ds = rd.from_arrow(pa.table({"doc_id": ids, "n_chars": w}))
        out = weighted_sample_stage(ds, k=20).to_pandas()

        with np.errstate(over="ignore"):
            h = (ids.astype(np.uint64) * _PRIO_A + _PRIO_B) % _MOD61
        keep = w > 0
        prio = h[keep].astype(np.float64) / w[keep].astype(np.float64)
        order = np.lexsort((ids[keep], prio))[:20]
        assert list(out["doc_id"]) == list(ids[keep][order])
        np.testing.assert_array_equal(out["prio"].to_numpy(), prio[order])
        assert 5 not in set(out["doc_id"])

    def test_k_larger_than_corpus(self):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.sampling import weighted_sample_stage

        ds = rd.from_arrow(
            pa.table({"doc_id": np.arange(5, dtype=np.int64), "n_chars": np.full(5, 3, dtype=np.int64)})
        )
        assert weighted_sample_stage(ds, k=50).count() == 5
