"""Text-analysis operators: golden values on handcrafted docs."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pytest
import ray.data as rd

from bioner_ray.stages.textstats import (
    fingerprint_stage,
    langid_stage,
    quality_filter_stage,
    rolling_hashes,
    token_stats_stage,
    tokenize_ws,
    winnow_fingerprint,
    winnow_stage,
)


@pytest.fixture(scope="module")
def docs():
    return pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": [
                "The cat sat on the mat",
                "der hund ist gut und der tag ist schön",
                "aaa aaa aaa aaa",
                "",
            ],
        }
    )


class TestTokenStats:
    def test_golden(self, docs):
        out = token_stats_stage(rd.from_arrow(docs)).to_pandas().set_index("doc_id")
        r0 = out.loc[0]
        assert r0.n_tokens == 6 and r0.n_types == 5  # "the" twice after lower
        assert r0.n_chars == len("The cat sat on the mat")
        assert r0.max_token_len == 3
        assert r0.stopword_frac == pytest.approx(3 / 6)  # the, on, the
        r2 = out.loc[2]
        assert r2.n_types == 1 and r2.ttr == pytest.approx(1 / 4)
        r3 = out.loc[3]
        assert r3.n_tokens == 0 and r3.ttr == 0.0

    def test_tokenize_contract(self):
        assert tokenize_ws("  A\tb\n c  ") == ["a", "b", "c"]


class TestQualityFilter:
    def test_window_and_diversity(self, docs):
        kept = quality_filter_stage(
            rd.from_arrow(docs), min_tokens=5, max_tokens=100, min_ttr=0.5
        ).to_pandas()
        assert set(kept.doc_id) == {0, 1}  # doc2 fails ttr, doc3 fails min


class TestLangid:
    def test_profiles(self, docs):
        out = langid_stage(rd.from_arrow(docs)).to_pandas().set_index("doc_id")
        assert out.loc[0].pred_lang == "en"
        assert out.loc[1].pred_lang == "de"
        assert out.loc[3].pred_lang == "und" and out.loc[3].lang_score == 0.0


class TestFingerprints:
    def test_md5_and_bpe(self, docs):
        out = fingerprint_stage(rd.from_arrow(docs)).to_pandas().set_index("doc_id")
        assert out.loc[0].md5 == hashlib.md5(b"The cat sat on the mat").hexdigest()
        assert out.loc[0].n_bpe_tokens == 6
        assert out.loc[3].n_bpe_tokens == 0

    def test_bpe_splits_mixed(self):
        tbl = pa.table({"doc_id": pa.array([0], type=pa.int64()), "text": ["ab12,cd"]})
        out = fingerprint_stage(rd.from_arrow(tbl)).to_pandas()
        # ab | 12 | , | cd
        assert out.iloc[0].n_bpe_tokens == 4


class TestWinnow:
    def test_shift_tolerance(self):
        toks = [f"w{i}" for i in range(40)]
        fp1 = set(winnow_fingerprint(toks))
        fp2 = set(winnow_fingerprint(["zzz"] + toks))  # prefix shift
        inter = len(fp1 & fp2) / max(len(fp1 | fp2), 1)
        assert inter >= 0.5  # winnowing survives shifts on long docs

    def test_rolling_short(self):
        assert rolling_hashes(["a"], window=5).size == 0

    def test_stage(self, docs):
        out = winnow_stage(rd.from_arrow(docs)).to_pandas().set_index("doc_id")
        assert len(out.loc[3].fingerprint) == 0
        assert len(out.loc[0].fingerprint) > 0
