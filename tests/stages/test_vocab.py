"""Vocabulary pipeline goldens — mirrors the reference's n-gram encoder
tests (test_n_gram_encoder.py:58-142): the 'Zaimean Prime Minister
Kisto' corpus at min_word_frequency=1 gives a 23-trigram vocab, etc.
Rank parity is also checked against the reference LookupCache directly.
"""

import sys
from collections import Counter

import ray.data as rd

from bioner_ray.functions.text import create_n_grams
from bioner_ray.schemas import SENTENCE_TYPE
from bioner_ray.stages.vocab import Vocab, build_vocab, vocab_from_counter

TOKENS = ["Zaimean", "Prime", "Minister", "Kisto"]


def _docs_ds():
    import pyarrow as pa

    sentences = [
        [
            {
                "sent_id": 0,
                "token_text": TOKENS,
                "token_start": [0, 6, 11, 0],
                "token_end": [5, 10, 16, 5],
            }
        ]
    ]
    tbl = pa.table(
        {"url": ["doc0"], "sentences": pa.array(sentences, type=pa.list_(SENTENCE_TYPE))}
    )
    return rd.from_arrow(tbl)


class TestBuildVocab:
    def test_reference_goldens(self):
        vocab = build_vocab(_docs_ds(), n=3, min_word_frequency=1)
        assert len(vocab) == 23
        assert not vocab.is_unknown("Prime")
        assert vocab.is_unknown("Kengo")
        v1 = vocab.encode("Minister")
        v2 = vocab.encode("Mistister")
        assert len(v1) == 23 and len(v2) == 23
        assert v1.max() == 1 and v2.max() == 1
        assert v1.sum() == 8 and v2.sum() == 5

    def test_min_frequency_filter(self):
        vocab = build_vocab(_docs_ds(), n=3, min_word_frequency=2)
        # only trigrams occurring ≥2 times survive (e.g. '#pr'? no — 'ri'
        # appears in Prime and... ) just assert strictly smaller
        assert len(vocab) < 23

    def test_rank_matches_reference_lookup_cache(self):
        """Tie-free counts → our (-count, ngram) order must equal the
        reference's count-desc stable sort."""
        import types

        # the reference module transitively imports torch (unavailable
        # here) only for the Dataset base class — stub it out
        if "torch" not in sys.modules:
            torch_mod = types.ModuleType("torch")
            utils_mod = types.ModuleType("torch.utils")
            data_mod = types.ModuleType("torch.utils.data")
            data_mod.Dataset = object
            utils_mod.data = data_mod
            torch_mod.utils = utils_mod
            sys.modules["torch"] = torch_mod
            sys.modules["torch.utils"] = utils_mod
            sys.modules["torch.utils.data"] = data_mod
        sys.path.insert(0, "/root/reference")
        try:
            from bioner.model.encoder.ngram_encoder import LookupCache, Vocabulary
        finally:
            sys.path.remove("/root/reference")
        ref_vocab = Vocabulary()
        words = ["test", "tests", "testz", "tests", "tests", "testz"]
        for w in words:
            ref_vocab.increment_word_count(w)
        cache = LookupCache(vocabulary=ref_vocab)
        ours = vocab_from_counter(Counter(words), n=3)
        for w in set(words):
            assert ours.get_index_of_word(w) == cache.get_index_of_word(w)
        assert ours.get_index_of_word("tests") == 0
        assert ours.get_index_of_word("testz") == 1
        assert ours.get_index_of_word("test") == 2


class TestVocabEncode:
    def test_sparse_indices_match_dense(self):
        vocab = vocab_from_counter(
            Counter(g for t in TOKENS for g in create_n_grams(t, 3)), n=3
        )
        dense = vocab.encode("Minister")
        idx = vocab.encode_indices("Minister")
        assert sorted(i for i, v in enumerate(dense) if v == 1.0) == idx

    def test_unknown_word_encodes_empty(self):
        vocab = vocab_from_counter({"#ab": 1}, n=3)
        assert vocab.encode_indices("zzz") == []
