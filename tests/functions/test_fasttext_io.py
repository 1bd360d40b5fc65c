"""Pure-numpy fastText .bin reader (functions/fasttext_io.py): hash
vectors, subword-ngram walk, round-trip through the fixture writer, and
the encoder backend driving it — plus the gated parity pin against the
real wheel (absent from this container)."""

from __future__ import annotations

import numpy as np
import pytest

from bioner_ray.functions.fasttext_io import (
    EOS,
    FastTextBin,
    ft_hash,
    subword_ngrams,
    write_fasttext_bin,
)

try:
    import fasttext  # noqa: F401

    HAVE_FASTTEXT = True
except ImportError:
    HAVE_FASTTEXT = False


class TestHash:
    def test_published_fnv1a_vectors(self):
        # FNV-1a 32-bit test vectors (Noll's published table); fastText's
        # hash IS standard FNV-1a for pure-ASCII input
        assert ft_hash("") == 2166136261
        assert ft_hash("a") == 0xE40C292C
        assert ft_hash("foobar") == 0xBF9CF968

    def test_sign_extension_quirk_for_high_bytes(self):
        # bytes ≥ 0x80 go through int8 sign extension (dictionary.cc) —
        # replay the formula with plain python ints as the cross-check
        def ref(s: str) -> int:
            h = 2166136261
            for b in s.encode("utf-8"):
                if b >= 128:
                    b |= 0xFFFFFF00
                h = ((h ^ b) & 0xFFFFFFFF) * 16777619 % 2**32
            return h

        for s in ["é", "naïve", "日本語", "\x7f"]:
            assert ft_hash(s) == ref(s)
        # and the quirk MUST differ from unsigned FNV-1a on high bytes
        h_unsigned = 2166136261
        for b in "é".encode("utf-8"):
            h_unsigned = ((h_unsigned ^ b) & 0xFFFFFFFF) * 16777619 % 2**32
        assert ft_hash("é") != h_unsigned


class TestSubwords:
    def test_ascii_ngrams_match_spec_walk(self):
        # "<cat>": 3-grams {<ca, cat, at>}, 4-grams {<cat, cat>}, 5-gram {<cat>}
        got = subword_ngrams("cat", 3, 5)
        assert got == ["<ca", "<cat", "<cat>", "cat", "cat>", "at>"]

    def test_min_bound_excludes_boundary_unigrams(self):
        # minn=1: 1-grams at i==0 or reaching the end are skipped
        got = subword_ngrams("ab", 1, 2)
        assert "<" not in got and ">" not in got
        assert "a" in got and "b" in got

    def test_utf8_continuation_bytes_glue(self):
        # multibyte chars count as ONE ngram position
        got = subword_ngrams("éz", 2, 2)
        assert got == ["<é", "éz", "z>"]


@pytest.fixture(scope="module")
def tiny_bin(tmp_path_factory):
    rng = np.random.default_rng(11)
    words = ["the", "cat", EOS, "naïve"]
    bucket, dim = 32, 6
    mat = rng.normal(size=(len(words) + bucket, dim)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("ft") / "tiny.bin")
    write_fasttext_bin(path, words, mat, bucket=bucket, minn=3, maxn=4)
    return path, words, mat, bucket


class TestReader:
    def test_header_and_vocab(self, tiny_bin):
        path, words, mat, bucket = tiny_bin
        m = FastTextBin(path)
        assert m.get_dimension() == 6
        assert m.nwords == len(words)
        assert m.bucket == bucket
        assert set(words) <= set(m.vocab)

    def test_vocab_vector_is_mean_of_word_and_ngram_rows(self, tiny_bin):
        path, words, mat, bucket = tiny_bin
        m = FastTextBin(path)
        ids = [words.index("cat")] + [
            len(words) + ft_hash(g) % bucket for g in subword_ngrams("cat", 3, 4)
        ]
        want = mat[ids].mean(axis=0, dtype=np.float64).astype(np.float32)
        np.testing.assert_array_equal(m.get_word_vector("cat"), want)

    def test_oov_uses_only_ngram_rows(self, tiny_bin):
        path, words, mat, bucket = tiny_bin
        m = FastTextBin(path)
        ids = [len(words) + ft_hash(g) % bucket for g in subword_ngrams("dog", 3, 4)]
        want = mat[ids].mean(axis=0, dtype=np.float64).astype(np.float32)
        np.testing.assert_array_equal(m["dog"], want)

    def test_eos_has_no_ngrams(self, tiny_bin):
        path, words, mat, _ = tiny_bin
        m = FastTextBin(path)
        np.testing.assert_array_equal(m[EOS], mat[words.index(EOS)])

    def test_unicode_vocab_word(self, tiny_bin):
        path, words, mat, bucket = tiny_bin
        m = FastTextBin(path)
        ids = [words.index("naïve")] + [
            len(words) + ft_hash(g) % bucket for g in subword_ngrams("naïve", 3, 4)
        ]
        want = mat[ids].mean(axis=0, dtype=np.float64).astype(np.float32)
        np.testing.assert_array_equal(m["naïve"], want)

    def test_bad_magic_rejected(self, tmp_path):
        p = tmp_path / "junk.bin"
        p.write_bytes(b"\x00" * 64)
        with pytest.raises(ValueError, match="magic"):
            FastTextBin(str(p))


class TestEncoderBackend:
    def test_encoder_uses_bin_model(self, tiny_bin):
        from bioner_ray.stages.encode import EmbeddingEncoder

        path, words, mat, bucket = tiny_bin
        enc = EmbeddingEncoder(backend="fasttext-bin", model_path=path)
        assert enc.dim == 6
        out = enc._encode_tokens(["cat", "dog"])
        m = FastTextBin(path)
        np.testing.assert_array_equal(out[0], m["cat"])
        np.testing.assert_array_equal(out[1], m["dog"])

    def test_encode_stage_end_to_end(self, tiny_bin):
        import pyarrow as pa
        import ray.data as rd

        from bioner_ray.stages.encode import encode_stage

        path = tiny_bin[0]
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "sentences": pa.array(
                    [
                        [{"token_text": ["the", "cat"]}],
                        [{"token_text": ["naïve"]}, {"token_text": []}],
                    ]
                ),
            }
        )
        out = encode_stage(
            rd.from_arrow(docs), backend="fasttext-bin", model_path=path,
            concurrency=(1, 1), batch_size=2,
        ).take_all()
        by_id = {r["doc_id"]: r["encodings"] for r in out}
        assert len(by_id[0][0]) == 2 and len(by_id[0][0][0]) == 6
        m = FastTextBin(path)
        np.testing.assert_allclose(by_id[0][0][1], m["cat"], rtol=1e-6)

    def test_missing_model_path_rejected(self):
        from bioner_ray.stages.encode import EmbeddingEncoder

        with pytest.raises(ValueError, match="model_path"):
            EmbeddingEncoder(backend="fasttext-bin")


@pytest.mark.skipif(not HAVE_FASTTEXT, reason="fasttext wheel not installed")
class TestWheelParity:
    def test_reader_matches_wheel_vectors(self, tiny_bin):
        # the real parity pin: the day the wheel exists, our reader's
        # vectors must equal fasttext.load_model's for the same .bin
        import fasttext

        path = tiny_bin[0]
        ours = FastTextBin(path)
        theirs = fasttext.load_model(path)
        for w in ["the", "cat", "dog", "naïve", EOS, "zzzz"]:
            np.testing.assert_allclose(
                ours[w], theirs.get_word_vector(w), rtol=1e-6, atol=1e-7
            )
