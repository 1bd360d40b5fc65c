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


class TestQuantized:
    """Product-quantized (.ftz) input matrix (VERDICT r3, Next #9):
    the QuantMatrix/ProductQuantizer layout parses and decodes to
    dense rows. The fixture writer stores EXACT per-row codes
    (≤ 256 rows), so decode must reproduce the dense model
    bit-for-bit (qnorm=False) / to float roundoff (qnorm=True,
    normalize→rescale is two extra roundings)."""

    WORDS = ["alpha", "beta", "gamma", "héllo", "世界"]
    BUCKET = 64

    def _matrix(self):
        rng = np.random.default_rng(7)
        return rng.normal(0, 0.3, (len(self.WORDS) + self.BUCKET, 6)).astype(
            np.float32
        )

    def _paths(self, tmp_path, dsub=2, qnorm=False):
        from bioner_ray.functions.fasttext_io import write_fasttext_bin_quantized

        M = self._matrix()
        dense = str(tmp_path / "d.bin")
        quant = str(tmp_path / "q.ftz")
        write_fasttext_bin(dense, self.WORDS, M, bucket=self.BUCKET, minn=2, maxn=4)
        write_fasttext_bin_quantized(
            quant, self.WORDS, M, dsub=dsub, qnorm=qnorm,
            bucket=self.BUCKET, minn=2, maxn=4,
        )
        return dense, quant

    def test_exact_code_decode_matches_dense_bitwise(self, tmp_path):
        dense, quant = self._paths(tmp_path, dsub=2, qnorm=False)
        d, q = FastTextBin(dense), FastTextBin(quant)
        np.testing.assert_array_equal(d.input, q.input)
        for w in self.WORDS + ["outofvocab", "zz"]:
            np.testing.assert_array_equal(d[w], q[w])

    def test_qnorm_roundtrip_close(self, tmp_path):
        dense, quant = self._paths(tmp_path, dsub=4, qnorm=True)
        d, q = FastTextBin(dense), FastTextBin(quant)
        np.testing.assert_allclose(d.input, q.input, rtol=1e-5, atol=1e-6)
        for w in self.WORDS + ["outofvocab"]:
            np.testing.assert_allclose(d[w], q[w], rtol=1e-5, atol=1e-6)

    def test_uneven_dsub_exercises_lastdsub(self, tmp_path):
        # dim 6, dsub 4 → nsubq 2, lastdsub 2 — the asymmetric-layout
        # branch of get_centroids
        dense, quant = self._paths(tmp_path, dsub=4, qnorm=False)
        d, q = FastTextBin(dense), FastTextBin(quant)
        np.testing.assert_array_equal(d.input, q.input)

    def test_corrupt_pq_header_rejected(self, tmp_path):
        import struct

        _, quant = self._paths(tmp_path)
        raw = bytearray(open(quant, "rb").read())
        # PQ header sits right after codes; find it by recomputing the
        # offset is brittle — instead flip nsubq via targeted search of
        # the (dim, nsubq, dsub, lastdsub) int32 quadruple
        needle = struct.pack("<4i", 6, 3, 2, 2)
        i = raw.find(needle)
        assert i > 0
        raw[i : i + 16] = struct.pack("<4i", 6, 4, 2, 2)
        bad = tmp_path / "bad.ftz"
        bad.write_bytes(bytes(raw))
        with pytest.raises(ValueError, match="inconsistent PQ header"):
            FastTextBin(str(bad))

    def test_encoder_backend_loads_quantized(self, tmp_path):
        from bioner_ray.stages.encode import EmbeddingEncoder

        _, quant = self._paths(tmp_path)
        enc = EmbeddingEncoder(backend="fasttext-bin", model_path=quant)
        assert enc.dim == 6
        vecs = enc._encode_tokens(["alpha", "nope"])
        assert vecs.shape == (2, 6)
        assert np.abs(vecs).sum() > 0

    @pytest.mark.skipif(not HAVE_FASTTEXT, reason="fasttext not installed")
    def test_quant_reader_matches_wheel(self, tmp_path):
        # the day a wheel appears: a real quantized model's vectors must
        # match this reader (same seam as TestWheelParity)
        import fasttext

        _, quant = self._paths(tmp_path)
        m = fasttext.load_model(quant)
        q = FastTextBin(quant)
        for w in self.WORDS:
            np.testing.assert_allclose(m[w], q[w], rtol=1e-5, atol=1e-6)
