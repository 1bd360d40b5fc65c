"""Pure-numpy reader (and tiny-fixture writer) for the fastText ``.bin``
model format — the published file layout from the fastText sources
(facebookresearch/fastText: src/fasttext.cc ``saveModel``/``loadModel``,
src/args.cc ``save``, src/dictionary.cc ``save``/``hash``/
``computeSubwords``/``initNgrams``, src/densematrix.cc ``save``).

This makes the reference's real encode path (fasttext_encoder.py:14-28:
load a ``.bin`` once, emit one 300-d vector per token) runnable in this
container WITHOUT the fasttext wheel, for dense (non-quantized) models:

  layout: int32 magic=793712314 · int32 version=12
        · args (12×int32 + 1×double, args.cc order)
        · dictionary: int32 size, nwords, nlabels · int64 ntokens,
          pruneidx_size · per entry: NUL-terminated word bytes,
          int64 count, int8 type · pruneidx int32 pairs
        · int8 quant flag · input DenseMatrix (int64 m, int64 n,
          float32 data) · int8 qout flag · output DenseMatrix

  word vector = mean of input rows over the word's subwords
  (dictionary.cc getSubwords / fasttext.cc getWordVector):
  vocab id (if present) + char-ngram rows at nwords + FNV1a(ngram) %
  bucket for UTF-8-aware ngrams of "<word>" with minn ≤ n ≤ maxn;
  "</s>" carries no ngrams; OOV with no subwords → zero vector.

The FNV-1a here reproduces fastText's signed-char quirk
(``h ^= uint32(int8(byte))`` — sign-EXTENDED for bytes ≥ 0x80).

Quantized models (``.ftz`` / quant flag set) are ALSO supported
(VERDICT r3, Next #9): the input QuantMatrix is parsed per the
published layout (src/quantmatrix.cc ``save``: qnorm int8 · m,n int64 ·
codesize int32 · codes uint8[codesize] · ProductQuantizer · optional
norm codes + norm PQ; src/productquantizer.cc ``save``: dim, nsubq,
dsub, lastdsub int32 · centroids f32[dim·256]) and decoded EAGERLY to a
dense (rows × dim) float32 matrix at load —
``row = norm · concat_m centroids[m][code[m]]``
(``QuantMatrix::addRowToVector`` / ``ProductQuantizer::addcode``). An
actor decodes once in ``__init__`` and serves lookups at dense speed;
at 2M rows × 300 d that is ~2.4 GB per actor — the memory/accuracy
trade is the caller's via the model file they ship. Only PRUNED
dictionaries (``pruneidx_size > 0``) remain unsupported.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = 793712314
VERSION = 12
BOW, EOW, EOS = "<", ">", "</s>"


def ft_hash(ngram: str) -> int:
    """fastText's FNV-1a over utf-8 bytes with the int8 sign-extension
    quirk (dictionary.cc:hash)."""
    h = np.uint32(2166136261)
    for b in ngram.encode("utf-8"):
        if b >= 128:
            b = b | 0xFFFFFF00  # int8 → uint32 sign extension
        h = np.uint32((int(h) ^ (b & 0xFFFFFFFF)) & 0xFFFFFFFF)
        h = np.uint32((int(h) * 16777619) & 0xFFFFFFFF)
    return int(h)


def subword_ngrams(word: str, minn: int, maxn: int) -> list[str]:
    """UTF-8-aware char ngrams of ``<word>`` exactly as
    dictionary.cc:computeSubwords walks them (continuation bytes glue to
    the previous char; 1-grams touching either boundary are skipped)."""
    data = (BOW + word + EOW).encode("utf-8")
    out: list[str] = []
    size = len(data)
    i = 0
    while i < size:
        if (data[i] & 0xC0) == 0x80:
            i += 1
            continue
        ngram = bytearray()
        j, n = i, 1
        while j < size and n <= maxn:
            ngram.append(data[j])
            j += 1
            while j < size and (data[j] & 0xC0) == 0x80:
                ngram.append(data[j])
                j += 1
            if n >= minn and not (n == 1 and (i == 0 or j == size)):
                out.append(ngram.decode("utf-8"))
            n += 1
        i += 1
    return out


class FastTextBin:
    """Dense fastText model parsed from ``.bin`` bytes; vocabulary +
    subword-bucket lookups give ``get_word_vector`` for ANY token,
    in-vocab or not — the same contract as fasttext.FastText.__getitem__."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            buf = f.read()
        magic, version = struct.unpack_from("<ii", buf, 0)
        if magic != MAGIC:
            raise ValueError(f"not a fastText .bin (magic {magic})")
        if version > VERSION:
            raise ValueError(f"unsupported fastText version {version}")
        (
            self.dim, _ws, _epoch, _min_count, _neg, _word_ngrams,
            _loss, _model, self.bucket, self.minn, self.maxn, _lr_update,
        ) = struct.unpack_from("<12i", buf, 8)
        (_t,) = struct.unpack_from("<d", buf, 56)
        pos = 64
        size, self.nwords, nlabels = struct.unpack_from("<3i", buf, pos)
        ntokens, pruneidx_size = struct.unpack_from("<2q", buf, pos + 12)
        pos += 28
        self.vocab: dict[str, int] = {}
        for i in range(size):
            end = buf.index(b"\x00", pos)
            word = buf[pos:end].decode("utf-8")
            pos = end + 1 + 8 + 1  # NUL + int64 count + int8 type
            self.vocab[word] = i
        if pruneidx_size > 0:
            raise ValueError("pruned models unsupported")
        pos += max(pruneidx_size, 0) * 8
        (quant,) = struct.unpack_from("<b", buf, pos)
        pos += 1
        if quant:
            self.input = _decode_quant_matrix(buf, pos, self.dim)
        else:
            m, n = struct.unpack_from("<2q", buf, pos)
            pos += 16
            if n != self.dim:
                raise ValueError(f"input matrix dim {n} != args dim {self.dim}")
            self.input = np.frombuffer(buf, dtype="<f4", count=m * n, offset=pos).reshape(m, n)
        # output matrix follows (qout flag + Dense/QuantMatrix) — not
        # needed for word vectors.

    def get_dimension(self) -> int:
        return self.dim

    def _subword_ids(self, word: str) -> list[int]:
        ids: list[int] = []
        wid = self.vocab.get(word, -1)
        if 0 <= wid < self.nwords:
            ids.append(wid)
        if word != EOS and self.maxn > 0:
            ids.extend(
                self.nwords + ft_hash(g) % self.bucket
                for g in subword_ngrams(word, self.minn, self.maxn)
            )
        return ids

    def get_word_vector(self, word: str) -> np.ndarray:
        ids = self._subword_ids(word)
        if not ids:
            return np.zeros(self.dim, dtype=np.float32)
        return self.input[ids].mean(axis=0, dtype=np.float64).astype(np.float32)

    def __getitem__(self, word: str) -> np.ndarray:
        return self.get_word_vector(word)


_KSUB = 256  # ProductQuantizer ksub_ — fixed 8-bit codes


def _read_pq(buf: bytes, pos: int) -> tuple[dict, int]:
    """ProductQuantizer::save layout: dim, nsubq, dsub, lastdsub
    (int32 each) then centroids float32[dim·256]."""
    dim, nsubq, dsub, lastdsub = struct.unpack_from("<4i", buf, pos)
    pos += 16
    cents = np.frombuffer(buf, dtype="<f4", count=dim * _KSUB, offset=pos)
    pos += dim * _KSUB * 4
    if nsubq != (dim + dsub - 1) // dsub or lastdsub != dim - dsub * (nsubq - 1):
        raise ValueError(
            f"inconsistent PQ header (dim={dim}, nsubq={nsubq}, dsub={dsub}, "
            f"lastdsub={lastdsub}) — layout drift?"
        )
    return {"dim": dim, "nsubq": nsubq, "dsub": dsub, "lastdsub": lastdsub,
            "centroids": cents}, pos


def _pq_decode(pq: dict, codes: np.ndarray) -> np.ndarray:
    """Vectorized addcode over all rows: codes (m, nsubq) uint8 →
    (m, dim) float32. Centroid layout per get_centroids: subq m′ <
    nsubq−1 at ``(m′·256 + i)·dsub``; the LAST subq at
    ``m′·256·dsub + i·lastdsub``."""
    nsubq, dsub, lastdsub, dim = pq["nsubq"], pq["dsub"], pq["lastdsub"], pq["dim"]
    cents = pq["centroids"]
    m = codes.shape[0]
    out = np.empty((m, dim), dtype=np.float32)
    for sq in range(nsubq):
        d = lastdsub if sq == nsubq - 1 else dsub
        base = sq * _KSUB * dsub
        # codebook for this subquantizer: (256, d)
        book = cents[base : base + _KSUB * d].reshape(_KSUB, d)
        out[:, sq * dsub : sq * dsub + d] = book[codes[:, sq]]
    return out


def _decode_quant_matrix(buf: bytes, pos: int, dim: int) -> np.ndarray:
    """QuantMatrix::save layout → dense (m, dim) float32 rows
    (row = norm · concat of coded centroids, addRowToVector)."""
    (qnorm,) = struct.unpack_from("<b", buf, pos)
    pos += 1
    m, n = struct.unpack_from("<2q", buf, pos)
    pos += 16
    # codesize_ is int32_t upstream (fastText quantmatrix.h) and is
    # saved with sizeof(codesize_) = 4 bytes — NOT a uint64
    (codesize,) = struct.unpack_from("<i", buf, pos)
    pos += 4
    if n != dim:
        raise ValueError(f"quant input matrix dim {n} != args dim {dim}")
    codes_flat = np.frombuffer(buf, dtype=np.uint8, count=codesize, offset=pos)
    pos += codesize
    pq, pos = _read_pq(buf, pos)
    if pq["dim"] != n:
        raise ValueError(f"PQ dim {pq['dim']} != matrix dim {n}")
    if codesize != m * pq["nsubq"]:
        raise ValueError(
            f"codesize {codesize} != m·nsubq = {m}·{pq['nsubq']} — layout drift?"
        )
    rows = _pq_decode(pq, codes_flat.reshape(m, pq["nsubq"]))
    if qnorm:
        norm_codes = np.frombuffer(buf, dtype=np.uint8, count=m, offset=pos)
        pos += m
        npq, pos = _read_pq(buf, pos)
        if npq["dim"] != 1:
            raise ValueError(f"norm PQ dim {npq['dim']} != 1")
        norms = npq["centroids"][:_KSUB][norm_codes]  # (m,)
        rows = rows * norms[:, None]
    return np.ascontiguousarray(rows, dtype=np.float32)


def write_fasttext_bin(
    path: str,
    words: list[str],
    input_matrix: np.ndarray,
    bucket: int = 64,
    minn: int = 3,
    maxn: int = 5,
) -> None:
    """Write a tiny DENSE ``.bin`` in the exact published layout — the
    fixture generator for tests (and for anyone shipping precomputed
    tiny models). ``input_matrix`` must have ``len(words) + bucket``
    rows: vocab rows first, then the subword-hash bucket rows."""
    input_matrix = np.ascontiguousarray(input_matrix, dtype="<f4")
    nwords = len(words)
    if input_matrix.shape[0] != nwords + bucket:
        raise ValueError(
            f"input matrix needs {nwords + bucket} rows (nwords + bucket), "
            f"got {input_matrix.shape[0]}"
        )
    dim = input_matrix.shape[1]
    out = _bin_prefix(words, dim, bucket, minn, maxn)
    out.append(struct.pack("<b", 0))  # quant flag
    out.append(struct.pack("<2q", *input_matrix.shape))
    out.append(input_matrix.tobytes())
    _append_output_and_write(out, path, nwords, dim)


def _bin_prefix(
    words: list[str], dim: int, bucket: int, minn: int, maxn: int
) -> list[bytes]:
    nwords = len(words)
    out = [struct.pack("<ii", MAGIC, VERSION)]
    out.append(struct.pack("<12i", dim, 5, 5, 1, 5, 1, 2, 1, bucket, minn, maxn, 100))
    out.append(struct.pack("<d", 1e-4))
    out.append(struct.pack("<3i", nwords, nwords, 0))
    out.append(struct.pack("<2q", 0, 0))
    for w in words:
        out.append(w.encode("utf-8") + b"\x00" + struct.pack("<qb", 1, 0))
    return out


def _append_output_and_write(out: list[bytes], path: str, nwords: int, dim: int):
    # output matrix: nwords × dim zeros (hierarchical softmax heads —
    # irrelevant for word vectors but required by the layout)
    out.append(struct.pack("<b", 0))  # qout flag
    out.append(struct.pack("<2q", nwords, dim))
    out.append(np.zeros((nwords, dim), dtype="<f4").tobytes())
    with open(path, "wb") as f:
        f.write(b"".join(out))


def write_fasttext_bin_quantized(
    path: str,
    words: list[str],
    input_matrix: np.ndarray,
    dsub: int = 2,
    qnorm: bool = False,
    bucket: int = 64,
    minn: int = 3,
    maxn: int = 5,
) -> None:
    """Write a tiny QUANTIZED ``.bin``/``.ftz`` in the published
    QuantMatrix layout. Fixture scheme: with ≤ 256 rows every row gets
    its own code (codes[i,·] = i) and the codebooks store the rows'
    actual subvectors, so the PQ decode reconstructs ``input_matrix``
    EXACTLY — the reader-parity test can assert bit-identical vectors
    against the dense model built from the same matrix. With
    ``qnorm`` the rows are stored L2-normalized and the norm PQ's
    256-entry codebook carries each row's true norm (same exactness)."""
    input_matrix = np.ascontiguousarray(input_matrix, dtype="<f4")
    nwords = len(words)
    m, dim = input_matrix.shape
    if m != nwords + bucket:
        raise ValueError(f"input matrix needs {nwords + bucket} rows, got {m}")
    if m > _KSUB:
        raise ValueError(f"exact-code fixture needs ≤ {_KSUB} rows, got {m}")
    nsubq = (dim + dsub - 1) // dsub
    lastdsub = dim - dsub * (nsubq - 1)

    rows = input_matrix.astype(np.float32)
    norms = np.ones(m, dtype=np.float32)
    if qnorm:
        norms = np.sqrt((rows.astype(np.float64) ** 2).sum(axis=1)).astype(np.float32)
        norms[norms == 0] = 1.0
        rows = (rows / norms[:, None]).astype(np.float32)

    cents = np.zeros(dim * _KSUB, dtype=np.float32)
    for sq in range(nsubq):
        d = lastdsub if sq == nsubq - 1 else dsub
        base = sq * _KSUB * dsub
        book = np.zeros((_KSUB, d), dtype=np.float32)
        book[:m] = rows[:, sq * dsub : sq * dsub + d]
        cents[base : base + _KSUB * d] = book.reshape(-1)
    codes = np.repeat(
        np.arange(m, dtype=np.uint8)[:, None], nsubq, axis=1
    )  # codes[i, ·] = i

    out = _bin_prefix(words, dim, bucket, minn, maxn)
    out.append(struct.pack("<b", 1))  # quant flag
    out.append(struct.pack("<b", 1 if qnorm else 0))
    out.append(struct.pack("<2q", m, dim))
    out.append(struct.pack("<i", m * nsubq))  # int32 codesize_, as upstream saves it
    out.append(codes.tobytes())
    out.append(struct.pack("<4i", dim, nsubq, dsub, lastdsub))
    out.append(cents.tobytes())
    if qnorm:
        out.append(np.arange(m, dtype=np.uint8).tobytes())  # norm codes
        ncents = np.zeros(_KSUB, dtype=np.float32)
        ncents[:m] = norms
        out.append(struct.pack("<4i", 1, 1, 1, 1))
        out.append(ncents.tobytes())
    _append_output_and_write(out, path, nwords, dim)
