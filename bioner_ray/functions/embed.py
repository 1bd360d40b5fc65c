"""Deterministic hash embeddings (process-stable, seed-free).

Stand-in for the reference's fastText token encoder
(bioner/model/encoder/fasttext_encoder.py:14-28): a character-trigram
feature-hashing embedding. Unlike ``hash()`` (salted per process), CRC32
is stable across processes/workers, so encodings are identical no matter
how Ray schedules the batch — the determinism requirement of
SURVEY.md §7.4.8.
"""

from __future__ import annotations

import zlib

import numpy as np

from bioner_ray.functions.text import create_n_grams


def hash_embedding(text: str, dim: int = 32) -> np.ndarray:
    """L2-normalized character-trigram hash embedding (float32)."""
    vec = np.zeros(dim, dtype=np.float32)
    for gram in create_n_grams(text, 3):
        h = zlib.crc32(gram.encode("utf-8"))
        vec[h % dim] += 1.0 if (h >> 16) & 1 else -1.0
    norm = float(np.linalg.norm(vec))
    if norm > 0:
        vec /= norm
    return vec


def hash_embedding_batch(texts, dim: int = 32) -> np.ndarray:
    """(n, dim) matrix; computed once per unique text."""
    texts = np.asarray(texts, dtype=object)
    uniq, inverse = np.unique(texts, return_inverse=True)
    mat = np.empty((len(uniq), dim), dtype=np.float32)
    for i, t in enumerate(uniq):
        mat[i] = hash_embedding(t, dim)
    return mat[inverse]
