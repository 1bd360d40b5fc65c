"""n-gram vocabulary pipeline (reference G1-G3, O1) — the engine's first
wide shuffle.

Reference semantics (bioner/model/encoder/ngram_encoder.py):

* G1 count every n-gram of every token across the corpus
  (:139-150 — a single Python dict); here: per-batch PARTIAL counts
  inside ``map_batches`` (combiner) followed by a small
  ``groupby("ngram").sum()`` — the classic partial+final aggregate, so
  the shuffle moves one row per (block, distinct-ngram), not per token.
* G2 drop n-grams with count < min_word_frequency (:23-28, default 10
  at :139).
* G3 index = rank by count descending (:102-121). The reference relies
  on Python's stable sort over dict insertion order for ties —
  nondeterministic under distribution — so we pin the total order
  ``(-count, ngram)`` (SURVEY.md §7.4.4); the reference's own golden
  test (test_n_gram_encoder.py:116-132) is tie-free and passes either
  way.

The finished vocabulary is tiny (⪅10^5 rows); it is collected and
broadcast via ``ray.put`` so every downstream task reads it zero-copy
from the object store instead of re-shipping it per batch (A6/J7
pattern, ray_guide.md broadcast idiom).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from bioner_ray.functions.text import create_n_grams


class Vocab:
    """Broadcastable LookupCache equivalent (ngram_encoder.py:110-121)."""

    def __init__(self, words_in_rank_order: list[str], n: int):
        self.n = n
        self.word_index_map = {w: i for i, w in enumerate(words_in_rank_order)}

    def __len__(self) -> int:
        return len(self.word_index_map)

    def get_index_of_word(self, word: str) -> int:
        return self.word_index_map[word]  # KeyError contract as in reference

    def encode_indices(self, phrase: str) -> list[int]:
        """Sparse one-hot: indices of known n-grams (ngram_encoder.py:164-177
        sets vector[index]=1.0, KeyError → skip). Densify only where needed."""
        idx = {
            self.word_index_map[g]
            for g in create_n_grams(phrase, self.n)
            if g in self.word_index_map
        }
        return sorted(idx)

    def encode(self, phrase: str) -> np.ndarray:
        vec = np.zeros(len(self.word_index_map), dtype=np.float32)
        vec[self.encode_indices(phrase)] = 1.0
        return vec

    def is_unknown(self, word: str) -> bool:
        """Token unknown iff ANY of its n-grams is missing (ngram_encoder.py:179-186)."""
        return any(g not in self.word_index_map for g in create_n_grams(word, self.n))


def _partial_counts_batch(batch: pa.Table, n: int) -> pa.Table:
    """Local combiner: one (ngram, count) row per distinct n-gram per batch."""
    counter: Counter[str] = Counter()
    for doc_sents in batch.column("sentences").to_pylist():
        for sent in doc_sents:
            for token in sent["token_text"]:
                counter.update(create_n_grams(token, n))
    if not counter:
        return pa.table({"ngram": pa.array([], type=pa.string()), "count": pa.array([], type=pa.int64())})
    items = list(counter.items())
    return pa.table(
        {"ngram": [k for k, _ in items], "count": pa.array([v for _, v in items], type=pa.int64())}
    )


def ngram_count_dataset(docs_ds, n: int = 3, batch_size: int = 256):
    """Documents Dataset → (ngram, count) Dataset via partial+final aggregate.

    The final merge runs through ``bucketed_aggregate`` (vocabulary
    cardinality is unbounded pre-filter — web-scale corpora have 10^7+
    distinct n-grams, far past Ray's per-group aggregate sweet spot)."""
    from bioner_ray.stages.shuffle import bucketed_aggregate

    partial = docs_ds.map_batches(
        lambda b: _partial_counts_batch(b, n), batch_format="pyarrow", batch_size=batch_size
    )
    return bucketed_aggregate(partial, ["ngram"], [("count", "sum")])


def build_vocab(docs_ds, n: int = 3, min_word_frequency: int = 10, batch_size: int = 256) -> Vocab:
    """Full G1→G2→G3 pipeline → broadcast-ready ``Vocab``.

    The post-filter vocabulary is small by construction (min-frequency
    cut), so collecting it to the driver for ranking is the scale-safe
    move: the sort runs over ⪅10^5 rows regardless of corpus size.
    """
    import pyarrow.compute as pc

    counts = ngram_count_dataset(docs_ds, n=n, batch_size=batch_size)
    counts = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["count"], min_word_frequency)),
        batch_format="pyarrow",
    )
    rows = counts.take_all()
    rows.sort(key=lambda r: (-r["count"], r["ngram"]))
    return Vocab([r["ngram"] for r in rows], n=n)


def vocab_from_counter(counter: dict[str, int], n: int, min_word_frequency: int = 1) -> Vocab:
    """Driver-side constructor for tests / tiny corpora."""
    items = [(w, c) for w, c in counter.items() if c >= min_word_frequency]
    items.sort(key=lambda kv: (-kv[1], kv[0]))
    return Vocab([w for w, _ in items], n=n)
