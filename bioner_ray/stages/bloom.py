"""Bloom-filter benchmark decontamination — the broadcast-membership
scale path when even the eval n-gram STRING set is too big to ship.

``stages/contamination.py`` broadcasts the eval set's distinct gram
strings (exact, collision-free); at very large eval suites the strings
themselves dominate the broadcast. A Bloom filter ships ``m_bits/8``
bytes regardless of gram count — typically 10-50× smaller — at the
cost of a known false-positive rate ((1-e^{-kn/m})^k, the classic
bound; Bloom 1970, CACM 13(7)). The standard Dolma/CCNet-style
membership structure for corpus-scale hygiene.

Everything is RNG-free and SQL-replayable, so the oracle replays the
filter's EXACT bit behavior — false positives included:

- gram hash ``h`` = first 8 md5 bytes of the gram, masked to 61 bits
  (the ``stages/graph._node_hash_column`` pattern; DuckDB:
  ``CAST(concat('0x', substr(md5(gm), 1, 16)) AS UBIGINT) % 2^61``);
- bit positions ``p_i = ((A_i·h + B_i) mod 2^64) mod m_bits`` with
  seeded 61-bit constants (HUGEINT products ≤ 2^122 replay the uint64
  wrap — the minhash-twin pattern);
- the filter IS the distinct eval position set: the build emits
  positions as rows (bounded by eval grams × k, never corpus-sized),
  dedups them distributedly, and the driver packs a bit array that is
  ``ray.put`` ONCE; every train task probes it zero-copy.

Token/gram contract matches ``stages/contamination.py``: whitespace
tokens of lower(text), joined by single spaces.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from bioner_ray.stages.contamination import _batch_grams

_MASK61 = (1 << 61) - 1


def bloom_params(k: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Seeded 61-bit affine constants (A_i, B_i), inlined verbatim into
    the SQL twin by ``__ray_entry__``."""
    rng = np.random.default_rng(seed)
    bound = 1 << 61
    a = rng.integers(1, bound, size=k, dtype=np.uint64)
    b = rng.integers(0, bound, size=k, dtype=np.uint64)
    return a, b


def _gram_hashes(grams: list[str]) -> np.ndarray:
    import hashlib

    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big") & _MASK61
    return out


def _positions(h: np.ndarray, a: np.ndarray, b: np.ndarray, m_bits: int) -> np.ndarray:
    """(n, k) bit positions — one vectorized multiply-add per hash fn."""
    with np.errstate(over="ignore"):
        return ((h[:, None] * a[None, :] + b[None, :]) % np.uint64(m_bits)).astype(
            np.int64
        )


def build_bloom(
    ds_eval,
    n: int = 5,
    m_bits: int = 1 << 20,
    k: int = 4,
    seed: int = 42,
    text_col: str = "text",
):
    """Distinct eval bit positions → packed bit array, ``ray.put`` once.

    The position rows are bounded by eval grams × k (the SMALL side);
    per-batch dedup runs distributedly, the driver unions only the
    per-batch distinct sets — the same bounded-collect contract as
    ``contamination.eval_gram_set``."""
    import ray

    a, b = bloom_params(k, seed=seed)

    def positions(batch: pa.Table) -> pa.Table:
        grams, _ = _batch_grams(batch, n, text_col)
        grams = sorted(set(grams))
        if not grams:
            return pa.table({"pos": pa.array([], type=pa.int64())})
        pos = np.unique(_positions(_gram_hashes(grams), a, b, m_bits).ravel())
        return pa.table({"pos": pa.array(pos)})

    bits = np.zeros(m_bits, dtype=bool)
    for row in ds_eval.map_batches(positions, batch_format="pyarrow").take_all():
        bits[row["pos"]] = True
    return ray.put(np.packbits(bits))


def bloom_contamination_stats(
    ds_train,
    bloom_ref,
    n: int = 5,
    m_bits: int = 1 << 20,
    k: int = 4,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-doc Bloom membership stats: (id, n_grams, n_hits,
    contaminated). A gram "hits" iff ALL k of its bits are set — so
    n_hits ≥ true overlaps, with the documented FP surplus; the SQL
    twin reproduces every hit bit-for-bit."""
    import ray

    a, b = bloom_params(k, seed=seed)
    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            ("n_grams", pa.int64()),
            ("n_hits", pa.int64()),
            ("contaminated", pa.bool_()),
        ]
    )

    def stats(batch: pa.Table) -> pa.Table:
        packed = ray.get(bloom_ref)
        grams, rows = _batch_grams(batch, n, text_col)
        n_grams = np.zeros(batch.num_rows, dtype=np.int64)
        n_hits = np.zeros(batch.num_rows, dtype=np.int64)
        if grams:
            np.add.at(n_grams, rows, 1)
            pos = _positions(_gram_hashes(grams), a, b, m_bits)  # (G, k)
            byte_idx, bit_off = pos >> 3, 7 - (pos & 7)  # packbits is MSB-first
            set_bits = (packed[byte_idx] >> bit_off) & 1
            hit = set_bits.all(axis=1)
            np.add.at(n_hits, rows[hit], 1)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_grams": pa.array(n_grams),
                "n_hits": pa.array(n_hits),
                "contaminated": pa.array(n_hits > 0),
            },
            schema=out_schema,
        )

    return ds_train.map_batches(stats, batch_format="pyarrow")
