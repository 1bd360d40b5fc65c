"""Mergeable distinct-count sketch (KMV / bottom-k) — the scale path
next to the exact two-level count-distinct.

The exact count-distinct (`pipelines/analytics.distinct_users_per_type`)
shuffles one row per distinct (key, value) — correct, but at 100 TB a
high-cardinality column makes that shuffle the job. The K-Minimum-Values
synopsis caps the exchange at ``k`` rows per (block, key): every block
forwards only its k smallest *distinct* 61-bit value hashes per key
(a value hash outside the block-local bottom-k can never be in the
global bottom-k — the same prune argument as stages/rank.py), the
per-key merge re-uniques and re-cuts, and the estimator is

    distinct ≈ (k-1) / h_k   with hashes scaled to (0, 1]

i.e. ``(k-1) * 2^61 / kth_hash`` here (hashes are uniform on
[0, 2^61)). When a key's synopsis holds fewer than k hashes the count
is EXACT (the synopsis is the full distinct hash set). Deterministic
end-to-end — the hash is md5-derived, not seeded — so the DuckDB
oracle replays estimate, k-th hash and synopsis size bit-for-bit.

No reference analog (the reference's distinct counting is the in-memory
vocabulary set, ngram_encoder.py:139-150); extension per SURVEY.md §2.11.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_M61 = 2305843009213693952  # 2^61


def _value_hashes(values: list) -> np.ndarray:
    """Sorted distinct 61-bit hashes (md5 first 8 bytes, mod 2^61 —
    the same construction as the shingle/winnow hashes, so the SQL
    twin is `CAST(concat('0x', substr(md5(v), 1, 16)) AS UBIGINT) %
    2^61`). ``str(value)`` must match DuckDB's VARCHAR cast."""
    hs = np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big") % _M61
            for v in values
        ),
        dtype=np.uint64,
        count=len(values),
    )
    return np.unique(hs)  # sorted ascending


def kmv_distinct(ds, key_col: str, value_col: str, k: int = 64):
    """Per-key distinct count of ``value_col`` via a bottom-k synopsis.

    Columns: key_col, n_synopsis (int64, = min(k, true distinct)),
    kth_hash (int64, the largest hash kept), est_distinct (float64 —
    exact when n_synopsis < k).
    """

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        vals = batch.column(value_col).to_pylist()
        per_key: dict = {}
        for kk, v in zip(keys, vals):
            per_key.setdefault(kk, set()).add(v)
        out_k: list = []
        out_h: list = []
        for kk, vs in per_key.items():
            hs = _value_hashes(list(vs))[:k]
            out_k.extend([kk] * len(hs))
            out_h.extend(hs.tolist())
        return pa.table(
            {
                key_col: pa.array(out_k),
                "hv": pa.array(np.array(out_h, dtype=np.uint64)),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        hs = np.unique(group.column("hv").to_numpy(zero_copy_only=False))[:k]
        n = int(hs.size)
        kth = int(hs[-1]) if n else 0
        if n < k:
            est = float(n)
        else:
            est = (k - 1) * 2305843009213693952.0 / float(kth)
        return pa.table(
            {
                key_col: group.column(key_col).slice(0, 1),
                "n_synopsis": pa.array([n], type=pa.int64()),
                "kth_hash": pa.array([kth], type=pa.int64()),
                "est_distinct": pa.array([est], type=pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(final, batch_format="pyarrow")
    )
