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


def _bitlen_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized integer bit length (0 for 0) — exact, no float log."""
    bl = np.zeros(w.shape, dtype=np.int64)
    v = w.astype(np.uint64).copy()
    for sh in (32, 16, 8, 4, 2, 1):
        m = v >= np.uint64(1 << sh)
        bl[m] += sh
        v[m] >>= np.uint64(sh)
    bl[w > 0] += 1
    return bl


def hll_distinct(ds, key_col: str, value_col: str, p: int = 8):
    """Per-key distinct count via HyperLogLog (Flajolet et al. 2007) —
    the FIXED-size mergeable synopsis next to KMV's bottom-k: every
    block ships at most m = 2^p (bucket, max-rank) pairs per key
    regardless of cardinality, and merge is a plain per-bucket max
    (associative, order-free ⇒ deterministic on any cluster shape).

    Same md5-derived 61-bit hash as KMV; bucket = top ``p`` bits, rank
    = 54 − bitlen of the remaining (61−p=53)-bit tail (so rank ∈ [1,
    54]; the bit length is computed in exact integer arithmetic, NOT
    float log2, and replays in SQL as ``length(bin(w))``). The
    registers are harmonically combined through ONE exact int64 sum
    S = Σ 2^(54 − rank) (each term ≤ 2^53, m ≤ 256 terms — no float
    association order to drift), so the raw estimate is a single
    exactly-rounded double expression α·m²·2^54 / S; the small-range
    linear-counting branch (E ≤ 2.5m with empty buckets) uses libm
    ``math.log``, the kg_edge_pmi pinning. The per-key finish walks a
    table bounded by keys × m — the value_percentiles driver-finish
    argument. Columns: key_col, v_zero, s_int, est_distinct."""
    return hll_finish(hll_registers(ds, key_col, value_col, p=p), key_col, p=p)


def hll_registers(ds, key_col: str, value_col: str, p: int = 8):
    """The mergeable half of the HLL: per-key (bucket, max-rank)
    register table — union two register tables and re-max to MERGE
    sketches (the property ``hll_merge_proof`` pins end to end).
    Bounded by keys × 2^p rows."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    tail_bits = 61 - p
    rank_cap = tail_bits + 1  # 54 at p=8

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        vals = batch.column(value_col).to_pylist()
        per_key: dict = {}
        for kk, v in zip(keys, vals):
            per_key.setdefault(kk, set()).add(v)
        out_k: list = []
        out_b: list = []
        out_r: list = []
        for kk, vs in per_key.items():
            hs = _value_hashes(list(vs))
            bucket = (hs >> np.uint64(tail_bits)).astype(np.int64)
            tail = hs & np.uint64((1 << tail_bits) - 1)
            rank = rank_cap - _bitlen_u64(tail)
            # block-local register: max rank per bucket
            reg: dict = {}
            for bb, rr in zip(bucket.tolist(), rank.tolist()):
                if rr > reg.get(bb, 0):
                    reg[bb] = rr
            out_k.extend([kk] * len(reg))
            out_b.extend(reg.keys())
            out_r.extend(reg.values())
        return pa.table(
            {
                key_col: pa.array(out_k),
                "bucket": pa.array(out_b, type=pa.int64()),
                "rank": pa.array(out_r, type=pa.int64()),
            }
        )

    reg_schema = pa.schema(
        [(key_col, pa.string()), ("bucket", pa.int64()), ("rank", pa.int64())]
    )
    return pin_schema(
        bucketed_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            [key_col, "bucket"],
            [("rank", "max")],
        ),
        reg_schema,
    )


def hll_merge(regs_a, regs_b, key_col: str):
    """Sketch merge = per-(key, bucket) max over the unioned register
    tables — associative and order-free."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    reg_schema = pa.schema(
        [(key_col, pa.string()), ("bucket", pa.int64()), ("rank", pa.int64())]
    )
    return pin_schema(
        bucketed_aggregate(
            regs_a.union(regs_b), [key_col, "bucket"], [("rank", "max")]
        ),
        reg_schema,
    )


def hll_finish(regs, key_col: str, p: int = 8):
    """Registers → (v_zero, s_int, est_distinct) per key."""
    import math

    m = 1 << p
    tail_bits = 61 - p
    rank_cap = tail_bits + 1
    alpha = 0.7213 / (1.0 + 1.079 / float(m))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema(
                [
                    (key_col, pa.string()),
                    ("v_zero", pa.int64()),
                    ("s_int", pa.int64()),
                    ("est_distinct", pa.float64()),
                ]
            ).empty_table()
        import pandas as pd

        df = t.to_pandas()
        rows = []
        for kk, g in df.groupby(key_col, sort=True):
            nb = len(g)
            v_zero = m - nb
            s_int = int(
                np.sum(np.int64(1) << (rank_cap - g["rank"].to_numpy(np.int64)))
            ) + (v_zero << rank_cap)
            est = alpha * float(m) * float(m) * float(1 << rank_cap) / float(s_int)
            if est <= 2.5 * m and v_zero > 0:
                est = float(m) * math.log(float(m) / float(v_zero))
            rows.append((kk, v_zero, s_int, est))
        return pa.table(
            {
                key_col: pa.array([r[0] for r in rows]),
                "v_zero": pa.array([r[1] for r in rows], type=pa.int64()),
                "s_int": pa.array([r[2] for r in rows], type=pa.int64()),
                "est_distinct": pa.array([r[3] for r in rows], type=pa.float64()),
            }
        )

    # the register table is bounded by keys × m — per-key finish groups
    # whole keys via the same coarse-bucket shuffle as every aggregate
    return regs.groupby(key_col).map_groups(finish, batch_format="pyarrow")


def cms_params(depth: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Seeded 61-bit affine constants (one (a, b) row pair per sketch
    row), inlined verbatim into the SQL twin by ``__ray_entry__`` — the
    bloom_params construction."""
    rng = np.random.default_rng(seed)
    bound = 1 << 61
    a = rng.integers(1, bound, size=depth, dtype=np.uint64)
    b = rng.integers(0, bound, size=depth, dtype=np.uint64)
    return a, b


def _word_hashes(words: list[str]) -> np.ndarray:
    """61-bit md5-prefix hash per word — the engine's replayable hash
    contract (`CAST(concat('0x', substr(md5(w), 1, 16)) AS UBIGINT) %
    2^61`). Called on per-batch DISTINCT words only, so the Python md5
    loop is vocabulary-bounded, never token-volume-bounded."""
    out = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        out[i] = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big") % _M61
    return out


def _cms_cols(h: np.ndarray, a: np.ndarray, b: np.ndarray, r: int, width: int) -> np.ndarray:
    """Sketch column per word for row ``r``: ((a_r·h + b_r) mod 2^64)
    mod width — numpy uint64 wrap replays as HUGEINT in the twin."""
    with np.errstate(over="ignore"):
        return ((a[r] * h + b[r]) % np.uint64(width)).astype(np.int64)


def _batch_word_counts(batch: pa.Table, text_col: str):
    """Vectorized per-batch word counts under the engine's tokenizer
    contract (lower + split \\s+ + drop empties — textstats.tokenize_ws
    / the shared `tok` SQL CTE). Returns (words, counts)."""
    import pyarrow.compute as pc

    lowered = pc.utf8_lower(pc.cast(batch.column(text_col), pa.string()))
    flat = pc.list_flatten(pc.split_pattern_regex(lowered, r"\s+"))
    flat = flat.filter(pc.not_equal(flat, ""))
    vc = flat.value_counts()
    return vc.field("values").to_pylist(), vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)


def cms_word_counts(
    ds,
    text_col: str = "text",
    depth: int = 4,
    width: int = 64,
    seed: int = 7,
    num_buckets: int = 16,
):
    """Count-min sketch word-frequency estimates — the mergeable
    heavy-hitters synopsis next to the exact G1 word_count.

    The exact count shuffles one row per distinct word per block; at
    crawl scale the long vocabulary tail makes that exchange the job.
    The CMS caps the exchange at ``depth × width`` int64 registers per
    block REGARDLESS of vocabulary: each block pre-counts its words
    (one Arrow value_counts), adds each word's count into
    ``depth`` seeded-affine-hashed register cells, and ships only the
    non-zero cells; the reduce is a (row, col) SUM — sketches merge by
    addition. The estimate for any word is the MIN over its ``depth``
    cells: an upper bound on the true count, exact when no collision
    lands in all of a word's cells. Deterministic end-to-end (md5 word
    hash, seeded affine rows — no RNG at query time), so the DuckDB
    twin replays registers AND estimates bit-for-bit, collisions
    included. ``width`` here defaults small (64) to make collisions
    REAL at fixture vocabulary; production sizing is width ≈ e/ε
    (2^20 cells for ε ≈ 2.6e-6 of total token mass), still ≤ 32 MiB
    per block at depth 4.

    Returns (registers_ds, words_ds): the reduced (r, c, cnt) register
    table and the distinct-word table — ``cms_estimates`` composes
    them. No reference analog (the reference's vocabulary count is
    exact, ngram_encoder.py:139-150); extension per SURVEY.md §2.11.
    """
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    a, b = cms_params(depth, seed=seed)

    def partial(batch: pa.Table) -> pa.Table:
        words, counts = _batch_word_counts(batch, text_col)
        h = _word_hashes(words)
        regs = np.zeros((depth, width), dtype=np.int64)
        for r in range(depth):
            np.add.at(regs[r], _cms_cols(h, a, b, r, width), counts)
        rr, cc = regs.nonzero()
        return pa.table(
            {
                "r": pa.array(rr.astype(np.int64)),
                "c": pa.array(cc.astype(np.int64)),
                "cnt": pa.array(regs[rr, cc]),
            }
        )

    reg_schema = pa.schema([("r", pa.int64()), ("c", pa.int64()), ("cnt", pa.int64())])
    registers = pin_schema(
        bucketed_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["r", "c"],
            [("cnt", "sum")],
            num_buckets=num_buckets,
        ),
        reg_schema,
    )

    def distinct_words(batch: pa.Table) -> pa.Table:
        words, _ = _batch_word_counts(batch, text_col)
        return pa.table({"word": pa.array(words, type=pa.string())})

    words = pin_schema(
        bucketed_aggregate(
            with_ones(ds.map_batches(distinct_words, batch_format="pyarrow")),
            ["word"],
            [("one", "min")],
            num_buckets=num_buckets,
        ),
        pa.schema([("word", pa.string()), ("one", pa.int64())]),
    )
    return registers, words


def cms_estimates(
    registers,
    words,
    depth: int = 4,
    width: int = 64,
    seed: int = 7,
):
    """Per-word CMS estimates: est = min over rows of the word's
    register cell. The register table is depth×width BOUNDED (never
    data-sized), so collecting it driver-side and closing over the
    dense array is the broadcast-small-side pattern, not a
    materialization hazard. Columns: word, est."""
    a, b = cms_params(depth, seed=seed)
    regs = np.zeros((depth, width), dtype=np.int64)
    for row in registers.take_all():
        regs[int(row["r"]), int(row["c"])] = int(row["cnt"])

    def est(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return pa.schema([("word", pa.string()), ("est", pa.int64())]).empty_table()
        ws = batch.column("word").to_pylist()
        h = _word_hashes(ws)
        cells = np.stack(
            [regs[r][_cms_cols(h, a, b, r, width)] for r in range(depth)]
        )
        return pa.table(
            {
                "word": pa.array(ws, type=pa.string()),
                "est": pa.array(cells.min(axis=0).astype(np.int64)),
            }
        )

    return words.map_batches(est, batch_format="pyarrow")


def kmv_pair_overlap(ds, key_col: str, value_col: str, k: int = 64):
    """Mergeable-sketch SET ALGEBRA (Beyer et al.): estimated distinct
    overlap |values(A) ∩ values(B)| for every unordered key pair, from
    the same bottom-k synopses kmv_distinct builds — the cross-segment
    audience-overlap query that exact two-level dedup would pay a
    values×keys shuffle for; the sketch pays k hashes per key.

    Per pair: K_∪ = bottom-k of the two synopses' union,
    ρ = |{h ∈ K_∪ : h ∈ K_A ∧ h ∈ K_B}| / |K_∪|, est_union =
    (k−1)·M/kth (exact |union| when it fits the synopsis), est_inter =
    ρ · est_union. Everything is deterministic (the md5-61-bit value
    hash) and the float composition is pinned to exactly
    `double(n_both)/double(n_usyn) * est_union`, so the DuckDB twin
    replays the estimate bit-for-bit — including its error vs truth.
    The exchange is keys × k hashes; the pair loop runs on the
    keys-bounded synopsis table driver-side. Columns: ta, tb, n_both,
    est_union, est_inter."""
    M = 2305843009213693952.0

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        vals = batch.column(value_col).to_pylist()
        per_key: dict = {}
        for kk, v in zip(keys, vals):
            per_key.setdefault(kk, set()).add(v)
        out_k, out_h = [], []
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
        return pa.table(
            {
                key_col: group.column(key_col).slice(0, 1),
                "synopsis": pa.array([hs.astype(np.int64).tolist()], type=pa.list_(pa.int64())),
            }
        )

    sk = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(final, batch_format="pyarrow")
    )
    rows = sk.take_all()  # bounded: one synopsis row per key
    syn = {r[key_col]: np.array(r["synopsis"], dtype=np.int64) for r in rows}
    keys = sorted(syn)
    out = {"ta": [], "tb": [], "n_both": [], "est_union": [], "est_inter": []}
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            a, b = keys[i], keys[j]
            u = np.union1d(syn[a], syn[b])[:k]
            n_usyn = int(u.size)
            if n_usyn == 0:
                continue
            kth = int(u[-1])
            # union fits both synopses completely only if both sides
            # were exact (size < k) and the merged set is < k
            exact = len(syn[a]) < k and len(syn[b]) < k and n_usyn < k
            est_union = float(n_usyn) if exact else (k - 1) * M / float(kth)
            both = np.intersect1d(u, syn[a], assume_unique=True)
            both = np.intersect1d(both, syn[b], assume_unique=True)
            n_both = int(both.size)
            est_inter = float(n_both) / float(n_usyn) * est_union
            out["ta"].append(a)
            out["tb"].append(b)
            out["n_both"].append(n_both)
            out["est_union"].append(est_union)
            out["est_inter"].append(est_inter)
    return pa.table(
        {
            "ta": pa.array(out["ta"], type=pa.string()),
            "tb": pa.array(out["tb"], type=pa.string()),
            "n_both": pa.array(out["n_both"], type=pa.int64()),
            "est_union": pa.array(out["est_union"], type=pa.float64()),
            "est_inter": pa.array(out["est_inter"], type=pa.float64()),
        }
    )
