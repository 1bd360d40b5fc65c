"""Deterministic sampling + token-budget shard packing.

Training-data preparation needs two order-independent primitives the
reference has no analog for (scale extensions, cf. SURVEY.md §2.8):

* **Hash sampling** — keep a row iff a multiplicative hash of its id
  lands under a per-stratum rate. Stateless, exactly reproducible on
  any cluster size, and replayable in ANSI SQL (the driver oracle),
  unlike ``Dataset.random_sample``.
* **Token-budget shard packing** — assign every document to a training
  shard such that shards hold ``budget`` tokens each in ``doc_id``
  order. This is a distributed *prefix sum*: shard(doc) =
  exclusive-cumsum(tokens) // budget. Computed in two levels so no
  stage ever sees the whole corpus:

  1. per-doc token counts + a coarse ``doc_id // bucket_width`` range
     bucket (stateless ``map_batches``);
  2. per-block partial bucket sums (Arrow ``group_by``) — the driver
     collects only ~buckets×blocks tiny rows, exclusive-scans the
     per-bucket totals (10^6 buckets at 10^12 docs with the default
     width — MBs, not the corpus), and broadcasts the offsets with one
     ``ray.put``;
  3. per-bucket ``groupby().map_groups``: sort the bucket by doc_id,
     local cumsum + the bucket's broadcast offset, integer-divide by
     the budget. Each bucket holds ≤ ``bucket_width`` fixed-width rows,
     so group size is bounded by construction (no skew: doc_id ranges
     are uniform by definition).

  The count stage is executed twice (once feeding the partial sums,
  once feeding the final assignment); a production run checkpoints the
  counts to Parquet between the passes (state/checkpoint.py) — they are
  3 int64 columns, ~24 bytes/doc, vs re-reading the text corpus.

Token contract matches textstats: whitespace tokens of lower(text),
i.e. ``regexp_split_to_array(lower(text), '\\s+')`` minus empties.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bioner_ray.stages.textstats import _split_lower

#: Knuth's multiplicative constant; the product is taken mod 2^64
#: (numpy uint64 wraparound) then mod 2^32, which equals
#: ``CAST(id AS HUGEINT) * 2654435761 % 4294967296`` in SQL because
#: 2^32 divides 2^64.
_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(4294967296)


def hash_permille(ids: pa.Array) -> np.ndarray:
    """Deterministic per-id value in [0, 1000) for rate comparisons."""
    v = ids.to_numpy(zero_copy_only=False).astype(np.uint64)
    with np.errstate(over="ignore"):
        return ((v * _KNUTH) % _MOD32) % np.uint64(1000)


def stratified_sample_stage(
    ds,
    rates_permille: dict[str, int],
    default_permille: int,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
):
    """Keep each row iff hash_permille(id) < the stratum's rate.

    Stateless and cluster-size-independent: the same (id, stratum)
    always makes the same keep/drop decision, so a resumed or
    repartitioned run samples identically. The rate table is a plain
    broadcast-by-closure dict (strata are few: languages, sources).
    """

    def keep(batch: pa.Table) -> pa.Table:
        h = hash_permille(batch.column(id_col))
        strata = batch.column(stratum_col).to_pylist()
        limit = np.fromiter(
            (rates_permille.get(s, default_permille) for s in strata),
            dtype=np.uint64,
            count=batch.num_rows,
        )
        return batch.filter(pa.array(h < limit))

    return ds.map_batches(keep, batch_format="pyarrow")


def _token_counts(ds, id_col: str, text_col: str, bucket_width: int, passthrough: tuple):
    def counts(batch: pa.Table) -> pa.Table:
        toks = _split_lower(batch, text_col)
        n = np.array([len(t) for t in toks], dtype=np.int64)
        ids = batch.column(id_col)
        bucket = pc.divide(ids, pa.scalar(bucket_width, type=pa.int64()))
        cols = {id_col: ids, "n_tok": pa.array(n), "_bucket": bucket}
        for c in passthrough:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return ds.map_batches(counts, batch_format="pyarrow")


def token_shards(
    ds,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_width: int = 1 << 20,
    passthrough_cols: tuple = (),
):
    """Assign each document to a token-budget shard (see module doc).

    shard = (sum of n_tok over all docs with smaller doc_id) // budget —
    i.e. documents are packed greedily in doc_id order and never split,
    so a shard may overrun by at most one document. Output columns:
    id_col, ``n_tok``, ``shard`` (all int64), plus any
    ``passthrough_cols`` carried verbatim. Passing the text column
    through means the bucket shuffle moves the corpus once — that IS
    the output repartition a shard-materializing export performs; leave
    it empty for assignment-only (3 int64 columns through the
    shuffle).
    """
    import ray

    counted = _token_counts(ds, id_col, text_col, bucket_width, tuple(passthrough_cols))

    # level 1: per-block partial sums per bucket — tiny (≤ buckets×blocks
    # rows of two int64s) regardless of corpus size
    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["_bucket"]).aggregate([("n_tok", "sum")])
        t = t.select(["_bucket", "n_tok_sum"])
        return t.rename_columns(["_bucket", "n_tok"])

    parts = counted.map_batches(partial, batch_format="pyarrow").take_all()
    totals: dict[int, int] = {}
    for row in parts:
        totals[row["_bucket"]] = totals.get(row["_bucket"], 0) + row["n_tok"]
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(totals):  # exclusive scan over bucket totals
        offsets[b] = acc
        acc += totals[b]
    off_ref = ray.put(offsets)

    # level 2: per-bucket local exclusive cumsum + broadcast offset
    def assign(group: pa.Table) -> pa.Table:
        group = group.sort_by(id_col)
        n = group.column("n_tok").to_numpy()
        start = ray.get(off_ref)[group.column("_bucket")[0].as_py()]
        excl = start + np.concatenate(([0], np.cumsum(n[:-1], dtype=np.int64)))
        cols = {
            id_col: group.column(id_col),
            "n_tok": group.column("n_tok"),
            "shard": pa.array(excl // budget, type=pa.int64()),
        }
        for c in passthrough_cols:
            cols[c] = group.column(c)
        return pa.table(cols)

    return counted.groupby("_bucket").map_groups(assign, batch_format="pyarrow")


def upsample_mix_stage(
    ds,
    weights_permille: dict[str, int],
    default_permille: int,
    id_col: str = "doc_id",
    stratum_col: str = "source",
):
    """Fractional-epoch data mixing: replicate each row floor(w) times
    plus one more iff ``hash_permille(id) < w mod 1000`` (w in
    permille; 2500 = "2.5 epochs", 400 = downsample to 0.4). The
    flat-map counterpart of ``stratified_sample_stage`` — deterministic
    and cluster-size-independent, so a resumed run reproduces the
    exact training mix. Adds ``copy`` (1-based replica index);
    vectorized ``Table.take`` on a repeat index, no per-row Python."""

    def reps(batch: pa.Table) -> pa.Table:
        h = hash_permille(batch.column(id_col))
        strata = batch.column(stratum_col).to_pylist()
        w = np.fromiter(
            (weights_permille.get(s, default_permille) for s in strata),
            dtype=np.int64,
            count=len(strata),
        )
        n = w // 1000 + (h < (w % 1000).astype(np.uint64)).astype(np.int64)
        idx = np.repeat(np.arange(len(n)), n)
        copy = np.arange(idx.size, dtype=np.int64) - np.repeat(np.cumsum(n) - n, n) + 1
        out = batch.take(pa.array(idx))
        return out.append_column("copy", pa.array(copy, type=pa.int64()))

    return ds.map_batches(reps, batch_format="pyarrow")


#: LCG constants (Knuth MMIX) for the priority-sample hash; the affine
#: mix mod 2^64 then mod 2^61 replays in SQL as HUGEINT arithmetic
#: (products ≤ 2^126), the minhash-twin pattern.
_PRIO_A = np.uint64(6364136223846793005)
_PRIO_B = np.uint64(1442695040888963407)
_MOD61 = np.uint64(2305843009213693952)


def weighted_sample_stage(
    ds,
    k: int = 50,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
):
    """Deterministic weighted bottom-k sample (priority sampling,
    Duffield–Lund–Thorup): each row gets priority = h(id) / weight with
    h a seeded 61-bit affine mix, and the global k smallest priorities
    are the sample — inclusion probability ∝ weight in the tail, with
    NO RNG state: the same row always draws the same priority, so a
    resumed or repartitioned run samples identically (the
    stratified_sample argument), and the float is one exactly-rounded
    division (uint→double cast + IEEE divide), bit-replayable in SQL
    without the libm-log pinning a -ln(u)/w Efraimidis–Spirakis key
    would need.

    Scale shape: priorities are vectorized numpy per batch; each block
    prunes to its local bottom-k before the global sort, so the
    sort/limit moves at most k rows per block. Zero/negative weights
    are excluded (they carry no sampling mass). Columns: id, weight,
    prio."""

    def prio(batch: pa.Table) -> pa.Table:
        ids64 = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = w > 0
        with np.errstate(over="ignore"):
            h = (ids64.astype(np.uint64) * _PRIO_A + _PRIO_B) % _MOD61
        p = h.astype(np.float64) / w.astype(np.float64)
        t = pa.table(
            {
                id_col: pa.array(ids64, type=pa.int64()),
                "weight": pa.array(w, type=pa.int64()),
                "prio": pa.array(p, type=pa.float64()),
            }
        ).filter(pa.array(keep))
        if t.num_rows > k:
            t = t.sort_by([("prio", "ascending"), (id_col, "ascending")]).slice(0, k)
        return t

    return (
        ds.map_batches(prio, batch_format="pyarrow")
        .sort(["prio", id_col])
        .limit(k)
    )


def temperature_mix_stage(
    ds,
    budget: int = 200,
    alpha: float = 0.7,
    id_col: str = "doc_id",
    source_col: str = "source",
    mass_col: str = "n_chars",
):
    """Temperature-based source mixing (the multilingual/multi-source
    sampling rule p_s ∝ mass_s^alpha): per-source budgets from ONE
    bounded aggregate, then a deterministic per-source bottom-k draw.

    The only float op is one libm ``pow`` per source, immediately
    quantized to integer micro-units (q_s = floor(mass_s^alpha · 1e6));
    the share normalization and budget split run in exact integers
    (k_s = budget · q_s // Σq), so the SQL twin replays row counts
    bit-for-bit with no float-sum order hazard. The draw reuses the
    61-bit affine priority hash: each source keeps its k_s
    lexicographically-smallest (hash, id) rows — cluster-size- and
    resume-independent like every sampler here. Shape: one bounded
    aggregate + one combiner-pruned per-group top-k (blocks ship at
    most max(k_s) rows per source). Columns: source, id, rk.
    """
    import math

    from bioner_ray.stages.rank import top_k_per_group
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    mass = bucketed_aggregate(
        ds.map_batches(
            lambda t: pa.table(
                {
                    source_col: t.column(source_col),
                    "mass": pc.cast(t.column(mass_col), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        [source_col],
        [("mass", "sum")],
    )
    q_by = {
        r[source_col]: int(math.floor(math.pow(float(r["mass"]), alpha) * 1_000_000))
        for r in mass.take_all()  # bounded: one row per source
        if r["mass"] > 0
    }
    total_q = sum(q_by.values())
    k_by = {s: (budget * q) // total_q for s, q in q_by.items()} if total_q else {}
    max_k = max(k_by.values(), default=0)

    prio_schema = pa.schema(
        [(source_col, pa.string()), (id_col, pa.int64()), ("h", pa.int64())]
    )

    def prio(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            h = (ids.astype(np.uint64) * _PRIO_A + _PRIO_B) % _MOD61
        return pa.table(
            {
                source_col: batch.column(source_col),
                id_col: pa.array(ids),
                "h": pa.array(h.astype(np.int64)),  # < 2^61, sign-safe
            }
        )

    ranked = top_k_per_group(
        ds.map_batches(prio, batch_format="pyarrow"),
        source_col,
        [("h", "ascending"), (id_col, "ascending")],
        max(max_k, 1),
    )

    def keep(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [(source_col, pa.string()), (id_col, pa.int64()), ("rk", pa.int64())]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        ks = np.fromiter(
            (k_by.get(s, 0) for s in t.column(source_col).to_pylist()),
            dtype=np.int64,
            count=t.num_rows,
        )
        rk = t.column("rk").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                source_col: t.column(source_col),
                id_col: t.column(id_col),
                "rk": t.column("rk"),
            }
        ).filter(pa.array(rk <= ks))

    return pin_schema(
        ranked.map_batches(keep, batch_format="pyarrow"),
        pa.schema([(source_col, pa.string()), (id_col, pa.int64()), ("rk", pa.int64())]),
        ensure_block=True,
    )
