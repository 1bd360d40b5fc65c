"""Deduplication operators (exact, n-gram Jaccard, MinHash+LSH,
SimHash) for web-scale corpus hygiene.

The reference's only dedup-shaped machinery is span-set identity
(entity_level_precision_recall.py:112-123 hashes Annotation value
tuples; analysis.py:140-149 takes set differences) and the G1 n-gram
count shuffle (ngram_encoder.py:139-150). These operators scale those
two patterns to documents:

* exact dedup       — hash-partition on a content hash, keep min id per
                      group (D2 pattern: hash-partition + per-group first);
* n-gram Jaccard    — EXACT all-pairs similarity via an inverted
                      shingle index: (shingle, doc) rows → per-shingle
                      pair emission → pair-count groupby → hash join
                      with per-doc set sizes. No driver-side loops; the
                      per-shingle group cap bounds the quadratic blowup
                      of stop-shingles (each block logs dropped-group
                      counts when the cap fires);
* MinHash + LSH     — shingle→minhash signature (vectorized universal
                      hashing) → band→bucket groupby → candidate pairs,
                      the sub-quadratic scale path;
* SimHash           — 64-bit weighted-projection fingerprint, banded
                      into 16-bit chunks for Hamming-distance buckets.

Partitioning assumption (SURVEY.md §7.3): pair keys are always emitted
with ``a < b`` (sorted ids) so the same pair never lands in two groups.
"""

from __future__ import annotations

import math
import hashlib
import logging
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bioner_ray.stages.shuffle import bucketed_aggregate, with_ones
from bioner_ray.stages.textstats import tokenize_ws

_MERSENNE61 = np.uint64((1 << 61) - 1)
_LOG = logging.getLogger(__name__)


def _join(left, right, on, num_partitions: int | None = None):
    """Hash join with bounded aggregator-actor footprint: Ray's shuffle
    join spawns one aggregator actor per partition (1 CPU each by
    default) — at default partition counts the aggregators can reserve
    every core and deadlock the streaming executor (upstream tasks
    starve). So: fractional-CPU aggregators (¼ core each) and a
    partition count sized to the cluster — cpus/4, floor 4 — which
    keeps the aggregators to ≤ 1/16 of the cluster while scaling the
    exchange width with the hardware."""
    if num_partitions is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        num_partitions = max(4, cpus // 4)
    return left.join(
        right,
        join_type="inner",
        num_partitions=num_partitions,
        on=on,
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def content_key_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(id, key) rows; key = md5 hex of the raw text (oracle: md5())."""
    keys = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in batch.column(text_col).to_pylist()]
    return pa.table({id_col: batch.column(id_col), "key": pa.array(keys, type=pa.string())})


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id", batch_size: int = 4096):
    """One row per distinct content: (key, keep_id = min id, n_copies).

    The classic hash-partition + per-group-first: the only shuffle moves
    (id, key) pairs — never the documents themselves — and the groupby
    pre-combines per block before the exchange. Key cardinality ≈ the
    number of distinct documents, so the final merge runs through
    ``bucketed_aggregate`` (C-speed Arrow group_by per coarse bucket),
    not Ray's per-group Python aggregate.
    """
    keyed = ds.map_batches(
        content_key_batch,
        fn_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    agg = bucketed_aggregate(
        with_ones(keyed, "n_copies"), ["key"], [(id_col, "min"), ("n_copies", "sum")]
    )
    return agg.rename_columns({id_col: "keep_id"})


def exact_dedup_filter(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Streaming filter form: keep only rows whose id is the group
    representative. A LEFT-SEMI bucketed join of the corpus against the
    keep set (no broadcast of the corpus, no fanout, and — unlike Ray's
    native join — no crash on empty hash partitions)."""
    from bioner_ray.stages.shuffle import bucketed_inner_join, pin_schema

    left_schema = ds.schema().base_schema
    keep_schema = pa.schema([(id_col, left_schema.field(id_col).type)])
    keep = pin_schema(
        exact_dedup(ds, text_col=text_col, id_col=id_col)
        .select_columns(["keep_id"])
        .rename_columns({"keep_id": id_col}),
        keep_schema,
    )
    return bucketed_inner_join(
        ds, keep, [id_col], left_schema, keep_schema, join_type="left semi"
    )


# ---------------------------------------------------------------------------
# shingles
# ---------------------------------------------------------------------------


def shingle_set(tokens: list[str], k: int = 3) -> list[str]:
    """Distinct k-token shingles (space-joined), order-insensitive set."""
    if len(tokens) < k:
        return []
    return sorted({" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)})


def shingle_rows_batch(
    batch: pa.Table,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = True,
) -> pa.Table:
    """Inverted-index rows: one (shingle, id, n_shingles) per distinct
    doc-shingle. The doc's set size rides along (one int64) so the
    Jaccard denominator never needs a join back to the corpus.

    ``hashed=True`` (default) keys the index by the 64-bit md5-derived
    shingle hash instead of the shingle string: the shuffle then moves
    8 bytes per row instead of ~k words, and bucketing is a vectorized
    integer op. Distinct shingles colliding in 64 bits would overcount
    n_common by 1 — probability ≈ m²/2⁶⁵ per document pair, negligible
    at any realistic shingle count (and absent at test scales);
    ``hashed=False`` keeps exact strings.
    """
    ids_out: list[int] = []
    shingles_out: list = []
    sizes_out: list[int] = []
    for doc_id, text in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
        ss = shingle_set(tokenize_ws(text or ""), k)
        for s in ss:
            ids_out.append(doc_id)
            shingles_out.append(s)
            sizes_out.append(len(ss))
    if hashed:
        shingle_col = pa.array(
            np.array(
                [
                    int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
                    for s in shingles_out
                ],
                dtype=np.uint64,
            )
        )
    else:
        shingle_col = pa.array(shingles_out, type=pa.string())
    return pa.table(
        {
            "shingle": shingle_col,
            id_col: pa.array(ids_out),
            "n_shingles": pa.array(sizes_out, type=pa.int64()),
        }
    )


def doc_shingle_sizes(ds, k: int = 3, text_col: str = "text", id_col: str = "doc_id"):
    """(id, n_shingles) per document — the Jaccard denominator input."""

    def sizes(batch: pa.Table) -> pa.Table:
        ns = [
            len(shingle_set(tokenize_ws(t or ""), k)) for t in batch.column(text_col).to_pylist()
        ]
        return pa.table({id_col: batch.column(id_col), "n_shingles": pa.array(ns, type=pa.int64())})

    return ds.map_batches(sizes, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# bucketed pair emission (shared by Jaccard / MinHash-LSH / SimHash)
# ---------------------------------------------------------------------------

_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array (byte-table lookup — no
    Python bit twiddling per element)."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    if x.size == 0:
        return np.zeros(0, dtype=np.int32)
    return _POPCOUNT8[x.view(np.uint8)].reshape(len(x), 8).sum(axis=1).astype(np.int32)


def _sorted_runs(group: pa.Table, key_col: str, id_col: str):
    """Arrow-sorted (key, id) view of ``group`` plus run boundaries:
    rows bounds[k]:bounds[k+1] share one key value. Sort and adjacent
    compare are Arrow C kernels; no Python per row. Requires distinct
    (key, id) input rows (all callers emit each doc once per key)."""
    import pyarrow.compute as pc

    if group.num_rows == 0:
        return group, np.zeros(1, dtype=np.int64)
    idx = pc.sort_indices(group, sort_keys=[(key_col, "ascending"), (id_col, "ascending")])
    t = group.take(idx).combine_chunks()
    n = t.num_rows
    keys = t.column(key_col)
    neq = pc.not_equal(keys.slice(1), keys.slice(0, n - 1)).to_numpy(zero_copy_only=False)
    change = np.nonzero(neq)[0] + 1
    bounds = np.concatenate(
        [np.zeros(1, dtype=np.int64), change.astype(np.int64), np.array([n], dtype=np.int64)]
    )
    return t, bounds


def _run_pair_indices(bounds: np.ndarray, max_group: int, what: str = "key"):
    """Global (i, j) row-index pairs for every within-run combination;
    runs with <2 or >``max_group`` members are skipped (stop-key bound
    on the quadratic blowup). Python iterates RUNS, never rows/pairs —
    each run contributes one ``triu_indices`` array op.

    Over-cap runs are NOT silent: each block logs a warning with the
    number of dropped keys/rows so a run that diverges from an exact
    oracle because of the cap is visible in the worker logs."""
    ii, jj = [], []
    dropped_runs = 0
    dropped_rows = 0
    for s, e in zip(bounds[:-1], bounds[1:]):
        m = int(e - s)
        if m < 2:
            continue
        if m > max_group:
            dropped_runs += 1
            dropped_rows += m
            continue
        iu, ju = np.triu_indices(m, k=1)
        ii.append(iu.astype(np.int64) + s)
        jj.append(ju.astype(np.int64) + s)
    if dropped_runs:
        _LOG.warning(
            "stop-%s cap (max_group=%d) dropped %d over-cap %s group(s) "
            "covering %d rows in this block; pairs within them are NOT emitted",
            what, max_group, dropped_runs, what, dropped_rows,
        )
    if not ii:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    return np.concatenate(ii), np.concatenate(jj)


def _bucketed_pairs(ds, key_col: str, id_col: str, max_group: int = 1024, num_buckets: int = 256):
    """(key, id) rows → all in-key pairs (a < b), WITHOUT one Ray group
    per key: keys are hashed into ``num_buckets`` coarse buckets (the
    shuffle partitioning unit), and pair emission inside each bucket is
    a local Arrow sort + vectorized run-scan — a few large groups
    instead of millions of tiny ones. Keys with more than ``max_group``
    members are stop-keys: skipped (bounded quadratic blowup).
    """

    def add_bucket(batch: pa.Table) -> pa.Table:
        col = batch.column(key_col)
        if pa.types.is_integer(col.type):
            h = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                buckets = ((h * np.uint64(2654435761)) % np.uint64(num_buckets)).astype(np.int32)
            return batch.append_column("bucket", pa.array(buckets, type=pa.int32()))
        from bioner_ray.stages.shuffle import hash_strings_u64

        buckets = (hash_strings_u64(col) % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("bucket", pa.array(buckets, type=pa.int32()))

    def emit(group: pa.Table) -> pa.Table:
        t, bounds = _sorted_runs(group, key_col, id_col)
        ii, jj = _run_pair_indices(bounds, max_group)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64) if t.num_rows else np.zeros(0, dtype=np.int64)
        return pa.table(
            {"a": pa.array(ids[ii], type=pa.int64()), "b": pa.array(ids[jj], type=pa.int64())}
        )

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(emit, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (inverted index; the oracle-checkable path)
# ---------------------------------------------------------------------------


def jaccard_pairs(
    ds,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_docs: int = 1024,
    num_buckets: int = 256,
):
    """All document pairs with shingle-set Jaccard >= ``threshold``.

    Exact UP TO the stop-shingle cap: a shingle shared by more than
    ``max_shingle_docs`` documents contributes no pairs (the blocks log
    a warning with the dropped counts when this fires) — raise the cap
    for small oracle-checked corpora, keep it for web scale. Join-free:
      1. inverted-index rows (shingle, id, n_shingles) — the set size
         rides with every row, so no join back to the corpus is needed;
      2. bucket the shingle key space (num_buckets coarse partitions),
         emit in-shingle pairs (a, b, na, nb) with a < b via a local
         sort + run scan per bucket (shingles with > max_shingle_docs
         members are stop-shingles: skipped, bounded blowup);
      3. groupby(a, b): count = |A∩B|, na/nb via min (constant per key);
      4. jaccard = c / (na + nb − c), one float division, bit-identical
         to the DuckDB oracle's.

    Columns: a, b, n_common, jaccard. Shuffled payload is only the
    inverted index and the pair keys — never documents.
    """
    return _shingle_pair_counts(
        ds, k, text_col, id_col, max_shingle_docs, num_buckets
    ).map_batches(_jaccard_finish(threshold), batch_format="pyarrow")


def _jaccard_finish(threshold: float):
    def finish(batch: pa.Table) -> pa.Table:
        c = batch.column("n_common").to_numpy().astype(np.float64)
        na = batch.column("na").to_numpy().astype(np.float64)
        nb = batch.column("nb").to_numpy().astype(np.float64)
        jac = c / (na + nb - c)
        out = pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "n_common": batch.column("n_common"),
                "jaccard": pa.array(jac, type=pa.float64()),
            }
        )
        return out.filter(pa.array(jac >= threshold))

    return finish


def _shingle_pair_counts(
    ds, k: int, text_col: str, id_col: str, max_shingle_docs: int, num_buckets: int
):
    """Shared candidate machinery of jaccard_pairs / containment_pairs:
    inverted index → bucketed in-shingle pair emission (stop-shingle
    capped) → ONE (a, b) aggregate carrying n_common + both set sizes."""
    inv = ds.map_batches(
        shingle_rows_batch,
        fn_kwargs={"k": k, "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        col = batch.column("shingle")
        if pa.types.is_unsigned_integer(col.type) or pa.types.is_integer(col.type):
            h = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                buckets = ((h * np.uint64(2654435761)) % np.uint64(num_buckets)).astype(np.int32)
            return batch.append_column("bucket", pa.array(buckets, type=pa.int32()))
        from bioner_ray.stages.shuffle import hash_strings_u64

        buckets = (hash_strings_u64(col) % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("bucket", pa.array(buckets, type=pa.int32()))

    def emit(group: pa.Table) -> pa.Table:
        t, bounds = _sorted_runs(group, "shingle", id_col)
        ii, jj = _run_pair_indices(bounds, max_shingle_docs, what="shingle")
        if t.num_rows:
            ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            ns = t.column("n_shingles").to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            ids = ns = np.zeros(0, dtype=np.int64)
        return pa.table(
            {
                "a": pa.array(ids[ii], type=pa.int64()),
                "b": pa.array(ids[jj], type=pa.int64()),
                "na": pa.array(ns[ii], type=pa.int64()),
                "nb": pa.array(ns[jj], type=pa.int64()),
            }
        )

    pairs = (
        inv.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(emit, batch_format="pyarrow")
    )
    # (a, b) cardinality ≈ number of candidate pairs (millions) — Ray's
    # per-group aggregate would dominate wall time; bucketed_aggregate
    # keeps the merge at Arrow C speed.
    agg = bucketed_aggregate(
        with_ones(pairs, "n_common"),
        ["a", "b"],
        [("n_common", "sum"), ("na", "min"), ("nb", "min")],
        num_buckets=num_buckets,
    )

    return agg


def containment_pairs(
    ds,
    k: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_docs: int = 1024,
    num_buckets: int = 256,
):
    """Asymmetric near-dup pairs by the CONTAINMENT (overlap)
    coefficient ``|A∩B| / min(|A|, |B|)`` — the quote-inclusion /
    boilerplate-wrap detector symmetric Jaccard misses: a short doc
    fully embedded in a long one scores containment ≈ 1 while its
    Jaccard stays tiny. Identical join-free plan to ``jaccard_pairs``
    (same inverted index, same stop-shingle cap, same (a, b)
    aggregate); only the final coefficient and the ``contained_id``
    column (the smaller side — the removal candidate) differ.
    Columns: a, b, n_common, containment, contained_id."""
    agg = _shingle_pair_counts(
        ds, k, text_col, id_col, max_shingle_docs, num_buckets
    )

    def finish(batch: pa.Table) -> pa.Table:
        c = batch.column("n_common").to_numpy().astype(np.float64)
        na_i = batch.column("na").to_numpy().astype(np.int64)
        nb_i = batch.column("nb").to_numpy().astype(np.int64)
        cont = c / np.minimum(na_i, nb_i).astype(np.float64)
        a_ids = batch.column("a").to_numpy().astype(np.int64)
        b_ids = batch.column("b").to_numpy().astype(np.int64)
        out = pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "n_common": batch.column("n_common"),
                "containment": pa.array(cont, type=pa.float64()),
                "contained_id": pa.array(
                    np.where(na_i <= nb_i, a_ids, b_ids), type=pa.int64()
                ),
            }
        )
        return out.filter(pa.array(cont >= threshold))

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH (sub-quadratic scale path)
# ---------------------------------------------------------------------------


def _minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE61), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE61), size=num_perm, dtype=np.uint64)
    return a, b


def shingle_hashes(tokens: list[str], k: int = 3) -> np.ndarray:
    """Stable 64-bit hash per distinct shingle (crc32 of md5 is too
    short; use the first 8 bytes of md5 — process-independent)."""
    return np.array(
        [
            int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") & int(_MERSENNE61)
            for s in shingle_set(tokens, k)
        ],
        dtype=np.uint64,
    )


def minhash_signature(tokens: list[str], a: np.ndarray, b: np.ndarray, k: int = 3) -> np.ndarray:
    """(num_perm,) uint64 signature: h_i(x) = a_i·x + b_i in wraparound
    uint64 arithmetic (deterministic, platform-independent), min over
    the doc's shingle hashes — one (P, S) vectorized pass."""
    h = shingle_hashes(tokens, k)
    if h.size == 0:
        return np.full(a.shape[0], np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        v = a[:, None] * h[None, :] + b[:, None]
    return v.min(axis=1)


def minhash_stage(
    ds,
    num_perm: int = 64,
    k: int = 3,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 1024,
):
    """Adds a ``signature: list<uint64>`` column (one row per doc)."""
    a, b = _minhash_params(num_perm, seed)

    def sig(batch: pa.Table) -> pa.Table:
        sigs = [
            minhash_signature(tokenize_ws(t or ""), a, b, k).tolist()
            for t in batch.column(text_col).to_pylist()
        ]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "signature": pa.array(sigs, type=pa.list_(pa.uint64())),
            }
        )

    return ds.map_batches(sig, batch_format="pyarrow", batch_size=batch_size)


def lsh_candidate_pairs(
    sig_ds, bands: int = 16, id_col: str = "doc_id", max_bucket: int = 4096
):
    """Band the signatures, bucket-groupby, emit in-bucket pairs.

    Each signature of length P is cut into ``bands`` rows of P/bands
    values; the bucket key is (band_id, md5 of the band values). Two
    docs collide in some band iff they are LSH candidates. Output:
    distinct (a, b) with a < b and ``n_bands`` collision count.
    """

    def band_rows(batch: pa.Table) -> pa.Table:
        ids_out, band_ids, keys = [], [], []
        for doc_id, sig in zip(
            batch.column(id_col).to_pylist(), batch.column("signature").to_pylist()
        ):
            arr = np.asarray(sig, dtype=np.uint64)
            per = len(arr) // bands
            for bi in range(bands):
                chunk = arr[bi * per : (bi + 1) * per]
                keys.append(hashlib.md5(chunk.tobytes()).hexdigest())
                band_ids.append(bi)
                ids_out.append(doc_id)
        return pa.table(
            {
                "band": pa.array(band_ids, type=pa.int32()),
                "bkey": pa.array(keys, type=pa.string()),
                id_col: pa.array(ids_out),
            }
        )

    banded = sig_ds.map_batches(band_rows, batch_format="pyarrow")

    def fuse_key(batch: pa.Table) -> pa.Table:
        keys = [
            f"{b}:{k}"
            for b, k in zip(batch.column("band").to_pylist(), batch.column("bkey").to_pylist())
        ]
        return pa.table(
            {"bandkey": pa.array(keys, type=pa.string()), id_col: batch.column(id_col)}
        )

    pairs = _bucketed_pairs(
        banded.map_batches(fuse_key, batch_format="pyarrow"), "bandkey", id_col,
        max_group=max_bucket,
    )
    return bucketed_aggregate(with_ones(pairs, "n_bands"), ["a", "b"], [("n_bands", "sum")])


def band_hash_stage(sigs_ds, bands: int, num_perm: int, id_col: str = "doc_id"):
    """Signature rows → (bandkey: uint64, id) LSH band rows, 8 bytes of
    key per band (the band index is folded into the hash input so the
    same slice values in different bands never share a key). Shared by
    ``minhash_dedup_pairs(payload="bandhash")`` and the incremental
    ingest store (pipelines/ingest.py)."""
    per = num_perm // bands

    def band_hash_rows(batch: pa.Table) -> pa.Table:
        ids_out: list = []
        keys: list[int] = []
        for doc_id, sig in zip(
            batch.column(id_col).to_pylist(), batch.column("signature").to_pylist()
        ):
            arr = np.asarray(sig, dtype=np.uint64)
            for bi in range(bands):
                digest = hashlib.md5(
                    bi.to_bytes(4, "big") + arr[bi * per : (bi + 1) * per].tobytes()
                ).digest()
                keys.append(int.from_bytes(digest[:8], "big"))
                ids_out.append(doc_id)
        return pa.table(
            {
                "bandkey": pa.array(np.array(keys, dtype=np.uint64)),
                id_col: pa.array(ids_out),
            }
        )

    return sigs_ds.map_batches(band_hash_rows, batch_format="pyarrow")


def minhash_dedup_pairs(
    ds,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 4096,
    num_buckets: int = 256,
    payload: str = "bandhash",
):
    """MinHash→LSH candidate pairs. Columns: a, b, n_bands, est_jaccard.

    Two payload strategies (same candidate-pair set either way — pair
    selection is band-hash equality in both):

    * ``payload="bandhash"`` (default, the 100-TB shape): each band row
      carries only an 8-byte hash of its own band slice, so the bucket
      shuffle moves ~16 B/doc/band instead of the full signature
      (num_perm × 8 B/doc/band — 34× more at 64 perms). Collisions are
      aggregated per (a, b) in a SECOND, tiny shuffle whose volume is
      the candidate-pair population (near-dups + LSH false positives),
      not the corpus. ``est_jaccard`` is the band-level estimator
      ``(n_bands/bands)^(1/rows_per_band)`` (E[band agrees] = J^r).
    * ``payload="signature"``: join-free — band rows carry the full
      signature; a pair colliding in several bands is emitted
      exclusively by its first agreeing band (checked on the carried
      signatures), the pair shuffle does not exist, and ``est_jaccard``
      is slot-wise (fraction of agreeing signature slots — a finer
      estimator). Costs ``bands×`` signature bytes through the shuffle.
    """
    sigs = minhash_stage(ds, num_perm=num_perm, k=k, seed=seed, text_col=text_col, id_col=id_col)
    per = num_perm // bands

    if payload == "bandhash":
        banded = band_hash_stage(sigs, bands=bands, num_perm=num_perm, id_col=id_col)
        pairs = _bucketed_pairs(
            banded, "bandkey", id_col, max_group=max_bucket, num_buckets=num_buckets
        )
        agg = bucketed_aggregate(
            with_ones(pairs, "n_bands"), ["a", "b"], [("n_bands", "sum")],
            num_buckets=num_buckets,
        )

        def finish(batch: pa.Table) -> pa.Table:
            # math.pow, not numpy's vectorized **: libm matches the
            # DuckDB oracle bit-for-bit; numpy's SIMD pow is 1 ulp off.
            # Volume here is the candidate-pair population — tiny.
            nb = batch.column("n_bands").to_numpy()
            est = [math.pow(n / float(bands), 1.0 / per) for n in nb]
            return batch.append_column("est_jaccard", pa.array(est, type=pa.float64()))

        return agg.map_batches(finish, batch_format="pyarrow")
    if payload != "signature":
        raise ValueError(f"unknown payload mode {payload!r}")

    def band_rows(batch: pa.Table) -> pa.Table:
        ids_out, keys, band_out, buckets, sig_out = [], [], [], [], []
        for doc_id, sig in zip(
            batch.column(id_col).to_pylist(), batch.column("signature").to_pylist()
        ):
            arr = np.asarray(sig, dtype=np.uint64)
            for bi in range(bands):
                key = f"{bi}:{hashlib.md5(arr[bi * per : (bi + 1) * per].tobytes()).hexdigest()}"
                keys.append(key)
                band_out.append(bi)
                buckets.append(zlib.crc32(key.encode()) % num_buckets)
                ids_out.append(doc_id)
                sig_out.append(sig)
        return pa.table(
            {
                "bandkey": pa.array(keys, type=pa.string()),
                "band": pa.array(band_out, type=pa.int32()),
                "bucket": pa.array(buckets, type=pa.int32()),
                id_col: pa.array(ids_out),
                "signature": pa.array(sig_out, type=pa.list_(pa.uint64())),
            }
        )

    def emit(group: pa.Table) -> pa.Table:
        t, bounds = _sorted_runs(group, "bandkey", id_col)
        ii, jj = _run_pair_indices(bounds, max_bucket, what="band-bucket")
        empty = pa.table(
            {
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
                "n_bands": pa.array([], type=pa.int64()),
                "est_jaccard": pa.array([], type=pa.float64()),
            }
        )
        if len(ii) == 0:
            return empty
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        band_col = t.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        sigs_m = np.asarray(t.column("signature").to_pylist(), dtype=np.uint64)  # (n, P)
        eq = sigs_m[ii] == sigs_m[jj]  # (pairs, P)
        band_eq = eq[:, : bands * per].reshape(len(ii), bands, per).all(axis=2)
        first_band = band_eq.argmax(axis=1)  # first agreeing band (≥1 exists: this run's)
        keep = band_col[ii] == first_band
        if not keep.any():
            return empty
        return pa.table(
            {
                "a": pa.array(ids[ii][keep], type=pa.int64()),
                "b": pa.array(ids[jj][keep], type=pa.int64()),
                "n_bands": pa.array(band_eq.sum(axis=1)[keep], type=pa.int64()),
                "est_jaccard": pa.array(eq.mean(axis=1)[keep], type=pa.float64()),
            }
        )

    return (
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(emit, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token md5 hashes, weight = term frequency."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    counts: dict[str, int] = {}
    for t in tokens:
        counts[t] = counts.get(t, 0) + 1
    for t, w in counts.items():
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), w, -w)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_stage(ds, text_col: str = "text", id_col: str = "doc_id", batch_size: int = 1024):
    def sh(batch: pa.Table) -> pa.Table:
        hs = [simhash64(tokenize_ws(t or "")) for t in batch.column(text_col).to_pylist()]
        return pa.table(
            {id_col: batch.column(id_col), "simhash": pa.array(hs, type=pa.uint64())}
        )

    return ds.map_batches(sh, batch_format="pyarrow", batch_size=batch_size)


def simhash_pairs(
    ds,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chunk_group: int = 65536,
):
    """Near-dup pairs with Hamming distance ≤ ``max_hamming``.

    Pigeonhole banding: split the 64-bit hash into ``max_hamming + 1``
    chunks — any pair within distance d agrees on ≥1 chunk — bucket by
    (chunk_id, chunk_value), emit in-bucket pairs, verify exactly.
    Fully vectorized: banding is one numpy shift/mask pass, pair
    verification is a table-lookup popcount over ``xor`` arrays — no
    Python per row or per pair. Chunk groups over ``max_chunk_group``
    members are stop-keys (narrow chunks at corpus scale collide
    heavily; the bound keeps the quadratic verify survivable).
    Columns: a, b, hamming.
    """
    chunks = max_hamming + 1
    width = 64 // chunks
    mask = np.uint64((1 << width) - 1)

    hashed = simhash_stage(ds, text_col=text_col, id_col=id_col)

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ci = np.arange(chunks, dtype=np.uint64)
        vals = (h[:, None] >> (ci[None, :] * np.uint64(width))) & mask  # (n, chunks)
        ckey = vals.astype(np.int64) * chunks + np.arange(chunks, dtype=np.int64)[None, :]
        ckey = ckey.reshape(-1)
        with np.errstate(over="ignore"):
            bucket = ((ckey.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(256)).astype(
                np.int32
            )
        return pa.table(
            {
                "ckey": pa.array(ckey, type=pa.int64()),
                id_col: pa.array(np.repeat(ids, chunks), type=pa.int64()),
                "simhash": pa.array(np.repeat(h, chunks), type=pa.uint64()),
                "bucket": pa.array(bucket, type=pa.int32()),
            }
        )

    def emit(group: pa.Table) -> pa.Table:
        """Bucketed (see _bucketed_pairs): Arrow sort + vectorized run
        scan, exact Hamming verify on the full 64-bit hash.

        First-agreeing-chunk ownership: a pair that collides in several
        chunks is emitted ONLY by the lowest agreeing chunk id (checked
        directly on the xor of the full hashes), so the output is
        already distinct — the cross-bucket dedup shuffle that a naive
        emit would need simply does not exist."""
        t, bounds = _sorted_runs(group, "ckey", id_col)
        ii, jj = _run_pair_indices(bounds, max_chunk_group, what="simhash-chunk")
        if len(ii) == 0:
            return pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "hamming": pa.array([], type=pa.int32()),
                }
            )
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = t.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ck = t.column("ckey").to_numpy(zero_copy_only=False).astype(np.int64)
        x = h[ii] ^ h[jj]
        d = _popcount64(x)
        keep = d <= max_hamming
        chunk_of_pair = ck[ii] % chunks
        for k in range(chunks - 1):
            agree_k = ((x >> np.uint64(k * width)) & mask) == 0
            keep &= ~((chunk_of_pair > k) & agree_k)
        return pa.table(
            {
                "a": pa.array(ids[ii][keep], type=pa.int64()),
                "b": pa.array(ids[jj][keep], type=pa.int64()),
                "hamming": pa.array(d[keep], type=pa.int32()),
            }
        )

    banded = hashed.map_batches(band_rows, batch_format="pyarrow")
    return banded.groupby("bucket").map_groups(emit, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# segment-level dedup (C4 / RefinedWeb line-dedup analog)
# ---------------------------------------------------------------------------


def segment_rows_batch(
    batch: pa.Table,
    window: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Explode docs into (key, doc_id, packed) segment rows.

    Segments are consecutive non-overlapping ``window``-token slices of
    the contract tokenization (trailing partial slice included); key is
    the md5 hex of the space-joined slice (oracle: ``md5()``), packed =
    ``doc_id * 2^20 + seg_idx`` — the lexicographic (doc_id, seg_idx)
    order as one int64 min (requires seg_idx < 2^20, i.e. docs under
    ~10M tokens; split giant docs upstream per SURVEY §7.4-6).
    """
    keys: list[str] = []
    ids: list[int] = []
    packed: list[int] = []
    for did, text in zip(
        batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
    ):
        toks = tokenize_ws(text or "")
        base = did << 20
        for seg_idx in range(0, (len(toks) + window - 1) // window):
            seg = " ".join(toks[seg_idx * window : (seg_idx + 1) * window])
            keys.append(hashlib.md5(seg.encode("utf-8")).hexdigest())
            ids.append(did)
            packed.append(base + seg_idx)
    return pa.table(
        {
            "key": pa.array(keys, type=pa.string()),
            id_col: pa.array(ids, type=pa.int64()),
            "packed": pa.array(packed, type=pa.int64()),
        }
    )


def segment_dedup(
    ds,
    window: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 4096,
):
    """Corpus-wide segment-level exact dedup: the line-dedup pass of C4
    (Raffel et al., "three-sentence span" dedup) adapted to newline-free
    text — every ``window``-token segment is kept only at its FIRST
    corpus occurrence (min (doc_id, seg_idx)).

    Scale shape: only (key, id, packed) triples ever shuffle — one
    bucketed aggregate (min packed per key: the winner table), one
    bucketed join of segment rows against winners on the same key (so
    both exchanges share the md5-key partitioning), one bucketed
    per-doc count aggregate. No document text moves past the explode;
    no driver-side state. Output columns: doc_id, n_segs, n_kept.
    """
    from bioner_ray.stages.shuffle import bucketed_inner_join

    rows = ds.map_batches(
        segment_rows_batch,
        fn_kwargs={"window": window, "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    winners = bucketed_aggregate(
        rows.map_batches(
            lambda t: t.select(["key", "packed"]).rename_columns(["key", "win_packed"]),
            batch_format="pyarrow",
        ),
        ["key"],
        [("win_packed", "min")],
    )
    joined = bucketed_inner_join(
        rows,
        winners,
        ["key"],
        pa.schema([("key", pa.string()), (id_col, pa.int64()), ("packed", pa.int64())]),
        pa.schema([("key", pa.string()), ("win_packed", pa.int64())]),
    )

    def tally(t: pa.Table) -> pa.Table:
        kept = pc.equal(t.column("packed"), t.column("win_packed"))
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_segs": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n_kept": pc.cast(kept, pa.int64()),
            }
        )

    return bucketed_aggregate(
        joined.map_batches(tally, batch_format="pyarrow"),
        [id_col],
        [("n_segs", "sum"), ("n_kept", "sum")],
    )
