"""Prefix-filtered set-similarity self-join (AllPairs / PPJoin family:
Bayardo et al. WWW'07, Xiao et al. WWW'08) over the hashed-shingle
universe — same output contract as ``dedup.jaccard_pairs`` (exact
3-shingle Jaccard ≥ t pairs), different scale shape.

``jaccard_pairs`` ships the FULL inverted index and emits a pair row
per shared shingle — the quadratic pair emission is bounded only by
the stop-shingle cap. Prefix filtering bounds it structurally: order
every document's shingle set by a global (df asc, shingle asc) total
order and index only each set's PREFIX (the ``sz − ceil(t·sz) + 1``
rarest shingles). The prefix-filtering lemma guarantees any pair with
overlap ≥ ceil(t·max(sz)) shares a prefix shingle, so candidates are
complete; exact Jaccard is then verified per candidate from the two
documents' ordered hash blobs. Candidate generation touches only the
rare end of the df spectrum — the hot template shingles that blow up
the naive index sit in suffixes and generate nothing.

Plan (every wide step key-partitioned, nothing corpus-sized collected):
  1. inverted rows (shingle-hash u64, doc, sz)      — one corpus pass
  2. df per shingle                                 — bucketed aggregate
  3. rows ⋈ df                                      — bucketed join
  4. doc-bucketed reassembly → docs(doc, sz, blob, prefix-blob):
     per-bucket Arrow sort by (doc, df, shingle), run-sliced with
     numpy; blobs are the ordered u64 hashes as binary (8 B/shingle,
     the KMV binary-blob pattern) — materialized ONCE, reused for
     postings and verification
  5. prefix postings explode → candidate pairs within posting lists
     (sorted runs + triu indices, length filter min ≥ t·max,
     ``max_prefix_docs`` logged cap — same contract as the
     stop-shingle cap)
  6. distinct (a, b)                                — bucketed aggregate
  7. candidates ⋈ docs(a) ⋈ docs(b)                 — candidate-sized joins
  8. verify: np.intersect1d on the two hash arrays, one float64
     division c/(sa+sb−c) — bit-identical to the DuckDB twin's.

Prefix lengths and the length filter are Ray-side PRUNING only (never
part of the result's semantics), so they use epsilon-padded float
guards: an over-long prefix costs a little work, an under-long one
would lose pairs.

Reference relation: none (BioNER has no similarity join); extension
per SURVEY.md §2.11, sharing `dedup_jaccard_pairs`' oracle semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("sz", pa.int64()),
        ("blob", pa.binary()),
        ("pblob", pa.binary()),
    ]
)

_POST_SCHEMA = pa.schema(
    [("shingle", pa.uint64()), ("doc_id", pa.int64()), ("sz", pa.int64())]
)

_PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])

_OUT_SCHEMA = pa.schema(
    [
        ("a", pa.int64()),
        ("b", pa.int64()),
        ("n_common", pa.int64()),
        ("jaccard", pa.float64()),
    ]
)


def _prefix_len(sz: np.ndarray, threshold: float) -> np.ndarray:
    """p = sz − ceil(t·sz) + 1, epsilon-padded toward LONGER prefixes
    (pruning-only: a long prefix is safe, a short one loses pairs)."""
    alpha = np.ceil(threshold * sz - 1e-9).astype(np.int64)
    return np.maximum(sz - alpha + 1, 1)


def _assemble_docs(group: pa.Table, threshold: float) -> pa.Table:
    """Doc-bucket reassembly: (shingle, doc_id, sz, df) rows → one row
    per doc with ordered hash blob + prefix blob. Arrow sort + numpy
    run slicing; the only per-doc Python is one ``tobytes`` each."""
    if group.num_columns == 0 or group.num_rows == 0:
        return _DOCS_SCHEMA.empty_table()
    idx = pc.sort_indices(
        group,
        sort_keys=[
            ("doc_id", "ascending"),
            ("df", "ascending"),
            ("shingle", "ascending"),
        ],
    )
    t = group.take(idx).combine_chunks()
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    sh = t.column("shingle").to_numpy(zero_copy_only=False).astype(np.uint64)
    starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
    ends = np.r_[starts[1:], len(ids)]
    sz = (ends - starts).astype(np.int64)
    p = _prefix_len(sz, threshold)
    # big-endian so blob bytes are portable across workers regardless
    # of host endianness (single-arch here, but blobs cross the wire)
    sh_be = sh.astype(">u8")
    return pa.table(
        {
            "doc_id": pa.array(ids[starts], type=pa.int64()),
            "sz": pa.array(sz, type=pa.int64()),
            "blob": pa.array(
                [sh_be[s:e].tobytes() for s, e in zip(starts, ends)],
                type=pa.binary(),
            ),
            "pblob": pa.array(
                [sh_be[s : s + k].tobytes() for s, k in zip(starts, p)],
                type=pa.binary(),
            ),
        }
    )


def _explode_prefix(t: pa.Table) -> pa.Table:
    """docs rows → (shingle, doc_id, sz) prefix postings, vectorized
    via one concatenated frombuffer."""
    if t.num_columns == 0 or t.num_rows == 0:
        return _POST_SCHEMA.empty_table()
    pb = t.column("pblob").combine_chunks()
    lens = (
        pc.binary_length(pb).to_numpy(zero_copy_only=False).astype(np.int64) // 8
    )
    buf = b"".join(pb.to_pylist())
    hashes = np.frombuffer(buf, dtype=">u8").astype(np.uint64)
    return pa.table(
        {
            "shingle": pa.array(hashes, type=pa.uint64()),
            "doc_id": pa.array(
                np.repeat(
                    t.column("doc_id").to_numpy(zero_copy_only=False), lens
                ).astype(np.int64)
            ),
            "sz": pa.array(
                np.repeat(t.column("sz").to_numpy(zero_copy_only=False), lens).astype(
                    np.int64
                )
            ),
        }
    )


def setsim_prefix_pairs(
    ds,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_prefix_docs: int = 1024,
    num_buckets: int = 256,
):
    """All document pairs with k-shingle Jaccard ≥ ``threshold`` via
    prefix-filtered candidate generation. Columns: a, b, n_common,
    jaccard — same contract (and DuckDB oracle) as
    ``dedup.jaccard_pairs``, exact up to the logged posting-list cap."""
    from bioner_ray.stages.dedup import (
        _run_pair_indices,
        _sorted_runs,
        shingle_rows_batch,
    )
    from bioner_ray.stages.shuffle import (
        bucketed_aggregate,
        bucketed_inner_join,
        pin_schema,
        with_ones,
    )

    inv = ds.map_batches(
        shingle_rows_batch,
        fn_kwargs={"k": k, "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
    )
    df = pin_schema(
        bucketed_aggregate(
            with_ones(inv.select_columns(["shingle"]), "df"),
            ["shingle"],
            [("df", "sum")],
            num_buckets=num_buckets,
        ),
        pa.schema([("shingle", pa.uint64()), ("df", pa.int64())]),
    )
    inv_df = bucketed_inner_join(
        inv,
        df,
        keys=["shingle"],
        left_schema=pa.schema(
            [
                ("shingle", pa.uint64()),
                ("doc_id", pa.int64()),
                ("n_shingles", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("shingle", pa.uint64()), ("df", pa.int64())]),
        num_buckets=num_buckets,
    )

    def doc_bucket(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({"_dbucket": pa.array([], type=pa.int32())})
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            b = ((ids * np.uint64(2654435761)) % np.uint64(num_buckets)).astype(
                np.int32
            )
        return t.append_column("_dbucket", pa.array(b, type=pa.int32()))

    docs = pin_schema(
        inv_df.map_batches(doc_bucket, batch_format="pyarrow")
        .groupby("_dbucket")
        .map_groups(
            lambda g: _assemble_docs(
                g.drop_columns(["_dbucket"]) if "_dbucket" in g.column_names else g,
                threshold,
            ),
            batch_format="pyarrow",
        ),
        _DOCS_SCHEMA,
    ).materialize()

    postings = docs.map_batches(_explode_prefix, batch_format="pyarrow")

    def shingle_bucket(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({"_sbucket": pa.array([], type=pa.int32())})
        h = t.column("shingle").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            b = ((h * np.uint64(2654435761)) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("_sbucket", pa.array(b, type=pa.int32()))

    def emit_candidates(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        if "_sbucket" in group.column_names:
            group = group.drop_columns(["_sbucket"])
        t, bounds = _sorted_runs(group, "shingle", "doc_id")
        ii, jj = _run_pair_indices(bounds, max_prefix_docs, what="prefix-shingle")
        if t.num_rows == 0 or len(ii) == 0:
            return _PAIR_SCHEMA.empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        sz = t.column("sz").to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.minimum(sz[ii], sz[jj]).astype(np.float64)
        hi = np.maximum(sz[ii], sz[jj]).astype(np.float64)
        keep = lo >= threshold * hi - 1e-9  # length filter, prune-only
        return pa.table(
            {
                "a": pa.array(ids[ii][keep], type=pa.int64()),
                "b": pa.array(ids[jj][keep], type=pa.int64()),
            }
        )

    cand = pin_schema(
        bucketed_aggregate(
            with_ones(
                postings.map_batches(shingle_bucket, batch_format="pyarrow")
                .groupby("_sbucket")
                .map_groups(emit_candidates, batch_format="pyarrow"),
            ),
            ["a", "b"],
            [("one", "min")],
            num_buckets=num_buckets,
        ),
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("one", pa.int64())]),
    )

    docs_a = docs.map_batches(
        lambda t: pa.table(
            {"a": t.column("doc_id"), "sa": t.column("sz"), "blob_a": t.column("blob")}
        ),
        batch_format="pyarrow",
    )
    docs_b = docs.map_batches(
        lambda t: pa.table(
            {"b": t.column("doc_id"), "sb": t.column("sz"), "blob_b": t.column("blob")}
        ),
        batch_format="pyarrow",
    )
    j1 = bucketed_inner_join(
        cand,
        docs_a,
        keys=["a"],
        left_schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("one", pa.int64())]
        ),
        right_schema=pa.schema(
            [("a", pa.int64()), ("sa", pa.int64()), ("blob_a", pa.binary())]
        ),
        num_buckets=num_buckets,
    )
    j2 = bucketed_inner_join(
        j1,
        docs_b,
        keys=["b"],
        left_schema=pa.schema(
            [
                ("a", pa.int64()),
                ("b", pa.int64()),
                ("one", pa.int64()),
                ("sa", pa.int64()),
                ("blob_a", pa.binary()),
            ]
        ),
        right_schema=pa.schema(
            [("b", pa.int64()), ("sb", pa.int64()), ("blob_b", pa.binary())]
        ),
        num_buckets=num_buckets,
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        ba = t.column("blob_a").to_pylist()
        bb = t.column("blob_b").to_pylist()
        c = np.array(
            [
                np.intersect1d(
                    np.frombuffer(x, dtype=">u8"), np.frombuffer(y, dtype=">u8")
                ).size
                for x, y in zip(ba, bb)
            ],
            dtype=np.int64,
        )
        sa = t.column("sa").to_numpy(zero_copy_only=False).astype(np.int64)
        sb = t.column("sb").to_numpy(zero_copy_only=False).astype(np.int64)
        jac = c.astype(np.float64) / (sa + sb - c).astype(np.float64)
        out = pa.table(
            {
                "a": t.column("a"),
                "b": t.column("b"),
                "n_common": pa.array(c, type=pa.int64()),
                "jaccard": pa.array(jac, type=pa.float64()),
            }
        )
        return out.filter(pa.array(jac >= threshold))

    return pin_schema(
        j2.map_batches(verify, batch_format="pyarrow"), _OUT_SCHEMA
    )
