"""Deterministic k-means (Lloyd) over an embedding column.

The corpus-organization step of an embedding pipeline: cluster document
vectors into k groups (topic sharding, IVF coarse quantizers, dedup
blocking). Classic k-means is RNG-seeded and float-ordered; this is the
determinized, SQL-replayable form the engine uses everywhere:

* embeddings quantize ONCE to integer micromarks (floor(x·1e6) — the
  entity_centroids contract), so every distance and centroid update is
  exact integer arithmetic with no accumulation-order drift;
* init = the k lexicographically-smallest ids' vectors (no RNG);
* assignment = integer argmin of ||x−c||² (expanded as x·x + c·c −
  2x·c, int64 throughout; max |q| ≤ 1e6, so x·c ≤ 1e12·dims ≪ 2^63),
  ties to the smallest cluster id;
* update = per-dimension FLOOR(sum/n) via the exact-divisibility
  identity ``(s − ((s % n) + n) % n) / n`` that means the same thing
  in numpy and DuckDB regardless of their integer-division sign
  conventions; empty clusters keep their previous centroid;
* a fixed iteration count, so the DuckDB twin replays the whole
  trajectory bit-for-bit.

Scale shape: centroids are k×dims BOUNDED driver/broadcast state
(never data-sized); each iteration is ONE streaming map pass over the
column-pruned parquet read emitting k×dims partial sums per block,
reduced by ONE tiny bucketed aggregate — the input is never
materialized, shuffled, or collected. Assumes fixed embedding
dimensionality (asserted per batch) — the partitioning assumption this
op relies on.

No reference analog (the reference has no embedding-space clustering);
extension per SURVEY.md §2.11.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

QSCALE = 1_000_000.0


def _qmatrix(t: pa.Table, emb_col: str) -> np.ndarray:
    """(n, dims) int64 micromark matrix from a list<float> column."""
    emb = t.column(emb_col).combine_chunks()
    off = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(off) - 1
    if n == 0:
        return np.zeros((0, 0), dtype=np.int64)
    widths = np.diff(off)
    assert (widths == widths[0]).all(), "ragged embedding column"
    vals = emb.values.slice(off[0], off[-1] - off[0]).to_numpy(zero_copy_only=False)
    q = np.floor(vals.astype(np.float64) * QSCALE).astype(np.int64)
    return q.reshape(n, int(widths[0]))


def _floor_div_exact(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """floor(s/n) via the exact-divisibility identity shared verbatim
    with the SQL twin (sign-convention-proof)."""
    return (s - ((s % n) + n) % n) // n


def _assign(X: np.ndarray, C: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(cluster, dist2) per row — integer argmin, ties to smallest id."""
    xx = np.einsum("ij,ij->i", X, X)
    cc = np.einsum("ij,ij->i", C, C)
    xc = X @ C.T
    dist2 = xx[:, None] + cc[None, :] - 2 * xc
    a = dist2.argmin(axis=1)  # first minimum = smallest cluster id
    return a, dist2[np.arange(len(a)), a]


def gram_matrix(ds, emb_col: str = "embedding", num_buckets: int = 16):
    """Exact integer Gram (uncentered second-moment) matrix of the
    embedding column — the reduction under PCA/whitening/linear-probe
    fits. One streaming pass: each batch contributes X.T@X on the
    micromark-quantized matrix (dims² int64 partials, data never
    shuffled), reduced by ONE tiny bucketed aggregate over the ≤
    dims·(dims+1)/2 upper-triangle keys.

    Exactness: the _qmatrix micromark contract (floor(x·1e6), float64
    math identical in numpy and DuckDB); products ≤ q_max² ≈ 10¹²·|x|²
    summed in int64 — overflow-safe while n·q_max² < 2⁶³ (≈1.6·10⁸
    unit-norm rows; the SQL twin sums in HUGEINT and its BIGINT cast
    raises past that, same failure surface). Per-batch partials are
    guarded explicitly. Columns: i, j (0-based, i ≤ j), gram_sum."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    schema = pa.schema(
        [("i", pa.int64()), ("j", pa.int64()), ("gram_sum", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        X = _qmatrix(t, emb_col)
        if X.shape[0] == 0:
            return schema.empty_table()
        qmax = int(np.abs(X).max()) or 1
        assert X.shape[0] * qmax * qmax < 2**62, "int64 partial overflow"
        G = X.T @ X
        d = X.shape[1]
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64)),
                "j": pa.array(ju.astype(np.int64)),
                "gram_sum": pa.array(G[iu, ju].astype(np.int64)),
            }
        )

    return pin_schema(
        bucketed_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["i", "j"],
            [("gram_sum", "sum")],
            num_buckets=num_buckets,
        ),
        schema,
    )


def kmeans_centroids(
    ds,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_buckets: int = 16,
) -> np.ndarray:
    """The centroid-training half of ``kmeans_assign``: ``iters``
    deterministic Lloyd rounds, returning the (k × dims) int64
    micromark centroid matrix — the bounded artifact consumers
    broadcast to assign clusters in-stream (semantic_dedup) instead of
    joining an assignment table back against the vectors."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    # init: the k lexicographically-smallest ids' vectors. Per-batch
    # prune to the local k smallest first, so the global sort+limit
    # moves at most k rows per block.
    def local_k(t: pa.Table) -> pa.Table:
        return t.sort_by(id_col).slice(0, k)

    seed_rows = (
        ds.map_batches(local_k, batch_format="pyarrow").sort(id_col).limit(k).take_all()
    )
    seed_t = pa.table(
        {
            id_col: pa.array([r[id_col] for r in seed_rows]),
            emb_col: pa.array([list(r[emb_col]) for r in seed_rows], type=pa.list_(pa.float32())),
        }
    )
    C = _qmatrix(seed_t, emb_col)
    dims = C.shape[1]

    part_schema = pa.schema(
        [("cid", pa.int64()), ("dim", pa.int64()), ("s", pa.int64()), ("n", pa.int64())]
    )

    def make_partial(cent: np.ndarray):
        def fn(t: pa.Table) -> pa.Table:
            X = _qmatrix(t, emb_col)
            if X.shape[0] == 0:
                return part_schema.empty_table()
            a, _ = _assign(X, cent)
            sums = np.zeros((k, dims), dtype=np.int64)
            np.add.at(sums, a, X)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            keep = np.repeat(counts, dims) > 0
            return pa.table(
                {
                    "cid": pa.array(np.repeat(np.arange(k, dtype=np.int64), dims)[keep]),
                    "dim": pa.array(np.tile(np.arange(dims, dtype=np.int64), k)[keep]),
                    "s": pa.array(sums.ravel()[keep]),
                    "n": pa.array(np.repeat(counts, dims)[keep]),
                }
            )

        return fn

    for _ in range(iters):
        reduced = pin_schema(
            bucketed_aggregate(
                ds.map_batches(make_partial(C), batch_format="pyarrow"),
                ["cid", "dim"],
                [("s", "sum"), ("n", "sum")],
                num_buckets=num_buckets,
            ),
            part_schema,
        ).take_all()  # ≤ k×dims rows — bounded, the broadcast-small pattern
        newC = C.copy()  # empty clusters keep their previous centroid
        for row in reduced:
            cid, dim = int(row["cid"]), int(row["dim"])
            newC[cid, dim] = _floor_div_exact(
                np.int64(row["s"]), np.int64(row["n"])
            )
        C = newC

    return C


def kmeans_assign(
    ds,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_buckets: int = 16,
):
    """Dataset(id, list<float>) → Dataset(id, cluster, dist2) after
    ``iters`` deterministic Lloyd rounds. ``ds`` is consumed in
    ``iters + 2`` streaming passes (init prune, one per round, final
    assignment) — re-reading a pruned parquet column beats pinning the
    whole table in the object store."""
    cent = kmeans_centroids(
        ds, k=k, iters=iters, id_col=id_col, emb_col=emb_col, num_buckets=num_buckets
    )

    def final(t: pa.Table) -> pa.Table:
        X = _qmatrix(t, emb_col)
        if X.shape[0] == 0:
            return pa.schema(
                [(id_col, pa.int64()), ("cluster", pa.int64()), ("dist2", pa.int64())]
            ).empty_table()
        a, d2 = _assign(X, cent)
        return pa.table(
            {
                id_col: t.column(id_col),
                "cluster": pa.array(a.astype(np.int64)),
                "dist2": pa.array(d2.astype(np.int64)),
            }
        )

    return ds.map_batches(final, batch_format="pyarrow")


def pq_codes(
    ds,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_buckets: int = 16,
):
    """Product quantization: split each vector into ``m`` contiguous
    subspaces and Lloyd-quantize every subspace to ``k`` codewords —
    the compressed-ANN storage layout (m·log2(k) bits per vector
    instead of dims·32) that IVF-PQ engines serve from at 10^12-vector
    scale. Everything inherits the kmeans_assign determinism contract:
    micromark quantization, smallest-ids init (shared seed rows, sliced
    per subspace), integer argmin with (dist2, cid) ties, the exact
    floor-div centroid update, empty codewords inheriting their
    previous centroid, fixed rounds — so the whole trajectory replays
    bit-for-bit in SQL.

    Scale shape: ALL m codebooks train in the SAME ``iters`` streaming
    passes (the per-block partial emits (sub, cid, sdim, s, n) rows for
    every subspace at once — m× the bounded k×dims state, not m× the
    data passes), reduced by ONE tiny bucketed aggregate per round.
    Output: LONG form (vec_id, sub, code, dist2), n·m rows."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    def local_k(t: pa.Table) -> pa.Table:
        return t.sort_by(id_col).slice(0, k)

    seed_rows = (
        ds.map_batches(local_k, batch_format="pyarrow").sort(id_col).limit(k).take_all()
    )
    seed_t = pa.table(
        {
            id_col: pa.array([r[id_col] for r in seed_rows]),
            emb_col: pa.array(
                [list(r[emb_col]) for r in seed_rows], type=pa.list_(pa.float32())
            ),
        }
    )
    C = _qmatrix(seed_t, emb_col)
    dims = C.shape[1]
    assert dims % m == 0, f"dims {dims} not divisible by m={m}"
    w = dims // m
    subC = [C[:, j * w : (j + 1) * w].copy() for j in range(m)]

    part_schema = pa.schema(
        [
            ("sub", pa.int64()),
            ("cid", pa.int64()),
            ("sdim", pa.int64()),
            ("s", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def make_partial(cents: list[np.ndarray]):
        def fn(t: pa.Table) -> pa.Table:
            X = _qmatrix(t, emb_col)
            if X.shape[0] == 0:
                return part_schema.empty_table()
            subs, cids, sdims, ss, ns = [], [], [], [], []
            for j in range(m):
                Xj = X[:, j * w : (j + 1) * w]
                a, _ = _assign(Xj, cents[j])
                sums = np.zeros((k, w), dtype=np.int64)
                np.add.at(sums, a, Xj)
                counts = np.bincount(a, minlength=k).astype(np.int64)
                keep = np.repeat(counts, w) > 0
                subs.append(np.full(int(keep.sum()), j, dtype=np.int64))
                cids.append(np.repeat(np.arange(k, dtype=np.int64), w)[keep])
                sdims.append(np.tile(np.arange(w, dtype=np.int64), k)[keep])
                ss.append(sums.ravel()[keep])
                ns.append(np.repeat(counts, w)[keep])
            return pa.table(
                {
                    "sub": np.concatenate(subs),
                    "cid": np.concatenate(cids),
                    "sdim": np.concatenate(sdims),
                    "s": np.concatenate(ss),
                    "n": np.concatenate(ns),
                },
                schema=part_schema,
            )

        return fn

    for _ in range(iters):
        reduced = pin_schema(
            bucketed_aggregate(
                ds.map_batches(make_partial(subC), batch_format="pyarrow"),
                ["sub", "cid", "sdim"],
                [("s", "sum"), ("n", "sum")],
                num_buckets=num_buckets,
            ),
            part_schema,
        ).take_all()  # ≤ m×k×w = k×dims rows — bounded codebook state
        newC = [c.copy() for c in subC]  # empty codewords keep previous
        for row in reduced:
            newC[int(row["sub"])][int(row["cid"]), int(row["sdim"])] = _floor_div_exact(
                np.int64(row["s"]), np.int64(row["n"])
            )
        subC = newC

    cents = subC
    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            ("sub", pa.int64()),
            ("code", pa.int64()),
            ("dist2", pa.int64()),
        ]
    )

    def final(t: pa.Table) -> pa.Table:
        X = _qmatrix(t, emb_col)
        if X.shape[0] == 0:
            return out_schema.empty_table()
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        vv, jj, cc, dd = [], [], [], []
        for j in range(m):
            a, d2 = _assign(X[:, j * w : (j + 1) * w], cents[j])
            vv.append(ids)
            jj.append(np.full(len(ids), j, dtype=np.int64))
            cc.append(a.astype(np.int64))
            dd.append(d2.astype(np.int64))
        return pa.table(
            {
                id_col: np.concatenate(vv),
                "sub": np.concatenate(jj),
                "code": np.concatenate(cc),
                "dist2": np.concatenate(dd),
            },
            schema=out_schema,
        )

    return ds.map_batches(final, batch_format="pyarrow")


def _trunc_div(a: int, b: int) -> int:
    """Exact integer division truncating toward zero — DuckDB's ``//``
    convention (NOT Python's floor ``//``), so the SQL twin replays
    negative loadings bit-for-bit."""
    q = abs(a) // b
    return -q if a < 0 else q


def pca_top_component(ds, emb_col: str = "embedding", iters: int = 3, scale: int = 10**6):
    """Top principal direction of the embedding column's uncentered
    second-moment (Gram) matrix via fixed-round power iteration, fully
    deterministic: the distributed part is the ONE streaming Gram pass
    (gram_matrix — dims² int64 partials per batch, one tiny aggregate;
    the data is never shuffled and never leaves its blocks), and the
    d×d iteration runs driver-side in exact Python big-ints
    (dimension-bounded: d² integers, independent of corpus size).

    Per round: u = G·v exactly, then the floor-divide renormalization
    ``v = trunc(u / max(1, max(|u|) // scale))`` — monotone per-entry,
    truncation toward zero to match DuckDB's ``//``, so the unrolled
    SQL twin replays every round bit-for-bit. v₀ = scale·𝟙 (always
    non-orthogonal to the top eigenvector of a PSD Gram unless the
    corpus is degenerate, the standard deterministic start).

    Columns: dim, loading (component × scale as int64, unnormalized —
    rankings and ratios are exact; callers needing a unit vector
    divide by its norm once)."""
    g = gram_matrix(ds, emb_col=emb_col).to_pandas()  # ≤ d(d+1)/2 rows
    if len(g) == 0:
        return pa.table(
            {
                "dim": pa.array([], type=pa.int64()),
                "loading": pa.array([], type=pa.int64()),
            }
        )
    d = int(g["j"].max()) + 1
    G = [[0] * d for _ in range(d)]
    for i, j, s in zip(g["i"].tolist(), g["j"].tolist(), g["gram_sum"].tolist()):
        G[i][j] = int(s)
        G[j][i] = int(s)
    v = [scale] * d
    for _ in range(iters):
        u = [sum(G[i][j] * v[j] for j in range(d)) for i in range(d)]
        div = max(1, max(abs(x) for x in u) // scale)
        v = [_trunc_div(x, div) for x in u]
    return pa.table(
        {
            "dim": pa.array(list(range(d)), type=pa.int64()),
            "loading": pa.array(v, type=pa.int64()),
        }
    )


SEMDEDUP_SCHEMA = pa.schema(
    [("vec_id", pa.int64()), ("cluster", pa.int64()), ("kept", pa.int64())]
)


def semantic_dedup(
    ds,
    k: int = 4,
    iters: int = 2,
    tau: float = 0.45,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_buckets: int = 16,
):
    """SemDeDup-style semantic dedup (Abbas et al. 2023): k-means
    partitions the embedding space, then pairwise cosine runs ONLY
    within each cluster and a vector is dropped when an earlier
    (smaller-id) cluster-mate sits within ``tau`` — the
    dominated-by-earlier determinization of the paper's
    keep-one-per-duplicate-set rule (no RNG, exact SQL replay via
    EXISTS). The semantic companion to exact/minhash dedup: catches
    paraphrases sharing no n-grams.

    Scale shape: the deterministic fixed-round k-means
    (``kmeans_centroids``) is the SemDeDup design point that bounds the
    quadratic term — pairwise work is Σ|cluster|², controlled by
    scaling ``k`` with corpus size (k ≈ N/target_cluster). The bounded
    (k × dims) centroid matrix assigns clusters IN-STREAM (pyarrow hash
    joins cannot carry list<float> payloads, and shipping an N-row
    assignment table back against the vectors would be a second
    corpus-scale exchange anyway); the verdict pass is then ONE
    coarse-bucketed shuffle on cluster id with a vectorized
    normalize + matmul + upper-triangle any() per cluster. Nothing
    driver-side. Columns: vec_id, cluster, kept (0/1)."""
    from bioner_ray.stages.shuffle import bucketed_map_groups, pin_schema

    cent = kmeans_centroids(
        ds, k=k, iters=iters, id_col=id_col, emb_col=emb_col, num_buckets=num_buckets
    )

    def with_cluster(t: pa.Table) -> pa.Table:
        X = _qmatrix(t, emb_col)
        if X.shape[0] == 0:
            return pa.schema(
                [(id_col, pa.int64()), ("cluster", pa.int64()), (emb_col, pa.list_(pa.float32()))]
            ).empty_table()
        a, _ = _assign(X, cent)
        return pa.table(
            {
                id_col: t.column(id_col),
                "cluster": pa.array(a.astype(np.int64)),
                emb_col: t.column(emb_col),
            }
        )

    joined = ds.map_batches(with_cluster, batch_format="pyarrow")

    def verdicts(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return SEMDEDUP_SCHEMA.empty_table()
        t = t.sort_by([("cluster", "ascending"), (id_col, "ascending")])
        cl = t.column("cluster").to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.asarray(t.column(emb_col).to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        mat = mat / norms
        kept = np.ones(len(ids), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
        for s, e in zip(starts, np.r_[starts[1:], len(cl)]):
            if e - s < 2:
                continue
            sims = mat[s:e] @ mat[s:e].T
            dropped = np.triu(sims >= tau, k=1).any(axis=0)
            kept[s:e][dropped] = 0
        return pa.table(
            {"vec_id": pa.array(ids), "cluster": pa.array(cl), "kept": pa.array(kept)},
            schema=SEMDEDUP_SCHEMA,
        )

    return pin_schema(
        bucketed_map_groups(joined, ["cluster"], verdicts, num_buckets=num_buckets),
        SEMDEDUP_SCHEMA,
    )
