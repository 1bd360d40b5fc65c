"""Similarity search over an embedding column (``list<float>``).

The reference's only vector machinery is the dense fastText lookup
(fasttext_encoder.py:17-28) and our linker's cosine fallback
(stages/link.py); these operators scale that to corpus-level
nearest-neighbor search:

* brute-force top-k  — numpy matmul per Arrow block against a
                       broadcast (``ray.put`` once) query matrix, each
                       block emits only its local top-k, the driver
                       merges the tiny partials. Exact; the baseline.
* IVF top-k          — k-means-ish centroids from a deterministic
                       sample, batches route to their nearest centroid
                       partitions, probing only ``n_probe`` lists. The
                       sub-linear scale path.
* cosine near-dup    — all-pairs ≥ threshold via hyperplane-LSH
                       buckets (scale path) or block×broadcast exact
                       mode for bounded corpora.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _ids_np(col) -> tuple[np.ndarray, pa.DataType]:
    """Id column → numpy array + the Arrow type to emit pairs with:
    int64 for integer ids, object (python str) for string ids — so the
    pair emitters work for doc ids and entity surfaces alike."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return np.asarray(col.to_pylist(), dtype=object), pa.string()
    return np.asarray(col.to_pylist(), dtype=np.int64), pa.int64()


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # zero-copy flatten for list<float32/float64> columns
    flat = col.flatten().to_numpy(zero_copy_only=False)
    n = len(col)
    return flat.reshape(n, -1).astype(np.float64, copy=False)


def knn_brute_force(
    ds,
    query_matrix: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact cosine top-k for each query row.

    Per block: one (Q, D) × (D, B) matmul, then a local ``k``-cut —
    each block ships only Q×k candidate rows to the driver, which
    heap-merges them. The query matrix is broadcast via ``ray.put``
    ONCE, not captured per batch. Returns a pyarrow Table
    (query_id, vec_id, score, rank) — Q×k rows, always small.
    """
    import ray

    q = _normalize_rows(np.asarray(query_matrix, dtype=np.float64))
    q_ref = ray.put(q)

    def block_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        m = _normalize_rows(_batch_matrix(batch, vec_col))
        sims = qm @ m.T  # (Q, B)
        ids = np.asarray(batch.column(id_col).to_pylist())
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        q_out, v_out, s_out = [], [], []
        for qi in range(sims.shape[0]):
            for bi in part[qi]:
                q_out.append(qi)
                v_out.append(int(ids[bi]))
                s_out.append(float(sims[qi, bi]))
        return pa.table(
            {
                "query_id": pa.array(q_out, type=pa.int64()),
                id_col: pa.array(v_out, type=pa.int64()),
                "score": pa.array(s_out, type=pa.float64()),
            }
        )

    partials = ds.map_batches(block_topk, batch_format="pyarrow").take_all()
    by_query: dict[int, list[tuple[float, int]]] = {}
    for row in partials:
        by_query.setdefault(row["query_id"], []).append((row["score"], row[id_col]))
    q_out, v_out, s_out, r_out = [], [], [], []
    for qi in sorted(by_query):
        # deterministic order: score desc, id asc
        top = heapq.nsmallest(k, by_query[qi], key=lambda t: (-t[0], t[1]))
        for rank, (score, vid) in enumerate(top, start=1):
            q_out.append(qi)
            v_out.append(vid)
            s_out.append(score)
            r_out.append(rank)
    return pa.table(
        {
            "query_id": pa.array(q_out, type=pa.int64()),
            id_col: pa.array(v_out, type=pa.int64()),
            "score": pa.array(s_out, type=pa.float64()),
            "rank": pa.array(r_out, type=pa.int64()),
        }
    )


def build_ivf_centroids(
    ds, n_clusters: int = 16, sample_size: int = 2048, iters: int = 10,
    vec_col: str = "embedding", seed: int = 42, id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic Lloyd iterations over a bounded sample (the
    centroid table is tiny and broadcast; the corpus itself never
    materializes). The sample is sorted by ``id_col`` before seeding:
    Ray's streaming executor does not preserve block order by default
    (``preserve_order`` is off), so ``limit().to_pandas()`` row order
    varies with block completion — the sort pins the kmeans input (and
    therefore every IVF result) regardless of scheduling."""
    sample = ds.limit(sample_size).to_pandas()
    if id_col in sample.columns:
        sample = sample.sort_values(id_col).reset_index(drop=True)
    m = _normalize_rows(np.asarray(list(sample[vec_col]), dtype=np.float64))
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(len(m), size=min(n_clusters, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            members = m[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize_rows(cent)
    return cent


def _ivf_scan(ds, q: np.ndarray, cent: np.ndarray, probes: np.ndarray, k: int,
              vec_col: str, id_col: str) -> pa.Table:
    """Shared IVF scan: per block, assign vectors to centroids, mask to
    each query's probe lists, local top-k; driver heap-merges the tiny
    Q×k-per-block partials."""
    import ray

    state = ray.put((q, cent, probes))

    def block_topk(batch: pa.Table) -> pa.Table:
        qm, cm, pr = ray.get(state)
        m = _normalize_rows(_batch_matrix(batch, vec_col))
        ids = np.asarray(batch.column(id_col).to_pylist())
        assign = np.argmax(m @ cm.T, axis=1)  # (B,)
        q_out, v_out, s_out = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(assign, pr[qi])
            if not mask.any():
                continue
            # matmul summation order varies with the slice shape, which
            # varies with block boundaries (worker count) — a 1-ulp
            # jitter that would make the result parallelism-dependent.
            # 9-dp rounding absorbs it (scores are cosines in [-1, 1]);
            # remaining exact ties break by id in the global merge.
            sims = np.round(m[mask] @ qm[qi], 9)
            sub_ids = ids[mask]
            kk = min(k, sims.shape[0])
            part = np.argpartition(-sims, kk - 1)[:kk]
            for bi in part:
                q_out.append(qi)
                v_out.append(int(sub_ids[bi]))
                s_out.append(float(sims[bi]))
        return pa.table(
            {
                "query_id": pa.array(q_out, type=pa.int64()),
                id_col: pa.array(v_out, type=pa.int64()),
                "score": pa.array(s_out, type=pa.float64()),
            }
        )

    partials = ds.map_batches(block_topk, batch_format="pyarrow").take_all()
    by_query: dict[int, list[tuple[float, int]]] = {}
    for row in partials:
        by_query.setdefault(row["query_id"], []).append((row["score"], row[id_col]))
    q_out, v_out, s_out, r_out = [], [], [], []
    for qi in sorted(by_query):
        top = heapq.nsmallest(k, by_query[qi], key=lambda t: (-t[0], t[1]))
        for rank, (score, vid) in enumerate(top, start=1):
            q_out.append(qi)
            v_out.append(vid)
            s_out.append(score)
            r_out.append(rank)
    return pa.table(
        {
            "query_id": pa.array(q_out, type=pa.int64()),
            id_col: pa.array(v_out, type=pa.int64()),
            "score": pa.array(s_out, type=pa.float64()),
            "rank": pa.array(r_out, type=pa.int64()),
        }
    )


def knn_ivf(
    ds,
    query_matrix: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """IVF approximate top-k over an UNPARTITIONED dataset: vectors
    whose nearest centroid is not in a query's probe set are skipped
    inside the block scan. For read-level pruning (whole partitions
    skipped at the storage layer), build a centroid-partitioned index
    with ``build_ivf_index`` and query it with ``knn_ivf_index`` —
    this in-memory form and the index form return IDENTICAL results
    for the same centroid seed."""
    cent = build_ivf_centroids(ds, n_clusters=n_clusters, vec_col=vec_col)
    q = _normalize_rows(np.asarray(query_matrix, dtype=np.float64))
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]  # (Q, n_probe)
    return _ivf_scan(ds, q, cent, probes, k, vec_col, id_col)


def build_ivf_index(
    ds,
    index_dir: str,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Materialize a centroid-partitioned IVF index: one Parquet
    partition directory per inverted list (``list_id=K/``), centroids
    saved alongside. This is the scale path the in-memory scan's
    docstring promises: a query with ``n_probe`` lists reads ONLY those
    directories — partition pruning happens at the STORAGE layer, the
    unprobed ~(1 - n_probe/n_clusters) of the corpus never leaves disk.
    Writing is one streaming pass (assign = one matmul per block against
    the broadcast centroids + a partitioned write); returns the
    centroid matrix."""
    import os

    import pyarrow.parquet as pq
    import ray

    cent = build_ivf_centroids(
        ds, n_clusters=n_clusters, sample_size=sample_size, iters=iters,
        vec_col=vec_col, seed=seed,
    )
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        cm = ray.get(cent_ref)
        m = _normalize_rows(_batch_matrix(batch, vec_col))
        a = np.argmax(m @ cm.T, axis=1).astype(np.int64)
        return batch.select([id_col, vec_col]).append_column(
            "list_id", pa.array(a, type=pa.int64())
        )

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["list_id"]
    )
    pq.write_table(
        pa.table({"centroid": pa.array(cent.tolist(), type=pa.list_(pa.float64()))}),
        os.path.join(index_dir, "centroids.parquet"),
    )
    return cent


def knn_ivf_index(
    index_dir: str,
    query_matrix: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Approximate top-k against a ``build_ivf_index`` directory,
    reading ONLY the partitions in the queries' probe union — the
    read-level pruning counterpart of ``knn_ivf`` (identical output
    for the same centroids)."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    cent = np.asarray(
        pq.read_table(os.path.join(index_dir, "centroids.parquet"))
        .column("centroid")
        .to_pylist(),
        dtype=np.float64,
    )
    q = _normalize_rows(np.asarray(query_matrix, dtype=np.float64))
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :n_probe]  # (Q, n_probe)
    used = sorted({int(p) for row in probes for p in row})
    paths = []
    for c in used:
        d = os.path.join(index_dir, f"list_id={c}")
        if os.path.isdir(d):  # a list can be empty → no directory written
            paths.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            )
    pruned = rd.read_parquet(paths, columns=[id_col, vec_col])
    return _ivf_scan(pruned, q, cent, probes, k, vec_col, id_col)


def cosine_dup_pairs(
    ds,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int | None = None,
    seed: int = 42,
    n_tables: int = 8,
    max_exact_rows: int = 200_000,
):
    """All (a, b) pairs with cosine ≥ threshold.

    ``n_planes`` selects the plan; the default ``None`` SIZE-GATES it:
    corpora up to ``max_exact_rows`` rows run the exact mode, larger
    ones the LSH mode (with ``n_planes=12``) — so the default path
    never materializes an unbounded matrix driver-side, while small
    (oracle-checkable) inputs stay exact.

    ``n_planes == 0`` → exact block×broadcast mode: the full (normed)
    matrix is ``ray.put`` once and every block computes its slice of
    the similarity matrix, emitting only above-threshold pairs with
    ``a < b``. Exact; bounded by corpora whose embedding matrix fits
    the object store AND driver heap (~200k × 768 float64 ≈ 1.2 GB at
    the default gate).

    ``n_planes > 0`` → multi-table hyperplane-LSH (sign pattern of
    ``n_planes`` random projections, ``n_tables`` independent tables —
    OR-amplification), in-bucket EXACT verification so every emitted
    pair carries its true cosine — the scale path. Recall < 1 for
    pairs near the threshold (standard SimHash-for-cosine; miss
    probability per pair = (1 - p^n_planes)^n_tables with
    p = 1 - θ/π); each row is shuffled ``n_tables`` times, the
    recall/shuffle-bytes knob.
    """
    import ray

    if n_planes is None:
        n_rows = ds.count()
        n_planes = 0 if n_rows <= max_exact_rows else 12

    if n_planes == 0:
        # ONE pass for ids and vectors: separate executions of the same
        # dataset need not agree on row order, so zipping two to_pandas()
        # results positionally would mis-attribute vectors to ids.
        df = ds.select_columns([id_col, vec_col]).to_pandas()
        full = _normalize_rows(np.asarray(df[vec_col].tolist(), dtype=np.float64))
        all_ids, id_type = _ids_np(pa.array(df[id_col]))
        ref = ray.put((full, all_ids))

        def block_pairs(batch: pa.Table) -> pa.Table:
            fm, fids = ray.get(ref)
            m = _normalize_rows(_batch_matrix(batch, vec_col))
            ids, _ = _ids_np(batch.column(id_col))
            sims = m @ fm.T  # (B, N)
            rows, cols = np.nonzero(sims >= threshold)
            keep = ids[rows] < fids[cols]  # a < b, also drops self-pairs
            return pa.table(
                {
                    "a": pa.array(ids[rows][keep], type=id_type),
                    "b": pa.array(fids[cols][keep], type=id_type),
                    "cosine": pa.array(sims[rows, cols][keep], type=pa.float64()),
                }
            )

        return ds.map_batches(block_pairs, batch_format="pyarrow")

    def bucket_rows(batch: pa.Table) -> pa.Table:
        m = _normalize_rows(_batch_matrix(batch, vec_col))
        # one plane matrix per table, seeds pinned → deterministic across
        # workers and runs; all tables' projections in one (D, T*P) matmul
        planes = np.concatenate(
            [
                np.random.default_rng(seed + t).normal(size=(m.shape[1], n_planes))
                for t in range(n_tables)
            ],
            axis=1,
        )
        bits = (m @ planes) > 0  # (B, T*P)
        weights = (1 << np.arange(n_planes, dtype=np.int64))[::-1]
        buckets = bits.astype(np.int64).reshape(len(m), n_tables, n_planes) @ weights  # (B, T)
        table_ids = np.broadcast_to(np.arange(n_tables, dtype=np.int64), (len(m), n_tables))
        rep = np.repeat(np.arange(len(m)), n_tables)
        ids_rep = batch.column(id_col).take(pa.array(rep))
        vecs_rep = batch.column(vec_col).take(pa.array(rep))
        return pa.table(
            {
                "table": pa.array(table_ids.ravel(), type=pa.int64()),
                "bucket": pa.array(buckets.ravel(), type=pa.int64()),
                id_col: ids_rep,
                vec_col: vecs_rep,
            }
        )

    def emit(group: pa.Table) -> pa.Table:
        # a (table, bucket) group may be empty or cross-key-free; the
        # ownership of a pair is NOT deduped here (the same pair can
        # collide in several tables) — the bucketed_aggregate below is
        # the exact dedup.
        m = _normalize_rows(
            np.asarray(group.column(vec_col).to_pylist(), dtype=np.float64)
        )
        ids, id_type = _ids_np(group.column(id_col))
        order = np.argsort(ids)
        m, ids = m[order], ids[order]
        sims = m @ m.T
        rows, cols = np.nonzero(np.triu(sims >= threshold, k=1))
        return pa.table(
            {
                "a": pa.array(ids[rows], type=id_type),
                "b": pa.array(ids[cols], type=id_type),
                "cosine": pa.array(sims[rows, cols], type=pa.float64()),
            }
        )

    bucketed = ds.map_batches(bucket_rows, batch_format="pyarrow")
    pairs = bucketed.groupby(["table", "bucket"]).map_groups(emit, batch_format="pyarrow")
    # pair-keyed dedup at candidate-pair cardinality → bucketed Arrow merge
    from bioner_ray.stages.shuffle import bucketed_aggregate

    return bucketed_aggregate(pairs, ["a", "b"], [("cosine", "max")])


def knn_graph(
    ds,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_exact_rows: int = 200_000,
):
    """Exact k-NN GRAPH: every vector's top-``k`` cosine neighbors
    (self excluded) — the adjacency a semantic-dedup or
    embedding-cluster stage consumes.

    Plan: the normalized corpus matrix is built ONCE driver-side and
    broadcast via ``ray.put``; each batch answers its own rows
    COMPLETELY with one (B, D) × (D, N) matmul + per-row k-cut, so the
    result streams out of ``map_batches`` with no driver merge at all
    (unlike knn_brute_force's Q×k partials, here every row is a
    query). SIZE-GATED like cosine_dup_pairs: the N×D broadcast and
    O(N·B·D) block cost are exact and cheap up to ``max_exact_rows``;
    above it this raises and the caller routes to the IVF path
    (build_ivf_index / knn_ivf_index), whose partition-pruned lists
    are the honest 100-TB ANN-graph plan. Returns a Dataset:
    (vec_id, nbr_id, rank, score)."""
    import ray

    mat_tbl = ds.select_columns([id_col, vec_col]).to_pandas()
    n = len(mat_tbl)
    if n > max_exact_rows:
        raise ValueError(
            f"knn_graph exact path gated at {max_exact_rows} rows (got {n}); "
            "use build_ivf_index + knn_ivf_index for the scale path"
        )
    corpus = _normalize_rows(
        np.asarray([np.asarray(v, dtype=np.float64) for v in mat_tbl[vec_col]])
    )
    ids = mat_tbl[id_col].to_numpy().astype(np.int64)
    corpus_ref = ray.put((ids, corpus))

    out_schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("nbr_id", pa.int64()),
            ("rank", pa.int64()),
            ("score", pa.float64()),
        ]
    )

    def block_knn(batch: pa.Table) -> pa.Table:
        all_ids, cm = ray.get(corpus_ref)
        m = _normalize_rows(_batch_matrix(batch, vec_col))
        bids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sims = m @ cm.T  # (B, N)
        sims[bids[:, None] == all_ids[None, :]] = -np.inf  # mask self
        b = sims.shape[0]
        kk = min(k, sims.shape[1] - 1)
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        cand_ids = all_ids[part]  # (B, kk)
        sc = np.take_along_axis(sims, part, axis=1)
        # one flat lexsort ranks every row at once: row-major, then
        # score desc, then neighbor id asc — no per-row Python
        rows = np.repeat(np.arange(b), kk)
        order = np.lexsort((cand_ids.ravel(), -sc.ravel(), rows))
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(bids, kk)),
                "nbr_id": pa.array(cand_ids.ravel()[order]),
                "rank": pa.array(np.tile(np.arange(1, kk + 1, dtype=np.int64), b)),
                "score": pa.array(sc.ravel()[order]),
            },
            schema=out_schema,
        )

    return ds.map_batches(block_knn, batch_format="pyarrow")


def split_leakage(
    ds,
    threshold: float = 0.99,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_exact_rows: int = 200_000,
):
    """Train/test leakage audit in embedding space: every ODD-id vector
    (the held-out half) matched to its nearest EVEN-id vector (the
    train half); a near-1 cosine marks an eval row the model has
    effectively seen. Same plan as knn_graph — the train half
    normalizes once driver-side and broadcasts, each held-out batch
    answers itself with one matmul + argmax (ties → smallest train
    id) — and the same size gate routes bigger corpora to the IVF
    path. Returns (vec_id, nbr_id, score_r, leaky) with score rounded
    to 6 dp (the knn_topk oracle convention) and leaky computed FROM
    the rounded score so the flag replays exactly."""
    import ray

    tbl = ds.select_columns([id_col, vec_col]).to_pandas()
    tbl = tbl[tbl[id_col] % 2 == 0]
    n = len(tbl)
    if n == 0:
        # no train half at all -> nothing can leak (the twin's inner
        # join over an empty corpus side returns zero rows)
        empty = pa.schema(
            [
                ("vec_id", pa.int64()),
                ("nbr_id", pa.int64()),
                ("score_r", pa.float64()),
                ("leaky", pa.int64()),
            ]
        )
        return ds.map_batches(
            lambda t: empty.empty_table(), batch_format="pyarrow"
        )
    if n > max_exact_rows:
        raise ValueError(
            f"split_leakage exact path gated at {max_exact_rows} rows (got {n}); "
            "use build_ivf_index + knn_ivf_index for the scale path"
        )
    corpus = _normalize_rows(
        np.asarray([np.asarray(v, dtype=np.float64) for v in tbl[vec_col]])
    )
    ids = tbl[id_col].to_numpy().astype(np.int64)
    corpus_ref = ray.put((ids, corpus))

    out_schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("nbr_id", pa.int64()),
            ("score_r", pa.float64()),
            ("leaky", pa.int64()),
        ]
    )

    def block_top1(batch: pa.Table) -> pa.Table:
        bids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = bids % 2 == 1
        batch = batch.filter(pa.array(keep))
        if batch.num_rows == 0:
            return out_schema.empty_table()
        all_ids, cm = ray.get(corpus_ref)
        m = _normalize_rows(_batch_matrix(batch, vec_col))
        bids = bids[keep]
        sims = m @ cm.T  # (B, N)
        # argmax with ties → smallest train id: all_ids ascending by
        # construction? not guaranteed — lexsort per row is overkill;
        # order the corpus once by id at build time instead
        best = np.argmax(sims, axis=1)
        # resolve exact-score ties deterministically: mask to the max
        # then take the min id among maxima
        mx = sims[np.arange(len(bids)), best]
        tie_min = np.empty(len(bids), dtype=np.int64)
        sc = np.empty(len(bids), dtype=np.float64)
        for i in range(len(bids)):  # B-bounded; ties are rare
            mask = sims[i] == mx[i]
            tie_min[i] = all_ids[mask].min()
            sc[i] = mx[i]
        score_r = np.round(sc, 6)
        return pa.table(
            {
                "vec_id": pa.array(bids),
                "nbr_id": pa.array(tie_min),
                "score_r": pa.array(score_r),
                "leaky": pa.array((score_r >= threshold).astype(np.int64)),
            },
            schema=out_schema,
        )

    return ds.map_batches(block_top1, batch_format="pyarrow")


def hard_negatives(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    max_exact_rows: int = 200_000,
):
    """Hard-negative mining for contrastive training: every vector's
    nearest neighbor with a DIFFERENT label — the most-confusable
    example the loss should push away. Same broadcast-matmul plan as
    knn_graph with a label mask instead of a self mask (self is
    excluded transitively: same label); ties at the max → smallest
    negative id; same exact-path size gate, IVF beyond it. Returns
    (vec_id, neg_id, score_r) with the 6-dp rounding convention."""
    import ray

    tbl = ds.select_columns([id_col, vec_col, label_col]).to_pandas()
    n = len(tbl)
    if n > max_exact_rows:
        raise ValueError(
            f"hard_negatives exact path gated at {max_exact_rows} rows (got {n}); "
            "use build_ivf_index + knn_ivf_index for the scale path"
        )
    corpus = _normalize_rows(
        np.asarray([np.asarray(v, dtype=np.float64) for v in tbl[vec_col]])
    )
    ids = tbl[id_col].to_numpy().astype(np.int64)
    labels = tbl[label_col].to_numpy().astype(np.int64)
    corpus_ref = ray.put((ids, labels, corpus))

    out_schema = pa.schema(
        [("vec_id", pa.int64()), ("neg_id", pa.int64()), ("score_r", pa.float64())]
    )

    def block_neg(batch: pa.Table) -> pa.Table:
        all_ids, all_labels, cm = ray.get(corpus_ref)
        if batch.num_rows == 0:
            return out_schema.empty_table()
        m = _normalize_rows(_batch_matrix(batch, vec_col))
        bids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        blab = batch.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sims = m @ cm.T
        sims[blab[:, None] == all_labels[None, :]] = -np.inf  # same label out
        mx = sims.max(axis=1)
        # a row whose label covers the ENTIRE corpus has no negative at
        # all (mx = -inf): emit nothing, matching the twin's inner join
        has_neg = np.isfinite(mx)
        neg = np.empty(len(bids), dtype=np.int64)
        for i in np.flatnonzero(has_neg):  # tie-min, B-bounded
            neg[i] = all_ids[sims[i] == mx[i]].min()
        return pa.table(
            {
                "vec_id": pa.array(bids[has_neg]),
                "neg_id": pa.array(neg[has_neg]),
                "score_r": pa.array(np.round(mx[has_neg], 6)),
            },
            schema=out_schema,
        )

    return ds.map_batches(block_neg, batch_format="pyarrow")
