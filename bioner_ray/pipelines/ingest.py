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
