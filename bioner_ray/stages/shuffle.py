"""High-cardinality exact groupby: the coarse-bucket aggregate.

Ray Data's built-in ``groupby(...).aggregate(...)`` pays Python-level
cost per distinct group — fine for hundreds of groups (pricing
summaries, per-language counts), catastrophic for millions (pair
dedup, triple canonicalization: 1M distinct keys ≈ 20 s of pure group
bookkeeping on 32 cores). ``bucketed_aggregate`` keeps the exact same
semantics but restructures the physical plan:

1. **partial** — per-block Arrow ``Table.group_by`` (C speed): one row
   per distinct key per block, so the shuffle moves pre-combined rows
   (this is the G1 combiner pattern from the reference's vocabulary
   count, ngram_encoder.py:139-150, applied generically);
2. **shuffle** — hash the key columns into ``num_buckets`` coarse
   buckets; Ray shuffles on the *bucket* (fixed cardinality regardless
   of key cardinality — also the salted-key answer to hot keys: a hot
   key shares its bucket, it never owns a straggler partition of its
   own);
3. **final** — per-bucket Arrow ``group_by`` again (C speed).

Supported ops: sum / min / max (count = sum over a ones column —
callers add it, cf. pipelines/analytics.pricing_summary).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

_FNV = np.uint64(1099511628211)

#: ops whose partial and final step are the same op (decomposable)
_OPS = {"sum", "min", "max"}

#: polars fixed-seed hash PIN (VERDICT r3, Next #5): bucket assignment
#: must agree across every process of a run, and polars documents no
#: cross-version stability for Series.hash. These are the probe
#: outputs recorded under the image's pinned polars (1.42.1); a polars
#: whose seed/algorithm behavior differs flips at least one of them,
#: in which case the bucket hash falls back to the crc32 loop (slower,
#: version-independent) with a loud one-time warning instead of
#: silently re-bucketing half a cluster.
_POLARS_PROBE = ["", "a", "bioner-ray-bucket-probe", "héllo-世界", "site0.example.com/doc/123"]
_POLARS_PROBE_EXPECTED = (
    3619183968405584189,
    13223116160119632573,
    3564398302012424403,
    4093727340295390195,
    3696737862696830403,
)
_polars_hash_validated: bool | None = None


def _polars_hash_usable() -> bool:
    """True iff polars is importable AND its fixed-seed string hash
    reproduces the recorded probe values. Memoized per process."""
    global _polars_hash_validated
    if _polars_hash_validated is None:
        try:
            import polars as pl
        except ImportError:
            _polars_hash_validated = False
        else:
            got = tuple(pl.Series(_POLARS_PROBE).hash(seed=0).to_list())
            _polars_hash_validated = got == _POLARS_PROBE_EXPECTED
            if not _polars_hash_validated:
                import warnings

                warnings.warn(
                    "polars Series.hash(seed=0) does not reproduce the "
                    f"pinned probe values (polars {pl.__version__}; got "
                    f"{got}). Falling back to the crc32 bucket hash — "
                    "correct but slower. Re-pin _POLARS_PROBE_EXPECTED "
                    "for this polars version.",
                    RuntimeWarning,
                    stacklevel=3,
                )
    return _polars_hash_validated


def hash_strings_u64(col) -> np.ndarray:
    """Vectorized 64-bit hash of a string column/array — ONE C call
    (polars/xxhash, ~4× the crc32 Python generator this replaces).

    Bucket ids are partitioning-only: every caller drops them before
    any result column, so the only contract is determinism across
    processes WITHIN a run — polars' fixed-seed hash is stable for a
    given polars version, every worker in a cluster runs the same
    image, and ``_polars_hash_usable`` verifies the version actually
    behaves as recorded before the first bucket is assigned. Falls
    back to the crc32 loop when polars is absent, fails the probe, or
    the column isn't a plain string type."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if _polars_hash_usable() and (
        pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
    ):
        import polars as pl

        return pl.from_arrow(col).hash(seed=0).to_numpy().astype(np.uint64)
    return np.fromiter(
        (zlib.crc32(str(x).encode()) for x in col.to_pylist()),
        dtype=np.uint64,
        count=len(col),
    )


def _bucket_column(batch: pa.Table, keys: list[str], num_buckets: int) -> pa.Array:
    """Deterministic, process-independent bucket id per row (numpy mix
    for integer keys, vectorized xxhash for strings)."""
    acc = np.zeros(batch.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in keys:
            col = batch.column(k)
            if pa.types.is_integer(col.type):
                v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            else:
                v = hash_strings_u64(col)
            acc = acc * _FNV + v
    return pa.array((acc % np.uint64(num_buckets)).astype(np.int32))


def _arrow_agg(t: pa.Table, keys: list[str], aggs: list[tuple[str, str]]) -> pa.Table:
    out = t.group_by(keys).aggregate([(c, op) for c, op in aggs])
    # Select by the GENERATED names ("{col}_{op}"), not by position: if a
    # pyarrow version ever reorders group_by output, this raises a loud
    # KeyError instead of silently mislabeling aggregate columns.
    out = out.select(list(keys) + [f"{c}_{op}" for c, op in aggs])
    return out.rename_columns(list(keys) + [c for c, _ in aggs])


#: Ray returns task outputs under ~100 KB INLINE to the owning driver
#: instead of plasma; with headroom, slices ≥ 128 KB always go to the
#: object store.
_INLINE_SLICE_BYTES = 131072


def _shuffle_input_guard(ds, est_bytes: int | None, num_buckets: int):
    """Inline-slice guard for Ray's sort shuffle (round-5 blowup-audit
    finding): the sort behind ``groupby`` splits every input block into
    one slice per reduce partition, and any slice under the ~100 KB
    inline threshold is returned INLINE into the owning driver's heap —
    with sub-26 MB input blocks that is a dataset-sized transient spike
    in driver RSS (measured 369 MB on a 96 MB stream at sf1; 15 MB
    after this guard). Production-sized blocks (Ray's 128 MB default
    target) are immune — slices clear the threshold naturally — so the
    guard only acts in the small-block regime: when the caller's byte
    estimate says blocks would be small AND the resulting block count
    is below the cluster's natural parallelism, coalesce with one
    cheap ``repartition`` so each (block × bucket) slice lands in
    plasma."""
    if est_bytes is None:
        return ds
    # below ~4 coalesced blocks' worth (128 MB at the default 256
    # buckets) the inline spike is bounded by est_bytes itself —
    # harmless — and coalescing would only serialize the reduce; act
    # only when the stream is big enough for the spike to matter,
    # which also guarantees ≥ 5 reduce partitions after the coalesce
    if est_bytes < 4 * num_buckets * _INLINE_SLICE_BYTES:
        return ds
    import ray

    target = int(est_bytes // (num_buckets * _INLINE_SLICE_BYTES)) + 1
    cpus = (
        int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    )
    if target < cpus * 2:
        return ds.repartition(target)
    return ds


def bucketed_aggregate(
    ds,
    keys: list[str],
    aggs: list[tuple[str, str]],
    num_buckets: int = 256,
    batch_size: int = 65536,
    est_bytes: int | None = None,
):
    """Exact distributed groupby for arbitrary key cardinality.

    ``aggs`` = [(column, op)] with op ∈ {sum, min, max}; output columns
    keep their input names. See module docstring for the plan shape.
    ``est_bytes`` (optional): approximate byte size of the combined
    stream, enabling the ``_shuffle_input_guard`` block coalesce."""
    for _, op in aggs:
        if op not in _OPS:
            raise ValueError(f"unsupported op {op!r}; use sum/min/max (+ ones column for count)")

    def partial(batch: pa.Table) -> pa.Table:
        t = _arrow_agg(batch, keys, aggs)
        return t.append_column("_bucket", _bucket_column(t, keys, num_buckets))

    return (
        _shuffle_input_guard(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size),
            est_bytes,
            num_buckets,
        )
        .groupby("_bucket")
        .map_groups(
            lambda group: _arrow_agg(group.drop_columns(["_bucket"]), keys, aggs),
            batch_format="pyarrow",
        )
    )


def bucketed_map_groups(
    ds, keys: list[str], fn, num_buckets: int = 256, est_bytes: int | None = None
):
    """``groupby(keys).map_groups(fn)`` WITHOUT one Ray group per
    distinct key: rows shuffle on the coarse bucket of the key columns
    (``num_buckets`` groups total) and ``fn`` runs once per bucket over
    ALL of its keys — at web-scale key cardinality (entities, users,
    shingles) the per-key protocol is the dominant cost, not the UDF
    (measured 13.9 s → 2.5 s on source_overlap at sf0.1).

    Contract: ``fn`` must handle a multi-key table (sort by the key
    itself and run-scan — every caller in this engine already does) and
    a zero-column EMPTY table (the pin_schema hazard). The transient
    ``_bucket`` column is stripped before ``fn`` sees the rows."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return batch
        return batch.append_column("_bucket", _bucket_column(batch, keys, num_buckets))

    def run(group: pa.Table) -> pa.Table:
        if "_bucket" in group.schema.names:
            group = group.drop_columns(["_bucket"])
        return fn(group)

    return (
        _shuffle_input_guard(
            ds.map_batches(add_bucket, batch_format="pyarrow"),
            est_bytes,
            num_buckets,
        )
        .groupby("_bucket")
        .map_groups(run, batch_format="pyarrow")
    )


def bucketed_inner_join(
    left,
    right,
    keys: list[str],
    left_schema: pa.Schema,
    right_schema: pa.Schema,
    num_buckets: int = 256,
    batch_size: int = 65536,
    join_type: str = "inner",
    est_bytes: int | None = None,
):
    """Empty-partition-proof distributed hash join (``inner`` or
    ``left anti``). ``est_bytes``: optional combined-size estimate for
    the ``_shuffle_input_guard`` inline-slice coalesce.

    Ray's native ``Dataset.join`` (2.49) crashes whenever a hash
    partition receives zero rows on either side: the aggregator builds
    a zero-COLUMN empty table and pyarrow's join raises ``No match …
    for key field reference`` — guaranteed to fire at toy scale and
    possible at any scale under key skew. This join reuses the
    engine's coarse-bucket shuffle instead: both sides are tagged and
    padded to a common schema, unioned, shuffled on the bucket of the
    key columns (fixed cardinality — a hot key shares its bucket), and
    each bucket runs pyarrow's C-speed ``Table.join`` locally. Typed
    zero-ROW sides inside a bucket are fine; zero-column tables never
    reach the join. Non-key column names must be disjoint.

    ``join_type="left anti"`` emits the left rows with NO key match on
    the right; ``"left semi"`` the left rows WITH a match (both: left
    columns only, no fanout); ``"left outer"`` keeps unmatched left
    rows with null right columns; ``"full outer"`` additionally keeps
    unmatched RIGHT rows with null left columns (key columns coalesced
    by pyarrow, so the key is never null). All are globally exact under
    the same bucketing argument: a key's rows from both sides always
    land in the same bucket, so the local pyarrow join per bucket
    composes — including full outer, because an unmatched key is
    unmatched within exactly the one bucket it hashes to."""
    if join_type not in ("inner", "left anti", "left semi", "left outer", "full outer"):
        raise ValueError(f"unsupported join_type: {join_type}")
    lcols = [f.name for f in left_schema]
    rcols = [f.name for f in right_schema]
    rval = [c for c in rcols if c not in keys]
    overlap = set(rval) & set(lcols)
    if overlap:
        raise ValueError(f"non-key columns must be disjoint; overlap: {sorted(overlap)}")
    all_fields = list(left_schema) + [right_schema.field(c) for c in rval]

    def prep(side: int, schema: pa.Schema):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:
                t = schema.empty_table()
            n = t.num_rows
            cols = {}
            for f in all_fields:
                if f.name in t.column_names:
                    cols[f.name] = t.column(f.name).cast(f.type)
                else:
                    cols[f.name] = pa.nulls(n, type=f.type)
            out = pa.table(cols)
            out = out.append_column(
                "_side", pa.array(np.full(n, side, dtype=np.int8))
            )
            return out.append_column("_bucket", _bucket_column(out, keys, num_buckets))

        return fn

    u = _shuffle_input_guard(
        left.map_batches(
            prep(0, left_schema), batch_format="pyarrow", batch_size=batch_size
        ).union(
            right.map_batches(
                prep(1, right_schema), batch_format="pyarrow", batch_size=batch_size
            )
        ),
        est_bytes,
        num_buckets,
    )

    def final(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_bucket"])
        side = g.column("_side")
        import pyarrow.compute as pc

        lt = g.filter(pc.equal(side, 0)).select(lcols)
        if join_type in ("left anti", "left semi"):
            rt = g.filter(pc.equal(side, 1)).select(keys)
            if join_type == "left semi":
                # pyarrow's left-semi fans out on duplicate right keys in
                # some versions; dedup the right key set first
                rt = rt.group_by(keys).aggregate([])
            return lt.join(rt, keys=keys, join_type=join_type)
        rt = g.filter(pc.equal(side, 1)).select(keys + rval)
        return lt.join(rt, keys=keys, join_type=join_type)

    return u.groupby("_bucket").map_groups(final, batch_format="pyarrow")


def pin_schema(ds, schema: pa.Schema, ensure_block: bool = False):
    """Cast every block to ``schema``, turning the sort-shuffle's
    schema-less EMPTY reduce partitions into typed empty tables.

    Required before feeding an aggregate/map_groups output into a hash
    JOIN: pyarrow's join raises ``No match … for key field reference``
    if any left-side block is a zero-column empty table, which is
    exactly what an empty reduce partition looks like at toy scale
    (at production density every partition holds data and this is a
    zero-cost cast).

    ``ensure_block=True`` additionally unions one typed EMPTY block in,
    for pipelines whose upstream can legitimately produce ZERO blocks
    (e.g. a groupby over an empty candidate set): map_batches over zero
    blocks never runs, so a cast alone can't give the empty result a
    schema."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return schema.empty_table()
        return t.select(schema.names).cast(schema)

    out = ds.map_batches(fn, batch_format="pyarrow")
    if ensure_block:
        import ray.data as rd

        out = out.union(rd.from_arrow(schema.empty_table()))
    return out


def quiet_empty_bundle_warnings() -> None:
    """Filter Ray's "RefBundle with a different schema … new schema: ."
    log line. At toy scale, sort-based shuffles (the machinery under
    ``groupby().map_groups`` / ``aggregate``) emit EMPTY reduce
    partitions whose bundles carry no schema; the streaming executor
    logs a schema-change warning for each. The bundles are empty —
    nothing downstream can misbehave — and at production density every
    reduce partition holds data, so the condition itself vanishes.
    Entry points (bench, CLI, oracle checker) call this once."""
    import logging

    class _Filter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return "RefBundle with a different schema" not in record.getMessage()

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_Filter())


def with_ones(ds, name: str = "one"):
    """Append an int64 ones column (count = sum(one) after aggregation)."""

    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(name, pa.array(np.ones(batch.num_rows, dtype=np.int64)))

    return ds.map_batches(add, batch_format="pyarrow")
