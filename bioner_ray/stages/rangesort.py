"""Range-partitioned global sort — the terasort shape.

Ray Data's ``Dataset.sort`` already range-partitions internally, but a
production export needs the partitioning EXPLICIT: deterministic cutoffs
(resumable — a re-run assigns every row the same partition), partition
ids materialized next to the data (so a failed run skips finished
partitions), and per-partition summaries that verify global order
without re-reading the payload.

Plan: ONE combiner-pruned histogram aggregate over the (quantized
integer) sort key — the shuffle moves one row per distinct value per
block, never the data — then the driver derives parts−1 cutoffs from
the histogram with the exact ceil-rule order statistic
(first value with cumulative count ≥ ceil(k·n/parts), the
value_percentiles / DuckDB quantile_disc rule), broadcasts them, and a
stateless pass assigns pid = #cutoffs < value (np.searchsorted 'left',
replayed in SQL as a bounded cutoff join). The data-scale exchange is
the single pid shuffle; each partition sorts locally — global order is
pid-major by construction.

No reference analog beyond the vocab sort (O1, ngram_encoder.py:102-107
sorts a dict in memory); extension per SURVEY.md §2.11.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones


def range_sort_cutoffs(ds, value_col: str, parts: int) -> list[int]:
    """parts−1 cutoff values from one histogram aggregate + a driver
    walk bounded by the value domain (distinct int64 values)."""
    hist = bucketed_aggregate(
        with_ones(ds.select_columns([value_col])), [value_col], [("one", "sum")]
    )
    rows = sorted((r[value_col], r["one"]) for r in hist.take_all())
    n = sum(c for _, c in rows)
    cutoffs = []
    for k in range(1, parts):
        target = (k * n + parts - 1) // parts  # ceil(k·n/parts), exact
        cum = 0
        for v, c in rows:
            cum += c
            if cum >= target:
                cutoffs.append(v)
                break
    return cutoffs


def range_partitioned_sort(
    ds,
    value_col: str,
    id_col: str,
    parts: int = 8,
):
    """Globally sorted dataset via explicit range partitioning.

    Returns ``(sorted_ds, summary_ds)``: ``sorted_ds`` has the input
    columns + ``pid`` (rows within a pid sorted by (value, id); pids
    ascending in value), ``summary_ds`` one row per pid
    (pid, n_rows, min_<value>, max_<value>) — adjacent summaries verify
    global order without touching the payload."""
    import ray

    cutoffs = np.array(range_sort_cutoffs(ds, value_col, parts), dtype=np.int64)
    cut_ref = ray.put(cutoffs)

    def assign(t: pa.Table) -> pa.Table:
        cuts = ray.get(cut_ref)
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        pid = np.searchsorted(cuts, v, side="left").astype(np.int64)
        return t.append_column("pid", pa.array(pid))

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def local_sort(g: pa.Table) -> pa.Table:
        if g.num_columns == 0:
            return g
        return g.sort_by([(value_col, "ascending"), (id_col, "ascending")])

    sorted_ds = assigned.groupby("pid").map_groups(local_sort, batch_format="pyarrow")

    def summarize(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                ("pid", pa.int64()),
                ("n_rows", pa.int64()),
                (f"min_{value_col}", pa.int64()),
                (f"max_{value_col}", pa.int64()),
            ]
        )
        if t.num_columns == 0 or t.num_rows == 0:
            return schema.empty_table()
        g = t.group_by("pid").aggregate(
            [(value_col, "count"), (value_col, "min"), (value_col, "max")]
        )
        return pa.table(
            {
                "pid": pc.cast(g.column("pid"), pa.int64()),
                "n_rows": pc.cast(g.column(f"{value_col}_count"), pa.int64()),
                f"min_{value_col}": g.column(f"{value_col}_min"),
                f"max_{value_col}": g.column(f"{value_col}_max"),
            }
        )

    summary = pin_schema(
        bucketed_aggregate(
            assigned.map_batches(summarize, batch_format="pyarrow"),
            ["pid"],
            [("n_rows", "sum"), (f"min_{value_col}", "min"), (f"max_{value_col}", "max")],
            num_buckets=max(parts, 8),
        ),
        pa.schema(
            [
                ("pid", pa.int64()),
                ("n_rows", pa.int64()),
                (f"min_{value_col}", pa.int64()),
                (f"max_{value_col}", pa.int64()),
            ]
        ),
        ensure_block=True,
    )
    return sorted_ds, summary


def write_sorted_parquet(ds, out_root: str, value_col: str, id_col: str, parts: int = 8):
    """Resumable globally-sorted Parquet export: one directory per
    range partition (``pid=K/``), each holding that partition's
    locally-sorted rows, with a per-partition ``_SUCCESS`` manifest
    carrying the order proof (n_rows, min, max). Cutoffs are
    deterministic (range_sort_cutoffs), so a re-run assigns identical
    pids; finished partitions (manifest present) are filtered out
    BEFORE the shuffle and never recomputed — the north rule's resume
    contract applied to the sort sink (a failed 100-TB export redoes
    only its unfinished ranges). ONE pid exchange; each group sorts
    and writes ITS OWN directory worker-side (tmp file + atomic
    rename, so a crashed writer leaves no torn partition). Returns
    the per-partition manifest list."""
    import json
    import os

    import ray

    done: dict[int, dict] = {}
    for pid in range(parts):
        mpath = os.path.join(out_root, f"pid={pid}", "_SUCCESS")
        if os.path.exists(mpath):
            with open(mpath) as f:
                done[pid] = json.load(f)

    cutoffs = np.array(range_sort_cutoffs(ds, value_col, parts), dtype=np.int64)
    cut_ref = ray.put((cutoffs, frozenset(done)))

    def assign(t: pa.Table) -> pa.Table:
        cuts, skip = ray.get(cut_ref)
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        pid = np.searchsorted(cuts, v, side="left").astype(np.int64)
        t = t.append_column("pid", pa.array(pid))
        if skip:
            keep = ~np.isin(pid, np.fromiter(skip, dtype=np.int64, count=len(skip)))
            t = t.filter(pa.array(keep))
        return t

    def write_group(g: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("pid", pa.int64()), ("n_rows", pa.int64()), ("min", pa.int64()), ("max", pa.int64())]
        )
        if g.num_columns == 0 or g.num_rows == 0:
            return out_schema.empty_table()
        import pyarrow.parquet as pq

        pid = int(g.column("pid")[0].as_py())
        g = g.sort_by([(value_col, "ascending"), (id_col, "ascending")])
        pdir = os.path.join(out_root, f"pid={pid}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".part-0.parquet.tmp")
        pq.write_table(g.drop_columns(["pid"]), tmp)
        os.replace(tmp, os.path.join(pdir, "part-0.parquet"))
        v = g.column(value_col).to_numpy(zero_copy_only=False)
        man = {"pid": pid, "n_rows": int(g.num_rows), "min": int(v[0]), "max": int(v[-1])}
        mtmp = os.path.join(pdir, "._SUCCESS.tmp")
        with open(mtmp, "w") as f:
            json.dump(man, f)
        os.replace(mtmp, os.path.join(pdir, "_SUCCESS"))
        return pa.table(
            {
                "pid": pa.array([man["pid"]], type=pa.int64()),
                "n_rows": pa.array([man["n_rows"]], type=pa.int64()),
                "min": pa.array([man["min"]], type=pa.int64()),
                "max": pa.array([man["max"]], type=pa.int64()),
            }
        )

    written = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(write_group, batch_format="pyarrow")
        .take_all()
    )
    manifests = dict(done)
    for r in written:
        manifests[int(r["pid"])] = {
            "pid": int(r["pid"]),
            "n_rows": int(r["n_rows"]),
            "min": int(r["min"]),
            "max": int(r["max"]),
        }
    # ranges with no rows still need a manifest so resume can skip them
    for pid in range(parts):
        if pid not in manifests:
            pdir = os.path.join(out_root, f"pid={pid}")
            os.makedirs(pdir, exist_ok=True)
            man = {"pid": pid, "n_rows": 0, "min": None, "max": None}
            with open(os.path.join(pdir, "_SUCCESS"), "w") as f:
                json.dump(man, f)
            manifests[pid] = man
    return [manifests[pid] for pid in sorted(manifests)]
