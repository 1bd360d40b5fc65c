"""Per-group top-k rank (``row_number() OVER (PARTITION BY ... ORDER
BY ...) <= k``) — the combiner-pruned distributed form.

Naively this is one sort-based groupby carrying every row. The partial
step prunes first: inside every block, each group keeps only its local
top-k (no global information needed — a row outside its block-local
top-k can never be in the global top-k), so the shuffle moves at most
k × groups-per-block rows. The final per-group pass re-ranks the
survivors. Same partial/final shape as bucketed_aggregate (G1), applied
to an order statistic.

No reference analog beyond the global vocab top-k (O1,
ngram_encoder.py:139-150); extension per SURVEY.md §2.11.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _local_topk(batch: pa.Table, key_col: str, order_by, k: int, with_rank: bool) -> pa.Table:
    if batch.num_columns == 0:
        # Sort-shuffle reduce stages can hand map_groups a schema-less
        # EMPTY partition (see stages/shuffle.pin_schema); sort_by/select
        # on a zero-column table raises. Pass the empty block through —
        # callers that select/join downstream pin_schema the output.
        return batch
    sort_keys = [(key_col, "ascending")] + list(order_by)
    batch = batch.sort_by(sort_keys)
    keys = batch.column(key_col).to_numpy(zero_copy_only=False)
    # run-length positions within each key's sorted run
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    pos = np.arange(len(keys)) - np.repeat(starts, np.diff(np.r_[starts, len(keys)]))
    out = batch.filter(pa.array(pos < k))
    if with_rank:
        out = out.append_column("rk", pa.array((pos[pos < k] + 1).astype(np.int64)))
    return out


def top_k_per_group(ds, key_col: str, order_by, k: int):
    """Keep each group's top-k rows under ``order_by`` (list of
    ``(col, "ascending"|"descending")``, ties broken by the later
    columns — make the last one unique for determinism). Output: the
    input columns + ``rk`` (1-based rank within the group)."""

    from bioner_ray.stages.shuffle import bucketed_map_groups

    def partial(batch: pa.Table) -> pa.Table:
        return _local_topk(batch, key_col, order_by, k, with_rank=False)

    def final(group: pa.Table) -> pa.Table:
        return _local_topk(group, key_col, order_by, k, with_rank=True)

    # coarse-bucket reduce (one Ray group per bucket, run-scan inside),
    # never one Ray group per key — _local_topk is multi-key by
    # construction
    return bucketed_map_groups(
        ds.map_batches(partial, batch_format="pyarrow"), [key_col], final
    )
