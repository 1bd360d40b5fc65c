"""Time-window operators: rolling calendar aggregates and as-of joins.

The reference has no streaming/window constructs (SURVEY.md §2.9), but a
web-scale training-data pipeline needs them; these are the batch-engine
forms, built on the same primitives as the rest of the engine:

* ``rolling_daily_aggregate`` — tumbling daily aggregate (the
  events_per_day pattern) extended with a trailing W-day window. The
  per-day aggregate is a ``bucketed_aggregate`` over the corpus; the
  rolling pass then runs over the AGGREGATED table, whose cardinality
  is bounded by the calendar (days in the data), not by the corpus —
  so finishing it driver-side is scale-safe, the same argument as
  canonicalize_nodes.
* ``asof_join_latest`` — for every left row (event), the most recent
  right row (order) with the same key and time ≤ the event time. Ray
  Data has no as-of join; the composition is union → coarse key-bucket
  shuffle → per-bucket Arrow sort + vectorized forward-fill scan. The
  partitioning assumption: all rows of one key land in one bucket
  (guaranteed by hashing the key), so the merge never crosses buckets;
  a hot key shares its bucket and cannot own a straggler partition.
  Ties are pinned: right rows sort before left at equal time
  (inclusive ≤), equal (key, time) right rows resolve to the largest
  payload key — both replayed exactly by the DuckDB oracle's
  ``ORDER BY t DESC, okey DESC LIMIT 1``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bioner_ray.stages.shuffle import bucketed_aggregate


def rolling_daily_aggregate(
    events_ds,
    window_days: int = 7,
    ts_col: str = "ts",
    value_cents_col: str = "value_cents",
):
    """Input: rows with ``ts`` and an integer value column. Output
    pa.Table: day, n_events, sum_value_cents, n_events_<W>d,
    sum_value_cents_<W>d (trailing window INCLUDING the current day,
    calendar-gap-aware via searchsorted, matching SQL
    ``RANGE BETWEEN INTERVAL W-1 DAY PRECEDING AND CURRENT ROW``)."""

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.floor_temporal(batch.column(ts_col), unit="day"),
                "n_events": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "sum_value_cents": batch.column(value_cents_col),
            }
        )

    agg = bucketed_aggregate(
        events_ds.map_batches(prep, batch_format="pyarrow"),
        ["day"],
        [("n_events", "sum"), ("sum_value_cents", "sum")],
    )

    t = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)  # bounded by calendar
    if t.num_rows == 0:
        empty = pa.array([], type=pa.int64())
        return pa.table(
            {
                "day": pa.array([], type=pa.timestamp("us")),
                "n_events": empty,
                "sum_value_cents": empty,
                f"n_events_{window_days}d": empty,
                f"sum_value_cents_{window_days}d": empty,
            }
        )
    t = t.take(pc.sort_indices(t, sort_keys=[("day", "ascending")])).combine_chunks()
    days = t.column("day").to_numpy(zero_copy_only=False)
    d_int = days.astype("datetime64[D]").astype(np.int64)
    n = t.column("n_events").to_numpy(zero_copy_only=False).astype(np.int64)
    v = t.column("sum_value_cents").to_numpy(zero_copy_only=False).astype(np.int64)
    cn = np.concatenate([[0], np.cumsum(n)])
    cv = np.concatenate([[0], np.cumsum(v)])
    lo = np.searchsorted(d_int, d_int - (window_days - 1), side="left")
    hi = np.arange(len(d_int)) + 1
    return t.append_column(
        f"n_events_{window_days}d", pa.array(cn[hi] - cn[lo], type=pa.int64())
    ).append_column(
        f"sum_value_cents_{window_days}d", pa.array(cv[hi] - cv[lo], type=pa.int64())
    )


def sessionize(
    events_ds,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_buckets: int = 256,
):
    """Gap-based sessionization: per key, events ordered by
    ``(ts, id)``; a new session starts when the gap from the previous
    event strictly exceeds ``gap_seconds``. ``session_id`` is 0-based
    per key.

    Shuffle shape: ONE coarse-bucket shuffle (``bucketed_map_groups``,
    never one Ray group per user) with a multi-key run-scan inside
    each bucket — each reduce group holds ~1/``num_buckets`` of the
    events table, so size ``num_buckets`` so a bucket fits worker
    heap; a pathologically hot key's events must still share one
    bucket (sessionize cannot split a key without losing gap
    continuity — the honest lower bound for any engine).
    Output columns: id_col, key_col, ``session_id`` (int64).
    """

    def assign(group: pa.Table) -> pa.Table:
        if group.num_columns == 0:
            # schema-less empty reduce partition (the pin_schema
            # hazard): pass through — inventing column types here
            # would poison schema unification for int64-keyed callers
            return group
        if group.num_rows == 0:
            return pa.table(
                {
                    id_col: group.column(id_col),
                    key_col: group.column(key_col),
                    "session_id": pa.array([], type=pa.int64()),
                }
            )
        # multi-KEY run-scan (the bucketed_map_groups contract): sort by
        # (key, ts, id), session breaks on key change OR gap, session_id
        # rebased to 0 at each key's first row
        group = group.sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"), (id_col, "ascending")]
        )
        keys = group.column(key_col).to_numpy(zero_copy_only=False)
        ts = group.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)  # µs
        newkey = np.r_[True, keys[1:] != keys[:-1]]
        new = newkey.copy()
        new[1:] |= (ts[1:] - ts[:-1]) > gap_seconds * 1_000_000
        sid = np.cumsum(new) - 1
        starts = np.flatnonzero(newkey)
        base = np.repeat(sid[starts], np.diff(np.r_[starts, len(keys)]))
        return pa.table(
            {
                id_col: group.column(id_col),
                key_col: group.column(key_col),
                "session_id": pa.array(sid - base, type=pa.int64()),
            }
        )

    from bioner_ray.stages.shuffle import bucketed_map_groups

    return bucketed_map_groups(events_ds, [key_col], assign, num_buckets=num_buckets)


def asof_join_latest(
    left_ds,
    right_ds,
    left_key: str,
    left_ts: str,
    left_id: str,
    right_key: str,
    right_ts: str,
    right_payload: str,
    num_buckets: int = 64,
    missing: int = -1,
):
    """For each left row, the ``right_payload`` of the latest right row
    with the same key and time ≤ the left time (``missing`` when none).
    Columns: <left_id>, last_<right_payload>. See module docstring for
    the plan and tie rules."""

    def left_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b.column(left_key), pa.int64()),
                "t": b.column(left_ts),
                "kind": pa.array(np.ones(b.num_rows, dtype=np.int32)),
                "okey": pa.array(np.full(b.num_rows, missing, dtype=np.int64)),
                "row_id": pc.cast(b.column(left_id), pa.int64()),
            }
        )

    def right_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b.column(right_key), pa.int64()),
                "t": b.column(right_ts),
                "kind": pa.array(np.zeros(b.num_rows, dtype=np.int32)),
                "okey": pc.cast(b.column(right_payload), pa.int64()),
                "row_id": pa.array(np.full(b.num_rows, missing, dtype=np.int64)),
            }
        )

    unioned = left_ds.map_batches(left_rows, batch_format="pyarrow").union(
        right_ds.map_batches(right_rows, batch_format="pyarrow")
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        k = b.column("k").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            bucket = ((k * np.uint64(2654435761)) % np.uint64(num_buckets)).astype(np.int32)
        return b.append_column("bucket", pa.array(bucket, type=pa.int32()))

    def merge(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[
                ("k", "ascending"),
                ("t", "ascending"),
                ("kind", "ascending"),
                ("okey", "ascending"),
            ],
        )
        t = group.take(idx).combine_chunks()
        n = t.num_rows
        k = t.column("k").to_numpy(zero_copy_only=False)
        kind = t.column("kind").to_numpy(zero_copy_only=False)
        okey = t.column("okey").to_numpy(zero_copy_only=False)
        rid = t.column("row_id").to_numpy(zero_copy_only=False)
        is_right = kind == 0
        pos = np.where(is_right, np.arange(n), -1)
        ff = np.maximum.accumulate(pos) if n else pos
        newkey = np.ones(n, dtype=bool)
        if n > 1:
            newkey[1:] = k[1:] != k[:-1]
        run_start = np.maximum.accumulate(np.where(newkey, np.arange(n), 0))
        valid = (ff >= run_start) & (ff >= 0)
        last = np.where(valid, okey[np.clip(ff, 0, None)], missing)
        keep = ~is_right
        return pa.table(
            {
                left_id: pa.array(rid[keep], type=pa.int64()),
                f"last_{right_payload}": pa.array(last[keep], type=pa.int64()),
            }
        )

    return (
        unioned.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
    )


def range_join_count(
    left_ds,
    right_ds,
    left_key: str,
    left_ts: str,
    left_id: str,
    right_key: str,
    right_ts: str,
    window_us: int,
    num_buckets: int = 256,
):
    """Distributed band (range) join: for every left row, count right
    rows with the same key and |right_ts − left_ts| ≤ ``window_us`` —
    the "events near an order" interval-overlap query Ray Data has no
    operator for.

    Plan: both sides key on (key, coarse) with coarse = floor(ts /
    window) — one coarse cell per right row, ≤3 replicas per left row
    ({c−1, c, c+1} covers every cell a |Δ| ≤ window match can live in,
    since floor((t±W)/W) is within floor(t/W)±1). One bucketed hash
    join on the composite key, an exact vectorized |Δ| filter, one
    bucketed count — exchange is 3·|left| + |right| slim rows, never a
    per-key cross product beyond the genuine band matches. Skew: a hot
    (key, cell) shares its bucket, the usual coarse-bucket argument.
    Left rows with no match are absent (inner semantics). Columns:
    <left_id>, n_matches."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, bucketed_inner_join, with_ones

    w = np.int64(window_us)

    def left_rows(b: pa.Table) -> pa.Table:
        k = b.column(left_key).to_numpy(zero_copy_only=False).astype(np.int64)
        t = pc.cast(b.column(left_ts), pa.int64()).to_numpy(zero_copy_only=False)
        lid = b.column(left_id).to_numpy(zero_copy_only=False).astype(np.int64)
        c = t // w
        return pa.table(
            {
                "k": pa.array(np.tile(k, 3)),
                "c": pa.array(np.concatenate([c - 1, c, c + 1])),
                "lid": pa.array(np.tile(lid, 3)),
                "lt": pa.array(np.tile(t, 3)),
            }
        )

    def right_rows(b: pa.Table) -> pa.Table:
        k = b.column(right_key).to_numpy(zero_copy_only=False).astype(np.int64)
        t = pc.cast(b.column(right_ts), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {"k": pa.array(k), "c": pa.array(t // w), "rt": pa.array(t)}
        )

    joined = bucketed_inner_join(
        left_ds.map_batches(left_rows, batch_format="pyarrow"),
        right_ds.map_batches(right_rows, batch_format="pyarrow"),
        ["k", "c"],
        pa.schema(
            [("k", pa.int64()), ("c", pa.int64()), ("lid", pa.int64()), ("lt", pa.int64())]
        ),
        pa.schema([("k", pa.int64()), ("c", pa.int64()), ("rt", pa.int64())]),
        num_buckets=num_buckets,
    )

    def in_band(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema([("lid", pa.int64())]).empty_table()
        dt = pc.abs(pc.subtract(t.column("rt"), t.column("lt")))
        return t.filter(pc.less_equal(dt, int(w))).select(["lid"])

    return bucketed_aggregate(
        with_ones(joined.map_batches(in_band, batch_format="pyarrow"), "n_matches"),
        ["lid"],
        [("n_matches", "sum")],
        num_buckets=num_buckets,
    )


def grouped_running_sum(
    ds,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum",
    carry_cols: tuple[str, ...] = (),
    num_buckets: int = 256,
):
    """Per-key running total — ``SUM(value) OVER (PARTITION BY key
    ORDER BY order_cols ROWS UNBOUNDED PRECEDING)`` — for integer
    value columns (quantize floats first; integer prefix sums are
    order-exact and replay bit-for-bit in SQL).

    One key-bucketed exchange moves each key's rows (with the order
    and carry columns) into a single bucket; the reducer sorts the
    bucket once by (key, *order_cols) and computes every key's prefix
    sum in one segmented vectorized pass (cumsum minus per-segment
    base — no per-key loop). Make the last order column unique per key
    (an id) so the running order, and hence every prefix, is fully
    deterministic. A hot key shares its bucket; the per-bucket cost is
    the sort, O(rows log rows) in bucket size."""
    from bioner_ray.stages.shuffle import _bucket_column

    cols = [key_col, *order_cols, *(c for c in carry_cols if c not in (key_col, *order_cols)), value_col]

    def partial(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        return t.append_column("_bucket", _bucket_column(t, [key_col], num_buckets))

    def scan(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            # schema-less empty reduce partition: callers pin_schema
            return g
        g = g.drop_columns(["_bucket"]).sort_by(
            [(key_col, "ascending")] + [(c, "ascending") for c in order_cols]
        )
        keys = g.column(key_col).to_numpy(zero_copy_only=False)
        vals = g.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        sizes = np.diff(np.r_[starts, len(keys)])
        totals = np.cumsum(vals)
        seg_base = totals[starts] - vals[starts]
        cum = totals - np.repeat(seg_base, sizes)
        return g.drop_columns([value_col]).append_column(out_col, pa.array(cum))

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(scan, batch_format="pyarrow")
    )


def asof_join_next(
    left_ds,
    right_ds,
    left_key: str,
    left_ts: str,
    left_id: str,
    right_key: str,
    right_ts: str,
    right_payload: str,
    horizon_us: int,
    num_buckets: int = 64,
    missing: int = -1,
):
    """FORWARD as-of join with a horizon — attribution: for each left
    row, the payload of the EARLIEST right row with the same key,
    time STRICTLY after the left time, and gap ≤ ``horizon_us``
    (``missing`` when none). Ties at the winning timestamp resolve to
    the smallest payload (deterministic, replayable as
    ``row_number() OVER (ORDER BY t, payload)``).

    Same plan as asof_join_latest run mirrored: union-tag both sides,
    ONE key-bucketed exchange, per-bucket sort (k, t, kind, payload)
    with rights ordered BEFORE lefts at equal timestamps so an
    equal-time right is never matched (strictly-after rule), then a
    vectorized BACKWARD fill of next-right positions, key-run and
    horizon masks. Columns: <left_id>, next_<right_payload>, gap_us
    (−1 when unmatched)."""

    def left_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b.column(left_key), pa.int64()),
                "t": b.column(left_ts),
                "kind": pa.array(np.ones(b.num_rows, dtype=np.int32)),
                "okey": pa.array(np.full(b.num_rows, missing, dtype=np.int64)),
                "row_id": pc.cast(b.column(left_id), pa.int64()),
            }
        )

    def right_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(b.column(right_key), pa.int64()),
                "t": b.column(right_ts),
                "kind": pa.array(np.zeros(b.num_rows, dtype=np.int32)),
                "okey": pc.cast(b.column(right_payload), pa.int64()),
                "row_id": pa.array(np.full(b.num_rows, missing, dtype=np.int64)),
            }
        )

    unioned = left_ds.map_batches(left_rows, batch_format="pyarrow").union(
        right_ds.map_batches(right_rows, batch_format="pyarrow")
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        k = b.column("k").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            bucket = ((k * np.uint64(2654435761)) % np.uint64(num_buckets)).astype(np.int32)
        return b.append_column("bucket", pa.array(bucket, type=pa.int32()))

    def merge(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[
                ("k", "ascending"),
                ("t", "ascending"),
                ("kind", "ascending"),  # right (0) before left (1) at equal t
                ("okey", "ascending"),  # earliest-ts tie → smallest payload
            ],
        )
        t = group.take(idx).combine_chunks()
        n = t.num_rows
        k = t.column("k").to_numpy(zero_copy_only=False)
        kind = t.column("kind").to_numpy(zero_copy_only=False)
        okey = t.column("okey").to_numpy(zero_copy_only=False)
        rid = t.column("row_id").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        is_right = kind == 0
        # backward fill: next right position at index >= i
        pos = np.where(is_right, np.arange(n), n)
        bf = np.minimum.accumulate(pos[::-1])[::-1] if n else pos
        # last index of each key run
        newkey = np.ones(n, dtype=bool)
        if n > 1:
            newkey[1:] = k[1:] != k[:-1]
        run_id = np.cumsum(newkey) - 1
        run_end = np.zeros(n, dtype=np.int64)
        if n:
            ends = np.flatnonzero(np.r_[newkey[1:], True])
            run_end = ends[run_id]
        safe = np.clip(bf, 0, max(n - 1, 0))
        gap = ts[safe] - ts
        valid = (bf < n) & (safe <= run_end) & (gap <= horizon_us)
        # strictly-after is structural: an equal-time right sorts before
        # the left, so bf can only land on rights with t > left t
        nxt = np.where(valid, okey[safe], missing)
        gap_out = np.where(valid, gap, -1)
        keep = ~is_right
        return pa.table(
            {
                left_id: pa.array(rid[keep], type=pa.int64()),
                f"next_{right_payload}": pa.array(nxt[keep], type=pa.int64()),
                "gap_us": pa.array(gap_out[keep], type=pa.int64()),
            }
        )

    return (
        unioned.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
    )


def scd2_intervals(
    events_ds,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_buckets: int = 256,
):
    """Slowly-changing-dimension (type-2) validity intervals: per key,
    events ordered by ``(ts, id)`` collapse into STATE RUNS — each
    maximal stretch of one ``state_col`` value becomes one row with
    ``valid_from_us`` (first event's timestamp), ``valid_to_us`` (the
    NEXT run's first timestamp, −1 for the current open state) and the
    run's event count. The latest-state-per-key table a warehouse
    upsert/merge maintains, derived from the raw stream in one pass.

    Shuffle shape: identical to ``sessionize`` — ONE coarse-bucket
    shuffle (``bucketed_map_groups``), multi-key vectorized run-scan
    inside each bucket; a key's events must share a bucket (run
    continuity), which is the honest lower bound. Output columns:
    key_col, state, valid_from_us, valid_to_us, n_events."""
    from bioner_ray.stages.shuffle import bucketed_map_groups

    def fold(group: pa.Table) -> pa.Table:
        if group.num_columns == 0:
            return group
        out_schema = pa.schema(
            [
                (key_col, group.schema.field(key_col).type),
                ("state", pa.string()),
                ("valid_from_us", pa.int64()),
                ("valid_to_us", pa.int64()),
                ("n_events", pa.int64()),
            ]
        )
        if group.num_rows == 0:
            return out_schema.empty_table()
        group = group.sort_by(
            [(key_col, "ascending"), (ts_col, "ascending"), (id_col, "ascending")]
        )
        keys = group.column(key_col).to_numpy(zero_copy_only=False)
        ts = group.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)  # µs
        states = np.asarray(group.column(state_col).to_pylist(), dtype=object)
        newkey = np.r_[True, keys[1:] != keys[:-1]]
        newrun = newkey | np.r_[True, states[1:] != states[:-1]]
        starts = np.flatnonzero(newrun)
        ends = np.r_[starts[1:], len(keys)]
        run_key = keys[starts]
        valid_from = ts[starts]
        # next run's first ts WITHIN the same key, else -1 (open state)
        nxt = np.full(len(starts), -1, dtype=np.int64)
        same_key_next = np.r_[run_key[1:] == run_key[:-1], False]
        nxt[: len(starts) - 1][same_key_next[: len(starts) - 1]] = valid_from[1:][
            run_key[1:] == run_key[:-1]
        ]
        return pa.table(
            {
                key_col: pa.array(run_key).cast(group.schema.field(key_col).type),
                "state": pa.array(states[starts].tolist(), type=pa.string()),
                "valid_from_us": pa.array(valid_from, type=pa.int64()),
                "valid_to_us": pa.array(nxt, type=pa.int64()),
                "n_events": pa.array(ends - starts, type=pa.int64()),
            },
            schema=out_schema,
        )

    return bucketed_map_groups(events_ds, [key_col], fold, num_buckets=num_buckets)
