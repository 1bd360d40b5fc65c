"""Column profiling: exact per-column row/null/distinct counts — the
data-quality pass a pipeline runs on every new table drop (schema
drift, null-rate regressions, key-cardinality checks) before anything
downstream trusts it.

Distributed shape: ONE pass melts the profiled columns to long
(col, val) form — per-batch, each value cast to a string surrogate
(injective for the supported int/string/date types, so distinctness is
preserved; floats are deliberately unsupported — profile their
quantized form instead, the engine-wide cents/micromark contract).
Null/row tallies are per-batch combiner rows; distinct counts are ONE
bucketed dedup over (col, val) followed by a combos-sized count — the
exact-count-distinct plan of ``distinct_users_per_type`` applied per
column. Nothing table-sized is ever collected; the melt is C× the
selected columns only (the standard profiler trade: you profile the
columns you name, not the whole row).

Columns: column, n_rows, n_nulls, n_distinct.

No reference analog; extension per SURVEY.md §2.11 (DuckDB twin:
count / count(col) / count(DISTINCT col) UNION ALL per column).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_OUT_SCHEMA = pa.schema(
    [
        ("column", pa.string()),
        ("n_rows", pa.int64()),
        ("n_nulls", pa.int64()),
        ("n_distinct", pa.int64()),
    ]
)


def _surrogate(col: pa.ChunkedArray) -> pa.ChunkedArray:
    t = col.type
    if pa.types.is_floating(t):
        raise TypeError(
            "float columns are not profiled directly; quantize first "
            "(cents/micromark contract)"
        )
    return pc.cast(col, pa.string())


def profile_columns(ds, columns: list[str], num_buckets: int = 64):
    """Dataset → Dataset(column, n_rows, n_nulls, n_distinct) for the
    named columns, exact."""
    from bioner_ray.stages.shuffle import bucketed_aggregate, pin_schema, with_ones

    def melt(t: pa.Table) -> pa.Table:
        vals_out = []
        for c in columns:
            s = _surrogate(t.column(c))
            vals_out.append(s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s)
        return pa.table(
            {
                "col": pa.array(
                    np.repeat(np.array(columns, dtype=object), t.num_rows),
                    type=pa.string(),
                ),
                "val": pa.concat_arrays(vals_out),
            }
        )

    def tallies(t: pa.Table) -> pa.Table:
        rows, nulls, names = [], [], []
        for c in columns:
            names.append(c)
            rows.append(t.num_rows)
            nulls.append(t.column(c).null_count)
        return pa.table(
            {
                "column": pa.array(names, type=pa.string()),
                "n_rows": pa.array(np.array(rows, dtype=np.int64)),
                "n_nulls": pa.array(np.array(nulls, dtype=np.int64)),
            }
        )

    tally_schema = pa.schema(
        [("column", pa.string()), ("n_rows", pa.int64()), ("n_nulls", pa.int64())]
    )
    tally = pin_schema(
        bucketed_aggregate(
            ds.map_batches(tallies, batch_format="pyarrow"),
            ["column"],
            [("n_rows", "sum"), ("n_nulls", "sum")],
            num_buckets=1,
        ),
        tally_schema,
    )

    melted = ds.map_batches(melt, batch_format="pyarrow").map_batches(
        lambda t: t.filter(pc.is_valid(t.column("val"))), batch_format="pyarrow"
    )
    distinct = pin_schema(
        bucketed_aggregate(
            with_ones(melted), ["col", "val"], [("one", "min")], num_buckets=num_buckets
        ),
        pa.schema([("col", pa.string()), ("val", pa.string()), ("one", pa.int64())]),
    )
    ndis_schema = pa.schema([("column", pa.string()), ("n_distinct", pa.int64())])
    ndis = pin_schema(
        bucketed_aggregate(
            distinct.map_batches(
                lambda t: pa.table(
                    {
                        "column": t.column("col"),
                        "n_distinct": pa.array(
                            np.ones(t.num_rows, dtype=np.int64)
                        ),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["column"],
            [("n_distinct", "sum")],
            num_buckets=1,
        ),
        ndis_schema,
    )

    from bioner_ray.stages.shuffle import bucketed_inner_join

    # left outer: an all-null column has zero distinct values and no
    # ndis row — it must still appear in the profile with n_distinct 0
    joined = bucketed_inner_join(
        tally,
        ndis,
        keys=["column"],
        left_schema=tally_schema,
        right_schema=ndis_schema,
        num_buckets=1,
        join_type="left outer",
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return _OUT_SCHEMA.empty_table()
        nd = pc.fill_null(t.column("n_distinct"), 0)
        return pa.table(
            {
                "column": t.column("column"),
                "n_rows": t.column("n_rows"),
                "n_nulls": t.column("n_nulls"),
                "n_distinct": nd,
            }
        )

    return pin_schema(
        joined.map_batches(finish, batch_format="pyarrow"), _OUT_SCHEMA
    )
