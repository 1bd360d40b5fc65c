"""stages/profile.py — exact column profiling."""

from __future__ import annotations

import pyarrow as pa
import pytest


def _ds(tbl: pa.Table, parts=3):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(parts)


def test_counts_nulls_and_distinct():
    from bioner_ray.stages.profile import profile_columns

    t = pa.table(
        {
            "k": pa.array([1, 2, 2, 3, None, 3], type=pa.int64()),
            "s": pa.array(["a", None, "a", "b", None, "c"], type=pa.string()),
            "allnull": pa.array([None] * 6, type=pa.int64()),
        }
    )
    got = (
        profile_columns(_ds(t), ["k", "s", "allnull"])
        .to_pandas()
        .set_index("column")
        .to_dict("index")
    )
    assert got["k"] == {"n_rows": 6, "n_nulls": 1, "n_distinct": 3}
    assert got["s"] == {"n_rows": 6, "n_nulls": 2, "n_distinct": 3}
    assert got["allnull"] == {"n_rows": 6, "n_nulls": 6, "n_distinct": 0}


def test_float_columns_rejected():
    from bioner_ray.stages.profile import profile_columns

    t = pa.table({"f": pa.array([1.0, 2.0], type=pa.float64())})
    with pytest.raises(Exception, match="quantize"):
        profile_columns(_ds(t, parts=1), ["f"]).to_pandas()


def test_partition_invariant():
    from bioner_ray.stages.profile import profile_columns

    t = pa.table({"k": pa.array(list(range(40)) * 3, type=pa.int64())})
    a = profile_columns(_ds(t, parts=1), ["k"]).to_pandas()
    b = profile_columns(_ds(t, parts=8), ["k"]).to_pandas()
    assert a.equals(b)
    assert a.iloc[0].to_dict() == {
        "column": "k",
        "n_rows": 120,
        "n_nulls": 0,
        "n_distinct": 40,
    }
