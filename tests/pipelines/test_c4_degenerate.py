"""c4_filters degenerate-document agreement (ADVICE r4): a zero-token
doc with no synthetic extras must be ABSENT from both the engine output
and the SQL twin (no phantom empty line), while zero-token docs that
get a lorem/brace extra line appear on both sides with n_lines = the
extra count."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def test_c4_filters_empty_doc_engine_twin_agree(tmp_path):
    import __ray_entry__ as e

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 13, 17, 2], type=pa.int64()),
                "text": ["", "   ", None, "one two three four five six."],
            }
        ),
        sf / "documents.parquet",
    )
    got = (
        e.queries()["c4_filters"](str(sf))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.execute(e.oracle_sql()["c4_filters"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [2, 13, 17]  # doc 1 absent on BOTH sides
    assert got.astype("int64").equals(want.astype("int64"))
