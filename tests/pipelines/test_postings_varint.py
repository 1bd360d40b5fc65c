"""postings_bytes varint-width model at extreme doc_id gaps: the
engine's digitize boundaries run to 2^35 (width 6 above it), and the
SQL twin's CASE ladder must follow — a 2^36 gap is representable in
int64 doc ids even though no test fixture produces one (ADVICE r4)."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def _leb128_width(x: int) -> int:
    w = 1
    while x >= 1 << (7 * w):
        w += 1
    return w


def test_postings_width_matches_true_leb128_at_all_boundaries():
    import numpy as np

    bounds = np.array(
        [1 << 7, 1 << 14, 1 << 21, 1 << 28, 1 << 35], dtype=np.int64
    )
    probes = []
    for b in [7, 14, 21, 28, 35]:
        probes += [(1 << b) - 1, 1 << b]
    probes += [1, (1 << 36) + 17]
    for g in probes:
        got = int(np.digitize([g], bounds)[0]) + 1
        want = min(_leb128_width(g), 6)  # model caps at the 2^35 bound
        assert got == want, (g, got, want)


def test_postings_bytes_engine_twin_agree_at_huge_gap(tmp_path):
    import __ray_entry__ as e

    sf = tmp_path / "sf"
    sf.mkdir()
    # term "x" posts in doc 3 and doc 3 + 2^36 → second gap = 2^36
    # (width 6); term "y" in one small doc (gap = doc_id + 1, width 1)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([3, 3 + (1 << 36), 9], type=pa.int64()),
                "text": ["x", "x", "y"],
            }
        ),
        sf / "documents.parquet",
    )
    got = (
        e.queries()["postings_bytes"](str(sf))
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.execute(e.oracle_sql()["postings_bytes"])
        .df()
        .sort_values("term")
        .reset_index(drop=True)
    )
    assert got["postings_bytes"].tolist() == want["postings_bytes"].tolist()
    # x: gap0 = 4 (1 byte) + gap1 = 2^36 (6 bytes) = 7; y: gap 10 → 1
    assert dict(zip(got["term"], got["postings_bytes"])) == {"x": 7, "y": 1}
