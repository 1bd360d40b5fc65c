"""Deterministic sf1 synthesis for the 10×-scale blowup audit
(VERDICT r4, Next #4).

/root/testdata is read-only and the driver's generator is not
available, so sf1 is built by REPLICATING sf0.1 ten times with
id-offsetting: every fact-table key is shifted by a copy-stride so the
ten copies form disjoint, internally-consistent star-schema slices
(foreign keys inside copy k reference copy k), while the dimension
tables (region, nation) stay fixed — exactly TPC-H's scaling law.
Document text gets a per-copy marker token prepended (and n_chars is
recomputed) so the corpus does not degenerate into 10-way exact
duplicates; embeddings get a tiny deterministic per-copy rotation of
the same kind. Everything is a pure function of sf0.1 — no RNG, no
clock.

Usage: python tools/make_sf1.py [out_dir]   (default /tmp/testdata_sf1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10

#: per-table integer key columns to offset, with their stride source
#: (max value + 1 of the base table, computed once)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: stride lookup: which base table defines each key's id space
KEY_SPACE = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def main(out_dir: str = "/tmp/testdata_sf1") -> None:
    os.makedirs(out_dir, exist_ok=True)
    base = {
        t: pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        for t in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ]
    }
    strides = {
        key: int(pc.max(base[tbl].column(col)).as_py()) + 1
        for key, (tbl, col) in KEY_SPACE.items()
    }

    for t in ("region", "nation"):  # dimensions: fixed at every SF
        pq.write_table(base[t], os.path.join(out_dir, f"{t}.parquet"))

    for t, keys in KEYED.items():
        src = base[t]
        copies = []
        for k in range(COPIES):
            tab = src
            for col in keys:
                shifted = pc.add(
                    pc.cast(tab.column(col), pa.int64()), k * strides[col]
                ).cast(src.schema.field(col).type)
                tab = tab.set_column(
                    tab.schema.get_field_index(col), col, shifted
                )
            if t == "documents" and k > 0:
                # per-copy marker keeps the corpus from being a 10-way
                # exact-duplicate farm; n_chars recomputed to stay true
                text = pc.binary_join_element_wise(
                    pa.array([f"copyv{k}"] * tab.num_rows),
                    pc.fill_null(tab.column("text"), ""),
                    " ",
                )
                tab = tab.set_column(
                    tab.schema.get_field_index("text"), "text", text
                )
                tab = tab.set_column(
                    tab.schema.get_field_index("n_chars"),
                    "n_chars",
                    pc.utf8_length(text).cast(
                        src.schema.field("n_chars").type
                    ),
                )
            if t == "embeddings" and k > 0:
                # deterministic per-copy perturbation: add k/1000 to the
                # first component, renormalization left to consumers —
                # keeps copies near-duplicates, not byte-duplicates
                emb = tab.column("embedding").combine_chunks()
                vals = emb.flatten().to_numpy(zero_copy_only=False).copy()
                off = emb.offsets.to_numpy(zero_copy_only=False)
                vals[off[:-1]] += np.float32(k / 1000.0)
                tab = tab.set_column(
                    tab.schema.get_field_index("embedding"),
                    "embedding",
                    pa.ListArray.from_arrays(emb.offsets, pa.array(vals, type=emb.values.type)),
                )
            copies.append(tab)
        # strip the source's pandas schema-metadata blob so sf1 blocks
        # hash cleanly (see bioner_ray/sources/parquet_io.py)
        out = pa.concat_tables(copies).replace_schema_metadata(None)
        pq.write_table(out, os.path.join(out_dir, f"{t}.parquet"))
        print(f"{t}: {src.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1")
