"""kg_publish non-degenerate path: a crafted corpus whose KG only
PARTIALLY merges, so published edges survive — engine vs the DuckDB
twin on the same parquet. (The sf0.001/sf0.01 lexicon yields a
complete K10 graph that folds into one merge group → the oracle run
proves the empty case; this proves the interesting one.)"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def sfdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("pubsf")
    texts = []
    # A-triangle: customer-table, table-row, customer-row
    texts += ["customer join table filter row"] * 30  # (customer,table),(table,row)
    texts += ["customer merge row"] * 30              # (customer,row)
    # bridge: customer-vector
    texts += ["customer join vector"] * 30
    # B-triangle: vector-key, key-line, vector-line
    texts += ["vector join key filter line"] * 30
    texts += ["vector merge line"] * 30
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * len(texts), type=pa.string()),
            "source": pa.array(["s0"] * len(texts), type=pa.string()),
        }
    )
    pq.write_table(tbl, str(root / "documents.parquet"))
    return str(root)


def test_kg_publish_nondegenerate_matches_oracle(sfdir):
    import __ray_entry__ as e

    res = e.queries()["kg_publish"](sfdir)
    mine = res.to_pandas() if not isinstance(res, pa.Table) else res.to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sfdir}/documents.parquet')"
    )
    ref = con.sql(e.oracle_sql()["kg_publish"]).df()
    assert len(mine) == len(ref) > 0, "crafted corpus must publish edges"
    key = ["subj", "obj"]
    a = mine.sort_values(key, ignore_index=True)
    b = ref.sort_values(key, ignore_index=True)
    assert (a[key + ["w"]].astype(str) == b[key + ["w"]].astype(str)).all().all()
    # merge groups folded at least one endpoint: some published endpoint
    # must be a group representative that absorbed another surface
    groups = e.queries()["kg_merge_groups"](sfdir).to_pandas()
    folded = set(groups.loc[groups["node"] != groups["rep"], "node"])
    assert folded, "crafted corpus must actually merge something"
    endpoints = set(a["subj"]) | set(a["obj"])
    assert not (endpoints & folded), "published endpoints must be reps only"


def test_kg_merge_groups_distributed_path_matches_driver(sfdir):
    from bioner_ray.pipelines.analytics import kg_merge_groups

    drv = kg_merge_groups(sfdir).to_pandas().sort_values("node", ignore_index=True)
    dist = (
        kg_merge_groups(sfdir, driver_max_pairs=0)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    assert drv.equals(dist)
    assert len(drv) > 0
