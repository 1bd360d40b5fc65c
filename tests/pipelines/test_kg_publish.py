"""kg_publish non-degenerate path: a crafted corpus with one
structural-twin pair (strong shared neighborhoods, weak direct edge —
the alias shape weighted jaccard is built to catch) so the KG only
PARTIALLY merges and published edges survive — engine vs the DuckDB
twin on the same parquet. (The sfX corpora carry the same shape via
the rare "dup" surface; this pins the fold-one-pair case exactly.)"""

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
    # twins: table/row share {customer, vector, key} with equal strong
    # weights but barely co-occur → wjaccard(table,row) = 90/100 = 0.9
    texts += ["table join customer"] * 30
    texts += ["row join customer"] * 30
    texts += ["table join vector"] * 30
    texts += ["row join vector"] * 30
    texts += ["table join key"] * 30
    texts += ["row join key"] * 30
    texts += ["table filter row"] * 5  # the weak direct edge
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
