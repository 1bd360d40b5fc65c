"""Generic golden expected-output generator for deterministic,
non-SQL-expressible queries (the datexis_mentions / encoding_fasttext
scheme, generalized).

For each sf the query runs in a FRESH process at 8 CPUs; on the
smallest sf it additionally runs at 2 CPUs and the outputs must be
identical — the determinism-across-parallelism pin that justifies a
golden oracle at all. One parquet per query lands in tests/golden/
with a ``corpus_key`` discriminator column (sum of document text
lengths), and ``oracle_sql()`` replays the query as a DuckDB
``read_parquet`` filtered to the current corpus's key.

Usage: python tools/make_query_golden.py <query> <sort_col> [sort_col…]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

_RUNNER = r"""
import sys
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]), include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from bioner_ray.stages.shuffle import quiet_empty_bundle_warnings
quiet_empty_bundle_warnings()
import __ray_entry__ as em
name, sf_dir, out = sys.argv[2], sys.argv[3], sys.argv[4]
sort_cols = sys.argv[5].split(",")
res = em.queries()[name](sf_dir)
df = res.to_pandas() if hasattr(res, "to_pandas") else res
import ray.data
if isinstance(df, ray.data.Dataset):
    df = df.to_pandas()
df = df.sort_values(sort_cols, ignore_index=True)
df.to_parquet(out, index=False)
ray.shutdown()
"""


def run_query(name: str, sort_cols: list[str], sf_dir: str, num_cpus: int, out: str) -> None:
    subprocess.run(
        [sys.executable, "-c", _RUNNER, str(num_cpus), name, sf_dir, out, ",".join(sort_cols)],
        check=True,
        cwd="/root/repo",
    )


def main() -> int:
    import duckdb
    import pandas as pd

    name = sys.argv[1]
    sort_cols = sys.argv[2:]
    assert sort_cols, "pass at least one sort column"
    golden = f"/root/repo/tests/golden/{name}.parquet"
    os.makedirs(os.path.dirname(golden), exist_ok=True)
    frames = []
    with tempfile.TemporaryDirectory() as td:
        for i, sf in enumerate(("0.001", "0.01", "0.1")):
            sf_dir = f"/root/testdata/sf{sf}"
            out = os.path.join(td, f"g{sf}.parquet")
            run_query(name, sort_cols, sf_dir, 8, out)
            df = pd.read_parquet(out)
            if i == 0:
                out2 = os.path.join(td, "g2.parquet")
                run_query(name, sort_cols, sf_dir, 2, out2)
                df2 = pd.read_parquet(out2)
                assert df.equals(df2), f"{name} is parallelism-dependent!"
                print("parallelism determinism: OK (2 vs 8 CPUs identical)")
            key = duckdb.sql(
                f"SELECT CAST(sum(length(text)) AS BIGINT) FROM read_parquet('{sf_dir}/documents.parquet')"
            ).fetchone()[0]
            df["corpus_key"] = int(key)
            frames.append(df)
            print(f"sf{sf}: rows={len(df)} corpus_key={key}")
    allg = pd.concat(frames, ignore_index=True)
    allg.to_parquet(golden, index=False)
    print(f"wrote {golden} ({len(allg)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
