"""Generate the golden expected-output parquet for ``encoding_fasttext``.

The fasttext-bin encoder's vectors depend only on the token string (the
tiny checked-in .bin), so the per-doc stats are deterministic across
runs AND worker counts; this pins that claim (2-vs-8-CPU identical on
the smallest sf) and writes one parquet with a ``corpus_key``
discriminator (sum of document text lengths — same scheme as
make_datexis_golden.py). ``oracle_sql()`` replays the query as a DuckDB
``read_parquet`` filtered to the current corpus's key.

Usage: python tools/make_encoding_golden.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

GOLDEN = "/root/repo/tests/golden/encoding_fasttext.parquet"

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
df = em.queries()["encoding_fasttext"](sys.argv[2]).to_pandas()
df = df.sort_values(["url"], ignore_index=True)
df.to_parquet(sys.argv[3], index=False)
ray.shutdown()
"""


def run_query(sf_dir: str, num_cpus: int, out: str) -> None:
    subprocess.run(
        [sys.executable, "-c", _RUNNER, str(num_cpus), sf_dir, out],
        check=True,
        cwd="/root/repo",
    )


def main() -> int:
    import duckdb
    import pandas as pd

    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    frames = []
    with tempfile.TemporaryDirectory() as td:
        for i, sf in enumerate(("0.001", "0.01", "0.1")):
            sf_dir = f"/root/testdata/sf{sf}"
            out = os.path.join(td, f"g{sf}.parquet")
            run_query(sf_dir, 8, out)
            df = pd.read_parquet(out)
            if i == 0:
                out2 = os.path.join(td, "g2.parquet")
                run_query(sf_dir, 2, out2)
                df2 = pd.read_parquet(out2)
                assert df.equals(df2), "encoding_fasttext is parallelism-dependent!"
                print("parallelism determinism: OK (2 vs 8 CPUs identical)")
            key = duckdb.sql(
                f"SELECT CAST(sum(length(text)) AS BIGINT) FROM read_parquet('{sf_dir}/documents.parquet')"
            ).fetchone()[0]
            df["corpus_key"] = int(key)
            frames.append(df)
            print(f"sf{sf}: rows={len(df)} corpus_key={key}")
    allg = pd.concat(frames, ignore_index=True)
    allg.to_parquet(GOLDEN, index=False)
    print(f"wrote {GOLDEN} ({len(allg)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
