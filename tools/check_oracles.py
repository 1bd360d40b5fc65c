"""Local stand-in for the driver's correctness gate: run every
``__ray_entry__.queries()`` entry and its ``oracle_sql()`` twin at the
given sf, compare row count, column names and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
        if df.shape[1] == 0:
            # Ray's to_pandas drops column names when every block is
            # empty; recover them from the dataset schema so a 0-row
            # result still column-compares against the oracle
            sch = res.schema()
            if sch is not None and getattr(sch, "names", None):
                df = pd.DataFrame({n: pd.Series(dtype="object") for n in sch.names})
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, mine: pd.DataFrame, ref: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(mine.columns) != sorted(ref.columns):
        errs.append(f"columns {sorted(mine.columns)} != {sorted(ref.columns)}")
        return errs
    if len(mine) != len(ref):
        errs.append(f"rows {len(mine)} != {len(ref)}")
    a, b = canon(mine), canon(ref)
    if len(a) == len(b):
        for col in a.columns:
            x, y = a[col].to_numpy(), b[col].to_numpy()
            if np.issubdtype(x.dtype, np.floating) or np.issubdtype(y.dtype, np.floating):
                ok = np.allclose(
                    x.astype(np.float64), y.astype(np.float64), rtol=0, atol=0, equal_nan=True
                )
            else:
                ok = (pd.Series(x).astype(str) == pd.Series(y).astype(str)).all()
            if not ok:
                bad = np.flatnonzero(
                    ~(pd.Series(x).astype(str) == pd.Series(y).astype(str)).to_numpy()
                )[:3]
                errs.append(
                    f"col {col!r} mismatch at rows {bad.tolist()}: "
                    f"mine={x[bad].tolist()} ref={y[bad].tolist()}"
                )
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, ignore_reinit_error=True)
    sys.path.insert(0, "/root/repo")
    from bioner_ray.stages.shuffle import quiet_empty_bundle_warnings

    quiet_empty_bundle_warnings()
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        wall = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(mine)} cols={sorted(mine.columns)} "
                  f"[rows-only, {wall:.1f}s]")
            continue
        try:
            ref = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        errs = compare(name, mine, ref)
        if errs:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(errs))
        else:
            print(f"ok   {name}: rows={len(mine)} match [{wall:.1f}s]")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
