"""10×-scale empirical blowup audit (VERDICT r4, Next #4): run every
registered query at a given sf_dir, recording per-query wall seconds
AND the driver-process RSS delta across the query — the unbounded-
driver-collect signature is a query whose RSS delta GROWS roughly with
corpus size. Compare a /tmp/testdata_sf1 run against /root/testdata/sf0.1.

Method note: all queries run in ONE process per scale (fresh processes
per query would cost hours); RSS is sampled from /proc/self/status
VmRSS with a gc.collect() before each query. Large driver-side
collections (numpy/pandas buffers) are munmap'd on free, so the
per-query delta is a faithful signal for collections of tens of MB+;
small allocator noise (±10 MB) is below the audit's resolution and is
ignored by the reporting threshold.

Usage:
  python tools/blowup_audit.py <sf_dir> <out_json> [--skip name ...]
  python tools/blowup_audit.py --report <sf0.1_json> <sf1_json>
"""

from __future__ import annotations

import gc
import json
import sys
import time


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def run(sf_dir: str, out_path: str, skip: set[str]) -> None:
    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import pyarrow as pa_
    import ray.data

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    results: dict[str, dict] = {}
    try:  # resume: completed queries are skipped on relaunch
        results = json.load(open(out_path))["queries"]
    except (OSError, ValueError):
        pass
    for i, name in enumerate(sorted(qs)):
        if name in skip or name in results:
            continue
        gc.collect()
        r0 = _rss_mb()
        t0 = time.time()
        err = None
        try:
            res = qs[name](sf_dir)
            if isinstance(res, ray.data.Dataset):
                for _ in res.iter_batches(batch_size=8192, batch_format="pyarrow"):
                    pass
            elif isinstance(res, pa_.Table):
                res.num_rows
            # pandas results already materialized
        except Exception as exc:  # noqa: BLE001 — audit records, not raises
            err = f"{type(exc).__name__}: {exc}"[:300]
        wall = round(time.time() - t0, 3)
        gc.collect()
        r1 = _rss_mb()
        results[name] = {
            "wall_s": wall,
            "rss_delta_mb": round(r1 - r0, 1),
            "rss_after_mb": round(r1, 1),
            "err": err,
        }
        print(f"[{i + 1}/{len(qs)}] {name}: {wall}s, ΔRSS {r1 - r0:+.0f} MB"
              + (f" ERR {err}" if err else ""), flush=True)
        with open(out_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "queries": results}, f, indent=1)
    ray.shutdown()


def report(small_path: str, big_path: str) -> None:
    small = json.load(open(small_path))["queries"]
    big = json.load(open(big_path))["queries"]
    rows = []
    for name in sorted(set(small) & set(big)):
        s, b = small[name], big[name]
        if s["err"] or b["err"]:
            rows.append((name, s, b, "ERR"))
            continue
        # flag: RSS delta grew by >64 MB AND by >3x — the size-coupled
        # driver-collect signature (allocator noise stays below this)
        grew = (b["rss_delta_mb"] - s["rss_delta_mb"] > 64
                and b["rss_delta_mb"] > 3 * max(s["rss_delta_mb"], 1))
        rows.append((name, s, b, "RSS-GROWS" if grew else ""))
    print("| query | wall sf0.1 | wall sf1 | ratio | ΔRSS sf0.1 | ΔRSS sf1 | flag |")
    print("|---|---|---|---|---|---|---|")
    for name, s, b, flag in rows:
        ratio = round(b["wall_s"] / max(s["wall_s"], 1e-9), 1)
        print(f"| {name} | {s['wall_s']} | {b['wall_s']} | {ratio}x "
              f"| {s['rss_delta_mb']} | {b['rss_delta_mb']} | {flag} |")
    flagged = [r[0] for r in rows if r[3]]
    print(f"\nflagged: {flagged or 'none'}")


if __name__ == "__main__":
    if sys.argv[1] == "--report":
        report(sys.argv[2], sys.argv[3])
    else:
        skip = set()
        if "--skip" in sys.argv:
            skip = set(sys.argv[sys.argv.index("--skip") + 1:])
        run(sys.argv[1], sys.argv[2], skip)
