"""Stage checkpointing: idempotent Parquet stage dirs with _SUCCESS
manifests (north-rule resumability; SURVEY.md §4 checkpoint/resume row).

The reference has no pipeline resume at all — its extractor even
*refuses* to overwrite (append-only assert, pubmed_parser.py:56-57) and
a crash means restarting the run. Here every stage materializes to its
own directory with overwrite-by-stage-dir semantics:

* output goes to ``<root>/<stage>/`` as partitioned Parquet (one file
  per block — never one giant file);
* a ``_SUCCESS`` JSON manifest (row count, wall seconds, stage version,
  lineage of the upstream stage) is written only after the write
  completes;
* on resume, a dir WITH a manifest is skipped (read back instead of
  recomputed); a dir WITHOUT one is a torn write and is deleted first —
  stage outputs are therefore idempotent (§7.4.7).

Per-partition lineage travels in-band: ``add_lineage`` stamps each row
with the stage name/version so every downstream partition can be traced
back through the stage graph.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable

import pyarrow as pa

MANIFEST = "_SUCCESS"
STAGE_VERSION = "1"


def add_lineage(ds, stage: str, version: str = STAGE_VERSION):
    """Stamp per-row lineage columns (overwrites any previous stage's)."""

    def stamp(t: pa.Table) -> pa.Table:
        for col in ("_lineage_stage", "_lineage_version"):
            if col in t.schema.names:
                t = t.drop_columns([col])
        n = t.num_rows
        return t.append_column(
            "_lineage_stage", pa.array([stage] * n, type=pa.string())
        ).append_column("_lineage_version", pa.array([version] * n, type=pa.string()))

    return ds.map_batches(stamp, batch_format="pyarrow")


def stage_dir(root: str, stage: str) -> str:
    return os.path.join(root, stage)


def is_complete(root: str, stage: str) -> bool:
    return os.path.exists(os.path.join(stage_dir(root, stage), MANIFEST))


def read_manifest(root: str, stage: str) -> dict:
    with open(os.path.join(stage_dir(root, stage), MANIFEST)) as f:
        return json.load(f)


def run_stage(
    root: str,
    stage: str,
    build: Callable[[], "ray.data.Dataset"],  # noqa: F821
    resume: bool = True,
    lineage: bool = True,
):
    """Execute (or resume) one checkpointed stage; returns a Dataset
    reading the stage's Parquet output, so downstream stages always
    consume the durable artifact — a failed later stage re-reads instead
    of recomputing."""
    import ray.data as rd

    out = stage_dir(root, stage)
    if resume and is_complete(root, stage):
        return rd.read_parquet(out)
    if os.path.exists(out):
        shutil.rmtree(out)  # torn write from a previous attempt
    os.makedirs(out, exist_ok=True)
    t0 = time.monotonic()
    ds = build()
    if lineage:
        ds = add_lineage(ds, stage)
    ds.write_parquet(out)
    if not any(f.endswith(".parquet") for f in os.listdir(out)):
        # zero-block dataset: write_parquet emits no files and the
        # read-back would fail — persist one typed empty file so the
        # checkpoint stays a valid, schema-carrying artifact
        import pyarrow.parquet as pq

        pq.write_table(
            ds.schema().base_schema.empty_table(),
            os.path.join(out, "empty-000.parquet"),
        )
    check = rd.read_parquet(out)
    manifest = {
        "stage": stage,
        "version": STAGE_VERSION,
        "rows": check.count(),
        "wall_seconds": round(time.monotonic() - t0, 3),
        "files": sorted(f for f in os.listdir(out) if f.endswith(".parquet")),
    }
    with open(os.path.join(out, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return rd.read_parquet(out)
