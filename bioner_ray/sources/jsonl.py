"""JSONL source/sink — the interchange format web-text corpora
actually ship in (Common-Crawl derivatives, RedPajama/FineWeb-style
dumps are JSON-lines; reference analog: the engine's other line-based
format, CoNLL, sources/conll.py).

Thin, schema-preserving wrappers over Ray's native distributed JSON
I/O: one JSONL file per block on write (resumable-output shape — a
partial run leaves whole files), pyarrow-JSON parse on read. The
round-trip query (`jsonl_roundtrip`) pins byte fidelity of text
content through JSON encode/decode (quotes, backslashes, non-ASCII)
against the parquet source of truth.
"""

from __future__ import annotations


def write_jsonl(ds, path: str) -> None:
    """Distributed JSONL write: one file per block under ``path``."""
    ds.write_json(path)


def read_jsonl(path: str, columns: list[str] | None = None):
    """Distributed JSONL read; optional column projection."""
    import ray.data as rd

    ds = rd.read_json(path)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def write_csv(ds, path: str) -> None:
    """Distributed CSV write: one file per block under ``path``."""
    ds.write_csv(path)


def read_csv(path: str, columns: list[str] | None = None):
    """Distributed CSV read; optional column projection."""
    import ray.data as rd

    ds = rd.read_csv(path)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds
