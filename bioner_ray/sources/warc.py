"""WARC-conversion record sink → source round-trip — the Common-Crawl
export/ingest seam (the WET grammar of ``pipelines/web.wet_shards``,
which only digests the rendered stream; here the records are WRITTEN to
sharded files and PARSED back by a distributed reader, pinning that
serialize∘parse is the identity — the ``sources/ntriples.py`` contract
applied to the crawl format).

Record grammar (one conversion record per page, wet_shards-identical):

    WARC/1.0\\n
    WARC-Target-URI: <url>\\n
    Content-Length: <utf-8 byte length of body>\\n
    \\n
    <body>\\n
    \\n

The parser is Content-Length-driven (the WARC rule): the body is read
as exactly ``Content-Length`` BYTES after the blank line, so bodies may
contain blank lines, ``WARC/1.0`` literals, or any other grammar
look-alike without desyncing the stream — a split-on-separator reader
would corrupt exactly the adversarial documents a web corpus contains.
A record whose trailing two newlines are missing or whose header is
malformed raises (torn file ≠ silently shorter corpus; the manifest
count assert in ``warc_roundtrip`` backs this).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

WARC_SCHEMA = pa.schema([("url", pa.string()), ("text", pa.string())])


def format_warc_record(url: str, body: str) -> bytes:
    payload = (body or "").encode("utf-8")
    head = f"WARC/1.0\nWARC-Target-URI: {url}\nContent-Length: {len(payload)}\n\n"
    return head.encode("utf-8") + payload + b"\n\n"


def parse_warc_bytes(buf: bytes) -> pa.Table:
    """Parse a concatenated conversion-record stream → (url, text).
    Byte-exact inverse of ``format_warc_record``; raises on any
    malformed header or truncated body."""
    urls: list[str] = []
    texts: list[str] = []
    pos, size = 0, len(buf)
    while pos < size:
        head_end = buf.find(b"\n\n", pos)
        if head_end < 0:
            raise ValueError(f"WARC: unterminated header at byte {pos}")
        header = buf[pos:head_end].decode("utf-8")
        lines = header.split("\n")
        if lines[0] != "WARC/1.0":
            raise ValueError(f"WARC: bad version line {lines[0]!r} at byte {pos}")
        fields = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(": ")
            if not sep:
                raise ValueError(f"WARC: malformed header line {ln!r}")
            fields[k] = v
        try:
            url = fields["WARC-Target-URI"]
            clen = int(fields["Content-Length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"WARC: missing/invalid header field at byte {pos}") from e
        body_start = head_end + 2
        body_end = body_start + clen
        if buf[body_end : body_end + 2] != b"\n\n":
            raise ValueError(
                f"WARC: record for {url} truncated (expected body of {clen} bytes "
                "+ blank-line terminator)"
            )
        urls.append(url)
        texts.append(buf[body_start:body_end].decode("utf-8"))
        pos = body_end + 2
    return pa.table({"url": urls, "text": texts}, schema=WARC_SCHEMA)


def write_warc(docs_ds, out_dir: str, num_shards: int = 16):
    """Sharded WARC sink: md5-61-bit url hash → shard (the engine's
    replayable convention), ONE file per shard written by a bucketed
    map_groups whose per-shard url sort fixes the record order (the
    resumable-manifest shape of wet_shards). Input columns: url, text.
    Returns the manifest Dataset (shard, n_records, n_bytes)."""
    import hashlib

    import pyarrow.compute as pc

    from bioner_ray.stages.shuffle import bucketed_map_groups, pin_schema

    os.makedirs(out_dir, exist_ok=True)
    m61 = 1 << 61
    mani_schema = pa.schema(
        [("shard", pa.int64()), ("n_records", pa.int64()), ("n_bytes", pa.int64())]
    )

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.schema(
                [("shard", pa.int64()), ("url", pa.string()), ("text", pa.string())]
            ).empty_table()
        urls = batch.column("url").to_pylist()
        shards = [
            int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "big") % m61 % num_shards
            for u in urls
        ]
        return pa.table(
            {
                "shard": pa.array(shards, type=pa.int64()),
                "url": pc.cast(batch.column("url"), pa.string()),
                "text": pc.cast(
                    pc.fill_null(batch.column("text"), ""), pa.string()
                ),
            }
        )

    def write_shard(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return mani_schema.empty_table()
        order = pc.sort_indices(group, sort_keys=[("shard", "ascending"), ("url", "ascending")])
        group = group.take(order)
        sh = group.column("shard").to_numpy(zero_copy_only=False)
        urls = group.column("url").to_pylist()
        texts = group.column("text").to_pylist()
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        ends = np.r_[starts[1:], len(sh)]
        out_s, out_n, out_b = [], [], []
        for a, b in zip(starts.tolist(), ends.tolist()):
            blob = b"".join(
                format_warc_record(u, t) for u, t in zip(urls[a:b], texts[a:b])
            )
            path = os.path.join(out_dir, f"part-{int(sh[a]):05d}.warc")
            with open(path, "wb") as f:
                f.write(blob)
            out_s.append(int(sh[a]))
            out_n.append(b - a)
            out_b.append(len(blob))
        return pa.table(
            {
                "shard": pa.array(out_s, type=pa.int64()),
                "n_records": pa.array(out_n, type=pa.int64()),
                "n_bytes": pa.array(out_b, type=pa.int64()),
            },
            schema=mani_schema,
        )

    return pin_schema(
        bucketed_map_groups(
            docs_ds.map_batches(assign, batch_format="pyarrow"), ["shard"], write_shard
        ),
        mani_schema,
    )


def read_warc(path_dir: str):
    """Distributed WARC source: one parse task per shard file
    (``read_binary_files`` keeps whole files per block — records never
    straddle a block boundary, the S1 whole-file-parse pattern of
    sources/conll.py). Columns: url, text."""
    import ray.data as rd

    ds = rd.read_binary_files(path_dir, file_extensions=["warc"])

    def parse(batch: pa.Table) -> pa.Table:
        tables = [parse_warc_bytes(buf) for buf in batch.column("bytes").to_pylist()]
        return (
            pa.concat_tables(tables) if tables else WARC_SCHEMA.empty_table()
        )

    return ds.map_batches(parse, batch_format="pyarrow")
