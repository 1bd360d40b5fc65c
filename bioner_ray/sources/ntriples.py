"""N-Triples source/sink — the line-based RDF serialization knowledge
graphs actually interchange (W3C N-Triples; Wikidata/DBpedia dumps ship
this way). Reference analog: the engine's other line-based formats
(CoNLL ``sources/conll.py``, JSONL ``sources/jsonl.py``); the KG output
contract this serializes is SURVEY §1.3's triple table.

Line grammar written/parsed here (one statement per line):

    <IRI> <IRI> <IRI> .

with every node minted under a configurable base namespace and the
local name **percent-encoded** (RFC 3987 unsafe bytes → ``%XX`` of
UTF-8), so arbitrary surface strings — spaces, angle brackets, quotes,
non-ASCII, even newlines — survive the round trip byte-exactly. The
encoder is ``urllib.parse.quote(safe='')``; the decoder is ``unquote``;
both are deterministic and total, so sink∘source = identity on any
string triple (pinned by pytest on adversarial strings and by the
``ntriples_roundtrip`` driver query on the real canonical edge table).

Scale shape: the writer is a ``map_batches`` side-effect emitting ONE
``part-*.nt`` file per block under the target directory (the engine's
resumable per-block file layout — a partial run leaves whole files),
returning a one-row manifest per block; the reader is Ray's
distributed ``read_text`` followed by a stateless vectorized parse.
Nothing materializes the graph on the driver.
"""

from __future__ import annotations

import os
import re
import uuid
from urllib.parse import quote, unquote

import pyarrow as pa

DEFAULT_BASE = "https://kg.example.org/"

#: one statement: three angle-bracketed IRIs, a dot; tolerant of
#: surrounding whitespace. Bytes inside IRIs are %-encoded so a literal
#: '>' can never appear and the lazy match is exact.
_STMT_RE = re.compile(r"^\s*<([^>]*)>\s+<([^>]*)>\s+<([^>]*)>\s+\.\s*$")

MANIFEST_SCHEMA = pa.schema([("path", pa.string()), ("n_triples", pa.int64())])
TRIPLE_SCHEMA = pa.schema(
    [("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string())]
)


def _mint(base: str, kind: str, local: str) -> str:
    return f"{base}{kind}/{quote(local, safe='')}"


def _local(iri: str, base: str, kind: str) -> str:
    prefix = f"{base}{kind}/"
    if not iri.startswith(prefix):
        raise ValueError(f"IRI {iri!r} not under {prefix!r}")
    return unquote(iri[len(prefix):])


def format_ntriples(
    subj: list[str], pred: list[str], obj: list[str], base: str = DEFAULT_BASE
) -> str:
    """Serialize aligned triple columns to N-Triples text (one
    statement per line, trailing newline iff non-empty)."""
    lines = [
        f"<{_mint(base, 'entity', s)}> <{_mint(base, 'pred', p)}> "
        f"<{_mint(base, 'entity', o)}> ."
        for s, p, o in zip(subj, pred, obj)
    ]
    return "\n".join(lines) + ("\n" if lines else "")


def parse_ntriples(text: str, base: str = DEFAULT_BASE) -> pa.Table:
    """Parse N-Triples text back to a (subj, pred, obj) Arrow table.
    Blank lines and ``#`` comment lines are skipped (per the W3C
    grammar); any other unparseable line raises."""
    subj, pred, obj = [], [], []
    for line in text.splitlines():
        if not line.strip() or line.lstrip().startswith("#"):
            continue
        m = _STMT_RE.match(line)
        if m is None:
            raise ValueError(f"not an N-Triples statement: {line!r}")
        subj.append(_local(m.group(1), base, "entity"))
        pred.append(_local(m.group(2), base, "pred"))
        obj.append(_local(m.group(3), base, "entity"))
    return pa.table(
        {
            "subj": pa.array(subj, type=pa.string()),
            "pred": pa.array(pred, type=pa.string()),
            "obj": pa.array(obj, type=pa.string()),
        }
    )


def write_ntriples(ds, path: str, base: str = DEFAULT_BASE):
    """Distributed N-Triples write: one ``part-*.nt`` file per block
    under ``path``; returns the materialized per-block manifest
    (path, n_triples) so callers can audit completeness. Input needs
    string columns subj, pred, obj."""
    os.makedirs(path, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return MANIFEST_SCHEMA.empty_table()
        text = format_ntriples(
            t.column("subj").to_pylist(),
            t.column("pred").to_pylist(),
            t.column("obj").to_pylist(),
            base=base,
        )
        fn = os.path.join(path, f"part-{uuid.uuid4().hex}.nt")
        tmp = fn + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(text)
        os.replace(tmp, fn)  # atomic: readers never see a torn file
        return pa.table(
            {"path": [fn], "n_triples": pa.array([t.num_rows], type=pa.int64())}
        )

    return ds.map_batches(write_block, batch_format="pyarrow").materialize()


def read_ntriples(path: str, base: str = DEFAULT_BASE):
    """Distributed N-Triples read: Ray ``read_text`` over ``*.nt``
    files (line-parallel) + stateless parse to (subj, pred, obj)."""
    import ray.data as rd

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".nt")
    )

    def parse_batch(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return TRIPLE_SCHEMA.empty_table()
        lines = t.column("text").to_pylist()
        return parse_ntriples("\n".join(lines), base=base)

    return rd.read_text(files).map_batches(parse_batch, batch_format="pyarrow")
