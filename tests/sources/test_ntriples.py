"""N-Triples sink/source: escaping totality, roundtrip identity,
distributed per-block file layout (sources/ntriples.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from bioner_ray.sources.ntriples import (
    format_ntriples,
    parse_ntriples,
    read_ntriples,
    write_ntriples,
)

NASTY = [
    "plain",
    "with space",
    "angle<bracket>",
    'quote"and\'apos',
    "uniçødé 中文",
    "new\nline\ttab",
    "dot.end.",
    "%already%encoded%20",
    "",
]


def test_format_parse_identity_on_nasty_strings():
    subj = NASTY
    pred = list(reversed(NASTY))
    obj = [s + "/obj" for s in NASTY]
    text = format_ntriples(subj, pred, obj)
    # every statement is a single physical line ending in " ."
    assert all(line.endswith(" .") for line in text.splitlines() if line)
    assert len(text.splitlines()) == len(NASTY)  # newlines in values stay encoded
    t = parse_ntriples(text)
    assert t.column("subj").to_pylist() == subj
    assert t.column("pred").to_pylist() == pred
    assert t.column("obj").to_pylist() == obj


def test_parse_skips_comments_and_blanks_rejects_garbage():
    text = format_ntriples(["a"], ["p"], ["b"])
    wrapped = "# comment\n\n" + text + "\n  # indented comment\n"
    assert parse_ntriples(wrapped).num_rows == 1
    with pytest.raises(ValueError):
        parse_ntriples("<x> <y> .")  # two terms, not three


def test_distributed_roundtrip(tmp_path):
    n = 500
    ds = rd.from_arrow(
        pa.table(
            {
                "subj": [f"s {i%7}" for i in range(n)],
                "pred": [f"p<{i%3}>" for i in range(n)],
                "obj": [f"oé{i}" for i in range(n)],
            }
        )
    ).repartition(8)
    manifest = write_ntriples(ds, str(tmp_path / "nt"))
    rows = manifest.take_all()
    assert sum(r["n_triples"] for r in rows) == n
    assert all(r["path"].endswith(".nt") for r in rows)
    back = read_ntriples(str(tmp_path / "nt"))
    got = sorted(
        (r["subj"], r["pred"], r["obj"]) for r in back.take_all()
    )
    want = sorted(
        (f"s {i%7}", f"p<{i%3}>", f"oé{i}") for i in range(n)
    )
    assert got == want
