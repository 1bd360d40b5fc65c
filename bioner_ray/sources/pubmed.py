"""PubMed XML source (reference S4/S5).

Ray-Data re-expression of ``PubMedParser.parse_pubmed_from``
(bioner/preprocessing/pubmed_parser.py:20-39): gzipped XML files are
read whole via ``read_binary_files`` and exploded one-abstract-per-row
in ``flat_map``. Element semantics are identical: iterate ``Article``
elements, take ``Abstract`` falling back to ``OtherAbstract``, then its
``AbstractText``; skip the article when any of these (or its text) is
missing. Each abstract is processed by the byte-faithful
``process_abstract_text``; the reference's three truncation counters
(pubmed_parser.py:14-18) become a ``truncated_kind`` metrics column
aggregated with a groupby instead of mutable instance state.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET

from bioner_ray.functions.text import process_abstract_text


def parse_pubmed_xml(data: bytes, gzipped: bool | None = None) -> list[dict]:
    """One file's bytes → [{abstract_idx, text, truncated_kind}].

    Compression is detected from the gzip magic, not the filename —
    Ray's ``read_binary_files`` already auto-decompresses ``*.gz`` by
    extension, so bytes may arrive either way.
    """
    if gzipped is None:
        gzipped = data[:2] == b"\x1f\x8b"
    if gzipped:
        data = gzip.decompress(data)
    root = ET.fromstring(data)
    out = []
    idx = 0
    for article in root.iter("Article"):
        abstract = article.find("Abstract")
        if abstract is None:
            abstract = article.find("OtherAbstract")
        if abstract is None:
            continue
        abstract_text = abstract.find("AbstractText")
        if abstract_text is None:
            continue
        text = abstract_text.text
        if text is None:
            continue
        processed, kind = process_abstract_text(text)
        out.append({"abstract_idx": idx, "text": processed, "truncated_kind": kind})
        idx += 1
    return out


def read_pubmed(paths: str | list[str]):
    """PubMed ``*.xml.gz`` file(s) → Dataset of abstract rows (+ path).

    The combined-file output of the reference (one abstract per line,
    pubmed_parser.py:55-69) is recovered by concatenating the ``text``
    column in (path, abstract_idx) order — each row already ends with
    its exactly-one newline.
    """
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse_row(row: dict) -> list[dict]:
        abstracts = parse_pubmed_xml(row["bytes"])
        for a in abstracts:
            a["path"] = row["path"]
        return abstracts

    return ds.flat_map(parse_row)


def truncation_counters(ds) -> dict[str, int]:
    """Distributed replacement for the reference's instance counters
    (pubmed_parser.py:55-69 logfile): per-kind abstract counts."""
    counts = {"none": 0, "250": 0, "400": 0, "plain": 0}
    for row in ds.groupby("truncated_kind").count().take_all():
        counts[row["truncated_kind"]] = row["count()"]
    total = sum(counts.values())
    return {
        "total_abstracts": total,
        "total_truncated": total - counts["none"],
        "truncated_250": counts["250"],
        "truncated_400": counts["400"],
        "truncated_plain": counts["plain"],
    }
