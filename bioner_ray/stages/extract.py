"""HTML → text extraction (stateless map_batches stage).

Ray-Data re-expression of the reference extractor pipeline
(bioner/preprocessing/pubmed_parser.py:20-53): where the reference
iterates ``Article/Abstract/AbstractText`` nodes of gzipped PubMed XML
and appends one processed abstract per line, we treat each page's
``<p>…</p>`` blocks as the abstract-text units, apply the byte-faithful
``process_abstract_text`` to each, and concatenate — so the per-url
output is the exact byte sequence the reference writer would have
produced for the same units.

The ``html`` column (potentially MBs per row) is dropped in the same
batch transform the moment text is extracted — wide-row hygiene per
SURVEY.md §7.4.6.
"""

from __future__ import annotations

import html as html_mod
import re

import pyarrow as pa

from bioner_ray.functions.text import process_abstract_text

_PARA_RE = re.compile(rb"<p(?:\s[^>]*)?>(.*?)</p>", re.DOTALL | re.IGNORECASE)


def extract_text_from_html(raw_html: bytes) -> tuple[str, str]:
    """(text, truncated_kind) for one page.

    Every ``<p>`` block is one abstract-text unit: unescape entities,
    then process exactly like the reference's per-abstract step
    (detect-but-keep truncation marker + exactly one trailing newline,
    pubmed_parser.py:41-53). Pages with no ``<p>`` yield "".
    """
    parts: list[str] = []
    kind = "none"
    for m in _PARA_RE.finditer(raw_html):
        unit = html_mod.unescape(m.group(1).decode("utf-8", errors="replace"))
        processed, k = process_abstract_text(unit)
        parts.append(processed)
        if kind == "none":
            kind = k
    return "".join(parts), kind


def extract_batch(batch: pa.Table) -> pa.Table:
    """pyarrow batch fn: (url, warc_ts, html, lang, …) → EXTRACTED_SCHEMA."""
    htmls = batch.column("html").to_pylist()
    texts = []
    kinds = []
    for h in htmls:
        text, kind = extract_text_from_html(h if h is not None else b"")
        texts.append(text)
        kinds.append(kind)
    return pa.table(
        {
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "text": pa.array(texts, type=pa.string()),
            "lang": batch.column("lang"),
            "truncated_kind": pa.array(kinds, type=pa.string()),
        }
    )


def extract_stage(ds, batch_size: int = 256):
    """Dataset stage: pages → extracted text (html dropped)."""
    return ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=batch_size)


_TABLE_RE = re.compile(rb"<table(?:\s[^>]*)?>(.*?)</table>", re.DOTALL | re.IGNORECASE)
_TR_RE = re.compile(rb"<tr(?:\s[^>]*)?>(.*?)</tr>", re.DOTALL | re.IGNORECASE)
_CELL_RE = re.compile(rb"<t[dh](?:\s[^>]*)?>(.*?)</t[dh]>", re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")

TABLE_CELLS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("table_idx", pa.int64()),
        ("row_idx", pa.int64()),
        ("col_idx", pa.int64()),
        ("cell", pa.string()),
    ]
)


def extract_table_cells_batch(batch: pa.Table) -> pa.Table:
    """(url, html) → one row per ``<td>``/``<th>`` cell: (url,
    table_idx, row_idx, col_idx, cell) — the web-table harvesting step
    a KG build runs on structured pages (WebTables-style fact
    extraction). Attribute noise on any tag is tolerated; inner markup
    is stripped and entities unescaped; pages with no table emit
    nothing, so output fan-out tracks real table bytes.

    Same per-page compiled-regex scan shape as extract_links_batch —
    the one per-document pass every text stage pays; no DOM, no
    per-token Python."""
    if batch.num_columns == 0 or batch.num_rows == 0:
        return TABLE_CELLS_SCHEMA.empty_table()
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    out_url: list[str] = []
    out_t: list[int] = []
    out_r: list[int] = []
    out_c: list[int] = []
    out_cell: list[str] = []
    for u, h in zip(urls, htmls):
        for ti, tm in enumerate(_TABLE_RE.finditer(h or b"")):
            for ri, rm in enumerate(_TR_RE.finditer(tm.group(1))):
                for ci, cm in enumerate(_CELL_RE.finditer(rm.group(1))):
                    raw = cm.group(1).decode("utf-8", errors="replace")
                    cell = html_mod.unescape(_TAG_RE.sub("", raw)).strip()
                    out_url.append(u)
                    out_t.append(ti)
                    out_r.append(ri)
                    out_c.append(ci)
                    out_cell.append(cell)
    return pa.table(
        {
            "url": pa.array(out_url, type=pa.string()),
            "table_idx": pa.array(out_t, type=pa.int64()),
            "row_idx": pa.array(out_r, type=pa.int64()),
            "col_idx": pa.array(out_c, type=pa.int64()),
            "cell": pa.array(out_cell, type=pa.string()),
        },
        schema=TABLE_CELLS_SCHEMA,
    )


_JSONLD_RE = re.compile(
    rb"<script[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>(.*?)</script>",
    re.DOTALL | re.IGNORECASE,
)

JSONLD_TRIPLES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
    ]
)


def _jsonld_scalar(v) -> str:
    # bool before int: Python bools are ints, but JSON-LD consumers
    # expect lowercase literals, and str(True) would emit 'True'
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


_JSONLD_MAX_DEPTH = 32


def _flatten_jsonld(node: dict, subj: str, url: str, out: list, depth: int = 0) -> None:
    """Depth-first flatten of one JSON-LD object to (url, subj, pred,
    obj) rows. Nested objects become blank-node-style subjects
    ``subj/pred`` (array elements ``subj/pred#idx``) linked from the
    parent by a triple whose object IS the child id; scalar arrays fan
    out one triple per element; ``@context`` is annotation, not a
    fact, and is skipped; JSON null carries no assertion. Nesting
    beyond ``_JSONLD_MAX_DEPTH`` is dropped (the parent link is still
    emitted) — wild-crawl JSON nests adversarially and a recursion
    crash in one page must not kill the batch."""
    if depth >= _JSONLD_MAX_DEPTH:
        return
    for k, v in node.items():
        if k == "@context":
            continue
        if isinstance(v, dict):
            child = f"{subj}/{k}"
            out.append((url, subj, k, child))
            _flatten_jsonld(v, child, url, out, depth + 1)
        elif isinstance(v, list):
            for idx, el in enumerate(v):
                if isinstance(el, dict):
                    child = f"{subj}/{k}#{idx}"
                    out.append((url, subj, k, child))
                    _flatten_jsonld(el, child, url, out, depth + 1)
                elif el is not None:
                    out.append((url, subj, k, _jsonld_scalar(el)))
        elif v is not None:
            out.append((url, subj, k, _jsonld_scalar(v)))


def extract_jsonld_batch(batch: pa.Table) -> pa.Table:
    """(url, html) → one row per schema.org JSON-LD assertion: the
    Web Data Commons-style structured-data harvest that is the highest-
    precision KG-construction source on a real crawl. Each
    ``<script type="application/ld+json">`` block is parsed with the
    stdlib JSON parser (C-accelerated; the per-page loop is per
    SCRIPT BLOCK, never per token); malformed JSON — ubiquitous in the
    wild — is skipped silently, page root subjects are
    ``url#ld{block_idx}`` (list roots ``url#ld{block}_{elem}``), and
    nesting flattens per ``_flatten_jsonld``. Pages with no JSON-LD
    emit nothing, so output fan-out tracks real structured bytes.

    Same stateless zero-copy-in scan shape as extract_table_cells_batch;
    compiled regex finds the blocks, json.loads does the parsing."""
    import json

    if batch.num_columns == 0 or batch.num_rows == 0:
        return JSONLD_TRIPLES_SCHEMA.empty_table()
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    out: list[tuple[str, str, str, str]] = []
    for u, h in zip(urls, htmls):
        for bi, m in enumerate(_JSONLD_RE.finditer(h or b"")):
            try:
                root = json.loads(m.group(1).decode("utf-8", errors="replace"))
            except (json.JSONDecodeError, RecursionError):
                # malformed JSON, or nesting so deep the C decoder
                # itself recurses out — one hostile page must not kill
                # the batch
                continue
            if isinstance(root, dict):
                _flatten_jsonld(root, f"{u}#ld{bi}", u, out)
            elif isinstance(root, list):
                for ei, el in enumerate(root):
                    if isinstance(el, dict):
                        _flatten_jsonld(el, f"{u}#ld{bi}_{ei}", u, out)
    if not out:
        return JSONLD_TRIPLES_SCHEMA.empty_table()
    cols = list(zip(*out))
    return pa.table(
        {
            "url": pa.array(cols[0], type=pa.string()),
            "subj": pa.array(cols[1], type=pa.string()),
            "pred": pa.array(cols[2], type=pa.string()),
            "obj": pa.array(cols[3], type=pa.string()),
        },
        schema=JSONLD_TRIPLES_SCHEMA,
    )


_BLOCK_RE = re.compile(rb"<(p|div)(?:\s[^>]*)?>(.*?)</\1>", re.DOTALL | re.IGNORECASE)
_A_RE = re.compile(rb"<a(?:\s[^>]*)?>(.*?)</a>", re.DOTALL | re.IGNORECASE)

MAIN_BLOCKS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("block_idx", pa.int64()),
        ("n_words", pa.int64()),
        ("n_link_words", pa.int64()),
        ("kept", pa.int64()),
    ]
)


def extract_main_blocks_batch(
    batch: pa.Table, max_link_density: float = 0.5, min_words: int = 3
) -> pa.Table:
    """(url, html) → one row per flat ``<p>``/``<div>`` block with the
    jusText/trafilatura-family boilerplate verdict: a block is KEPT
    when its link density (words inside ``<a>`` ÷ all words) is below
    ``max_link_density`` AND it has ≥ ``min_words`` words — navigation
    bars and footers (all-link, few-word blocks) drop, prose
    paragraphs survive. Same compiled-regex per-page scan shape as
    extract_table_cells_batch; flat blocks only (nested ``<div>``
    trees need the DOM pass this engine reserves for the import-gated
    seam — the Common-Crawl main-content heuristic operates on flat
    text blocks).

    Counts are exact integers, so the verdict is SQL-replayable; the
    kept-block text itself is ``_TAG_RE``-stripped and
    entity-unescaped exactly like the table harvester."""
    if batch.num_columns == 0 or batch.num_rows == 0:
        return MAIN_BLOCKS_SCHEMA.empty_table()
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    out = {k: [] for k in MAIN_BLOCKS_SCHEMA.names}
    for u, h in zip(urls, htmls):
        for bi, bm in enumerate(_BLOCK_RE.finditer(h or b"")):
            body = bm.group(2)
            n_link = sum(
                len(
                    html_mod.unescape(
                        _TAG_RE.sub("", am.group(1).decode("utf-8", errors="replace"))
                    ).split()
                )
                for am in _A_RE.finditer(body)
            )
            text = html_mod.unescape(
                _TAG_RE.sub("", body.decode("utf-8", errors="replace"))
            )
            n_words = len(text.split())
            kept = int(
                n_words >= min_words
                and (n_words == 0 or n_link / n_words < max_link_density)
            )
            out["url"].append(u)
            out["block_idx"].append(bi)
            out["n_words"].append(n_words)
            out["n_link_words"].append(n_link)
            out["kept"].append(kept)
    return pa.table(
        {
            "url": pa.array(out["url"], type=pa.string()),
            "block_idx": pa.array(out["block_idx"], type=pa.int64()),
            "n_words": pa.array(out["n_words"], type=pa.int64()),
            "n_link_words": pa.array(out["n_link_words"], type=pa.int64()),
            "kept": pa.array(out["kept"], type=pa.int64()),
        },
        schema=MAIN_BLOCKS_SCHEMA,
    )


_ANY_TAG_RE = re.compile(rb"<(/?)([a-zA-Z][a-zA-Z0-9]*)(?:\s[^>]*)?>")
#: HTML void elements — never pushed on the depth stack
_VOID_TAGS = frozenset(
    b"area base br col embed hr img input link meta param source track wbr".split()
)

DOM_DEPTH_SCHEMA = pa.schema(
    [("url", pa.string()), ("max_depth", pa.int64()), ("n_tags", pa.int64())]
)


def dom_depth_batch(batch: pa.Table) -> pa.Table:
    """(url, html) → per-page max tag-nesting depth and total tag count
    — the page-complexity signal quality filters use to flag
    template/widget-heavy pages (deep DOM, little text). One compiled
    regex scan per page: open tags push, close tags pop (void elements
    skipped; stray closers clamp at zero — real crawl HTML is
    unbalanced and the scanner must not go negative)."""
    if batch.num_columns == 0 or batch.num_rows == 0:
        return DOM_DEPTH_SCHEMA.empty_table()
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    out_d, out_n = [], []
    for h in htmls:
        depth = mx = n = 0
        for m in _ANY_TAG_RE.finditer(h or b""):
            tag = m.group(2).lower()
            if tag in _VOID_TAGS:
                n += 1
                continue
            if m.group(1):
                depth = max(0, depth - 1)
            else:
                n += 1
                depth += 1
                mx = max(mx, depth)
        out_d.append(mx)
        out_n.append(n)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "max_depth": pa.array(out_d, type=pa.int64()),
            "n_tags": pa.array(out_n, type=pa.int64()),
        },
        schema=DOM_DEPTH_SCHEMA,
    )


def tag_sequence_fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(url, html) → (url, fingerprint): md5 of the page's open-tag
    sequence (text and attributes ignored, void elements included in
    order) — the structural fingerprint template detection clusters
    on: pages generated from one server template share it even when
    every text node differs. One compiled-regex scan per page."""
    out_schema = pa.schema([("url", pa.string()), ("fingerprint", pa.string())])
    if batch.num_columns == 0 or batch.num_rows == 0:
        return out_schema.empty_table()
    import hashlib

    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    fps = []
    for h in htmls:
        tags = [
            m.group(2).lower().decode()
            for m in _ANY_TAG_RE.finditer(h or b"")
            if not m.group(1)  # open tags only
        ]
        fps.append(hashlib.md5(" ".join(tags).encode()).hexdigest())
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "fingerprint": pa.array(fps, type=pa.string()),
        },
        schema=out_schema,
    )
